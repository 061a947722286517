"""Cross-engine deterministic rounding.

Spark's ``round`` (BigDecimal HALF_UP on the double's shortest decimal
repr) and DuckDB's ``round`` (fp-multiply then round-half-away) disagree
on boundary doubles (e.g. 105127.335 → .33 vs .34). Both engines do IEEE
arithmetic identically, so the portable form is a pure-arithmetic round:
``floor(x * 10^n + 0.5) / 10^n``. Every query output uses this on BOTH
sides, making the driver's value hash deterministic.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


# Money sums are decimal-exact with ≤4 dp, so a sum can sit EXACTLY on a
# .005 boundary; engines then disagree purely on parallel-summation fp
# noise (~1e-9 abs). The epsilon pushes both engines to the same side of
# such boundaries; it is far below the 0.01 spacing of honest scaled
# values, so it never mis-rounds real data.
_EPS = 1e-4


def rnd(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    factor = float(10**scale)
    return F.floor(c * factor + (0.5 + _EPS)) / factor


def sql_rewrite_rounds(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in an oracle SQL string into the
    portable ``floor((expr) * 1eN + 0.5) / 1eN`` form (balanced-paren
    aware)."""
    out = []
    i = 0
    lower = sql.lower()
    while True:
        m = re.search(r"\bround\s*\(", lower[i:])
        if not m:
            out.append(sql[i:])
            break
        start = i + m.start()
        open_paren = i + m.end() - 1
        out.append(sql[i:start])
        depth, j = 0, open_paren
        while j < len(sql):
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        inner = sql[open_paren + 1 : j]
        # split on last top-level comma → (expr, scale)
        depth2, split = 0, -1
        for k, ch in enumerate(inner):
            if ch == "(":
                depth2 += 1
            elif ch == ")":
                depth2 -= 1
            elif ch == "," and depth2 == 0:
                split = k
        expr, scale = sql_rewrite_rounds(inner[:split]), int(inner[split + 1 :].strip())
        factor = float(10**scale)
        out.append(f"(floor(({expr}) * {factor} + {0.5 + _EPS}) / {factor})")
        i = j + 1
    return "".join(out)
