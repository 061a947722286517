"""Driver-facing query registry.

Each submodule exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins). Names without an
oracle get the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible ops).

Conventions enforced across every pair (see SURVEY.md §5.2):
- every computed column is aliased identically in Spark and SQL;
- float aggregates are pre-rounded on BOTH sides (2dp money, 6dp ratios)
  so parallel-summation order can't flip the driver's value hash;
- counts are cast to bigint on the Spark side (DuckDB count() is BIGINT).
"""

from __future__ import annotations

from ..functions.rounding import sql_rewrite_rounds
from . import domain_e2e, llmops, pipeline, relational, streaming

_MODULES = (relational, pipeline, llmops, streaming, domain_e2e)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    # every round() in oracle SQL is rewritten to the portable
    # floor(x*10^n+0.5)/10^n form the Spark side uses (see functions.rounding)
    out = {}
    for mod in _MODULES:
        out.update({k: sql_rewrite_rounds(v) for k, v in mod.ORACLES.items()})
    return out
