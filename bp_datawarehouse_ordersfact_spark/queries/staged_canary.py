"""STAGED registry query for a round-19 (or later buffer-round)
rotation (not yet in ``queries._MODULES`` — the sketches_r6/staged_r10
staging discipline: write the query + oracle + driver-style test ahead
of activation, so the activation is a mechanical edit).

One query: ``canary_scan`` — `operators.curation.canary_scan` (the
exact benchmark-canary detector, round 13's newest operator) was
pytest-pinned only; this gives it a driver row (r13 VERDICT "What's
missing #4": the `contamination_report` pattern — typed VALUES
canaries unioned over the real corpus).

Planted recipe (ids >= 4.5x10^7, disjoint from every testdata id range
and every other staged module's floor): three INVENTED canary marker
strings (digit-bearing hyphenated tokens no real document can
contain):

- alpha leaks through 2 docs (one mid-text, one exact — the verbatim
  ``contains`` both ways);
- beta leaks through 7 docs, exercising the max_example_ids=5 rank
  limit (count stays 7, examples truncate to the 5 smallest ids) and
  the r14 bounded-rollup fix (r13 ADVICE #4: ids are rank-limited
  BEFORE collect_list, so a heavily contaminated canary can never
  buffer every id in one aggregation buffer);
- gamma never leaks (the zero-hit row must still exist — the audit
  posture: a silently missing canary is indistinguishable from an
  unchecked one).

The real corpus unions into the docs side, so the |canaries|-predicate
broadcast contains-scan runs at corpus scale; the planted answer is
sf-independent because invented markers match only planted docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..core.io import load_table
from ..operators.curation import canary_scan

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_CANARY_ALPHA = "qv7zx-canary-alpha-93k1"
_CANARY_BETA = "rm3pw-canary-beta-55j9"
_CANARY_GAMMA = "tk6ln-canary-gamma-08x4"

_CANARY_DOCS = [
    (45_000_000, f"intro words then {_CANARY_ALPHA} and a tail"),
    (45_000_001, _CANARY_ALPHA),
] + [
    (45_000_010 + i, f"filler{i} {_CANARY_BETA} trailer{i}")
    for i in range(7)
]


@register(
    "canary_scan",
    f"""
    SELECT * FROM (VALUES
      ('{_CANARY_BETA}', CAST(7 AS BIGINT),
       '45000010,45000011,45000012,45000013,45000014'),
      ('{_CANARY_ALPHA}', CAST(2 AS BIGINT), '45000000,45000001'),
      ('{_CANARY_GAMMA}', CAST(0 AS BIGINT), '')
    ) AS t(canary, n_docs, example_doc_ids)
    """,
)
def q_canary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact benchmark-canary scan (`operators.curation.canary_scan`):
    per planted marker string, the count of documents containing it
    VERBATIM plus a bounded example-id list — the filter-before-training
    dual of `contamination_report`'s fuzzy n-gram audit.

    Why a typed VALUES oracle is a deterministic twin: the canaries are
    invented digit-bearing strings, so the matched set is exactly the
    planted docs — counts and the rank-limited example list are pure
    substring arithmetic over the fixture, re-derived from a
    pure-Python contains twin in the staged test (which also pins the
    zero-hit row's presence and the 7-hit canary's truncation to the 5
    smallest ids). The real corpus unions into the docs side and pays
    the operator's true at-scale cost: one corpus text pass with
    |canaries| codegen ``contains`` predicates, then a
    rank-bounded rollup over the (rare by construction) hit set."""
    real = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(_CANARY_DOCS, "doc_id long, text string")
    docs = real.unionByName(planted)
    canaries = spark.createDataFrame(
        [(_CANARY_ALPHA,), (_CANARY_BETA,), (_CANARY_GAMMA,)],
        "canary string",
    )
    return canary_scan(
        docs,
        canaries,
        text_col="text",
        id_col="doc_id",
        canary_col="canary",
        max_example_ids=5,
    )
