"""Driver-style verification for the STAGED ``canary_scan`` registry
query (queries/staged_canary.py — r13 VERDICT "What's missing #4").
The typed-VALUES oracle is re-derived from a pure-Python substring
twin, so the literals are never the only place the expected answer
lives; the twin also pins the zero-hit row's presence and the
rank-limit truncation of the 7-hit canary.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_canary
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-canary")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.mark.parametrize("name", list(staged_canary.QUERIES))
def test_staged_canary_query_passes_driver_comparison(spark, name):
    sdf = staged_canary.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_canary.ORACLES[name])
    ddf = duckdb.connect().execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_oracle_matches_pure_python_twin():
    """The VALUES literals re-derived independently: a plain substring
    scan over the planted fixture, counts per canary, examples = the
    max_example_ids smallest matching ids."""
    canaries = [
        staged_canary._CANARY_ALPHA,
        staged_canary._CANARY_BETA,
        staged_canary._CANARY_GAMMA,
    ]
    expected = {}
    for c in canaries:
        hits = sorted(
            i for i, t in staged_canary._CANARY_DOCS if c in t
        )
        expected[c] = (
            len(hits),
            ",".join(str(i) for i in hits[:5]),
        )
    ddf = duckdb.connect().execute(
        sql_rewrite_rounds(staged_canary.ORACLES["canary_scan"])
    ).fetchdf()
    got = {
        r["canary"]: (int(r["n_docs"]), r["example_doc_ids"])
        for _, r in ddf.iterrows()
    }
    assert got == expected
    # the fixture exercises what it claims: a multi-doc canary past the
    # example cap, a 2-doc canary, and a zero-hit canary
    counts = sorted(n for n, _ in expected.values())
    assert counts == [0, 2, 7]


def test_staged_module_is_not_yet_registered():
    """Staging contract: the name must NOT be in the live registry (the
    registry is at its 100-entry rotation cap) until a buffer-round
    activation (earliest r19 per queries/__init__.py) swaps it in."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    assert not (set(staged_canary.QUERIES) & live)
