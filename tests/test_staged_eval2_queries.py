"""STAGED driver-row tests for the round-13 group-grain evaluation
tiers (queries/staged_eval2.py): query + computed DuckDB oracle +
driver-style comparison, so the future activation (earliest r18, after
staged_eval's seven) is a mechanical edit. The underlying operators'
formula twins live in tests/test_staged_eval_queries.py — grouped
results there are pinned equal to the global operator run per group,
so these tests only need the cross-engine hash discipline."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_eval2
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-eval2")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


@pytest.mark.parametrize("name", list(staged_eval2.QUERIES))
def test_staged_eval2_query_passes_driver_comparison(spark, con, name):
    sdf = staged_eval2.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_eval2.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_not_yet_registered():
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    assert not (set(staged_eval2.QUERIES) & live)
    assert set(staged_eval2.QUERIES) == set(staged_eval2.ORACLES)


def test_split_premise_every_source_has_both_halves(spark):
    """The %40 block split must land both halves non-empty for every
    source (doc_id PARITY is constant per source in the testdata — the
    trap this split exists to avoid); re-checked against the data so a
    generator change can't silently void the psi row's premise."""
    from pyspark.sql import functions as F

    from bp_datawarehouse_ordersfact_spark.core.io import load_table

    docs = load_table(spark, SF_DIR, "documents")
    halves = docs.groupBy("source").agg(
        F.sum((F.col("doc_id") % 40 < 20).cast("int")).alias("a"),
        F.sum((F.col("doc_id") % 40 >= 20).cast("int")).alias("b"),
    )
    bad = halves.filter((F.col("a") == 0) | (F.col("b") == 0)).collect()
    assert not bad, f"one-sided sources under the %40 split: {bad}"
