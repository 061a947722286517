"""Driver-style verification for the STAGED ``embedding_profile``
registry query (queries/staged_profile.py). The oracle recomputes the
audit in SQL; this runs the driver's exact comparison at sf0.001 and
re-derives the planted-pathology counts from the fixture."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_profile
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-profile")
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
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", list(staged_profile.QUERIES))
def test_staged_profile_query_passes_driver_comparison(spark, con, name):
    sdf = staged_profile.QUERIES[name](spark, SF_DIR).toPandas()
    ddf = con.execute(sql_rewrite_rounds(staged_profile.ORACLES[name])).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_planted_pathology_counts_pinned(spark):
    """The planted rows ARE the count columns: the real table carries
    no NULL / ragged / zero-norm / non-finite vectors, so each count
    must equal exactly its plant."""
    out = staged_profile.QUERIES["embedding_profile"](spark, SF_DIR).collect()[0]
    assert out["n_null"] == 1
    assert out["n_zero_norm"] == 1
    assert out["n_nonfinite"] == 2
    assert out["n_dims_distinct"] == 2  # 64 and the ragged 3
    assert out["dim_min"] == 3 and out["dim_max"] == 64


def test_staged_module_is_not_yet_registered():
    """Staging contract: not in the live registry (100-entry cap)
    until a buffer-round activation (earliest r20)."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    assert not (set(staged_profile.QUERIES) & live)
