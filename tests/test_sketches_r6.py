"""Driver-style verification for the STAGED round-6 sketch queries.

Runs the exact comparison the driver will run (tests/parity.py's
fetchdf + dtype-sensitive frames_match, with the central round()
rewrite applied as queries/__init__.all_oracles will) so that round 6's
registry activation is a mechanical two-line edit."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import sketches_r6
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("sketches-r6")
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
    for t in "events".split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", list(sketches_r6.QUERIES))
def test_staged_r6_query_passes_driver_comparison(spark, con, name):
    sdf = sketches_r6.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(sketches_r6.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"
