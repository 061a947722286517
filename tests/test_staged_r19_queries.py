"""Driver-style verification for the STAGED round-19 registry query
(queries/staged_r19.py). The row is the self-validation pattern
(partition-dependent bound values, partition-independent guarantees),
so beyond the driver comparison the test re-checks the premises: the
plants beat the worst-case decrement at every test sf, the booleans
hold under a DIFFERENT parallelism than the driver's, and a pure-Python
single-pass Misra-Gries twin over the same pool brackets the same true
counts.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r19
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r19")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.mark.parametrize("name", list(staged_r19.QUERIES))
def test_staged_r19_query_passes_driver_comparison(spark, name):
    sdf = staged_r19.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r19.ORACLES[name])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_not_yet_registered():
    """Staging contract: the name must NOT be in the live registry (the
    registry is at its 100-entry rotation cap) until the round-19
    activation swaps it in."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    assert not (set(staged_r19.QUERIES) & live)


def test_mg_presence_guarantee_margin_at_every_test_sf():
    """The plants' survival must be GUARANTEED, not lucky: true count >
    N/(k+1) (the worst-case total decrement), with >= 2x margin, at
    EVERY sf directory that exists — enumerated, not hardcoded, so a
    regenerated or larger testdata dir re-triggers this check before it
    can redden a driver row (r11 review)."""
    import glob
    import os

    sf_dirs = sorted(glob.glob("/root/testdata/sf*"))
    assert sf_dirs, "no testdata sf dirs found"
    for d in sf_dirs:
        path = os.path.join(d, "events.parquet")
        if not os.path.exists(path):
            continue
        [n_events] = duckdb.connect().execute(
            f"SELECT count(*) FROM '{path}'"
        ).fetchone()
        n = n_events + staged_r19._MG_PLANT_A + staged_r19._MG_PLANT_B
        worst_dec = n / (staged_r19._MG_K + 1)
        assert staged_r19._MG_PLANT_B > 2 * worst_dec, (d, n, worst_dec)


def _mg_twin(stream, k):
    """Single-pass textbook Misra-Gries over a Python iterable."""
    counters: dict[str, int] = {}
    dec = 0
    for x in stream:
        if x in counters:
            counters[x] += 1
        elif len(counters) < k:
            counters[x] = 1
        else:
            dead = [i for i in counters if counters[i] == 1]
            for i in counters:
                counters[i] -= 1
            for i in dead:
                del counters[i]
            dec += 1
    return counters, dec


def test_mg_guarantees_rederive_from_pure_python_twin():
    """The same pool (sf0.001 event ids + plants) through a textbook
    single-pass MG twin: the plants survive with bracketing bounds, and
    the decrement total respects the N/(k+1) bound — the premises the
    Spark row's booleans assert, re-derived with zero Spark code."""
    (ids,) = (
        duckdb.connect()
        .execute(
            f"SELECT list(CAST(event_id AS VARCHAR)) FROM '{SF_DIR}/events.parquet'"
        )
        .fetchone()
    )
    stream = (
        list(ids)
        + ["planted-hh-a"] * staged_r19._MG_PLANT_A
        + ["planted-hh-b"] * staged_r19._MG_PLANT_B
    )
    counters, dec = _mg_twin(stream, staged_r19._MG_K)
    assert dec <= len(stream) / (staged_r19._MG_K + 1)
    for item, true in (
        ("planted-hh-a", staged_r19._MG_PLANT_A),
        ("planted-hh-b", staged_r19._MG_PLANT_B),
    ):
        assert item in counters
        est_lo = counters[item]
        assert est_lo <= true <= est_lo + dec
    assert "never-seen-item" not in counters


def test_mg_booleans_hold_under_different_parallelism(spark):
    """The driver runs local[8]; this session is local[4]. Repartitioning
    the pool to 1 and to 13 partitions changes the summaries (and the
    bound values) but must never flip presence or bounds_hold."""
    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.operators.sketches import (
        frequent_items_mg,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events").select(
        F.col("event_id").cast("string").alias("item")
    )
    planted = spark.createDataFrame(
        [("planted-hh-a",)] * staged_r19._MG_PLANT_A
        + [("planted-hh-b",)] * staged_r19._MG_PLANT_B,
        "item string",
    )
    pool = ev.unionByName(planted)
    for nparts in (1, 13):
        mg = {
            r["item"]: (r["est_lo"], r["est_hi"])
            for r in frequent_items_mg(
                pool.repartition(nparts), "item", k=staged_r19._MG_K
            ).collect()
        }
        for item, true in (
            ("planted-hh-a", staged_r19._MG_PLANT_A),
            ("planted-hh-b", staged_r19._MG_PLANT_B),
        ):
            lo, hi = mg[item]
            assert lo <= true <= hi, (nparts, item, lo, hi)
        assert "never-seen-item" not in mg
