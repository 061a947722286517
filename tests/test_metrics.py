"""Post-execution plan metrics (core/metrics.py): the numbers that
prove a plan's scale posture — map-side combine (shuffle records ≪
input rows), broadcast joins (zero exchanges), zero spill — read
directly from the executed plan instead of eyeballed from wall clock."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.core.io import load_table
from bp_datawarehouse_ordersfact_spark.core.metrics import (
    physical_plan_metrics,
    shuffle_summary,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("metrics")
        .config("spark.sql.shuffle.partitions", "4")
        # PIN the engine default: the exchange budgets below assume AQE
        # (e.g. conversation_pack reuses exchanges AQE plans away).
        # Another module's session config (test_plan_lint disables AQE)
        # leaks through the shared JVM's SparkConf when its module runs
        # first in the same pytest process — reproduced: plan_lint-then-
        # metrics ordering planned conversation_pack with 6 exchanges
        # against a budget of 4 (r10 review pass).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_groupby_metrics_prove_map_side_combine(spark):
    df = spark.range(0, 10_000, 1, 4).groupBy((F.col("id") % 7).alias("k")).count()
    df.collect()
    s = shuffle_summary(df)
    assert s["n_shuffle_exchanges"] == 1
    # partial aggregation: ≤ groups × map partitions records cross the
    # wire, NOT the 10k input rows — the map-side-combine proof
    assert 7 <= s["shuffle_records"] <= 7 * 4
    assert s["spill_bytes"] == 0
    rows = {
        e["node"]: e["metrics"].get("numOutputRows")
        for e in physical_plan_metrics(df)
        if e["metrics"].get("numOutputRows")
    }
    assert rows.get("RangeExec") == 10_000
    assert 7 in {
        e["metrics"].get("numOutputRows")
        for e in physical_plan_metrics(df)
        if e["node"] == "HashAggregateExec"
    }


def test_broadcast_join_shuffles_nothing(spark):
    small = spark.range(7).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    big = spark.range(10_000).select((F.col("id") % 7).alias("k"))
    j = big.join(F.broadcast(small), "k")
    j.count()
    assert shuffle_summary(j)["n_shuffle_exchanges"] == 0


def test_registry_flagship_shuffles_group_rows_not_input_rows(spark):
    """pricing_summary at sf0.001: 60k lineitem rows in, but the only
    exchange carries ≤ groups × map-partitions partial rows — the
    property that makes the rollup free at 100 TB, asserted from the
    executed metrics instead of the plan string."""
    from bp_datawarehouse_ordersfact_spark.queries import all_queries

    df = all_queries()["pricing_summary"](spark, SF_DIR)
    df.collect()
    s = shuffle_summary(df)
    n_input = load_table(spark, SF_DIR, "lineitem").count()
    assert s["n_shuffle_exchanges"] >= 1
    assert s["shuffle_records"] < n_input / 100
    assert s["spill_bytes"] == 0


def test_heavy_registry_queries_zero_spill_bounded_exchanges(spark):
    """The shuffle-heaviest registry shapes at sf0.001: every one must
    run with ZERO spill and a small fixed number of exchanges — the two
    metrics whose regression (a fan-out bug, a partition no longer
    fitting memory) wall-clock noise hides but SQLMetrics expose."""
    from bp_datawarehouse_ordersfact_spark.queries import all_queries
    from bp_datawarehouse_ordersfact_spark.queries.relational import RETIRED

    # registry-retired queries keep their plan budgets pinned here too —
    # retirement (round 9) moved them out of the driver window, not out
    # of the performance contract
    qs = {**all_queries(), **{k: fn for k, (fn, _) in RETIRED.items()}}
    budgets = {  # name -> max exchanges (fixed by plan shape)
        "count_distinct_per_group": 3,
        "dedup_keep_first": 2,
        "window_order_totals": 2,
        "multikey_rollup": 2,
        "sessionize_events": 3,
        "pivot_status": 3,
        "dedup_passage_spans": 7,  # fan-out + anchor rollups + coalesce window
        # round-9 window queries (url_canonicalize is map-only — zero
        # exchanges — so it can't satisfy this test's proves-execution
        # shuffle_records>0 gate and is pinned by parity instead)
        "conversation_pack": 4,  # bin window + offset window + final agg
        "token_mixture": 2,  # apply side: one (source, epoch) agg; plan agg is its own job
        # r10: the parallelism-pinning repartition must SATISFY the
        # grouped-map clustering requirement, not stack a second
        # exchange under it (and it exempts the Python stage from AQE
        # bytes-based coalescing — the 3x serialization found in r10)
        "grouped_ewma": 1,
    }
    for name, max_ex in budgets.items():
        df = qs[name](spark, SF_DIR)
        # collect(), NOT a noop write: a write action runs through its
        # OWN QueryExecution, leaving df's SQLMetrics at zero — the
        # assertions below would pass vacuously on an unexecuted plan
        # (found in r8: shuffle_records stayed 0 after a noop save).
        # Results at sf0.001 are small; collect executes THIS plan.
        df.collect()
        s = shuffle_summary(df)
        assert s["shuffle_records"] > 0, (name, s)  # proves execution
        assert s["spill_bytes"] == 0, (name, s)
        assert 1 <= s["n_shuffle_exchanges"] <= max_ex, (name, s)
