"""Scale-posture tests: salting correctness and bucketed-join plan shape
— the two levers beyond broadcast that matter on a 1000-executor cluster.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.core.io import write_bucketed
from bp_datawarehouse_ordersfact_spark.operators.joins import salted_join


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = (
        SparkSession.builder.master("local[4]")
        .appName("scale")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir", wh)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + a long tail
    big = spark.createDataFrame(
        [Row(k="hot", v=i) for i in range(900)]
        + [Row(k=f"cold{i}", v=i) for i in range(100)]
    )
    small = spark.createDataFrame(
        [Row(k="hot", w="H")] + [Row(k=f"cold{i}", w=f"C{i}") for i in range(100)]
    )
    plain = big.join(small, "k").groupBy("k", "w").count()
    salted = salted_join(big, small, "k", salt_n=8).groupBy("k", "w").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_rows_preserved(spark):
    big = spark.createDataFrame([Row(k="a", v=1), Row(k="a", v=2), Row(k="b", v=3)])
    small = spark.createDataFrame([Row(k="a", w="x"), Row(k="b", w="y")])
    out = salted_join(big, small, "k", salt_n=4)
    assert out.count() == 3  # exactly one replicated match per left row


def test_partitioned_staging_prunes_partitions(spark, tmp_path):
    """Staging partitioned by a filter column ⇒ the scan lists only the
    matching directories (PartitionFilters), never touching other years'
    files — the reference's single CSV blob re-reads everything always."""
    from bp_datawarehouse_ordersfact_spark.core.io import write_parquet

    df = spark.range(0, 1000).select(
        F.col("id"), (2020 + F.col("id") % 5).alias("year"), (F.col("id") * 2).alias("v")
    )
    path = str(tmp_path / "staged")
    write_parquet(df, path, partition_by=["year"])
    rd = spark.read.parquet(path).filter(F.col("year") == 2022)
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2022" in plan
    assert rd.count() == 200


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key ⇒ the join plan contains NO
    shuffle exchange — the co-location was paid once at write time."""
    import shutil

    # In a shared pytest JVM, getOrCreate reuses the FIRST session, so the
    # fixture's warehouse.dir may not apply — drop tables and clear any
    # leftover managed-table directories from previous runs explicitly.
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bucketed", "o_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    # runtime-set the plan-shape configs too (session reuse may have
    # ignored the fixture's builder configs)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.range(0, 1000).select(
        F.col("id").alias("orderkey"), (F.col("id") % 7).alias("qty")
    )
    o = spark.range(0, 200).select(
        F.col("id").alias("orderkey"), (F.col("id") % 3).alias("status")
    )
    write_bucketed(li, "li_bucketed", ["orderkey"], n_buckets=8)
    write_bucketed(o, "o_bucketed", ["orderkey"], n_buckets=8)
    j = spark.table("li_bucketed").join(spark.table("o_bucketed"), "orderkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucketing removed the shuffle
    assert j.count() == 200


def test_ingest_fan_out_partitioning_is_reused(spark):
    """The _fan_out hash-repartition after a single-blob scan must be the
    ONLY exchange for a downstream per-doc aggregate: HashPartitioning on
    doc_id satisfies ClusteredDistribution([doc_id, ...]) so groupBys and
    windows keyed on the doc reuse it instead of shuffling again."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    from bp_datawarehouse_ordersfact_spark.queries.llmops import _docs

    d = _docs(spark, "/root/testdata/sf0.001")
    assert d.rdd.getNumPartitions() > 1  # the scan alone is 1 indivisible split
    agg = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # fan-out only; the agg reuses it


def test_grouped_ewma_dominant_key_single_batch(spark):
    """applyInPandas delivers each group WHOLE to one invocation — the
    skew posture of the grouped-EWMA operator. One key owning 90% of the
    rows arrives as a single Arrow batch (state never splits, so the
    recursion is correct), at the cost of one straggler task whose group
    must fit in executor memory; past that, chunk with
    applyInPandasWithState (see queries/llmops.q_grouped_ewma)."""
    import pandas as pd

    rows = [Row(user_id=1, event_id=i, v=float(i % 13)) for i in range(900)] + [
        Row(user_id=2 + i, event_id=1000 + i, v=float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows).repartition(4, "event_id")

    def probe(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows_in_batch == group size proves the whole group reached one call
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[:1],
                "rows_in_batch": [len(pdf)],
                "ewma_last": [
                    pdf.sort_values("event_id")["v"]
                    .ewm(alpha=0.3, adjust=False)
                    .mean()
                    .iloc[-1]
                ],
            }
        )

    got = {
        r["user_id"]: r
        for r in df.groupBy("user_id")
        .applyInPandas(probe, "user_id long, rows_in_batch long, ewma_last double")
        .collect()
    }
    assert got[1]["rows_in_batch"] == 900  # dominant group: one whole batch
    assert all(got[u]["rows_in_batch"] == 1 for u in got if u != 1)
    # recursion over the dominant group matches a local single-pass fold
    expect = (
        pd.Series([float(i % 13) for i in range(900)])
        .ewm(alpha=0.3, adjust=False)
        .mean()
        .iloc[-1]
    )
    assert abs(got[1]["ewma_last"] - expect) < 1e-9


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime row-level filtering: when a selective dim-side filter feeds
    a shuffle join, Catalyst injects a bloom-filter aggregate on the dim
    keys and applies `might_contain` on the fact side BEFORE the shuffle —
    at 100 TB this drops most fact rows at the scan instead of shuffling
    them. Pin that the conf-gated rewrite actually fires on our join shape
    (thresholds lowered because local testdata is tiny; a real cluster
    keeps the defaults)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_shuffle_partitions(spark):
    """Production sessions run with AQE on and a fixed shuffle-partition
    count sized for the large case; AQE is what shrinks that to the data
    actually flowing (tiny shuffles → few partitions, no 200-task
    overhead). Pin that coalescing actually happens on a small aggregate
    so a session-factory regression (AQE off, advisory size broken)
    fails here instead of as cluster-wide task-scheduling overhead."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.shuffle.partitions": "64",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = (
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .groupBy("o_orderstatus")
            .count()
        )
        df.collect()  # AQE final plan exists only after execution
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead coalesced" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_diagnose_key_skew_detects_hot_key_and_spares_uniform(spark):
    """The diagnostic must (a) prove real skew from the MG LOWER bound
    and recommend a salt near the hot key's multiple of the even share,
    and (b) NOT cry wolf on uniform high-cardinality data — where the MG
    upper bound alone would be wildly inflated by the global decrement."""
    from bp_datawarehouse_ordersfact_spark.operators.joins import (
        diagnose_key_skew,
    )

    # 10_000 rows, hot key holds 50%, 1000 cold keys share the rest
    hot = spark.range(5_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(5_000).select(
        F.concat(F.lit("c"), (F.col("id") % 1000)).alias("k"),
        F.col("id").alias("v"),
    )
    d = diagnose_key_skew(hot.unionByName(cold), "k", mg_k=64)
    assert d["total_rows"] == 10_000
    assert d["top_keys"][0][0] == "hot"
    lo, hi = d["top_keys"][0][1], d["top_keys"][0][2]
    assert lo <= 5_000 <= hi  # MG bound contract on the hot key
    # even share ~ 10_000/1001 ≈ 10; the hot key is hundreds of times it
    assert d["skew_factor"] > 50
    assert 50 < d["recommended_salt"] <= 1024

    # uniform: 10_000 rows over ~2000 keys, 5 rows each
    uni = spark.range(10_000).select(
        F.concat(F.lit("u"), (F.col("id") % 2000)).alias("k"),
        F.col("id").alias("v"),
    )
    du = diagnose_key_skew(uni, "k", mg_k=64)
    # est_lo of any survivor of heavy decrementing is tiny vs total;
    # the diagnostic must NOT recommend material salting
    assert du["recommended_salt"] <= 2, du
    assert du["skew_factor"] < 2, du


def test_tune_ann_index_finds_cheapest_passing_config(spark, tmp_path):
    """The tuner walks the cost grid in order and stops at the FIRST
    config meeting the target; probe-all with a corpus-covering
    shortlist is always reachable at recall 1.0, and an impossible
    target (>1.0 is invalid, so use 1.0 on a tiny shortlist grid that
    cannot reach it... instead pin the met=False path via an empty
    grid) returns the trace instead of raising."""
    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.pipelines import build_ann_index
    from bp_datawarehouse_ordersfact_spark.pipelines.ann_index import (
        tune_ann_index,
    )

    out = str(tmp_path / "tune_idx")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    build_ann_index(spark, emb, out, n_cells=4, m=8, ksub=8, n_iter=2)

    res = tune_ann_index(
        spark, out, emb, target_recall=1.0, n_queries=5, k=4,
        shortlist_grid=(1000,),
    )
    assert res["met"] is True
    assert res["recall_at_k"] == 1.0
    # the trace is the recall/cost curve: one row per evaluated config,
    # strictly increasing n_probe, stopping AT the passing config
    probes = [t["n_probe"] for t in res["trace"]]
    assert probes == sorted(probes)
    assert res["trace"][-1]["n_probe"] == res["n_probe"]
    # every earlier config genuinely failed the target
    assert all(t["recall_at_k"] < 1.0 for t in res["trace"][:-1])

    # unmeetable: a 1-item grid with shortlist too small for recall 1.0
    res2 = tune_ann_index(
        spark, out, emb, target_recall=1.0, n_queries=5, k=4,
        n_probe_grid=[1], shortlist_grid=(1,),
    )
    assert res2["met"] is False and len(res2["trace"]) == 1
