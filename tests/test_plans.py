"""Physical-plan assertions: the shape of the plan IS the product at
100 TB. These tests pin the properties that make queries scale —
filter/column pushdown into the Parquet scan, broadcast joins for dims,
no cartesian products, whole-stage codegen coverage — so a refactor that
silently regresses the plan fails CI, not the cluster.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("plans")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # AQE off HERE ONLY: executedPlan stays inspectable pre-execution
        # (with AQE the final plan — codegen spans included — exists only
        # after the job runs). Production sessions keep AQE on.
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def plan_of(spark, name: str) -> str:
    df = all_queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    p = plan_of(spark, "pricing_summary")
    # the shipdate predicate reaches the Parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # only the 7 referenced columns are read (column pruning)
    assert "l_comment" not in p
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert rs and "l_returnflag" in rs[0] and "l_orderkey" not in rs[0]


def test_membership_filter_pushed_as_in(spark):
    p = plan_of(spark, "membership_filter")
    assert "PushedFilters" in p and "In(o_orderstatus" in p


def test_broadcast_dim_join_broadcasts_both_dims(spark):
    p = plan_of(spark, "broadcast_dim_join")
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_fact_royalty_broadcasts_part_and_no_cartesian(spark):
    p = plan_of(spark, "fact_royalty")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # the returns branch pushes l_returnflag='R' into its scan
    assert "EqualTo(l_returnflag,R)" in p


def test_window_order_totals_single_shuffle(spark):
    p = plan_of(spark, "window_order_totals")
    # one window over one exchange — no aggregate+join-back round trip
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p


def test_incremental_merge_uses_broadcast_anti_join(spark):
    p = plan_of(spark, "incremental_merge")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_semi_anti_join_no_shuffle_of_fact(spark):
    p = plan_of(spark, "semi_anti_join")
    assert "LeftAnti" in p


def test_dedup_queries_never_cross_join(spark):
    for name in ("dedup_minhash_lsh", "dedup_simhash", "dedup_passage_spans"):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_banded_lsh_driver_query_plan_shape(spark):
    """The round-7 driver query for the banded scale path must carry the
    scale plan it exists to prove: band keys from ONE Arrow eval pass
    and a pure key equi-join — never a cartesian/BNL join (the r6
    VERDICT #2 'done' criterion). The registry query returns an EAGER
    localCheckpoint (its executed plan is just the checkpoint scan), so
    the shape is pinned on the identical operator invocation in lazy
    form over the identical pool."""
    from pyspark.sql import functions as F

    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.operators.dedup import (
        embedding_near_dup_pairs_banded,
    )

    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dup = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    pool = e.unionByName(dup)
    df = embedding_near_dup_pairs_banded(
        pool, "embedding", "vec_id", threshold=0.999, dim=64, eager=False
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # and the registry-surface form stays free of unbounded joins
    p2 = plan_of(spark, "dedup_embedding_lsh_banded")
    assert "CartesianProduct" not in p2
    assert "BroadcastNestedLoopJoin" not in p2


def test_tfidf_match_is_token_join_not_cross_join(spark):
    p = plan_of(spark, "tfidf_title_match")
    assert "CartesianProduct" not in p


def test_whole_stage_codegen_present_in_hot_paths(spark):
    # codegen'd operators carry a '*(n)' stage prefix in the plan string
    for name in ("pricing_summary", "multikey_rollup", "fact_royalty"):
        p = plan_of(spark, name)
        assert "*(" in p, name
        # the aggregate itself (the hot operator) is inside a codegen span
        assert any(
            "HashAggregate" in ln and ln.lstrip().startswith(("*(", "+- *("))
            for ln in p.splitlines()
        ), name


def test_asof_join_is_single_shuffle_no_join(spark):
    # the union+carry-window as-of: exactly one exchange (hash on the
    # by-key), zero join operators, event_type filters pushed to the scan
    p = plan_of(spark, "asof_join")
    assert p.count("Exchange") == 1
    assert "Join" not in p
    assert "EqualTo(event_type,view)" in p and "EqualTo(event_type,purchase)" in p


def test_range_join_attribution_keeps_equi_key(spark):
    # equi key in the join condition -> hash join with the time range as
    # a residual filter; never a cartesian/BroadcastNestedLoop plan
    p = plan_of(spark, "range_join_attribution")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p


def test_regional_supplier_volume_fact_never_shuffles_for_joins(spark):
    # Q5 snowflake: all three dim joins broadcast; the fact side's only
    # exchange is the final rollup's
    p = plan_of(spark, "regional_supplier_volume")
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") == 3
    assert "PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)" in p


def test_cdc_apply_partial_window_group_limit(spark):
    # latest-wins rn=1 must plan as WindowGroupLimit with a PARTIAL pass
    # before the single key exchange (map-side per-key top-1 pruning)
    p = plan_of(spark, "cdc_apply")
    assert p.count("Exchange") == 1
    assert p.count("WindowGroupLimit") == 2  # Partial + Final
    assert "Join" not in p


def test_scd2_single_full_outer_join_one_dim_scan_per_branch(spark):
    # the SCD2 merge is ONE full-outer join; every merge case comes from
    # the version-array explode, never from re-joining the dimension
    p = plan_of(spark, "scd2_dim_update")
    assert p.count("SortMergeJoin") == 1 and "FullOuter" in p
    assert p.count("Generate explode") == 1


def test_events_gap_fill_two_exchanges_local_fill_sort(spark):
    # span agg + daily rollup are the only exchanges; the fill window
    # reuses the span aggregate's user_id partitioning (local sort only).
    # events_gap_fill RETIRED from the registry in round 13 — the plan
    # pin rides the RETIRED dict (retirement moved it out of the driver
    # window, not out of the performance contract).
    from bp_datawarehouse_ordersfact_spark.queries.relational import RETIRED

    fn, _ = RETIRED["events_gap_fill"]
    p = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 2
    assert "BroadcastHashJoin" in p
    assert "Window" in p


def test_funnel_stages_preaggregate_before_join(spark):
    # each stage joins USER-level aggregates, never raw event x event:
    # every join keeps a HashAggregate beneath it, and the event_type
    # filters reach the scans
    p = plan_of(spark, "funnel_analysis")
    assert "EqualTo(event_type,view)" in p
    assert "EqualTo(event_type,purchase)" in p
    assert "HashAggregate" in p and "CartesianProduct" not in p


def test_corpus_mix_filter_is_broadcast_no_corpus_shuffle(spark):
    # the per-source threshold table broadcasts; the corpus side must
    # not shuffle for the join
    p = plan_of(spark, "corpus_mix_resample")
    assert "BroadcastHashJoin" in p


def test_variant_extract_single_exchange_codegen(spark):
    # parse_json/variant_get stay JVM-side: one exchange for the rollup,
    # no joins, whole-stage codegen on the aggregate.
    # variant_props_extract RETIRED from the registry in round 12 — the
    # plan pin outlives the driver row (same contract as the oracle pin
    # in tests/test_retired_queries.py), so call the retiree directly.
    from bp_datawarehouse_ordersfact_spark.queries import relational

    df = relational.q_variant_props_extract(spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1 and "Join" not in p
    assert "*(" in p


def test_rollup_refresh_merges_without_join(spark):
    # archive/increment partials merge through union + one keyed
    # aggregate — a merge expressed as a join would shuffle twice as much
    p = plan_of(spark, "rollup_incremental_refresh")
    assert "Join" not in p
    assert p.count("Exchange") <= 2
    assert "Union" in p


def test_interval_coalesce_single_exchange_windows_reuse_partitioning(spark):
    """Gaps-and-islands: ONE shuffle on user_id; both windows and the
    (user_id, island) rollup reuse it — island refines user_id, so no
    second exchange may appear."""
    p = plan_of(spark, "interval_coalesce")
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Window") == 2
    assert "CartesianProduct" not in p


def test_correlated_exists_rewrite_semi_anti_no_cartesian(spark):
    """EXISTS -> left-semi, NOT EXISTS -> left-anti; supplier dim
    broadcasts; never a cartesian/BNLJ. Retired from the registry in
    round 11 (r10 VERDICT #1) — the plan pin rides the RETIRED dict, the
    same everything-stays-checked contract as its oracle pin."""
    from bp_datawarehouse_ordersfact_spark.queries.relational import RETIRED

    fn, _ = RETIRED["correlated_exists_rewrite"]
    p = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


# --- round-5 registry-neutral operators (bpe / pq / sampling) -------------
# These have no driver queries (registry capped by the rotation
# invariant), so their scale shape is pinned here instead.


def _exec_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_sample_is_takeordered_no_shuffle(spark):
    """Global A-ES top-n must compile to TakeOrderedAndProject (per-
    partition heaps, driver merge) — a global Sort+Exchange would
    shuffle the whole corpus for n rows."""
    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.operators.sampling import weighted_sample

    docs = load_table(spark, SF_DIR, "documents")
    p = _exec_plan(weighted_sample(docs, 10, "n_chars", "doc_id"))
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p


def test_weighted_sample_per_group_rank_limit_pushed(spark):
    """Per-group A-ES: exactly one exchange (the group key) and the
    row_number<=n filter pushed as WindowGroupLimit so partial top-n
    happens map-side before the shuffle."""
    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    docs = load_table(spark, SF_DIR, "documents")
    p = _exec_plan(
        weighted_sample_per_group(docs, 5, "n_chars", "doc_id", ["lang"])
    )
    assert "WindowGroupLimit" in p
    assert p.count("Exchange hashpartitioning") == 1


def test_pq_encode_broadcasts_codebooks(spark):
    """PQ assignment must broadcast the (m*ksub)-row codebooks — a
    sort-merge join would shuffle the full subvector fan-out."""
    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.operators.pq import pq_encode, pq_train

    emb = load_table(spark, SF_DIR, "embeddings")
    books = pq_train(emb, m=4, ksub=4, n_iter=1)
    p = _exec_plan(pq_encode(emb, books))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_pq_search_adc_is_joinless_takeordered(spark):
    """ADC search embeds the distance table as literals: the scan plan
    may contain NO join and the top-k must be a TakeOrdered."""
    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.operators.pq import (
        pq_encode,
        pq_search_adc,
        pq_train,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    books = pq_train(emb, m=4, ksub=4, n_iter=1)
    # codes would be a persisted table in production — materialize so the
    # inspected plan is the search alone, not the encode lineage
    enc = pq_encode(emb, books)
    codes = spark.createDataFrame(enc.collect(), enc.schema)
    q = [0.0] * 64
    p = _exec_plan(pq_search_adc(codes, books, q, k=5))
    assert "Join" not in p
    assert "TakeOrderedAndProject" in p


def test_bpe_word_freqs_partial_aggregates_map_side(spark):
    """The one corpus-scale pass of a BPE fit: token fan-out into a
    keyed count with map-side partial aggregation and a single
    exchange."""
    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.operators.bpe import word_freqs

    docs = load_table(spark, SF_DIR, "documents")
    p = _exec_plan(word_freqs(docs, "text"))
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("HashAggregate") == 2  # partial + final


def test_pq_batch_adc_broadcasts_both_small_sides(spark):
    """Batch ADC: the query distance table and codebooks both broadcast
    (never a sort-merge join against the corpus-sized codes), and the
    per-query top-k pushes as WindowGroupLimit."""
    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.operators.pq import (
        pq_encode,
        pq_search_adc_batch,
        pq_train,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    books = pq_train(emb, m=4, ksub=4, n_iter=1)
    enc = pq_encode(emb, books)
    codes = spark.createDataFrame(enc.collect(), enc.schema)
    queries = emb.limit(3).select(
        emb["vec_id"].alias("q_id"), "embedding"
    )
    p = _exec_plan(pq_search_adc_batch(queries, codes, books, k=5))
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert "WindowGroupLimit" in p


def test_corpus_stats_report_single_rollup_exchange(spark):
    """The dataset-card report is ONE scan + ONE rollup shuffle: partial
    aggregates map-side, no shuffle keyed by text."""
    from bp_datawarehouse_ordersfact_spark.operators.aggregates import (
        corpus_stats_report,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = (
        corpus_stats_report(docs, source_col="source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange") == 1
    assert "Expand" in p  # the rollup's grouping-set expansion
    assert "partial" in p.lower()  # map-side combine before the exchange
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_seeded_global_shuffle_single_range_exchange(spark):
    """The training-order shuffle costs exactly one range exchange —
    the minimum for a global permutation — and nothing else."""
    from bp_datawarehouse_ordersfact_spark.operators.sampling import (
        seeded_global_shuffle,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = (
        seeded_global_shuffle(docs, "doc_id", n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Exchange") == 1
    assert "rangepartitioning" in p.lower()
    assert "Sort" in p


def test_kafka_parse_evaluates_from_json_once(spark):
    """r15 optimization pin: the corrupt-record filter must not be
    pushed below the projection computing the parsed struct — alias
    inlining re-evaluates the whole from_json (and the to_json feeding
    it) per row, doubling the decode cost. parse_kafka_wire fences the
    filter behind a 1-element explode, so the plan carries exactly ONE
    from_json."""
    p = plan_of(spark, "kafka_wire_roundtrip")
    assert p.count("from_json") == 1, p
    # the fence must not have broken codegen or added an exchange: the
    # round trip is still one scan + the two aggregate exchanges
    assert p.count("Exchange") == 2
