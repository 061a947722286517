"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes through a `noop` write so the full plan runs (a bare
count() would let Catalyst prune the projections away) without paying
driver-side collect costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bp_datawarehouse_ordersfact_spark.core.persist import release_results
from bp_datawarehouse_ordersfact_spark.core.session import get_spark
from bp_datawarehouse_ordersfact_spark.queries import all_queries

# Every registry query except (a) the deliberately quadratic
# small-scale verifiers (the brute-force ANN baseline + its consumer
# ann_recall_at_k, and dedup_cluster_cc, which consumes the quadratic
# n-gram Jaccard pair verifier — still quadratic inside even though the
# dedup_ngram_jaccard registry row was retired in round 10) and (b) the
# domain e2e
# runs, which execute on fixed-size fixtures and ignore sf_dir — they
# measure plan depth, not data scaling, and are timed by the
# correctness gate and tests/test_domain_pipeline.py instead:
HEADLINE = [
    "pricing_summary",
    "select_rename",
    "broadcast_dim_join",
    "composite_key_join",
    "multikey_rollup",
    "window_order_totals",
    "conversation_pack",
    "asof_join",
    "range_join_attribution",
    "shipping_priority",
    "regional_supplier_volume",
    "kafka_wire_roundtrip",
    "parent_allocation",
    "incremental_merge",
    "count_distinct_per_group",
    "dedup_keep_first",
    "sessionize_events",
    "case_categorize",
    "date_functions",
    "string_cleanup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh_banded",
    "ann_cosine_ivf",
    "text_langid",
    "text_quality",
    "text_fingerprint",
    "text_repetition",
    "text_unigram_logprob",
    "decontaminate_ngram_overlap",
    "tfidf_title_match",
    "stream_tumbling_agg",
    "explode_line_items",
    "json_props_extract",
    "split_royalty_union",
    "fact_royalty",
    "dedup_passage_spans",
    "multimodal_binary_meta",
    "multimodal_feature_extract",
    "host_cap",
    "grouped_ewma",
    "text_pii_scrub",
    "quality_pacing",
    "line_dedupe",
    "sequence_packing",
    "corpus_filter_pipeline",
    "corpus_prep_pipeline",
    "stream_sliding_agg",
    "stream_dedup",
    "stream_session_agg",
    "stream_stream_join",
    "ann_ivf_kmeans_refine",
    "data_quality_audit",
    "scd2_dim_update",
    "leakage_safe_split",
    "cdc_apply",
    "embedding_classifier_score",
    "sketch_hll_merge",
    "funnel_analysis",
    "rollup_incremental_refresh",
    "corpus_mix_resample",
    "membership_filter",
    "html_extract",
    "distinct_rows",
    "percent_rate_normalization",
    "semi_anti_join",
    "conditional_measures",
    "union_by_name",
    "null_audit",
    "token_mixture",
    "quantile_stats",
    "grouping_rollup",
    "null_fill_sentinels",
    "levenshtein_ratio_join",
    "skew_salted_join",
    "top_k_per_group",
    "contamination_report",
    "sketch_approx_stats",
    "rest_ingest_distributed",
    "stream_stateful_user_stats",
    "interval_coalesce",
    "host_disjoint_split",
    "sketch_theta_set_algebra",
    "line_quality",
    "boilerplate_lines",
    "quality_pacing_by_group",
    "corpus_stats_exact",
    "registrable_domain_psl",
    "phash_near_dup",
    "bpe_tokenize",
    "containment_near_dup",
    "audio_pcm_features",
]


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _loadavg() -> list[float]:
    """1/5/15-minute load averages — recorded at suite start and end so
    the artifact self-describes its noise conditions (r8 VERDICT: three
    rounds of cross-round deltas had to be re-litigated from side
    documents because the official number carried no load telemetry)."""
    try:
        with open("/proc/loadavg") as f:
            return [round(float(x), 2) for x in f.read().split()[:3]]
    except OSError:  # non-Linux fallback — telemetry absent, not wrong
        return []


# attempts per query: ONE constant drives both the measurement loop and
# the telemetry tails — the r8-verdict problem was an artifact that
# couldn't describe its own conditions; a literal drifting from the loop
# would reintroduce it
ATTEMPTS_PER_QUERY = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    qs = all_queries()

    # JVM/codegen warmup on a tiny query so q1 isn't charged for it
    run_query(qs["pricing_summary"](spark, sf_dir).limit(1))
    # Python-worker warmup: fork the Arrow workers for every core now so
    # the suite's first mapInPandas query isn't charged the one-time
    # worker startup (~6s across 32 workers)
    run_query(
        spark.range(64, numPartitions=spark.sparkContext.defaultParallelism)
        .mapInPandas(lambda it: it, "id long")
    )

    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    load_start = _loadavg()
    t_total0 = time.perf_counter()
    for name in HEADLINE:
        # min of 2 back-to-back runs: single-sample timings on this host
        # showed ±5-10s machine-level noise (co-running processes, cold
        # page cache) on queries whose steady-state cost is <2s; the min
        # measures the engine, not the neighborhood
        best = float("inf")
        for i in range(ATTEMPTS_PER_QUERY):
            t0 = time.perf_counter()
            run_query(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            if i == 0:
                first_run[name] = dt
            best = min(best, dt)
            # isolation between measurements: drop SQL caches and the
            # pinned localCheckpoint blocks of eager operators so no run
            # is timed on top of leaked block-manager state (the r2/r3
            # suites showed late-suite queries regressing 2-9× from
            # exactly this). Cleanup cost lands in the total, not the query.
            spark.catalog.clearCache()
            release_results(spark)
        timings[name] = round(best, 3)
    wall = round(time.perf_counter() - t_total0, 3)

    # the headline value is the sum of per-query bests — the steady-state
    # suite cost; `first_run_total_s` is the sum of FIRST-run timings,
    # methodology-comparable to the r1-r3 single-pass totals (ADVICE r4);
    # the 2-run wall clock (≈2× plus cleanup) is reported separately
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    headline = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": headline,
                "unit": "sec",
                "queries": timings,
                "first_run_total_s": round(sum(first_run.values()), 3),
                "wall_2run_s": wall,
                "loadavg_start": load_start,
                "loadavg_end": _loadavg(),
                "attempts_per_query": ATTEMPTS_PER_QUERY,
                "sf": sf_val,
            }
        )
    )
    # compact duplicate LAST: the driver captures only the tail of stdout
    # and r4's 91-query map pushed the full line past the capture window
    # (BENCH_r04 parsed: null). This line is always short enough to parse.
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": headline,
                "unit": "sec",
                "n_queries": len(timings),
                "first_run_total_s": round(sum(first_run.values()), 3),
                "wall_2run_s": wall,
                "loadavg_start": load_start,
                "loadavg_end": _loadavg(),
                "attempts_per_query": ATTEMPTS_PER_QUERY,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
