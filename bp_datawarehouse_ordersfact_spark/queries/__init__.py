"""Driver-facing query registry.

Each submodule exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins). Names without an
oracle get the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible ops).

Conventions enforced across every pair (see SURVEY.md §5.2):
- every computed column is aliased identically in Spark and SQL;
- float aggregates are pre-rounded on BOTH sides (2dp money, 6dp ratios)
  so parallel-summation order can't flip the driver's value hash;
- counts are cast to bigint on the Spark side (DuckDB count() is BIGINT);
- EVERY integer oracle aggregate (sum/sum(CASE…) included, not just
  count) is CAST AS BIGINT — DuckDB integer sums return HUGEINT, which
  pandas materializes as float64 and the driver's dtype-sensitive hash
  rejects (r2 sessionize_events, r4 ann_recall_at_k);
- output columns are SCALAR only — array/struct columns crash the
  driver's pandas sort_values canonicalization (r4 ann_ivf_kmeans_refine;
  explode to rows or serialize to a string instead).
Both hazards are gated without Spark by tests/test_oracle_conventions.py
and cross-engine by the driver-faithful tests/parity.py.
"""

from __future__ import annotations

from ..functions.rounding import sql_rewrite_rounds
from . import domain_e2e, llmops, pipeline, relational, sketches_r6, streaming

_MODULES = (relational, pipeline, llmops, streaming, domain_e2e, sketches_r6)

# The driver's correctness gate checks the FIRST 50 registry entries in
# registration order, so coverage is a rotation discipline: no query's
# newest driver row may be older than 2 rounds
# (tests/test_window_rotation.py enforces it).
#
# ROUND-7 WINDOW (this tuple) — executes the forced rotation the
# round-6 tuple codified: the registry is at the 100-entry cap, so the
# window is exactly the 50 queries NOT in the round-6 tuple, i.e. the
# round-5 window (CORRECTNESS_r05.json's keys, whose newest driver row
# is now 2 rounds old — the hard staleness deadline). The 50
# round-6-green queries rotate out and stay covered by pytest pins
# (tests/test_plans.py, operator tests) until round 8 rotates them
# back; from here on the two 50-query halves alternate every round.
#
# One registry swap this round (r6 VERDICT #2): the banded-hyperplane
# LSH scale path gets a driver row as `dedup_embedding_lsh_banded`,
# REPLACING the `ann_cosine_lsh` small-scale sign-bucket twin it
# supersedes (r6-green, so its slot frees cleanly). The new query takes
# a window slot; `distinct_rows` (newest row r5 — 2 rounds old at r7,
# the allowed maximum) is displaced to make room and MUST be in the
# round-8 window.
#
# ROUND-8 ROTATION (mechanical; do it first): swap this tuple for the
# other half — the keys of CORRECTNESS_r06.json MINUS the retired
# `ann_cosine_lsh` PLUS the displaced `distinct_rows` (49 + 1 = 50),
# i.e. EXACTLY:
#   sketch_theta_set_algebra, sketch_kll_quantile_merge,
#   pricing_summary, tfidf_title_match, dedup_ngram_jaccard,
#   dedup_embedding_cosine, ann_cosine_topk, ann_cosine_ivf,
#   text_langid, text_quality, text_token_count, text_fingerprint,
#   text_pii_scrub, corpus_filter_pipeline, grouped_ewma,
#   multimodal_binary_meta, multimodal_feature_extract,
#   dedup_cluster_cc, text_chunking, sample_stratified,
#   sequence_packing, corpus_prep_pipeline, stream_tumbling_agg,
#   stream_sliding_agg, stream_dedup, stream_session_agg,
#   stream_stateful_user_stats, text_repetition,
#   decontaminate_ngram_overlap, text_unigram_logprob,
#   stream_stream_join, events_gap_fill, data_quality_audit,
#   scd2_dim_update, leakage_safe_split, cdc_apply, cube_summary,
#   embedding_classifier_score, sketch_hll_merge, funnel_analysis,
#   retention_cohorts, rollup_incremental_refresh, corpus_mix_resample,
#   variant_props_extract, listagg_per_group, fact_royalty,
#   rest_ingest_distributed, kafka_wire_roundtrip, sketch_approx_stats,
#   distinct_rows
# If a round-7 query's latest row comes back red, it must ALSO be in
# the round-8 window (tests/test_window_rotation.py enforces this
# automatically).
_WINDOW_FIRST = (
    # never driver-checked: the banded-LSH scale path's new driver query
    # (pre-verified by tests/parity.py and pinned by tests/test_banded_lsh.py)
    "dedup_embedding_lsh_banded",
    # the 4 re-checked in r5 outside the r4 window
    "ann_recall_at_k", "ann_ivf_kmeans_refine",
    "domain_fact_royalty", "domain_split_royalty_report",
    # round-5 additions
    "interval_coalesce", "correlated_exists_rewrite",
    # the relational/pipeline/llmops queries whose newest row is r5
    # (all of the r5 window except the displaced distinct_rows)
    "select_rename", "membership_filter", "threshold_filter",
    "split_royalty_union", "percent_rate_normalization",
    "dedup_keep_first", "broadcast_dim_join",
    "composite_key_join", "window_order_totals", "incremental_merge",
    "semi_anti_join", "levenshtein_ratio_join", "parent_allocation",
    "count_distinct_per_group", "grouping_rollup", "multikey_rollup",
    "null_audit", "case_categorize", "conditional_measures",
    "string_cleanup", "date_functions", "date_dim_generate", "top_k",
    "top_k_per_group", "union_by_name", "set_intersect_except",
    "null_fill_sentinels", "json_props_extract", "explode_line_items",
    "pivot_status", "quantile_stats", "range_join_attribution",
    "regional_supplier_volume", "rolling_window_avg",
    "sessionize_events", "shipping_priority", "skew_salted_join",
    "window_rank_functions", "event_interarrival", "asof_join",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
)


def _ordered(merged):
    out = {k: merged[k] for k in _WINDOW_FIRST if k in merged}
    out.update((k, v) for k, v in merged.items() if k not in out)
    return out


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return _ordered(out)


def all_oracles():
    # every round() in oracle SQL is rewritten to the portable
    # floor(x*10^n+0.5)/10^n form the Spark side uses (see functions.rounding)
    out = {}
    for mod in _MODULES:
        out.update({k: sql_rewrite_rounds(v) for k, v in mod.ORACLES.items()})
    return out
