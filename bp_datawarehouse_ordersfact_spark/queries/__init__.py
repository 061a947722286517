"""Driver-facing query registry.

Each submodule exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins). Names without an
oracle get the driver's weaker rows-only check (reserved for genuinely
non-SQL-expressible ops).

Conventions enforced across every pair (see SURVEY.md §5.2):
- every computed column is aliased identically in Spark and SQL;
- float aggregates are pre-rounded on BOTH sides (2dp money, 6dp ratios)
  so parallel-summation order can't flip the driver's value hash;
- counts are cast to bigint on the Spark side (DuckDB count() is BIGINT).
"""

from __future__ import annotations

from ..functions.rounding import sql_rewrite_rounds
from . import domain_e2e, llmops, pipeline, relational, streaming

_MODULES = (relational, pipeline, llmops, streaming, domain_e2e)

# The driver's correctness gate checks the FIRST 50 registry entries in
# registration order. Rounds 1-3 registered relational+pipeline first, so
# the llmops tail, all streaming jobs, and the domain e2e runs (27 queries)
# never produced a CORRECTNESS row despite passing the identical local gate
# (tests/parity.py). _WINDOW_FIRST puts those 27 first, then 23
# representative relational/pipeline queries covering every operator family
# (rollup, window, broadcast/anti/fuzzy/as-of/skew joins, explode, dates,
# sets, pivot, pipeline e2e, wire codec, sketches). The remaining 27 — all
# green under the driver for three straight rounds and pinned by pytest —
# register after position 50.
_WINDOW_FIRST = (
    # never driver-checked through round 3 (llmops 20 + streaming 5 + domain 2)
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "ann_cosine_topk",
    "ann_cosine_lsh", "ann_cosine_ivf", "text_langid", "text_quality",
    "text_token_count", "text_fingerprint", "text_pii_scrub",
    "corpus_filter_pipeline", "grouped_ewma", "multimodal_binary_meta",
    "multimodal_feature_extract", "dedup_cluster_cc", "text_chunking",
    "sample_stratified", "sequence_packing", "ann_recall_at_k",
    "corpus_prep_pipeline", "stream_tumbling_agg", "stream_sliding_agg",
    "stream_dedup", "stream_session_agg", "stream_stateful_user_stats",
    "domain_fact_royalty", "domain_split_royalty_report",
    # new in round 4 — never checked, by definition
    "text_repetition", "decontaminate_ngram_overlap", "text_unigram_logprob",
    "ann_ivf_kmeans_refine", "stream_stream_join",
    "events_gap_fill", "data_quality_audit", "scd2_dim_update",
    "leakage_safe_split", "cdc_apply", "cube_summary",
    "embedding_classifier_score", "sketch_hll_merge",
    "funnel_analysis", "retention_cohorts", "rollup_incremental_refresh",
    # 16 representative previously-green picks across the operator families
    # (string_cleanup/date_functions/union_by_name/pivot_status/
    # top_k_per_group rotate out: three rounds green, pytest-pinned, and
    # their families appear inside the retained pipeline queries)
    # (broadcast_dim_join and multikey_rollup rotate out for the two new
    # round-4 queries above: their families stay covered inside the window
    # by fact_royalty's broadcast dims and pricing_summary's rollup)
    # (levenshtein_ratio_join rotates out for embedding_classifier_score:
    # fuzzy similarity stays covered by tfidf_title_match, and the
    # levenshtein byte/codepoint contract is pinned by
    # tests/test_cross_engine_fuzz.py)
    # (incremental_merge, asof_join and skew_salted_join rotate out for
    # sketch_hll_merge / funnel_analysis / retention_cohorts: merge stays
    # covered in-window by cdc_apply plus the Delta MERGE equivalence
    # test; as-of and salted-join shapes are pinned by
    # tests/test_plans.py and tests/test_property.py. With these swaps
    # every registry query has a driver CORRECTNESS row after round 4.)
    # (parent_allocation rotates out for rollup_incremental_refresh: the
    # conditional-window family stays covered by cdc_apply's
    # WindowGroupLimit and events_gap_fill's running fill)
    "pricing_summary",
    "tfidf_title_match",
    # (case_categorize, window_order_totals, sessionize_events and
    # dedup_keep_first also rotate out for the round-4 queries above:
    # CASE stays covered by fact_royalty's C16-C22 arms, windows by
    # events_gap_fill / cdc_apply, sessionization by stream_session_agg,
    # keep-first dedup by the five dedup entries)
    "explode_line_items", "fact_royalty",
    "rest_ingest_distributed", "kafka_wire_roundtrip", "sketch_approx_stats",
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
