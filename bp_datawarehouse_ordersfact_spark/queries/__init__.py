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
# 27 queries (the llmops tail, all streaming jobs, the domain e2e runs)
# never produced a CORRECTNESS row despite passing the identical local
# gate (tests/parity.py). Round 4's window fixes that: the 27 backlog
# queries first, then the 19 queries ADDED in round 4, then 4
# representative previously-green picks — 50 exactly. The other 46 all
# carry CORRECTNESS rows from rounds 1-3 and stay pinned by pytest, so
# after round 4 EVERY registry query (96) has been driver-checked at
# least once. Each rotation below names where the rotated-out family
# stays covered; round 5 should rotate the r1-r3-only queries back in.
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
    # the 16 queries added in round 4 — never checked, by definition
    "text_repetition", "decontaminate_ngram_overlap", "text_unigram_logprob",
    "ann_ivf_kmeans_refine", "stream_stream_join",
    "events_gap_fill", "data_quality_audit", "scd2_dim_update",
    "leakage_safe_split", "cdc_apply", "cube_summary",
    "embedding_classifier_score", "sketch_hll_merge",
    "funnel_analysis", "retention_cohorts", "rollup_incremental_refresh",
    "corpus_mix_resample", "variant_props_extract", "listagg_per_group",
    # 6 representative previously-green picks (explode J3-J5 runs inside
    # fact_royalty's domain ingest chain). Families of the 44 queries
    # left outside the window stay covered inside it: broadcast dims +
    # CASE arms by fact_royalty, rollups by pricing_summary +
    # rollup_incremental_refresh, fuzzy similarity by tfidf_title_match,
    # merge/upsert by cdc_apply (plus the Delta MERGE equivalence test),
    # windows by events_gap_fill/cdc_apply, sessionization by
    # stream_session_agg, keep-first dedup by the five dedup entries;
    # as-of/salted-join shapes are pinned by tests/test_plans.py and
    # tests/test_property.py, levenshtein by test_cross_engine_fuzz.py.
    # (pricing_summary and tfidf_title_match rotate out last: the driver
    # smoke-checks entry() — which IS pricing_summary — every round, and
    # tfidf is pinned by operator tests + three green rounds)
    "fact_royalty",
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
