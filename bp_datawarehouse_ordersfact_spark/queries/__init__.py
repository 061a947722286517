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
# ROUND-6 WINDOW (this tuple) — executes the rotation codified in round
# 5: the 2 staged sketch queries (sketches_r6 now in _MODULES; already
# driver-verified by tests/test_sketches_r6.py), then pricing_summary
# and tfidf_title_match at their HARD round-6 staleness deadline (their
# newest row is round 3 — they were the displacements for the round-5
# additions), then the 46 queries whose newest driver row is round 4
# (exactly the r4 window minus the 4 re-checked in r5: ann_recall_at_k,
# ann_ivf_kmeans_refine, domain_fact_royalty, domain_split_royalty_report).
# That fills all 50 slots; the 48 round-5-green queries rotate out and
# stay covered by pytest pins (tests/test_plans.py, operator tests)
# until round 7 rotates them back. The registry now sits at 100 — the
# cap the 50-wide window sustains under the 2-round invariant; from
# round 7 on, rotation alternates the two 50-query halves.
#
# ROUND-7 ROTATION (mechanical; do it first): the registry is at cap,
# so the window is forced — exactly the 50 queries NOT in this tuple,
# i.e. the round-5 window (CORRECTNESS_r05.json's keys, whose newest
# row will then be 2 rounds old): ann_recall_at_k, ann_ivf_kmeans_refine,
# domain_fact_royalty, domain_split_royalty_report, interval_coalesce,
# correlated_exists_rewrite, and the 44 relational/pipeline queries from
# select_rename through dedup_simhash. No additions are possible without
# deleting a query (the two halves then alternate every round: r8 = this
# r6 tuple again, and so on). Swap the tuple, run
# tests/test_window_rotation.py, done. If a round-7 query's latest row
# comes back red, it must ALSO be in the round-8 window (the rotation
# test enforces this automatically).
_WINDOW_FIRST = (
    # round-6 additions — never driver-checked (pre-verified by
    # tests/test_sketches_r6.py with the driver-faithful harness)
    "sketch_theta_set_algebra", "sketch_kll_quantile_merge",
    # newest row round 3 — hard staleness deadline this round
    "pricing_summary", "tfidf_title_match",
    # newest driver row is round 4 for the 46 below (equally stale)
    "dedup_ngram_jaccard", "dedup_embedding_cosine", "ann_cosine_topk",
    "ann_cosine_lsh", "ann_cosine_ivf", "text_langid", "text_quality",
    "text_token_count", "text_fingerprint", "text_pii_scrub",
    "corpus_filter_pipeline", "grouped_ewma", "multimodal_binary_meta",
    "multimodal_feature_extract", "dedup_cluster_cc", "text_chunking",
    "sample_stratified", "sequence_packing", "corpus_prep_pipeline",
    "stream_tumbling_agg", "stream_sliding_agg", "stream_dedup",
    "stream_session_agg", "stream_stateful_user_stats",
    "text_repetition", "decontaminate_ngram_overlap",
    "text_unigram_logprob", "stream_stream_join", "events_gap_fill",
    "data_quality_audit", "scd2_dim_update", "leakage_safe_split",
    "cdc_apply", "cube_summary", "embedding_classifier_score",
    "sketch_hll_merge", "funnel_analysis", "retention_cohorts",
    "rollup_incremental_refresh", "corpus_mix_resample",
    "variant_props_extract", "listagg_per_group", "fact_royalty",
    "rest_ingest_distributed", "kafka_wire_roundtrip",
    "sketch_approx_stats",
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
