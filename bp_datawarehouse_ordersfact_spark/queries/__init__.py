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
from . import (
    curation_r9,
    domain_e2e,
    llmops,
    pipeline,
    relational,
    sketches_r6,
    staged_r10,
    staged_r11,
    staged_r12,
    staged_r13,
    staged_r14,
    staged_r15,
    staged_r16,
    staged_r17,
    streaming,
)

_MODULES = (
    relational, pipeline, llmops, streaming, domain_e2e, sketches_r6,
    curation_r9, staged_r10, staged_r11, staged_r12, staged_r13,
    staged_r14, staged_r15, staged_r16, staged_r17,
)

# The driver's correctness gate checks the FIRST 50 registry entries in
# registration order, so coverage is a rotation discipline: no query's
# newest driver row may be older than 2 rounds
# (tests/test_window_rotation.py enforces it).
#
# ROUND-14 WINDOW (this tuple) — the mechanical alternation: the
# registry is at the 100-entry cap, so the window is the other 50-query
# half — the keys of CORRECTNESS_r12.json, with the r13 VERDICT #1
# swaps. Retired this round (still oracle-pinned every pytest run via
# llmops.RETIRED / relational.RETIRED / pipeline.RETIRED /
# tests/test_retired_queries.py): `text_token_count` [superseded by the
# activated `bpe_tokenize` — the fitted-merge tokenizer; the regex
# counters also live inside `text_quality`'s registry row],
# `set_intersect_except` [U1/U2 keep `union_by_name` +
# `semi_anti_join`; INTERSECT/EXCEPT were engine-added],
# `date_dim_generate` [the fiscal MKEY/quarter/weekend Column rules
# stay registry-checked inside `date_functions` and the domain e2e
# rows]. Their capped slots go to the ACTIVATED staged queries:
# `bpe_tokenize` (staged_r16), `containment_near_dup`,
# `audio_pcm_features` (staged_r17).
# Window arithmetic: `text_token_count` sat in the r12 half (this
# window's base); `set_intersect_except` and `date_dim_generate` sat in
# the r13 half, so (as in r13) TWO r12-half queries defer to the
# round-15 window to keep this tuple at exactly 50:
# `sketch_theta_set_algebra` and `funnel_analysis` (newest rows r12;
# 15−12 = 3 > 2 forces both into the r15 window — the staleness
# invariant in tests/test_window_rotation.py verifies both states).
# Both are named r15 retirement candidates (CMS/MG supersede the theta
# algebra; `sessionize_events` + `stream_session_agg` keep the funnel
# family), so the deferrals cost nothing long-term. All 50 round-13
# rows came back green (50/50 hash-match), so no red query forces its
# way back in. `null_audit` (deferred from r13, newest row r11) is IN
# this window as required.
#
# ROUND-15 ROTATION (mechanical; do it first): swap this tuple for the
# other half — the keys of CORRECTNESS_r13.json MINUS the retired
# `set_intersect_except`/`date_dim_generate` PLUS the deferred
# `sketch_theta_set_algebra`/`funnel_analysis` — and ACTIVATE
# queries/staged_r18.py (`cms_point_freq`, `pq_adc_topk`) +
# staged_r19.py (`mg_heavy_hitters`): three activations, three
# retirements from the documented pool (least-loss candidates:
# `sketch_theta_set_algebra` and `funnel_analysis` once CMS/MG are
# live — both deferred INTO the r15 window, so retiring them instead
# of refreshing them frees two slots — plus `skew_salted_join`, which
# sits in the r13 half). If a round-14 query's latest row comes back
# red, it must ALSO be in the round-15 window
# (tests/test_window_rotation.py enforces this automatically).
#
# ACCELERATED STAGED SCHEDULE (r11 VERDICT #4 decision, round 12): the
# original one-module-per-round plan would land staged_r20's EIGHT rows
# in the final round with zero slack. Pull forward two modules per
# round instead: r12 = staged_r12+r13 (done); r13 = staged_r14+r15
# (done); r14 = staged_r16+r17 (done, this tuple); r15 =
# staged_r18+r19 (`cms_point_freq`, `pq_adc_topk`; `mg_heavy_hitters`
# — retirements above); r16 = staged_r20's eight
# (`weighted_sample_by_group`, `bigram_lm_score`, `bloom_join_prune`,
# `outlier_iqr_per_group`, `pmi_collocations`, `temperature_mixture`,
# `mixture_drift`, `corr_profile` — eight slots from the remaining
# pool, e.g. fact_royalty [§3 keeps domain_fact_royalty +
# conditional_measures], stream_sliding_agg, null_audit
# [data_quality_audit generalizes it], quantile_stats once KLL/CMS
# rows cover the family). Rounds 17-20 become buffer for operators
# invented in the meantime — first in line: queries/staged_eval.py
# (round 12's classifier-audit layer: roc_auc_per_group /
# calibration_ece / ks_drift, oracle-paired and twin-tested), earliest
# activation r17 with three retirements from the remaining pool; then
# queries/staged_eval2.py (round 13's group-grain tiers:
# roc_auc_global, precision_recall_by_group, calibration_ece_by_group,
# psi_drift_by_group, score_quantile_normalize, semantic_prune —
# 3-sf-proven), earliest r18; then queries/staged_canary.py (this
# round's `canary_scan` row), earliest r19; then
# queries/staged_profile.py (`embedding_profile` — round 14's
# embedding-corpus audit), earliest r20.
_WINDOW_FIRST = (
    "host_authority", "pricing_summary", "tfidf_title_match", "host_cap",
    "dedup_passage_spans", "ann_cosine_topk", "ann_cosine_ivf",
    "text_langid", "text_quality", "text_fingerprint", "text_pii_scrub",
    "corpus_filter_pipeline", "grouped_ewma", "multimodal_binary_meta",
    "multimodal_feature_extract", "dedup_cluster_cc", "quality_pacing",
    "line_dedupe", "sequence_packing", "corpus_prep_pipeline",
    "stream_tumbling_agg", "stream_sliding_agg", "stream_dedup",
    "stream_session_agg", "stream_stateful_user_stats",
    "text_repetition", "decontaminate_ngram_overlap",
    "text_unigram_logprob", "stream_stream_join", "data_quality_audit",
    "scd2_dim_update", "leakage_safe_split", "cdc_apply", "line_quality",
    "embedding_classifier_score", "sketch_hll_merge",
    "corpus_stats_exact", "rollup_incremental_refresh",
    "corpus_mix_resample", "boilerplate_lines", "quality_pacing_by_group",
    "fact_royalty", "rest_ingest_distributed", "kafka_wire_roundtrip",
    "sketch_approx_stats", "distinct_rows", "null_audit",
    "bpe_tokenize", "containment_near_dup", "audio_pcm_features",
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
