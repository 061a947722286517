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
    streaming,
)

_MODULES = (
    relational, pipeline, llmops, streaming, domain_e2e, sketches_r6,
    curation_r9, staged_r10, staged_r11, staged_r12, staged_r13,
)

# The driver's correctness gate checks the FIRST 50 registry entries in
# registration order, so coverage is a rotation discipline: no query's
# newest driver row may be older than 2 rounds
# (tests/test_window_rotation.py enforces it).
#
# ROUND-12 WINDOW (this tuple) — the mechanical alternation: the
# registry is at the 100-entry cap, so the window is the other 50-query
# half — the keys of CORRECTNESS_r10.json, with FIVE swaps this round
# (r11 VERDICT #1 prescribed three; #4 "staged-row endgame" adds two by
# ALSO activating staged_r13 now, pulling the whole staged schedule one
# round forward so round 20's eight rows land with buffer rounds to
# spare — see the accelerated schedule below). Retired (still
# oracle-pinned every pytest run via relational.RETIRED /
# tests/test_retired_queries.py): `cube_summary` [beyond-reference CUBE
# tour; grouping-set coverage keeps `grouping_rollup` (GROUPING SETS) +
# `multikey_rollup` + `rollup_incremental_refresh`],
# `listagg_per_group` [beyond-reference string agg; the A-family keeps
# `count_distinct_per_group`'s row], `variant_props_extract` [VARIANT
# twin of `json_props_extract`, whose J1 row survives],
# `retention_cohorts` [event-analytics pair — `funnel_analysis` keeps
# the family's row], `sketch_kll_quantile_merge` [sketch family holds
# theta/hll/approx live + cms/mg staged; the KLL merge law stays
# pytest-pinned]. Their capped slots and window positions go to the
# ACTIVATED staged queries: `line_quality`, `boilerplate_lines`,
# `quality_pacing_by_group` (staged_r12), `corpus_stats_exact`,
# `host_authority` (staged_r13; host_authority is fixture-bound —
# bench-EXCLUDED with a recorded reason). All 50 round-11 rows came
# back green (50/50 hash-match), so no red query forces its way back
# in.
#
# ROUND-13 ROTATION (mechanical; do it first): swap this tuple for the
# other half — the keys of CORRECTNESS_r11.json — and ACTIVATE
# queries/staged_r14.py (`registrable_domain_psl`) + staged_r15.py
# (`phash_near_dup`, `sft_ingest_stream` — the stream row is
# fixture-bound, bench-EXCLUDE it at activation): three activations,
# three retirements from the documented pool (least-loss candidates:
# `url_canonicalize` once registrable_domain_psl is live,
# `events_gap_fill` [gaps-and-islands family keeps interval_coalesce +
# sessionize_events], `top_k` [top_k_per_group keeps the family]). If a
# round-12 query's latest row comes back red, it must ALSO be in the
# round-13 window (tests/test_window_rotation.py enforces this
# automatically).
#
# ACCELERATED STAGED SCHEDULE (r11 VERDICT #4 decision, round 12): the
# original one-module-per-round plan would land staged_r20's EIGHT rows
# in the final round with zero slack. Pull forward two modules per
# round instead: r12 = staged_r12+r13 (done, this tuple); r13 =
# staged_r14+r15; r14 = staged_r16+r17 (`bpe_tokenize`;
# `containment_near_dup`, `audio_pcm_features` — retire e.g.
# text_token_count once bpe_tokenize is live, set_intersect_except,
# date_dim_generate); r15 = staged_r18+r19 (`cms_point_freq`,
# `pq_adc_topk`; `mg_heavy_hitters` — retire e.g. skew_salted_join,
# sketch_theta_set_algebra once CMS/MG live, one of
# funnel_analysis/stream_sliding_agg); r16 = staged_r20's eight
# (`weighted_sample_by_group`, `bigram_lm_score`, `bloom_join_prune`,
# `outlier_iqr_per_group`, `pmi_collocations`, `temperature_mixture`,
# `mixture_drift`, `corr_profile` — eight slots from the remaining
# pool, e.g. fact_royalty [§3 keeps domain_fact_royalty +
# conditional_measures], stream_sliding_agg, events_gap_fill remnants,
# null_audit [data_quality_audit generalizes it], quantile_stats once
# KLL/CMS rows cover the family). Rounds 17-20 become buffer for
# operators invented in the meantime — first in line:
# queries/staged_eval.py (round 12's classifier-audit layer:
# roc_auc_per_group / calibration_ece / ks_drift, oracle-paired and
# twin-tested), earliest activation r17 with three retirements from
# the remaining pool.
_WINDOW_FIRST = (
    "sketch_theta_set_algebra", "host_authority", "pricing_summary",
    "tfidf_title_match", "host_cap", "dedup_passage_spans",
    "ann_cosine_topk", "ann_cosine_ivf", "text_langid", "text_quality",
    "text_token_count", "text_fingerprint", "text_pii_scrub",
    "corpus_filter_pipeline", "grouped_ewma", "multimodal_binary_meta",
    "multimodal_feature_extract", "dedup_cluster_cc", "quality_pacing",
    "line_dedupe", "sequence_packing", "corpus_prep_pipeline",
    "stream_tumbling_agg", "stream_sliding_agg", "stream_dedup",
    "stream_session_agg", "stream_stateful_user_stats",
    "text_repetition", "decontaminate_ngram_overlap",
    "text_unigram_logprob", "stream_stream_join", "events_gap_fill",
    "data_quality_audit", "scd2_dim_update", "leakage_safe_split",
    "cdc_apply", "line_quality", "embedding_classifier_score",
    "sketch_hll_merge", "funnel_analysis", "corpus_stats_exact",
    "rollup_incremental_refresh", "corpus_mix_resample",
    "boilerplate_lines", "quality_pacing_by_group", "fact_royalty",
    "rest_ingest_distributed", "kafka_wire_roundtrip",
    "sketch_approx_stats", "distinct_rows",
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
