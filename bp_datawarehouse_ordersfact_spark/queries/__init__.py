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
    streaming,
)

_MODULES = (
    relational, pipeline, llmops, streaming, domain_e2e, sketches_r6,
    curation_r9, staged_r10, staged_r11, staged_r12, staged_r13,
    staged_r14, staged_r15,
)

# The driver's correctness gate checks the FIRST 50 registry entries in
# registration order, so coverage is a rotation discipline: no query's
# newest driver row may be older than 2 rounds
# (tests/test_window_rotation.py enforces it).
#
# ROUND-13 WINDOW (this tuple) — the mechanical alternation: the
# registry is at the 100-entry cap, so the window is the other 50-query
# half — the keys of CORRECTNESS_r11.json, with the r12 VERDICT #1
# swaps. Retired (still oracle-pinned every pytest run via
# relational.RETIRED / curation_r9.RETIRED /
# tests/test_retired_queries.py): `url_canonicalize` [superseded by the
# activated exact-PSL row; Column rules stay pinned in tests/test_urls.py],
# `events_gap_fill` [gaps-and-islands family keeps `interval_coalesce` +
# `sessionize_events`; its plan budget stays pinned via the RETIRED
# dict], `top_k` [`top_k_per_group` keeps the O1/O2 family]. Their
# capped slots go to the ACTIVATED staged queries:
# `registrable_domain_psl` (staged_r14), `phash_near_dup`,
# `sft_ingest_stream` (staged_r15; the stream row is fixture-bound —
# bench-EXCLUDED with a recorded reason, the host_authority class).
# Window arithmetic: `url_canonicalize` and `top_k` sat in the r11
# half, `events_gap_fill` in the r12 half — so ONE r11-half query must
# defer to the round-14 window to keep this tuple at exactly 50:
# `null_audit` (newest row r11; 14−11 = 3 > 2 forces it into the r14
# window, which is the r12 half it now joins — the staleness invariant
# in tests/test_window_rotation.py verifies both states). null_audit is
# also the named r16 retirement candidate (`data_quality_audit`
# generalizes it), so the deferral costs nothing long-term. All 50
# round-12 rows came back green (50/50 hash-match), so no red query
# forces its way back in.
#
# ROUND-14 ROTATION (mechanical; do it first): swap this tuple for the
# other half — the keys of CORRECTNESS_r12.json MINUS the retired
# `events_gap_fill` PLUS the deferred `null_audit` — and ACTIVATE
# queries/staged_r16.py (`bpe_tokenize`) + staged_r17.py
# (`containment_near_dup`, `audio_pcm_features`): three activations,
# three retirements from the documented pool (least-loss candidates:
# `text_token_count` once bpe_tokenize is live, `set_intersect_except`,
# `date_dim_generate` — the latter two sit in THIS tuple's half, so
# like this round one r12-half query may need a deferral to balance;
# `text_token_count` is in the r12 half). If a round-13 query's latest
# row comes back red, it must ALSO be in the round-14 window
# (tests/test_window_rotation.py enforces this automatically).
#
# ACCELERATED STAGED SCHEDULE (r11 VERDICT #4 decision, round 12): the
# original one-module-per-round plan would land staged_r20's EIGHT rows
# in the final round with zero slack. Pull forward two modules per
# round instead: r12 = staged_r12+r13 (done); r13 = staged_r14+r15
# (done, this tuple); r14 = staged_r16+r17 (`bpe_tokenize`;
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
# the remaining pool; then queries/staged_eval2.py (round 13's
# group-grain tiers: roc_auc_global, precision_recall_by_group,
# calibration_ece_by_group, psi_drift_by_group — 3-sf-proven),
# earliest r18.
_WINDOW_FIRST = (
    "dedup_embedding_lsh_banded", "ann_recall_at_k",
    "ann_ivf_kmeans_refine", "domain_fact_royalty",
    "domain_split_royalty_report", "interval_coalesce", "html_extract",
    "select_rename", "membership_filter", "contamination_report",
    "split_royalty_union", "percent_rate_normalization",
    "dedup_keep_first", "broadcast_dim_join", "composite_key_join",
    "window_order_totals", "incremental_merge", "semi_anti_join",
    "levenshtein_ratio_join", "parent_allocation",
    "count_distinct_per_group", "grouping_rollup", "multikey_rollup",
    "registrable_domain_psl", "case_categorize", "conditional_measures",
    "string_cleanup", "date_functions", "date_dim_generate",
    "phash_near_dup", "top_k_per_group", "union_by_name",
    "set_intersect_except", "null_fill_sentinels", "json_props_extract",
    "explode_line_items", "sft_ingest_stream", "quantile_stats",
    "range_join_attribution", "regional_supplier_volume",
    "conversation_pack", "sessionize_events", "shipping_priority",
    "skew_salted_join", "host_disjoint_split", "token_mixture",
    "asof_join", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
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
