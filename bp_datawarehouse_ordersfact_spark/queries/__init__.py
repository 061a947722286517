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
    streaming,
)

_MODULES = (
    relational, pipeline, llmops, streaming, domain_e2e, sketches_r6,
    curation_r9, staged_r10, staged_r11,
)

# The driver's correctness gate checks the FIRST 50 registry entries in
# registration order, so coverage is a rotation discipline: no query's
# newest driver row may be older than 2 rounds
# (tests/test_window_rotation.py enforces it).
#
# ROUND-11 WINDOW (this tuple) — the mechanical alternation: the
# registry is at the 100-entry cap, so the window is the other 50-query
# half — the keys of CORRECTNESS_r09.json, with THREE swaps this round
# (r10 VERDICT #1): the coverage-duplicated twins `threshold_filter`
# (P3-P6 filter family keeps `membership_filter`'s row),
# `window_rank_functions` (beyond-reference rank tour; the window family
# keeps `top_k_per_group` + `dedup_keep_first`), and
# `correlated_exists_rewrite` (beyond-reference rewrite demo; EXISTS
# semantics keep `semi_anti_join`'s row) are RETIRED from the registry
# (still oracle-pinned every pytest run — relational.RETIRED /
# tests/test_retired_queries.py) and their capped slots go to the staged
# curation-layer queries now ACTIVATED from queries/staged_r11.py:
# `html_extract`, `contamination_report`, `host_disjoint_split`. All 50
# round-10 rows came back green (50/50 hash-match), so no red query
# forces its way back in. (Round 10 rotated the CORRECTNESS_r08 half
# with the `host_cap`/`quality_pacing`/`line_dedupe` swaps — history;
# see CORRECTNESS_r10.json.)
#
# ROUND-12 ROTATION (mechanical; do it first): swap this tuple for the
# other half — the keys of CORRECTNESS_r10.json — and ACTIVATE the
# staged module `queries/staged_r12.py` (add to _MODULES): its three
# queries (`line_quality`, `boilerplate_lines`,
# `quality_pacing_by_group`) are already oracle-paired and driver-style
# tested (tests/test_staged_r12_queries.py; staged oracles ride the
# conventions gate every run); retire three coverage-duplicated
# round-10-window twins to hold the 100 cap (keep retirees oracle-pinned
# via a RETIRED dict — least-loss candidates: `cube_summary`
# [beyond-reference CUBE tour; grouping-set coverage keeps
# `grouping_rollup` (GROUPING SETS) + `multikey_rollup` +
# `rollup_incremental_refresh`], `listagg_per_group` [beyond-reference
# string agg; the A-family keeps `count_distinct_per_group`'s row],
# `variant_props_extract` [VARIANT twin of `json_props_extract`, whose
# J1 row survives]). If a round-11 query's latest row comes back red,
# it must ALSO be in the round-12 window (tests/test_window_rotation.py
# enforces this automatically).
#
# Rounds 13-19 are ALSO pre-staged: queries/staged_r13.py
# (corpus_stats_exact / host_authority — the latter is fixture-bound,
# add it to bench EXCLUDED at activation), queries/staged_r14.py
# (registrable_domain_psl), queries/staged_r15.py (phash_near_dup +
# sft_ingest_stream — the stream row is fixture-bound, bench-EXCLUDE it
# at activation), queries/staged_r16.py (bpe_tokenize),
# queries/staged_r17.py (containment_near_dup + audio_pcm_features),
# queries/staged_r18.py (cms_point_freq + pq_adc_topk),
# queries/staged_r19.py (mg_heavy_hitters), and queries/staged_r20.py
# (weighted_sample_by_group + bigram_lm_score + bloom_join_prune +
# outlier_iqr_per_group + pmi_collocations + temperature_mixture +
# mixture_drift + corr_profile — the eight extra slots come from the retirement
# pool named in PLANS.md "Round-11 staging ledger", e.g. fact_royalty
# [§3 keeps domain_fact_royalty's full-chain row + conditional_measures'
# C-row], one of funnel_analysis/retention_cohorts [the pair's other
# half already pools], stream_sliding_agg [windowed-agg family keeps
# tumbling + session + stateful], text_token_count once bpe_tokenize's
# r16 row is live [token-counting family], plus four more from the
# documented pool, e.g. events_gap_fill, set_intersect_except,
# date_dim_generate, and one of sketch_kll_quantile_merge/
# sketch_theta_set_algebra).
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
    "null_audit", "case_categorize", "conditional_measures",
    "string_cleanup", "date_functions", "date_dim_generate", "top_k",
    "top_k_per_group", "union_by_name", "set_intersect_except",
    "null_fill_sentinels", "json_props_extract", "explode_line_items",
    "url_canonicalize", "quantile_stats", "range_join_attribution",
    "regional_supplier_volume", "conversation_pack", "sessionize_events",
    "shipping_priority", "skew_salted_join", "host_disjoint_split",
    "token_mixture", "asof_join", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash",
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
