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
    streaming,
)

_MODULES = (
    relational, pipeline, llmops, streaming, domain_e2e, sketches_r6,
    curation_r9, staged_r10,
)

# The driver's correctness gate checks the FIRST 50 registry entries in
# registration order, so coverage is a rotation discipline: no query's
# newest driver row may be older than 2 rounds
# (tests/test_window_rotation.py enforces it).
#
# ROUND-10 WINDOW (this tuple) — the mechanical alternation the round-9
# tuple spelled out: the registry is at the 100-entry cap, so the window
# is the other 50-query half — the keys of CORRECTNESS_r08.json, with
# THREE swaps this round (r9 VERDICT #1): the coverage-duplicated twins
# `sample_stratified` (sampling rule also covered by corpus_mix_resample
# + token_mixture/quality_pacing), `text_chunking` (chunker also
# exercised inside corpus_prep_pipeline), and `dedup_ngram_jaccard`
# (quadratic small-scale verifier; the scale path is dedup_minhash_lsh)
# are RETIRED from the registry (still oracle-pinned every pytest run —
# llmops.RETIRED / tests/test_retired_queries.py) and their capped slots
# go to the staged curation-layer queries now ACTIVATED from
# queries/staged_r10.py: `host_cap`, `quality_pacing`, `line_dedupe`.
# All 50 round-9 rows came back green (50/50 hash-match), so no red
# query forces its way back in; the round-9-green half rotates out and
# stays covered by pytest pins until round 11 rotates it back.
#
# ROUND-11 ROTATION (mechanical; do it first): swap this tuple for the
# other half — the keys of CORRECTNESS_r09.json — and ACTIVATE the
# staged module `queries/staged_r11.py` (add to _MODULES): its three
# queries (`html_extract`, `contamination_report`,
# `host_disjoint_split`) are already oracle-paired and driver-style
# tested (tests/test_staged_r11_queries.py, and the staged oracles ride
# the conventions gate a round early); retire three coverage-duplicated
# round-9-window twins to hold the 100 cap (keep retirees oracle-pinned
# via a RETIRED dict — least-loss candidates: `threshold_filter`
# [P3-P6 filter family keeps `membership_filter`'s row],
# `window_rank_functions` [beyond-reference rank tour; the window
# family keeps `top_k_per_group` + `dedup_keep_first`],
# `correlated_exists_rewrite` [beyond-reference rewrite demo; the
# EXISTS semantics keep `semi_anti_join`'s row]). If a round-10 query's
# latest row comes back red, it must ALSO be in the round-11 window
# (tests/test_window_rotation.py enforces this automatically).
#
# Rounds 12 and 13 are ALSO pre-staged (queries/staged_r12.py:
# line_quality / boilerplate_lines / quality_pacing_by_group;
# queries/staged_r13.py: corpus_stats_exact / host_authority — the
# latter is fixture-bound, add it to bench EXCLUDED at activation).
# All staged oracles ride tests/test_oracle_conventions.py every run.
_WINDOW_FIRST = (
    "sketch_theta_set_algebra", "sketch_kll_quantile_merge",
    "pricing_summary", "tfidf_title_match", "host_cap",
    "dedup_passage_spans", "ann_cosine_topk", "ann_cosine_ivf",
    "text_langid", "text_quality", "text_token_count", "text_fingerprint",
    "text_pii_scrub", "corpus_filter_pipeline", "grouped_ewma",
    "multimodal_binary_meta", "multimodal_feature_extract",
    "dedup_cluster_cc", "quality_pacing", "line_dedupe",
    "sequence_packing", "corpus_prep_pipeline", "stream_tumbling_agg",
    "stream_sliding_agg", "stream_dedup", "stream_session_agg",
    "stream_stateful_user_stats", "text_repetition",
    "decontaminate_ngram_overlap", "text_unigram_logprob",
    "stream_stream_join", "events_gap_fill", "data_quality_audit",
    "scd2_dim_update", "leakage_safe_split", "cdc_apply", "cube_summary",
    "embedding_classifier_score", "sketch_hll_merge", "funnel_analysis",
    "retention_cohorts", "rollup_incremental_refresh",
    "corpus_mix_resample", "variant_props_extract", "listagg_per_group",
    "fact_royalty", "rest_ingest_distributed", "kafka_wire_roundtrip",
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
