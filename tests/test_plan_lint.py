"""Bulk plan lint over the ENTIRE registry.

tests/test_plans.py pins specific plan shapes for flagship queries; this
lint sweeps EVERY registry query (it iterates ``all_queries()``, so the
count tracks the live registry) for the one property that must hold
everywhere: no unbounded join — no CartesianProduct, and no
BroadcastNestedLoopJoin except where one side is a bounded
scalar/seed/centroid frame the plan deliberately replicates. A refactor
that silently turns an equi-join into a cross product fails here even
for queries without a dedicated plan pin.

Broadcast cross joins against PROVABLY TINY frames (a 1-row aggregate, a
k-row centroid/seed table, a bounded holdout) are the legitimate pattern
and are allowlisted BY QUERY with the reason recorded; the labeled
quadratic verifiers (ngram all-pairs and their consumers) are excluded
the same way bench.py excludes them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"

# query -> reason a BroadcastNestedLoopJoin / broadcast cross join is
# legitimately bounded there
BOUNDED_CROSS_OK = {
    "tfidf_title_match": "1-row corpus-size frame joined for IDF",
    "levenshtein_ratio_join": "broadcast master side, threshold filter",
    "ann_cosine_topk": "labeled exact brute-force baseline",
    "ann_recall_at_k": "consumes the exact brute-force baseline",
    # ann_cosine_ivf / ann_ivf_kmeans_refine left this list in round 14:
    # cell assignment became a ROW-LOCAL argmax over a driver-collected
    # centroid literal (r13 VERDICT #1), so their plans no longer carry
    # any nested-loop join — the lint now enforces that stays true.
    "dedup_cluster_cc": "consumes LSH pairs; convergence probe aggregates",
    "leakage_safe_split": "consumes LSH pairs + CC",
    "text_unigram_logprob": "1-row total-count frame",
    "decontaminate_ngram_overlap": "bounded holdout broadcast",
    "sketch_approx_stats": "1-row exact-side frames for self-validation",
    "sketch_hll_merge": "1-row merged-sketch frame",
    "corpus_mix_resample": "per-source ppm threshold frame (|sources| rows)",
    "split_royalty_union": "1-row frames in the royalty branches",
    "skew_salted_join": "dim replicated x salt_n (bounded) by operators/joins.salted_join",
    "fact_royalty": "1-row scalar frames",
    "rollup_incremental_refresh": "1-row scalar frames",
    "data_quality_audit": "1-row per-check aggregate frames",
    "domain_fact_royalty": "fixture-bound scalar frames",
    "domain_split_royalty_report": "fixture-bound scalar frames",
    "sketch_kll_quantile_merge": "1-row exact/estimate frames crossed for "
    "self-validation (the sketch_approx_stats pattern)",
    # staged_r20 — entry recorded AHEAD of activation (r12): the Bloom
    # bitmap travels as a one-row broadcast array frame attached by a
    # deliberately-bounded BroadcastNestedLoopJoin (r11 VERDICT #2)
    "bloom_join_prune": "1-row Bloom-bitmap frame broadcast to the probe",
    # staged_eval — recorded ahead of activation (r12): both anchor on
    # deliberately-bounded one-row frames
    "calibration_ece": "1-row exclusion aggregate anchors the bin table",
    "ks_drift": "1-row totals/D frames crossed for the single-row report",
    # staged_eval2 — recorded ahead of activation (r13, earliest r18):
    "roc_auc_global": "global mode's 1-row bounds/offsets/anchor frames "
    "broadcast (the grouped form's per-group joins collapse to one row)",
    "psi_drift_by_group": "measurable-group x range(n_bins) grid — "
    "bounded at n_groups x 10 rows",
}


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("plan-lint")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def plans(spark):
    """ONE planning sweep shared by every lint in this module — each
    lint is just a string scan, so adding one must stay O(1), not
    another full-registry executedPlan pass (r10 review finding).
    Values are plan strings, or ``("__error__", msg)`` tuples for
    queries that fail to plan."""
    out = {}
    for name, fn in all_queries().items():
        try:
            out[name] = (
                fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as ex:
            out[name] = ("__error__", f"{type(ex).__name__}: {ex}")
    return out


def test_no_unbounded_joins_anywhere(plans):
    offenders = []
    for name, plan in plans.items():
        if isinstance(plan, tuple):  # a query that cannot plan is its own bug
            offenders.append((name, f"planning failed: {plan[1]}"))
            continue
        if "CartesianProduct" in plan and name not in BOUNDED_CROSS_OK:
            offenders.append((name, "CartesianProduct"))
        elif "BroadcastNestedLoopJoin" in plan and name not in BOUNDED_CROSS_OK:
            offenders.append((name, "BroadcastNestedLoopJoin"))
    assert not offenders, (
        "unbounded joins outside the bounded-cross allowlist: "
        f"{offenders} — if the cross side is provably bounded, add the "
        "query to BOUNDED_CROSS_OK with the reason"
    )


def test_persist_counts_knob_pins_scoring_to_cached_count_tables(spark):
    """r11 VERDICT #5: ``persist_counts=True`` must make the scoring
    pass read COUNTS, not the corpus. Pinned on the executed plans:
    ``pmi_collocations`` reads ZERO corpus scans (every input derives
    from the two cached count tables); ``bigram_logprob`` reads exactly
    the two inherent corpus scans (the per-doc bigram stream + the
    short-doc re-attach) while all three count tables arrive via
    InMemoryTableScan."""
    import re

    from bp_datawarehouse_ordersfact_spark.operators.ml import (
        bigram_logprob,
        pmi_collocations,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def corpus_scans(df):
        """FileScans in the EXECUTION tree only — the plan string nests
        each InMemoryRelation's BUILD plan (whose FileScans run once at
        cache fill, not per scoring read) under the cache node, so a
        whole-string count would see them. Lines deeper-indented than
        an InMemoryRelation line belong to its build subtree."""
        plan = df._jdf.queryExecution().executedPlan().toString()
        n = 0
        skip_deeper_than = None
        for line in plan.splitlines():
            m = re.search(r"[A-Za-z*]", line)
            indent = m.start() if m else 0
            if skip_deeper_than is not None and indent > skip_deeper_than:
                continue
            skip_deeper_than = None
            if "InMemoryRelation" in line:
                skip_deeper_than = indent
            elif "FileScan parquet" in line:
                n += 1
        return n, plan

    try:
        n, plan = corpus_scans(
            pmi_collocations(docs, "text", "doc_id", persist_counts=True)
        )
        assert n == 0, f"pmi scoring still scans the corpus {n}x:\n{plan[:3000]}"
        assert "InMemoryTableScan" in plan

        n, plan = corpus_scans(
            bigram_logprob(docs, "text", "doc_id", persist_counts=True)
        )
        assert n == 2, f"bigram scoring scans the corpus {n}x (want 2):\n{plan[:3000]}"
        assert "InMemoryTableScan" in plan

        # knob off: the count tables re-derive from corpus scans —
        # clear first, else the cache manager substitutes the still-live
        # caches into any logically-equal subtree and the contrast is
        # vacuous
        spark.catalog.clearCache()
        n, _ = corpus_scans(pmi_collocations(docs, "text", "doc_id"))
        assert n > 0
    finally:
        spark.catalog.clearCache()


def test_python_stages_sit_on_user_pinned_partitioning(plans):
    """r10 lesson (grouped_ewma, PLANS.md "Round 10"): a Python-eval
    stage's cost scales with ROWS, not bytes, so AQE's bytes-based
    partition coalescing will serialize it onto a handful of cores
    whenever the rows are small — 3x on the suite's most expensive
    query. The repo rule is therefore: every registry plan containing a
    Python node (grouped-map, mapInPandas, Arrow/batch eval) must carry
    a USER-SPECIFIED repartition (REPARTITION_BY_NUM — exempt from AQE
    coalescing) feeding it, the `_fan_out` contract. This lint sweeps
    all registry plans so a new Python-stage query can't ship without
    the pin."""
    import re

    py_node = re.compile(
        r"FlatMapGroupsInPandas|MapInPandas|ArrowEvalPython"
        r"|BatchEvalPython|MapInArrow"
    )
    offenders = []
    for name, plan in plans.items():
        if isinstance(plan, tuple):
            continue  # planning failures are the other lint's business
        if py_node.search(plan) and "REPARTITION_BY_NUM" not in plan:
            offenders.append(name)
    assert not offenders, (
        f"registry queries with a Python stage but no user-pinned "
        f"repartition (AQE coalescing will serialize the Python work "
        f"when rows are small — see PLANS.md 'Round 10'): {offenders}"
    )
