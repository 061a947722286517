"""STAGED driver-row tests for the evaluation layer
(queries/staged_eval.py + operators/evaluation.py) — written in round
12, ahead of activation in a buffer round (earliest r17): query +
oracle + driver-style comparison + pure-Python formula twins, so the
future activation is a mechanical edit.

The driver-style tests run the exact parity comparison
(tests/parity.py frames_match over toPandas/fetchdf) at sf0.001; the
twins re-derive each statistic from first principles in pure Python on
hand-built frames, so a matched Spark/DuckDB pair that is WRONG the
same way on both engines still fails here."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
    calibration_ece,
    ks_drift,
    precision_recall_at,
    roc_auc_per_group,
)
from bp_datawarehouse_ordersfact_spark.queries import staged_eval
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-eval")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "orders"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


@pytest.mark.parametrize("name", list(staged_eval.QUERIES))
def test_staged_eval_query_passes_driver_comparison(spark, con, name):
    sdf = staged_eval.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_eval.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_not_yet_registered():
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    assert not (set(staged_eval.QUERIES) & live)


# --- pure-Python twins -------------------------------------------------------


def _py_auc(pairs):
    """Mann–Whitney AUC with average ranks; None for one-class."""
    n_pos = sum(y for _, y in pairs)
    n_neg = len(pairs) - n_pos
    if n_pos == 0 or n_neg == 0:
        return None
    ordered = sorted(pairs, key=lambda p: p[0])
    ranks, i = {}, 0
    while i < len(ordered):
        j = i
        while j < len(ordered) and ordered[j][0] == ordered[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0  # ranks i+1..j
        ranks[ordered[i][0]] = avg
        i = j
    pos_rank_sum = sum(ranks[s] for s, y in pairs if y == 1)
    return (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def test_roc_auc_matches_python_twin_with_ties_nulls_one_class(spark):
    rows = [
        # grp a: ties across classes (the 0.5-per-tied-pair case)
        ("a", 0.1, 0), ("a", 0.5, 0), ("a", 0.5, 1), ("a", 0.9, 1),
        ("a", 0.9, 0), ("a", 1.0, 1),
        # grp b: perfectly separable -> 1.0
        ("b", 0.1, 0), ("b", 0.2, 0), ("b", 0.8, 1), ("b", 0.9, 1),
        # grp c: one-class -> NULL auc
        ("c", 0.3, 1), ("c", 0.7, 1),
        # grp d: only excluded rows -> n=0, NULL auc, n_excluded=2
        ("d", None, 1), ("d", 0.4, None),
        # NULL group label is still a group
        (None, 0.2, 0), (None, 0.8, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, s double, y int")
    got = {
        r["grp"]: r
        for r in roc_auc_per_group(df, "s", "y", ["grp"]).collect()
    }
    assert set(got) == {"a", "b", "c", "d", None}
    want_a = _py_auc([(s, y) for g, s, y in rows if g == "a"])
    assert abs(got["a"]["auc"] - round(want_a, 6)) < 1e-9
    assert got["b"]["auc"] == 1.0
    assert got["c"]["auc"] is None and got["c"]["n_pos"] == 2
    assert got["d"]["auc"] is None
    assert got["d"]["n"] == 0 and got["d"]["n_excluded"] == 2
    assert got[None]["auc"] == 1.0 and got[None]["n"] == 2
    # group_cols=[] = GLOBAL AUC (round 13; the ks_drift symmetry) —
    # one row, same prefix-sum plan, twin-checked over ALL rows pooled
    glob = roc_auc_per_group(df, "s", "y", []).collect()
    assert len(glob) == 1
    want_glob = _py_auc(
        [(s, y) for _, s, y in rows if s is not None and y is not None]
    )
    assert abs(glob[0]["auc"] - round(want_glob, 6)) < 1e-9
    assert glob[0]["n"] == 14 and glob[0]["n_excluded"] == 2
    # empty input in global mode: counts report 0, never NULL
    empty = spark.createDataFrame([], "grp string, s double, y int")
    e = roc_auc_per_group(empty, "s", "y", []).collect()[0]
    assert (e["n"], e["n_pos"], e["n_excluded"], e["auc"]) == (0, 0, 0, None)


def test_roc_auc_rejects_non_binary_labels(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError, SparkRuntimeException

    errs = (Py4JJavaError, PySparkRuntimeError, SparkRuntimeException)
    df = spark.createDataFrame(
        [("a", 0.5, 2)], "grp string, s double, y int"
    )
    with pytest.raises(errs):
        roc_auc_per_group(df, "s", "y", ["grp"]).collect()
    # r12 review pin #1: fractional labels must raise, not truncate to 0
    # (the guard compares BEFORE any narrowing cast — catching the
    # swapped-score-and-label mistake)
    frac = spark.createDataFrame(
        [("a", 0.5, 0.7), ("a", 0.2, 0.2)], "grp string, s double, y double"
    )
    with pytest.raises(errs):
        roc_auc_per_group(frac, "s", "y", ["grp"]).collect()
    # r12 review pin #4: an invalid label on a NULL-SCORE row must still
    # raise — the guard is evaluated on every row, not only ranked ones
    hidden = spark.createDataFrame(
        [("a", None, 2), ("a", 0.5, 1), ("a", 0.2, 0)],
        "grp string, s double, y int",
    )
    with pytest.raises(errs):
        roc_auc_per_group(hidden, "s", "y", ["grp"]).collect()
    # float labels that ARE exactly 0.0/1.0 pass
    okf = spark.createDataFrame(
        [("a", 0.5, 1.0), ("a", 0.2, 0.0)], "grp string, s double, y double"
    )
    assert roc_auc_per_group(okf, "s", "y", ["grp"]).collect()[0]["auc"] == 1.0


def test_calibration_ece_all_excluded_still_reports(spark):
    """r12 review pin #2: a completely broken scorer (every row NULL or
    out-of-range) must yield a single NULL-bin row carrying the full
    n_excluded, not an empty frame indistinguishable from empty input."""
    df = spark.createDataFrame(
        [(None, 1), (2.0, 0), (-0.5, 1)], "s double, y int"
    )
    rows = calibration_ece(df, "s", "y", n_bins=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["bin"] is None and r["n"] == 0 and r["n_excluded"] == 3
    assert r["ece"] is None and r["avg_score"] is None


def test_calibration_ece_matches_python_twin_and_excludes(spark):
    rows = [
        (0.05, 0), (0.08, 0), (0.15, 0), (0.95, 1), (0.92, 1),
        (1.0, 1),            # closed top bin
        (0.55, 1), (0.58, 0),
        (1.5, 1), (-0.1, 0), (None, 1), (0.5, None),  # excluded
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    out = calibration_ece(df, "s", "y", n_bins=10).collect()
    kept = [(s, y) for s, y in rows
            if s is not None and y is not None and 0.0 <= s <= 1.0]
    bins = {}
    for s, y in kept:
        bins.setdefault(min(int(s * 10), 9), []).append((s, y))
    total = len(kept)
    ece = sum(
        abs(sum(s for s, _ in v) / len(v) - sum(y for _, y in v) / len(v))
        * len(v)
        for v in bins.values()
    ) / total
    got = {r["bin"]: r for r in out}
    assert set(got) == set(bins)
    for b, v in bins.items():
        assert got[b]["n"] == len(v)
        assert abs(got[b]["avg_score"] - sum(s for s, _ in v) / len(v)) < 1e-6
        assert abs(got[b]["frac_pos"] - sum(y for _, y in v) / len(v)) < 1e-6
        assert abs(got[b]["ece"] - ece) < 1e-6
        assert got[b]["n_excluded"] == 4
    # score exactly 1.0 landed in bin 9, not a phantom bin 10
    assert 9 in got and all(b <= 9 for b in got)
    with pytest.raises(ValueError):
        calibration_ece(df, "s", "y", n_bins=0)


def test_precision_recall_at_matches_python_twin_and_null_semantics(spark):
    rows = [
        (0.9, 1), (0.8, 1), (0.7, 0), (0.6, 1), (0.4, 0),
        (0.2, 0), (0.1, 1), (None, 1), (0.5, None),
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    ths = [0.0, 0.5, 0.75, 0.95]
    got = {
        r["threshold"]: r
        for r in precision_recall_at(df, "s", "y", ths).collect()
    }
    kept = [(s, y) for s, y in rows if s is not None and y is not None]
    pos = sum(y for _, y in kept)
    for t in ths:
        tp = sum(1 for s, y in kept if s >= t and y == 1)
        fp = sum(1 for s, y in kept if s >= t and y == 0)
        r = got[t]
        assert r["n_pred_pos"] == tp + fp
        assert r["n_excluded"] == 2
        if tp + fp == 0:
            # nothing clears 0.95: precision/recall/f1 must be NULL/0 —
            # the 0/0 case reports NULL, never a fabricated 1.0
            assert r["precision"] is None and r["f1"] is None
            assert r["recall"] == 0.0
        else:
            assert abs(r["precision"] - round(tp / (tp + fp), 6)) < 1e-9
            assert abs(r["recall"] - round(tp / pos, 6)) < 1e-9
            p, q = tp / (tp + fp), tp / pos
            want_f1 = 2 * p * q / (p + q) if (p + q) > 0 else None
            if want_f1 is None:
                assert r["f1"] is None
            else:
                assert abs(r["f1"] - round(want_f1, 6)) < 1e-6
    with pytest.raises(ValueError):
        precision_recall_at(df, "s", "y", [])
    with pytest.raises(ValueError):
        precision_recall_at(df, "s", "y", [0.5, 0.5])


def _py_ks(a, b):
    xs = sorted(set(a) | set(b))
    best = 0.0
    for x in xs:
        fa = sum(1 for v in a if v <= x) / len(a)
        fb = sum(1 for v in b if v <= x) / len(b)
        best = max(best, abs(fa - fb))
    return best


def test_ks_drift_matches_python_twin_across_bucket_counts(spark):
    base = [float((i * 37) % 101) for i in range(120)]
    cur = [float((i * 53) % 97) + 3.0 for i in range(80)]
    bdf = spark.createDataFrame([(v,) for v in base], "v double")
    cdf = spark.createDataFrame([(v,) for v in cur], "v double")
    want = round(_py_ks(base, cur), 6)
    # multiple bucket counts, incl. 1 (pure serial) and > |values|:
    # the statistic must be bucket-invariant — buckets shape only
    # parallelism
    for nb in (1, 7, 1024):
        row = ks_drift(bdf, cdf, "v", n_buckets=nb).collect()[0]
        assert row["n_base"] == 120 and row["n_cur"] == 80
        assert abs(row["d_stat"] - want) < 1e-9, nb


def test_ks_drift_degenerate_inputs(spark):
    bdf = spark.createDataFrame([(1.0,), (1.0,)], "v double")
    cdf = spark.createDataFrame([(1.0,)], "v double")
    # identical single-point distributions -> D = 0 (max==min path)
    row = ks_drift(bdf, cdf, "v").collect()[0]
    assert row["d_stat"] == 0.0
    # an empty side -> NULL d_stat, never a fabricated 0
    empty = spark.createDataFrame([], "v double")
    row = ks_drift(bdf, empty, "v").collect()[0]
    assert row["n_cur"] == 0 and row["d_stat"] is None
    # NULLs excluded but the other side still counts
    withnull = spark.createDataFrame([(None,), (2.0,)], "v double")
    row = ks_drift(bdf, withnull, "v").collect()[0]
    assert row["n_cur"] == 1 and row["d_stat"] == 1.0
    with pytest.raises(ValueError):
        ks_drift(bdf, cdf, "v", n_buckets=0)


def test_ks_drift_grouped_matches_python_twin_per_group(spark):
    """group_cols: one exact D per group (the per-source drift grain).
    NULL group labels are a group; a one-sided group (present in only
    one snapshot) reports its counts and NULL d_stat."""
    base_rows = (
        [("a", float((i * 37) % 101)) for i in range(60)]
        + [("b", float(i % 13)) for i in range(40)]
        + [(None, float(i % 7)) for i in range(20)]
        + [("only_base", float(i)) for i in range(5)]
    )
    cur_rows = (
        [("a", float((i * 53) % 97) + 5.0) for i in range(50)]
        + [("b", float(i % 13)) for i in range(40)]  # identical dist -> 0
        + [(None, float(i % 7) + 1.0) for i in range(10)]
    )
    bdf = spark.createDataFrame(base_rows, "grp string, v double")
    cdf = spark.createDataFrame(cur_rows, "grp string, v double")
    got = {
        r["grp"]: r
        for r in ks_drift(bdf, cdf, "v", group_cols=["grp"]).collect()
    }
    assert set(got) == {"a", "b", None, "only_base"}
    for grp in ("a", "b", None):
        b = [v for gv, v in base_rows if gv == grp]
        c = [v for gv, v in cur_rows if gv == grp]
        r = got[grp]
        assert (r["n_base"], r["n_cur"]) == (len(b), len(c))
        assert abs(r["d_stat"] - round(_py_ks(b, c), 6)) < 1e-9, grp
    assert got["b"]["d_stat"] == 0.0
    r = got["only_base"]
    assert r["n_base"] == 5 and r["n_cur"] == 0 and r["d_stat"] is None
    # r12 review: a group whose values are ALL NULL must still report
    # (0, 0, NULL) — a scoring pass gone NULL for one source is the
    # most alarming drift case, not an invisible one
    bnull = bdf.unionByName(
        spark.createDataFrame([("ghost", None)], "grp string, v double")
    )
    cnull = cdf.unionByName(
        spark.createDataFrame([("ghost", None)], "grp string, v double")
    )
    gh = {
        r["grp"]: r
        for r in ks_drift(bnull, cnull, "v", group_cols=["grp"]).collect()
    }["ghost"]
    assert (gh["n_base"], gh["n_cur"], gh["d_stat"]) == (0, 0, None)
    # grouped result is bucket-invariant too
    one_bucket = {
        r["grp"]: r["d_stat"]
        for r in ks_drift(
            bdf, cdf, "v", group_cols=["grp"], n_buckets=1
        ).collect()
    }
    assert one_bucket == {g: r["d_stat"] for g, r in got.items()}


def test_ks_drift_plan_has_no_global_single_partition_window(spark):
    """The scale claim: the only unpartitioned window runs over
    bucket-count rows. The per-value cumulative window must be
    PARTITIONED (by bucket); a refactor that reintroduces a bare
    Window.orderBy(value) over the full distinct-value stream would
    show a windowspecdefinition ordering __v without a partition."""
    import re

    bdf = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    cdf = spark.createDataFrame([(float(i),) for i in range(40)], "v double")
    plan = (
        ks_drift(bdf, cdf, "v", n_buckets=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "__v" in spec:
            assert "__bk" in spec, f"value window lost its partition: {spec}"


def test_psi_drift_matches_python_twin_and_edge_cases(spark):
    import math

    import numpy as np

    from bp_datawarehouse_ordersfact_spark.operators.evaluation import psi_drift

    base = [float((i * 37) % 101) for i in range(150)]
    cur = [float((i * 53) % 97) + 10.0 for i in range(100)]
    bdf = spark.createDataFrame([(v,) for v in base], "v double")
    cdf = spark.createDataFrame([(v,) for v in cur], "v double")
    rows = {r["bin"]: r for r in psi_drift(bdf, cdf, "v").collect()}
    assert set(rows) == set(range(10))

    edges = [float(np.percentile(base, 10 * i, method="linear"))
             for i in range(1, 10)]

    def bin_of(v):
        return sum(v > e for e in edges)

    nb = [0] * 10
    nc = [0] * 10
    for v in base:
        nb[bin_of(v)] += 1
    for v in cur:
        nc[bin_of(v)] += 1
    psi = 0.0
    for i in range(10):
        p = max(nb[i] / len(base), 1e-6)
        q = max(nc[i] / len(cur), 1e-6)
        psi += (q - p) * math.log(q / p)
    for i in range(10):
        r = rows[i]
        assert (r["n_base"], r["n_cur"]) == (nb[i], nc[i]), i
        assert abs(r["psi"] - round(psi, 6)) < 1e-6
    # identical distributions -> PSI ~ 0
    same = {r["bin"]: r for r in psi_drift(bdf, bdf, "v").collect()}
    assert all(abs(r["psi"]) < 1e-9 for r in same.values())
    # empty CURRENT: every q floors to eps, counts report 0, psi finite
    empty = spark.createDataFrame([], "v double")
    out = psi_drift(bdf, empty, "v").collect()
    assert len(out) == 10 and all(r["n_cur"] == 0 for r in out)
    assert all(math.isfinite(r["psi"]) for r in out)
    # empty BASE: no edges exist -> empty frame (documented)
    assert psi_drift(empty, bdf, "v").count() == 0
    with pytest.raises(ValueError):
        psi_drift(bdf, cdf, "v", n_bins=1)
    with pytest.raises(ValueError):
        psi_drift(bdf, cdf, "v", eps=0.0)


def test_snapshot_diff_semantics(spark):
    from bp_datawarehouse_ordersfact_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None),
         (4, "d", 40.0), (None, "nullkey", 5.0)],
        "id long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged
         (2, "b", 21.0),          # changed (v)
         (3, "c", None),          # unchanged (NULL == NULL)
         (5, "e", 50.0),          # added
         (None, "nullkey", 6.0)], # changed on a NULL id (still matched)
        "id long, name string, v double",
    )
    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {
        1: "unchanged", 2: "changed", 3: "unchanged",
        4: "removed", 5: "added", None: "changed",
    }
    # compare_cols narrows the change test: only v counts, name ignored
    new2 = spark.createDataFrame(
        [(1, "RENAMED", 10.0)], "id long, name string, v double"
    )
    only_v = snapshot_diff(
        old.filter("id = 1"), new2, ["id"], compare_cols=["v"]
    ).collect()[0]
    assert only_v["status"] == "unchanged"
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError):
        snapshot_diff(old, new.drop("v"), ["id"], compare_cols=["v"])


def test_ks_drift_both_inputs_empty_reports_zero_counts(spark):
    """r12 review pass 3: a global aggregate over ZERO rows yields NULL
    sums — the counts must still coalesce to 0 (the documented
    counts-always-report contract)."""
    empty = spark.createDataFrame([], "v double")
    r = ks_drift(empty, empty, "v").collect()[0]
    assert (r["n_base"], r["n_cur"], r["d_stat"]) == (0, 0, None)


def test_psi_drift_all_null_base_keeps_include_raw_schema(spark):
    """r12 review pass 3: the empty-base early return must carry the
    same schema as the normal path, include_raw column included."""
    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        psi_drift,
    )

    nulls = spark.createDataFrame([(None,)], "v double")
    cur = spark.createDataFrame([(1.0,)], "v double")
    out = psi_drift(nulls, cur, "v", include_raw=True)
    assert "__psi_raw" in out.columns and out.count() == 0
    out2 = psi_drift(nulls, cur, "v")
    assert "__psi_raw" not in out2.columns


def test_psi_edges_helper_matches_operator_default_path(spark):
    """The monitor's precompute and psi_drift(edges=None) share ONE
    derivation: explicit edges from psi_edges reproduce the default
    path bit-for-bit."""
    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        psi_drift,
        psi_edges,
    )

    base = spark.createDataFrame(
        [(float((i * 37) % 101),) for i in range(80)], "v double"
    )
    cur = spark.createDataFrame(
        [(float((i * 53) % 97),) for i in range(50)], "v double"
    )
    e = psi_edges(base, "v", 10)
    assert len(e) == 9 and e == sorted(e)
    a = sorted(map(tuple, psi_drift(base, cur, "v").collect()))
    b = sorted(map(tuple, psi_drift(base, cur, "v", edges=e).collect()))
    assert a == b
    with pytest.raises(ValueError):
        psi_drift(base, cur, "v", edges=[1.0, 2.0])  # wrong edge count

def test_roc_auc_bucket_invariance(spark):
    """r12 VERDICT #2 rewrite: n_buckets shapes PARALLELISM only — the
    AUC must be bit-identical across bucket counts, incl. 1 (pure
    serial) and > |distinct scores| (one value per bucket)."""
    rows = [
        ("a", float((i * 37) % 101) / 101.0, (i * 7) % 3 == 0)
        for i in range(120)
    ] + [
        ("b", float((i * 53) % 97) / 97.0, (i * 11) % 2 == 0)
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "grp string, s double, y boolean")
    want = {
        g: round(_py_auc([(s, int(y)) for gg, s, y in rows if gg == g]), 6)
        for g in ("a", "b")
    }
    for nb in (1, 7, 1024):
        got = {
            r["grp"]: r
            for r in roc_auc_per_group(
                df, "s", "y", ["grp"], n_buckets=nb
            ).collect()
        }
        for g in ("a", "b"):
            assert abs(got[g]["auc"] - want[g]) < 1e-9, (g, nb)
    with pytest.raises(ValueError):
        roc_auc_per_group(df, "s", "y", ["grp"], n_buckets=0)


def test_roc_auc_plan_has_no_whole_group_sort_window(spark):
    """The r12 VERDICT #2 scale fix, pinned at the plan level: the old
    row_number().over(partitionBy(group).orderBy(score)) serialized each
    group into ONE task. After the ks_drift-style rewrite, every window
    that orders by the score must be partitioned by (group, bucket) —
    a windowspecdefinition ordering __s without __bk in its partition
    spec is the regression — and no per-row ranking function may appear
    at all."""
    import re

    rows = [("a", float(i % 50), i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "grp string, s double, y int")
    plan = (
        roc_auc_per_group(df, "s", "y", ["grp"], n_buckets=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "row_number" not in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "__s" in spec:
            assert "__bk" in spec, f"score window lost its partition: {spec}"


def test_precision_recall_at_empty_input_reports_zero_counts(spark):
    """r12 ADVICE #1: sums over ZERO rows are NULL — the counts must
    coalesce to 0 (empty input ≠ failed count), matching the ks_drift
    totals fix. Precision/recall/f1 stay NULL (0/0 would lie)."""
    empty = spark.createDataFrame([], "s double, y int")
    rows = precision_recall_at(empty, "s", "y", [0.25, 0.75]).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_pred_pos"] == 0 and r["n_excluded"] == 0
        assert r["precision"] is None and r["recall"] is None
        assert r["f1"] is None


def test_calibration_ece_empty_input_reports_zero_excluded(spark):
    """r12 ADVICE #2: the anchor row must carry n_excluded = 0 (not
    NULL) on a fully empty input — the docstring promises the anchor
    row always reports."""
    empty = spark.createDataFrame([], "s double, y int")
    rows = calibration_ece(empty, "s", "y").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["bin"] is None and r["n"] == 0 and r["n_excluded"] == 0

def test_ks_binned_within_bin_mass_bound_of_exact(spark):
    """r12 VERDICT #4: the binned tier can only UNDERestimate, and by at
    most the max bin mass across both sides —
    D_binned <= D_exact <= D_binned + max_i max(p_i, q_i) — pinned on a
    planted location shift."""
    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        cdf_at_edges,
        ks_binned,
        ks_drift,
        psi_edges,
    )

    base = [float((i * 37) % 101) for i in range(400)]
    cur = [float((i * 53) % 97) + 20.0 for i in range(300)]  # shifted
    bdf = spark.createDataFrame([(v,) for v in base], "v double")
    cdf_ = spark.createDataFrame([(v,) for v in cur], "v double")
    k = 20
    edges = psi_edges(bdf, "v", k)
    base_cdf = cdf_at_edges(bdf, "v", edges)
    got = ks_binned(cdf_, "v", edges, base_cdf, include_raw=True).collect()[0]
    exact = ks_drift(bdf, cdf_, "v", include_raw=True).collect()[0]
    assert got["n_cur"] == 300

    # python twin of the bin masses: share of each side in each
    # edge-delimited bin (k bins: (-inf, e0], (e0, e1], ..., (e_{k-2}, inf))
    def masses(vals):
        cum = [sum(1 for v in vals if v <= e) for e in edges] + [len(vals)]
        prev, out = 0, []
        for c in cum:
            out.append((c - prev) / len(vals))
            prev = c
        return out

    bound = max(
        max(p, q) for p, q in zip(masses(base), masses(cur))
    )
    assert got["__d_raw"] <= exact["__d_raw"] + 1e-12  # never overestimates
    assert exact["__d_raw"] <= got["__d_raw"] + bound + 1e-12
    # on this hard shift the approximation still alarms decisively
    assert got["d_stat"] > 0.1

    # contract errors
    with pytest.raises(ValueError):
        ks_binned(cdf_, "v", edges, base_cdf[:-1])
    with pytest.raises(ValueError):
        ks_binned(cdf_, "v", list(reversed(edges)), list(reversed(base_cdf)))
    with pytest.raises(ValueError):
        ks_binned(cdf_, "v", [], [])
    with pytest.raises(ValueError):
        cdf_at_edges(spark.createDataFrame([(None,)], "v double"), "v", edges)
    # all-NULL current: counts report 0, d_stat NULL (not a fabricated 0)
    nulls = spark.createDataFrame([(None,)], "v double")
    r = ks_binned(nulls, "v", edges, base_cdf).collect()[0]
    assert r["n_cur"] == 0 and r["d_stat"] is None

def test_precision_recall_at_grouped_matches_python_twin(spark):
    """Round-13 grouped tier: per-group sweeps equal the global sweep
    run on each group's rows alone; NULL group labels are groups;
    per-group n_excluded."""
    rows = [
        ("en", 0.9, 1), ("en", 0.8, 1), ("en", 0.7, 0), ("en", 0.2, 0),
        ("fr", 0.9, 0), ("fr", 0.6, 1), ("fr", 0.1, 1),
        (None, 0.5, 1), (None, None, 1), (None, 0.4, None),
    ]
    df = spark.createDataFrame(rows, "lang string, s double, y int")
    ts = [0.5, 0.75]
    got = {
        (r["lang"], r["threshold"]): r
        for r in precision_recall_at(
            df, "s", "y", ts, group_cols=["lang"]
        ).collect()
    }
    assert len(got) == 6  # 3 groups x 2 thresholds
    for lang in ("en", "fr", None):
        sub = spark.createDataFrame(
            [(s, y) for g, s, y in rows if g == lang], "s double, y int"
        )
        want = {
            r["threshold"]: r
            for r in precision_recall_at(sub, "s", "y", ts).collect()
        }
        for t in ts:
            a, b = got[(lang, t)], want[t]
            for c in ("n_pred_pos", "precision", "recall", "f1",
                      "n_excluded"):
                assert a[c] == b[c], (lang, t, c, a[c], b[c])
    assert got[(None, 0.5)]["n_excluded"] == 2
    # hand-check one cell: en@0.75 -> preds {0.9, 0.8} both pos
    assert got[("en", 0.75)]["precision"] == 1.0
    assert got[("en", 0.75)]["recall"] == 1.0

def test_calibration_ece_grouped_matches_per_group_global(spark):
    """Round-13 grouped tier: each group's table equals the global
    operator run on that group's rows alone; an all-excluded group
    anchors with its own NULL-bin row; NULL group labels are groups."""
    rows = [
        ("en", 0.05, 0), ("en", 0.12, 0), ("en", 0.93, 1), ("en", 1.0, 1),
        ("fr", 0.45, 1), ("fr", 0.52, 0), ("fr", 0.58, 1),
        # all-excluded group: out-of-range + NULLs only
        ("broken", 1.7, 1), ("broken", None, 0), ("broken", 0.4, None),
        (None, 0.31, 1), (None, 0.39, 0),
    ]
    df = spark.createDataFrame(rows, "lang string, s double, y int")
    got = calibration_ece(df, "s", "y", n_bins=10, group_cols=["lang"])
    by_group = {}
    for r in got.collect():
        by_group.setdefault(r["lang"], []).append(r)
    assert set(by_group) == {"en", "fr", "broken", None}
    for lang in ("en", "fr", None):
        sub = spark.createDataFrame(
            [(s, y) for gl, s, y in rows if gl == lang], "s double, y int"
        )
        want = sorted(
            (tuple(r) for r in calibration_ece(sub, "s", "y",
                                               n_bins=10).collect()),
        )
        have = sorted(tuple(r)[1:] for r in by_group[lang])
        assert have == want, lang
    b = by_group["broken"]
    assert len(b) == 1 and b[0]["bin"] is None
    assert b[0]["n"] == 0 and b[0]["n_excluded"] == 3

def test_psi_drift_by_group_matches_global_per_group(spark):
    """Round-13 grouped PSI: each measurable group's table equals the
    global psi_drift run on that group's rows alone (same edges,
    binning, eps floor); a group with no non-NULL base values — or
    present only in current — anchors with ONE NULL-bin row carrying
    its true counts."""
    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        psi_drift,
        psi_drift_by_group,
    )

    base_rows = (
        [("en", float((i * 37) % 101)) for i in range(90)]
        + [("fr", float((i * 53) % 97)) for i in range(70)]
        + [(None, float(i % 11)) for i in range(30)]
        + [("nullbase", None)] * 3          # base present but all-NULL
    )
    cur_rows = (
        [("en", float((i * 29) % 89) + 5.0) for i in range(60)]
        + [("fr", float((i * 31) % 83)) for i in range(40)]
        + [(None, float(i % 7) + 2.0) for i in range(20)]
        + [("newsrc", 1.0), ("newsrc", 2.0)]  # current-only group
        + [("nullbase", 4.0)] * 2
    )
    b = spark.createDataFrame(base_rows, "src string, v double")
    c = spark.createDataFrame(cur_rows, "src string, v double")
    got = {}
    for r in psi_drift_by_group(
        b, c, "v", ["src"], include_raw=True
    ).collect():
        got.setdefault(r["src"], []).append(r)
    assert set(got) == {"en", "fr", None, "newsrc", "nullbase"}
    for grp in ("en", "fr", None):
        bg = b.filter(F.col("src").eqNullSafe(F.lit(grp))).select("v")
        cg = c.filter(F.col("src").eqNullSafe(F.lit(grp))).select("v")
        want = sorted(
            tuple(r) for r in psi_drift(bg, cg, "v",
                                        include_raw=True).collect()
        )
        have = sorted(tuple(r)[1:] for r in got[grp])
        # the 6dp-reported columns must match EXACTLY; the unrounded
        # __psi_raw tail may differ in the last ulps (parallel
        # summation order differs between the grouped and global
        # window plans — exactly why reported columns are rounded)
        assert [t[:-1] for t in have] == [t[:-1] for t in want], grp
        for h, w in zip(have, want):
            assert abs(h[-1] - w[-1]) < 1e-9, grp
        assert len(got[grp]) == 10
    for grp, nb, nc in (("newsrc", 0, 2), ("nullbase", 0, 2)):
        rows = got[grp]
        assert len(rows) == 1 and rows[0]["bin"] is None, grp
        assert rows[0]["n_base"] == nb and rows[0]["n_cur"] == nc, grp
        assert rows[0]["psi"] is None and rows[0]["p_share"] is None, grp
    import pytest as _pt

    with _pt.raises(ValueError):
        psi_drift_by_group(b, c, "v", [])
    with _pt.raises(ValueError):
        psi_drift_by_group(b, c, "v", ["src"], n_bins=1)
    with _pt.raises(ValueError):
        psi_drift_by_group(b, c, "v", ["src"], eps=0.0)
    # include_raw=False drops the raw column
    cols = psi_drift_by_group(b, c, "v", ["src"]).columns
    assert "__psi_raw" not in cols

def test_ks_binned_from_counts_within_bound_of_exact_grouped(spark):
    """Per-group binned KS derived from the psi counts frame: never
    overestimates the exact grouped ks_drift, and sits within the max
    bin mass of it; empty-current groups report NULL."""
    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        _null_safe_join,
        ks_binned_from_counts,
        ks_drift,
        psi_group_bin_counts,
        psi_group_edges,
    )

    base_rows = [("a", float((i * 37) % 101)) for i in range(200)] + [
        ("b", float((i * 53) % 97)) for i in range(150)
    ]
    cur_rows = [("a", float((i * 29) % 89) + 30.0) for i in range(120)] + [
        ("b", float((i * 31) % 83)) for i in range(90)
    ]
    b = spark.createDataFrame(base_rows, "g string, v double")
    c = spark.createDataFrame(cur_rows, "g string, v double")
    n_bins = 10
    edges = psi_group_edges(b, "v", ["g"], n_bins)
    edge_rows = edges.select("g", F.explode("__edges").alias("__e"))
    grid = edges.select("g").crossJoin(
        spark.range(n_bins).selectExpr("CAST(id AS INT) AS bin")
    )
    counts = _null_safe_join(
        grid,
        psi_group_bin_counts(b, "v", ["g"], edge_rows)
        .withColumnRenamed("n", "__nb"),
        ["g"], ["bin"], how="left",
    )
    counts = _null_safe_join(
        counts,
        psi_group_bin_counts(c, "v", ["g"], edge_rows)
        .withColumnRenamed("n", "__nc"),
        ["g"], ["bin"], how="left",
    ).selectExpr(
        "g", "bin",
        "CAST(coalesce(__nb, 0) AS LONG) AS n_base",
        "CAST(coalesce(__nc, 0) AS LONG) AS n_cur",
    )
    got = {
        r["g"]: r for r in ks_binned_from_counts(counts, ["g"]).collect()
    }
    exact = {
        r["g"]: r
        for r in ks_drift(b, c, "v", group_cols=["g"],
                          include_raw=True).collect()
    }
    masses = {
        r["g"]: r
        for r in counts.groupBy("g").agg(
            F.max(F.col("n_base")).alias("mb"),
            F.max(F.col("n_cur")).alias("mc"),
            F.sum("n_base").alias("tb"),
            F.sum("n_cur").alias("tc"),
        ).collect()
    }
    for grp in ("a", "b"):
        d_b = got[grp]["__d_binned_raw"]
        d_e = exact[grp]["__d_raw"]
        bound = max(
            masses[grp]["mb"] / masses[grp]["tb"],
            masses[grp]["mc"] / masses[grp]["tc"],
        )
        assert d_b <= d_e + 1e-12, grp          # never overestimates
        assert d_e <= d_b + bound + 1e-12, grp  # within the bin mass
    # the shifted group alarms decisively even binned
    assert got["a"]["d_binned"] > 0.25
    # empty current side -> NULL (no CDF)
    empty_counts = counts.withColumn(
        "n_cur", F.lit(0).cast("long")
    )
    r = {
        x["g"]: x
        for x in ks_binned_from_counts(empty_counts, ["g"]).collect()
    }
    assert r["a"]["d_binned"] is None

def test_score_quantile_normalize_matches_pandas_twin(spark):
    """Round-13 per-source rank normalization: (avg_rank - 0.5)/N per
    group equals pandas rank(method='average'); ties map to one value;
    NULLs pass through NULL; bucket-invariant; global mode; no
    whole-group sort window in the plan."""
    import re

    import pandas as pd

    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        score_quantile_normalize,
    )

    rows = (
        [("en", i, float((i * 37) % 11)) for i in range(40)]   # heavy ties
        + [("fr", 100 + i, float((i * 53) % 97)) for i in range(25)]
        + [(None, 200, 5.0), (None, 201, None)]                # NULL group + NULL value
    )
    df = spark.createDataFrame(rows, "src string, id long, s double")
    for nb in (1, 7, 1024):
        got = {
            r["id"]: r["pct_rank"]
            for r in score_quantile_normalize(
                df, "s", ["src"], n_buckets=nb
            ).collect()
        }
        pdf = pd.DataFrame(rows, columns=["src", "id", "s"])
        for src, sub in pdf.groupby("src", dropna=False):
            ranked = sub.dropna(subset=["s"])
            n = len(ranked)
            r = ranked["s"].rank(method="average")
            for id_, rv in zip(ranked["id"], r):
                assert abs(got[id_] - round((rv - 0.5) / n, 6)) < 1e-9, (
                    src, id_, nb,
                )
        assert got[201] is None  # NULL value -> NULL pct, row survives
        assert len(got) == len(rows)

    # global mode pools everything
    g = {
        r["id"]: r["pct_rank"]
        for r in score_quantile_normalize(df, "s", []).collect()
    }
    pdf = pd.DataFrame(rows, columns=["src", "id", "s"])
    ranked = pdf.dropna(subset=["s"])
    n = len(ranked)
    rr = ranked["s"].rank(method="average")
    for id_, rv in zip(ranked["id"], rr):
        assert abs(g[id_] - round((rv - 0.5) / n, 6)) < 1e-9

    # out_col collision refuses loudly
    with pytest.raises(ValueError):
        score_quantile_normalize(df, "s", ["src"], out_col="s")
    with pytest.raises(ValueError):
        score_quantile_normalize(df, "s", ["src"], n_buckets=0)

    # plan: no per-row ranking, no value window without a bucket partition
    plan = (
        score_quantile_normalize(df, "s", ["src"], n_buckets=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "row_number" not in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if "__v" in spec:
            assert "__bk" in spec, f"value window lost its partition: {spec}"

def test_null_safe_join_global_broadcast_knob(spark):
    """r13 review #1: with no group cols the helper broadcasts by
    default (right for the bounded 1-row anchor frames) but must NOT
    when broadcast_global=False — score_quantile_normalize's global
    join-back carries the UNBOUNDED distinct-value mapping."""
    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        _null_safe_join,
    )

    a = spark.range(10).selectExpr("id AS k", "id * 2 AS x")
    b = spark.range(10).selectExpr("id AS k", "id * 3 AS y")
    hinted = _null_safe_join(a, b.select("k", "y"), [], ["k"])
    plain = _null_safe_join(
        a, b.select("k", "y"), [], ["k"], broadcast_global=False
    )
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plain._jdf.queryExecution().analyzed().toString()
    # results identical either way
    assert sorted(map(tuple, hinted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # and the operator's global mode still computes correctly through
    # the unhinted mapping join-back (values re-checked in the pandas
    # twin test; here just prove the path executes)
    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        score_quantile_normalize,
    )

    df = spark.range(50).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS s")
    assert score_quantile_normalize(df, "s", []).count() == 50


def test_score_quantile_normalize_rejects_reserved_columns(spark):
    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        score_quantile_normalize,
    )

    df = spark.range(3).selectExpr("CAST(id AS DOUBLE) AS s", "id AS __v")
    with pytest.raises(ValueError):
        score_quantile_normalize(df, "s", [])
