"""Classifier-audit and continuous-drift EVALUATION operators.

The quality loop trains and applies filter classifiers at corpus scale
(`operators/ml.py`, `embedding_classifier_score`); this module is the
measurement layer that decides whether those classifiers — and the
score distributions they produce — can be TRUSTED:

- ``roc_auc_per_group`` — exact Mann–Whitney ROC AUC per group (e.g.
  per source/language): does the quality score actually rank good above
  bad, and does it do so uniformly across strata? A classifier with
  great global AUC and 0.55 on one language silently biases the corpus
  mix.
- ``calibration_ece`` — reliability table + expected calibration error:
  does "score 0.9" mean 90%? Threshold-based document budgeting
  (keep top p%) survives miscalibration, but MIXING scores across
  sources does not.
- ``ks_drift`` — exact two-sample Kolmogorov–Smirnov statistic between
  a baseline and a current CONTINUOUS score distribution — the
  continuous dual of ``aggregates.mixture_drift`` (which needs
  categorical keys): the alarm that a re-run scoring pass shifted the
  score distribution even when the mixture of sources did not.

No reference equivalent (the reference is a royalty ETL, SURVEY §2);
these are beyond-reference operators for the training-data pipeline
layer, built on public formulas (Mann–Whitney U / Hand & Till 2001;
Naeini et al. 2015 ECE; the classical two-sample KS statistic).

All three are pure JVM DataFrame plans (windows + aggregates, no
Python), with exact cross-engine twins in ANSI SQL for the driver gate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd


def _null_safe_join(
    left: DataFrame,
    right: DataFrame,
    g: list[str],
    extra: list[str],
    how: str = "inner",
    broadcast_global: bool = True,
) -> DataFrame:
    """left JOIN right on the group cols (NULL-SAFE — a NULL group label
    is still a group) plus ``extra`` plain equi columns; right's group
    cols arrive aliased ``__g{i}`` and are dropped. With no group cols
    the right side broadcasts WHEN ``broadcast_global`` — correct for
    the bounded 1-row/n_buckets-row frames these operators anchor on,
    but a caller whose global-mode right side is UNBOUNDED (e.g.
    ``score_quantile_normalize``'s distinct-value mapping) must pass
    ``broadcast_global=False`` and let the equi keys drive a shuffle
    join (r13 review #1). Shared by ``ks_drift``,
    ``roc_auc_per_group``, and ``psi_drift_by_group`` (one definition
    of the alignment rule, so the prefix-sum/bin plans can never
    diverge on NULL-group handling). ``extra`` columns under
    ``how="left"`` keep the LEFT side's values (the right copies are
    dropped), so unmatched rows keep their keys."""
    # alias the right side's extra equi columns like the group cols
    # (r13 VERDICT #2): self-join-derived mapping frames otherwise trip
    # Spark's "trivially true equals predicate" attribute-resolution
    # warning on `left[c] == right[c]`
    ex = {c: f"__e{i}" for i, c in enumerate(extra)}
    # refuse a left frame that already carries one of the reserved
    # aliases (r14 ADVICE #4): the post-join drop is by NAME, so a
    # caller column literally named __e0/__g0 would be silently dropped
    reserved = set(ex.values()) | {f"__g{i}" for i in range(len(g))}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"_null_safe_join: left frame carries reserved column(s) "
            f"{sorted(clash)} — rename them before joining"
        )
    r = right.select(
        *[F.col(c).alias(f"__g{i}") for i, c in enumerate(g)],
        *[
            F.col(c).alias(ex.get(c, c))
            for c in right.columns
            if c not in g
        ],
    )
    cond = F.lit(True)
    for i, c in enumerate(g):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__g{i}"))
    for c in extra:
        cond = cond & (F.col(c) == F.col(ex[c]))
    joined = left.join(
        r if g or not broadcast_global else F.broadcast(r), cond, how
    )
    drop = [f"__g{i}" for i in range(len(g))] + [ex[c] for c in extra]
    return joined.drop(*drop)


def roc_auc_per_group(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str],
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact ROC AUC per group via the rank (Mann–Whitney) identity::

        AUC = (sum(rank of positives) - n_pos*(n_pos+1)/2) / (n_pos*n_neg)

    with AVERAGE ranks on score ties (the sklearn
    ``roc_auc_score`` convention — a tie between a positive and a
    negative contributes 0.5, exactly the trapezoid over the tied
    segment).

    Rows with a NULL score or NULL label are EXCLUDED from the ranking
    but counted in ``n_excluded`` (an audit that silently dropped them
    would hide scoring bugs — the ``outlier_iqr_per_group`` posture).
    ``label_col`` must be exactly 0/1-valued (integer, boolean, or a
    float that IS 0.0/1.0); anything else raises at runtime via an
    ANSI-safe guard column — the guard compares the value BEFORE any
    narrowing cast (an r12 review showed a post-cast guard silently
    truncating 0.7 → 0, exactly the swapped-score-and-label mistake it
    exists to catch) and is evaluated on EVERY row, NULL-score rows
    included. One-class groups (no positives or no negatives) report
    NULL AUC rather than a fabricated 0.5 — the caller decides their
    fate.

    Scale shape (rewritten round 13, r12 VERDICT #2): NO per-row rank
    window — the original ``row_number().over(partitionBy(group))``
    sorted each group's entire row set inside ONE task, a scale-killer
    at the per-source/per-language grain where the dominant group is a
    large fraction of the corpus. Average ranks derive instead from
    per-(group, distinct-score) cumulative counts via the SAME
    two-level bucketed prefix sum as ``ks_drift`` (same file): the avg
    rank of a tie bucket is ``cum_before + (n_bucket + 1) / 2``, so

        pos_rank_sum = Σ_buckets pos_in_bucket · (cum_before + (n+1)/2)

    needs only (1) one shuffle collapsing rows to distinct (group,
    score) buckets map-side, (2) per-(group, uniform-bucket) subtotals
    → bucket offsets via a per-group window over ≤ ``n_buckets`` rows
    (constant-size state per group), (3) within-bucket cumulatives via
    a window partitioned by (group, bucket) — parallel. No window ever
    sorts a whole group's rows; ``n_buckets`` shapes parallelism only,
    never the value (pinned by the bucket-invariance test, the
    ``ks_drift`` discipline).

    Returns one row per group (``group_cols=[]`` computes the GLOBAL
    AUC as ONE row — same prefix-sum plan, the ``ks_drift`` symmetry;
    the only serial step is the offsets window over ≤ ``n_buckets``
    rows): ``n`` (ranked rows), ``n_pos``, ``n_excluded``, ``auc``
    (6dp). An empty input still reports (0, 0, 0, NULL) in global mode
    — counts always report.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    g = list(group_cols)
    s = F.col(score_col).cast("double")
    # loud 0/1 domain guard BEFORE the narrowing cast: cast("double")
    # widens losslessly for every sensible label type (int, boolean,
    # float), so 0.7 stays 0.7 and fails the isin instead of truncating
    # to a plausible 0. raise_error is ANSI-independent.
    lab_wide = F.col(label_col).cast("double")
    lab_checked = F.when(
        lab_wide.isin(0.0, 1.0) | lab_wide.isNull(), lab_wide.cast("int")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{label_col} must be 0/1, got "),
                F.col(label_col).cast("string"),
            )
        )
    )
    # __ok derives from lab_checked (not the raw column) so the guard
    # evaluates for EVERY row — a corrupt label on a NULL-score row
    # still raises instead of folding silently into n_excluded
    base = df.select(
        *g, s.alias("__s"), lab_checked.alias("__y")
    ).withColumn("__ok", F.col("__s").isNotNull() & F.col("__y").isNotNull())
    # (1) collapse to one row per distinct (group, score) — map-side
    # combined, so the heavy shuffle carries |distinct scores| rows
    per_value = (
        base.filter("__ok")
        .groupBy(*g, "__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__nb"),
            F.sum("__y").cast("long").alias("__pb"),
        )
    )
    # (2) uniform buckets over each group's observed [min, max] — the
    # ks_drift recipe verbatim; degenerate groups (one distinct score,
    # max == min) collapse to bucket 0 and stay correct
    bounds = per_value.groupBy(*g).agg(
        F.min("__s").alias("__lo"), F.max("__s").alias("__hi")
    )
    with_bucket = _null_safe_join(per_value, bounds, g, []).select(
        *g,
        "__s",
        "__nb",
        "__pb",
        F.when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.floor(
                    (F.col("__s") - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * n_buckets
                ).cast("int"),
                F.lit(n_buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .alias("__bk"),
    )
    bucket_totals = with_bucket.groupBy(*g, "__bk").agg(
        F.sum("__nb").alias("__tb")
    )
    woff = (
        Window.partitionBy(*g)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if g
        else Window.orderBy("__bk").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    offsets = bucket_totals.select(
        *g,
        "__bk",
        (F.sum("__tb").over(woff) - F.col("__tb")).alias("__ob"),
    )
    # (3) within-bucket inclusive cumulative + bucket offset = rows with
    # score <= s in the group; cum_before = that minus the tie bucket
    win = Window.partitionBy(*g, "__bk").orderBy("__s")
    cum = _null_safe_join(with_bucket, offsets, g, ["__bk"]).select(
        *g,
        "__nb",
        "__pb",
        (F.sum("__nb").over(win) + F.col("__ob") - F.col("__nb")).alias(
            "__cum_before"
        ),
    )
    avg_rank = F.col("__cum_before").cast("double") + (
        F.col("__nb").cast("double") + F.lit(1.0)
    ) / F.lit(2.0)
    per_group = cum.groupBy(*g).agg(
        F.sum("__nb").cast("long").alias("n"),
        F.sum("__pb").cast("long").alias("n_pos"),
        F.sum(F.col("__pb").cast("double") * avg_rank).alias(
            "__pos_rank_sum"
        ),
    )
    # null-SAFE join back (a NULL group label is still a group — the
    # outlier_iqr_per_group posture); excl is the full group set, so it
    # anchors the output and all-excluded groups still report
    # coalesce: in GLOBAL mode this aggregate runs even over an empty
    # input (groupBy() always yields one row) and its sum would be NULL
    # — counts always report (the r12 ADVICE posture)
    excl = base.groupBy(*g).agg(
        F.coalesce(F.sum((~F.col("__ok")).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_excluded")
    )
    n_pos = F.col("n_pos").cast("double")
    n_neg = (F.col("n") - F.col("n_pos")).cast("double")
    auc = F.try_divide(
        F.col("__pos_rank_sum") - n_pos * (n_pos + F.lit(1.0)) / F.lit(2.0),
        n_pos * n_neg,
    )
    return _null_safe_join(excl, per_group, g, [], how="left").select(
        *g,
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("long").alias("n_pos"),
        F.col("n_excluded").cast("long").alias("n_excluded"),
        rnd(auc, 6).alias("auc"),
    )


def precision_recall_at(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Precision / recall / F1 at each threshold in one corpus scan —
    the operating-point companion to ``roc_auc_per_group`` (AUC says
    the ranking is good; this says WHERE to cut it for a target
    precision, the decision a corpus filter actually ships with).
    ``group_cols`` computes the sweep PER GROUP (round 13 — the grain
    filters actually ship at: one threshold can sit at 0.95 precision
    on English and 0.6 on a low-resource language; a NULL group label
    is still a group, the module-wide posture).

    A document counts as predicted-positive at threshold ``t`` when
    ``score >= t``. NULL scores/labels are excluded (counted once in
    ``n_excluded``, repeated per row — per group in grouped mode).
    Precision at a threshold nothing clears is NULL (0/0 — reporting
    1.0 or 0.0 would both lie); recall with zero true positives in the
    data is NULL likewise.

    Scale shape: the classic distributed form — ONE aggregate computes
    (tp, fp) for every threshold via per-threshold conditional sums
    (map-side combined; 2 expressions per threshold, so even a
    1000-point sweep is a 2000-aggregate pass, well under the
    ``corr_matrix`` chunking knee), then the per-threshold arithmetic
    runs on the |groups|-row frame exploded to
    ``|groups| × len(thresholds)`` rows. The corpus is scanned exactly
    once regardless of threshold count; grouped mode adds only the
    group key to the one shuffle.

    Returns per (group,) threshold: group cols, ``threshold``,
    ``n_pred_pos`` (bigint), ``precision``, ``recall``, ``f1`` (6dp),
    ``n_excluded`` (bigint).
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    if len(set(thresholds)) != len(thresholds):
        raise ValueError(f"thresholds must be distinct, got {thresholds!r}")
    g = list(group_cols or [])
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("int")
    ok = s.isNotNull() & lab.isNotNull()
    base = df.select(*g, s.alias("__s"), lab.alias("__y"), ok.alias("__ok"))
    # every count is coalesced to 0: a global aggregate over ZERO rows
    # yields NULL sums, and the counts-always-report posture promises
    # n_pred_pos/n_excluded 0, not NULL, on an empty input — the same
    # empty-input bug ks_drift's totals fixed (r12 ADVICE)
    def cnt(cond, name):
        return (
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(name)
        )

    aggs = [
        cnt(~F.col("__ok"), "__nex"),
        cnt(F.col("__ok") & (F.col("__y") == 1), "__pos"),
    ]
    for i, t in enumerate(thresholds):
        pred = F.col("__ok") & (F.col("__s") >= F.lit(float(t)))
        aggs += [
            cnt(pred & (F.col("__y") == 1), f"__tp{i}"),
            cnt(pred & (F.col("__y") == 0), f"__fp{i}"),
        ]
    wide = base.groupBy(*g).agg(*aggs) if g else base.agg(*aggs)

    def row(i, t):
        tp = F.col(f"__tp{i}").cast("double")
        fp = F.col(f"__fp{i}").cast("double")
        prec = F.try_divide(tp, tp + fp)
        rec = F.try_divide(tp, F.col("__pos").cast("double"))
        f1 = F.try_divide(F.lit(2.0) * prec * rec, prec + rec)
        return F.struct(
            F.lit(float(t)).alias("threshold"),
            (F.col(f"__tp{i}") + F.col(f"__fp{i}")).alias("n_pred_pos"),
            rnd(prec, 6).alias("precision"),
            rnd(rec, 6).alias("recall"),
            rnd(f1, 6).alias("f1"),
            F.col("__nex").alias("n_excluded"),
        )

    rows = [row(i, t) for i, t in enumerate(thresholds)]
    return wide.select(*g, F.explode(F.array(*rows)).alias("p")).select(
        *g,
        "p.threshold",
        "p.n_pred_pos",
        "p.precision",
        "p.recall",
        "p.f1",
        "p.n_excluded",
    )


def calibration_ece(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Reliability table + expected calibration error over uniform
    score bins on [0, 1]: per non-empty bin, mean predicted score
    (confidence), positive fraction (empirical accuracy), and the
    |gap|; ``ece`` repeats the (per-group) ``Σ (n_b/N)·|gap_b|`` total
    on every row so the table is self-contained (the window total runs
    over ≤ ``n_bins`` rows per group — constant-size state).
    ``group_cols`` computes a reliability table and ECE PER GROUP
    (round 13, completing the group grain across the eval layer:
    "score 0.9 means 90%" can hold on the corpus and fail on one
    source); a NULL group label is still a group.

    Scores must lie in [0, 1] (a filter classifier's probability
    output); out-of-range or NULL scores and NULL labels are EXCLUDED
    from the table and surface in the per-row ``n_excluded`` companion
    column rather than silently vanishing — INCLUDING when everything
    is excluded: the output anchors on the exclusion aggregate (the
    ``roc_auc_per_group`` posture), so a completely broken scorer — or
    one broken GROUP — yields one anchor row (NULL ``bin``, ``n`` 0,
    NULL stats, full ``n_excluded``) instead of vanishing (r12 review).
    ``score == 1.0`` lands in the top bin (the standard half-open
    binning with a closed top).

    Scale shape: one map-side-combined aggregate to ``n_bins`` rows per
    group, then window arithmetic over those rows — the corpus is
    scanned exactly once (grouped mode only adds the group key to that
    one shuffle), nothing after the aggregate scales with it.

    Returns per (group,) non-empty bin: group cols, ``bin`` (0-based
    int), ``n`` (bigint), ``avg_score``, ``frac_pos``, ``abs_gap``,
    ``ece`` (6dp), and ``n_excluded`` (bigint, same on every row of a
    group).
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    g = list(group_cols or [])
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("int")
    ok = s.isNotNull() & lab.isNotNull() & (s >= 0.0) & (s <= 1.0)
    tagged = df.select(*g, s.alias("__s"), lab.alias("__y"), ok.alias("__ok"))
    binned = tagged.filter("__ok").select(
        *g,
        F.least(
            F.floor(F.col("__s") * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        "__s",
        "__y",
    )
    per_bin = binned.groupBy(*g, "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("__s").alias("__avg_score"),
        F.avg(F.col("__y").cast("double")).alias("__frac_pos"),
    )
    # coalesce: on a fully EMPTY input the sum is NULL, but the anchor
    # row's docstring contract is that n_excluded always reports — 0
    # must be distinguishable from a failed count (r12 ADVICE). In
    # grouped mode this anchors on the FULL group set (pre-filter).
    excluded = tagged.groupBy(*g).agg(
        F.coalesce(F.sum((~F.col("__ok")).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_excluded")
    )
    per_group = Window.partitionBy(*g)
    gap = F.abs(F.col("__avg_score") - F.col("__frac_pos"))
    total = F.sum("n").over(per_group).cast("double")
    ece = F.sum(gap * F.col("n").cast("double")).over(per_group) / total
    table = per_bin.select(
        *g,
        "bin",
        "n",
        rnd(F.col("__avg_score"), 6).alias("avg_score"),
        rnd(F.col("__frac_pos"), 6).alias("frac_pos"),
        rnd(gap, 6).alias("abs_gap"),
        rnd(ece, 6).alias("ece"),
    )
    # LEFT join from the exclusion anchor (null-safe on group cols, the
    # shared helper): with bins present this is the plain per-bin
    # fan-out; an all-excluded group degrades to one NULL-bin row that
    # still carries its n_excluded
    return _null_safe_join(excluded, table, g, [], how="left").select(
        *g,
        "bin",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        "avg_score",
        "frac_pos",
        "abs_gap",
        "ece",
        "n_excluded",
    )


def quantile_edges(
    base: DataFrame, value_col: str, bins_list: list[int]
) -> list[list[float] | None]:
    """Several quantile edge sets — ``1/n .. (n−1)/n`` EXACT
    percentiles (bit-identical to DuckDB ``quantile_cont``) for each
    ``n`` in ``bins_list`` — derived in ONE aggregate over ONE scan of
    the base (r13 review: the binned-KS monitor was paying two separate
    percentile jobs for its PSI and KS edge sets). Each entry is None
    when the base has no non-NULL values."""
    if not bins_list:
        raise ValueError("bins_list must be non-empty")
    for n in bins_list:
        if n < 2:
            raise ValueError(f"every n_bins must be >= 2, got {n}")
    v = F.col(value_col).cast("double")
    aggs = [
        F.percentile(
            F.col("__v"),
            F.array(*[F.lit(i / n) for i in range(1, n)]),
        ).alias(f"__e{j}")
        for j, n in enumerate(bins_list)
    ]
    row = (
        base.select(v.alias("__v"))
        .filter(F.col("__v").isNotNull())
        .agg(*aggs)
        .collect()[0]
    )
    return [
        list(row[f"__e{j}"]) if row[f"__e{j}"] is not None else None
        for j in range(len(bins_list))
    ]


def psi_edges(
    base: DataFrame, value_col: str, n_bins: int = 10
) -> list[float] | None:
    """The PSI bin edges: the base distribution's ``1/n_bins ..
    (n_bins−1)/n_bins`` EXACT percentiles (bit-identical to DuckDB
    ``quantile_cont``), or None when the base has no non-NULL values.
    Shared by ``psi_drift`` (its ``edges=None`` path) and the streaming
    monitor's once-per-stream precompute, so the two can never diverge
    on quantile convention or NULL handling. Defined as the one-set
    case of ``quantile_edges`` — one derivation to rule them all."""
    return quantile_edges(base, value_col, [n_bins])[0]


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    *,
    n_bins: int = 10,
    eps: float = 1e-6,
    edges: list[float] | None = None,
    include_raw: bool = False,
) -> DataFrame:
    """Population Stability Index between two continuous distributions
    over BASE-quantile bins — the third standard drift metric next to
    ``aggregates.mixture_drift`` (JS, categorical) and ``ks_drift``
    (KS, distribution-free): PSI weights WHERE the mass moved, which KS
    (a single max gap) deliberately ignores, and its banking-era rule
    of thumb (<0.1 stable / 0.1–0.25 shifting / >0.25 shifted) is what
    pipelines actually alert on.

    ``PSI = Σ_bins (q_i − p_i) · ln(q_i / p_i)`` with ``p`` the base
    share and ``q`` the current share per bin. Bin edges are the BASE
    distribution's ``1/n_bins .. (n_bins−1)/n_bins`` quantiles (exact
    ``percentile`` — bit-identical to DuckDB ``quantile_cont``, the
    ``outlier_iqr_per_group`` verification), so the base lands ~uniform
    by construction and every bin measures current-vs-expected mass.
    Empty-bin convention made EXPLICIT (the classic PSI pitfall —
    ln(0) is ±inf): both shares are floored at ``eps`` before the
    ratio, identically on both engines; duplicate quantile edges
    (discrete data) simply yield structurally-empty bins that the
    floor neutralizes. NULLs excluded per side.

    Scale shape: the edges come from ONE exact-percentile aggregate
    over the base (collected — n_bins−1 doubles, the same
    1-row-collect discipline as the k-means centroids and logreg
    weights, so the bin assignment compiles to ``n_bins−1`` codegen
    comparisons per row, no interpreted HOF, no broadcast join); each
    side then pays one map-side-combined count-per-bin aggregate, and
    the PSI arithmetic runs on ≤ ``n_bins`` rows. Two scans total
    (edges + counts) of the base, one of the current.

    Returns per bin (all ``n_bins`` rows, empty ones included):
    ``bin`` (0-based int), ``n_base``/``n_cur`` (bigint),
    ``p_share``/``q_share``/``psi_contrib``/``psi`` (6dp; ``psi``
    repeats the total on every row; ``include_raw=True`` appends the
    UNROUNDED ``__psi_raw`` for callers that THRESHOLD the total — the
    ``mixture_drift`` convention). Returns an empty frame only when
    the BASE has no non-NULL values (no quantile edges exist to bin
    against — the caller must treat that as "cannot measure", and the
    companion counts would be meaningless).

    ``edges`` supplies precomputed bin edges (``n_bins − 1`` ascending
    values) and skips the percentile pass entirely — the monitoring
    knob: a streaming caller derives the baseline's edges ONCE and
    every micro-batch pays only the two count-per-bin aggregates
    (``run_score_drift_monitor_stream``).
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    if edges is not None and len(edges) != n_bins - 1:
        raise ValueError(
            f"edges must have n_bins - 1 = {n_bins - 1} values, "
            f"got {len(edges)}"
        )
    v = F.col(value_col).cast("double")
    if edges is None:
        edges = psi_edges(base, value_col, n_bins)
    if edges is None:
        # schema must match the non-degenerate path exactly, including
        # the include_raw column (r12 review pass 3)
        schema = (
            "bin int, n_base long, n_cur long, p_share double, "
            "q_share double, psi_contrib double, psi double"
            + (", __psi_raw double" if include_raw else "")
        )
        return base.sparkSession.createDataFrame([], schema)

    def binned(df: DataFrame, side: str) -> DataFrame:
        b = F.lit(0)
        for e in edges:
            b = b + (v > F.lit(float(e))).cast("int")
        return (
            df.filter(v.isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias(side))
        )

    bins = base.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    counts = (
        bins.join(binned(base, "n_base"), "bin", "left")
        .join(binned(current, "n_cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    everything = Window.partitionBy()
    tb = F.sum("n_base").over(everything).cast("double")
    tc = F.sum("n_cur").over(everything).cast("double")
    p = F.greatest(F.try_divide(F.col("n_base"), tb), F.lit(eps))
    q = F.greatest(
        F.coalesce(F.try_divide(F.col("n_cur"), tc), F.lit(0.0)), F.lit(eps)
    )
    contrib = (q - p) * F.log(q / p)
    raw = (
        [F.sum(contrib).over(everything).alias("__psi_raw")]
        if include_raw
        else []
    )
    return counts.select(
        "bin",
        "n_base",
        "n_cur",
        rnd(p, 6).alias("p_share"),
        rnd(q, 6).alias("q_share"),
        rnd(contrib, 6).alias("psi_contrib"),
        rnd(F.sum(contrib).over(everything), 6).alias("psi"),
        *raw,
    )


def psi_group_edges(
    base: DataFrame, value_col: str, group_cols: list[str], n_bins: int = 10
) -> DataFrame:
    """Per-group PSI bin edges: one row per group with ``__edges``
    (``array<double>`` of the group's own ``1/n_bins ..
    (n_bins−1)/n_bins`` EXACT percentiles) — ONE grouped aggregate,
    fully distributed (never collected; the grouped dual of
    ``psi_edges``). Groups with no non-NULL values simply have no row
    (no edges exist to bin against). Shared by ``psi_drift_by_group``
    and the per-source streaming monitor's once-per-stream precompute,
    so the two can never diverge on quantile convention."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    probs = [i / n_bins for i in range(1, n_bins)]
    return (
        base.select(*g, v.alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy(*g)
        .agg(
            F.percentile(
                F.col("__v"), F.array(*[F.lit(p) for p in probs])
            ).alias("__edges")
        )
    )


def _bin_counts_from_per_value(
    per_value: DataFrame,
    g: list[str],
    edge_rows: DataFrame,
    count_cols: list[str],
) -> DataFrame:
    """THE one definition of the PSI bin assignment (``bin = Σ_edges
    (v > e)``) over an already-collapsed per-(group, ``__v``) frame
    carrying one or more count columns: the bounded fan-out join
    against exploded edge rows, then per-(group, bin) sums of every
    count column. Shared by ``psi_group_bin_counts`` (one side, one
    count) and ``psi_drift_by_group`` (both sides' counts in ONE pass —
    the r13 review restored the single-union plan the refactor had
    split into two collapses + two joins)."""
    binned = (
        _null_safe_join(per_value, edge_rows, g, [])
        .groupBy(*g, "__v", *count_cols)
        .agg(
            F.sum((F.col("__v") > F.col("__e")).cast("int"))
            .cast("int")
            .alias("bin")
        )
    )
    return binned.groupBy(*g, "bin").agg(
        *[F.sum(c).cast("long").alias(c) for c in count_cols]
    )


def psi_group_bin_counts(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    edge_rows: DataFrame,
) -> DataFrame:
    """One side's per-(group, bin) counts against precomputed exploded
    edge rows (``group cols..., __e`` — ``psi_group_edges`` output
    exploded): ``bin = Σ_edges (v > e)``, the exact ``psi_drift``
    binning convention. The side collapses to DISTINCT (group, value)
    rows map-side first, so the ≤ ``n_bins−1``-way fan-out join runs
    over distinct values only — pure codegen comparisons. Groups
    without edge rows drop (unmeasurable; the caller's anchor
    reinstates them). Returns (group cols..., ``bin`` int, ``n``
    bigint) for non-empty bins only."""
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    per_value = (
        df.select(*g, v.alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy(*g, "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    return _bin_counts_from_per_value(
        per_value, g, edge_rows, ["__c"]
    ).withColumnRenamed("__c", "n")


def psi_share_table(
    counts_full: DataFrame,
    group_cols: list[str],
    *,
    eps: float = 1e-6,
    include_raw: bool = False,
) -> DataFrame:
    """The PSI share/contribution arithmetic over a complete
    per-(group, bin) counts frame (columns: group cols, ``bin``,
    ``n_base``, ``n_cur``): eps-floored shares, per-bin contribution,
    and the per-group total repeated on every row — a window over
    ≤ n_bins rows per group. One definition shared by
    ``psi_drift_by_group`` and the per-source streaming monitor (which
    precomputes the base counts once and feeds per-batch current
    counts through this same arithmetic)."""
    g = list(group_cols)
    per_group = Window.partitionBy(*g)
    tb = F.sum("n_base").over(per_group).cast("double")
    tc = F.sum("n_cur").over(per_group).cast("double")
    p = F.greatest(F.try_divide(F.col("n_base"), tb), F.lit(eps))
    q = F.greatest(
        F.coalesce(F.try_divide(F.col("n_cur"), tc), F.lit(0.0)), F.lit(eps)
    )
    contrib = (q - p) * F.log(q / p)
    raw = (
        [F.sum(contrib).over(per_group).alias("__psi_raw")]
        if include_raw
        else []
    )
    return counts_full.select(
        *g,
        "bin",
        "n_base",
        "n_cur",
        rnd(p, 6).alias("p_share"),
        rnd(q, 6).alias("q_share"),
        rnd(contrib, 6).alias("psi_contrib"),
        rnd(F.sum(contrib).over(per_group), 6).alias("psi"),
        *raw,
    )


def psi_drift_by_group(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    n_bins: int = 10,
    eps: float = 1e-6,
    include_raw: bool = False,
) -> DataFrame:
    """PSI PER GROUP (round 13, completing the drift-per-source grain
    across all three drift metrics next to grouped ``ks_drift`` and
    keyed ``mixture_drift``): each group's bin edges are ITS OWN base
    distribution's ``1/n_bins .. (n_bins−1)/n_bins`` exact quantiles,
    so every group measures current-vs-expected mass against its own
    baseline — a global PSI near 0 can hide one source whose scores
    moved entirely. Same formula, eps floor, and binning convention as
    ``psi_drift`` (``bin = Σ_edges (v > e)``); a NULL group label is
    still a group.

    Scale shape — NOTHING collects to the driver (the global form's
    n_bins−1-double collect would become n_groups × that here):

    1. per-group edges via ONE grouped exact-``percentile`` aggregate
       over the base (n_groups rows, stays distributed);
    2. both sides collapse to distinct (group, value) counts map-side
       (one shuffle), then the bin index comes from a fan-out join
       against the ≤ ``n_bins−1`` exploded edge rows per group — pure
       codegen comparisons, no interpreted HOF, join amplification
       bounded by n_bins−1 on DISTINCT values only;
    3. per-(group, bin) subtotals; shares and the PSI total via a
       window over ≤ ``n_bins`` rows per group.

    Returns per group with a measurable base: ``n_bins`` rows (empty
    bins included) — group cols, ``bin``, ``n_base``/``n_cur``
    (bigint), ``p_share``/``q_share``/``psi_contrib``/``psi`` (6dp,
    ``psi`` repeated per group; ``include_raw=True`` appends the
    unrounded ``__psi_raw``). A group with NO non-NULL base values
    (including current-only groups) cannot be measured — it still
    reports ONE anchor row (NULL ``bin``, its true per-side counts,
    NULL shares/psi) instead of vanishing: a source that appears from
    nowhere or whose baseline went all-NULL is the loudest drift case
    (the ``ks_drift`` anchor posture).
    """
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty — use psi_drift for the "
            "global form"
        )
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    tagged = base.select(*g, v.alias("__v"), F.lit(1).alias("__b")).unionByName(
        current.select(*g, v.alias("__v"), F.lit(0).alias("__b"))
    )
    notnull = F.col("__v").isNotNull()
    # anchor: the PRE-filter group set with per-side non-NULL counts —
    # coalesced so zero-row groups (impossible) / all-NULL sides report 0
    totals = tagged.groupBy(*g).agg(
        F.coalesce(
            F.sum(F.when(notnull & (F.col("__b") == 1), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("__tot_base"),
        F.coalesce(
            F.sum(F.when(notnull & (F.col("__b") == 0), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("__tot_cur"),
    )
    # per-group edges: the SAME exact percentile as psi_edges/psi_drift,
    # grouped — distributed, never collected (shared helper, also the
    # streaming monitor's once-per-stream precompute)
    edges = psi_group_edges(base, value_col, g, n_bins)
    edge_rows = edges.select(*g, F.explode("__edges").alias("__e"))
    # bin = number of edges strictly below the value (the psi_drift
    # convention) — BOTH sides collapse in ONE pass over the tagged
    # union (one distinct-(group, value) shuffle carrying per-side
    # counts, one bounded fan-out join — the r13 review restored this
    # single-union plan; the shared _bin_counts_from_per_value keeps
    # the bin definition identical to the monitor's one-sided calls).
    # The inner edge join drops groups without edges, and the totals
    # anchor reinstates them as NULL-bin rows at the end.
    per_value = (
        tagged.filter(notnull)
        .groupBy(*g, "__v")
        .agg(
            F.sum("__b").cast("long").alias("__cb"),
            F.sum(F.lit(1) - F.col("__b")).cast("long").alias("__cc"),
        )
    )
    counts = _bin_counts_from_per_value(per_value, g, edge_rows, ["__cb", "__cc"])
    # full n_bins grid per MEASURABLE group (one with edges)
    grid = edges.select(*g).crossJoin(
        base.sparkSession.range(n_bins).select(
            F.col("id").cast("int").alias("bin")
        )
    )
    counts_full = _null_safe_join(grid, counts, g, ["bin"], how="left").select(
        *g,
        "bin",
        F.coalesce("__cb", F.lit(0)).cast("long").alias("n_base"),
        F.coalesce("__cc", F.lit(0)).cast("long").alias("n_cur"),
    )
    table = psi_share_table(counts_full, g, eps=eps, include_raw=include_raw)
    # reinstate unmeasurable groups (no base edges) from the anchor:
    # left join totals -> table keeps measurable groups' n_bins rows and
    # gives the rest ONE row with NULL bin/shares but true counts
    out = _null_safe_join(totals, table, g, [], how="left")
    raw_out = [F.col("__psi_raw")] if include_raw else []
    return out.select(
        *g,
        "bin",
        F.coalesce(F.col("n_base"), F.col("__tot_base"))
        .cast("long")
        .alias("n_base"),
        F.coalesce(F.col("n_cur"), F.col("__tot_cur"))
        .cast("long")
        .alias("n_cur"),
        "p_share",
        "q_share",
        "psi_contrib",
        "psi",
        *raw_out,
    )


def ks_drift(
    base: DataFrame,
    current: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    n_buckets: int = 1024,
    include_raw: bool = False,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic between two
    continuous distributions: ``D = max over observed x of
    |F_base(x) − F_cur(x)|`` — the continuous-score dual of
    ``aggregates.mixture_drift`` (JS needs categorical keys; KS needs
    none). NULL values are excluded per side (counted in the output).

    ``group_cols`` computes a D PER GROUP (e.g. per source — the grain
    a drift monitor actually alarms on: a global D near 0 can hide one
    source whose distribution moved entirely). A NULL group label is
    still a group (null-safe alignment throughout, the
    ``roc_auc_per_group`` posture); a group present on only ONE side
    reports that side's count, 0 for the other, and NULL ``d_stat`` (no
    second CDF exists — a fabricated 1.0 would pre-judge what the
    caller should decide).

    Scale shape — the empirical CDFs need cumulative counts over every
    distinct value, and a bare ``Window.orderBy(value)`` computes them
    in ONE task. Instead the classic two-level prefix sum, all
    DataFrame ops:

    1. per distinct (group, value), count rows on each side (one
       shuffle, map-side combined — cumulative state collapses to
       |distinct values| rows);
    2. assign each distinct value to one of ``n_buckets`` uniform
       buckets over that group's observed [min, max] (group-grain
       bounds frame joined back null-safely);
    3. per-(group, bucket) subtotals → bucket OFFSETS via a window
       partitioned by group over ≤ ``n_buckets`` rows (constant-size
       state per group; with no groups this is the only serial step);
    4. within-bucket cumulative counts via a window PARTITIONED BY
       (group, bucket) — parallel — plus the bucket offset.

    Uniform buckets only shape PARALLELISM (a skewed distribution
    crowds some buckets); the statistic is exact regardless. Degenerate
    inputs (an empty side, or every value identical so max == min)
    collapse to the single-bucket path and stay correct.

    Returns one row per group (ONE row total without ``group_cols``):
    ``n_base``, ``n_cur`` (bigint), ``d_stat`` (6dp) — NULL when either
    side has no non-NULL values. The group anchor is the PRE-filter
    frame, so a group whose values are ALL NULL still reports (0, 0,
    NULL) instead of vanishing — a scoring pass that starts emitting
    NULLs for one source is the most alarming drift case, not an
    invisible one (r12 review #2). ``include_raw=True`` appends
    ``__d_raw`` (the UNROUNDED statistic) for callers that THRESHOLD
    the value — comparing the 6dp column can flip an alert within
    5e-7 of the cutoff (the ``mixture_drift`` convention).
    """
    from functools import reduce

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    g = list(group_cols or [])
    v = F.col(value_col).cast("double")
    tagged = base.select(*g, v.alias("__v"), F.lit(1).alias("__b")).unionByName(
        current.select(*g, v.alias("__v"), F.lit(0).alias("__b"))
    )
    per_value = (
        tagged.filter(F.col("__v").isNotNull())
        .groupBy(*g, "__v")
        .agg(
            F.sum("__b").cast("long").alias("__cb"),
            F.sum(F.lit(1) - F.col("__b")).cast("long").alias("__cc"),
        )
    )

    def null_safe(left: DataFrame, right: DataFrame, extra: list[str]):
        # one shared definition with roc_auc_per_group — see module helper
        return _null_safe_join(left, right, g, extra)

    bounds = per_value.groupBy(*g).agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi")
    )
    with_bucket = null_safe(per_value, bounds, []).select(
        *g,
        "__v",
        "__cb",
        "__cc",
        F.when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.floor(
                    (F.col("__v") - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * n_buckets
                ).cast("int"),
                F.lit(n_buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .alias("__bk"),
    )
    bucket_totals = with_bucket.groupBy(*g, "__bk").agg(
        F.sum("__cb").alias("__tb"), F.sum("__cc").alias("__tc")
    )
    woff = (
        Window.partitionBy(*g)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if g
        else Window.orderBy("__bk").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    offsets = bucket_totals.select(
        *g,
        "__bk",
        (F.sum("__tb").over(woff) - F.col("__tb")).alias("__ob"),
        (F.sum("__tc").over(woff) - F.col("__tc")).alias("__oc"),
    )
    win = Window.partitionBy(*g, "__bk").orderBy("__v")
    cum = null_safe(with_bucket, offsets, ["__bk"]).select(
        *g,
        (F.sum("__cb").over(win) + F.col("__ob")).alias("__cum_b"),
        (F.sum("__cc").over(win) + F.col("__oc")).alias("__cum_c"),
    )
    # totals anchor on the PRE-NULL-filter frame: every group that has
    # ROWS reports, even when all its values are NULL on both sides
    notnull = F.col("__v").isNotNull()
    # coalesce: a global aggregate over ZERO rows (both inputs empty)
    # yields NULL sums — counts must still report 0 (r12 review pass 3)
    totals = tagged.groupBy(*g).agg(
        F.coalesce(
            F.sum(F.when(notnull & (F.col("__b") == 1), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_base"),
        F.coalesce(
            F.sum(F.when(notnull & (F.col("__b") == 0), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_cur"),
    )
    d = null_safe(cum, totals, []).groupBy(*g).agg(
        F.max(
            F.abs(
                F.try_divide(F.col("__cum_b").cast("double"), F.col("n_base"))
                - F.try_divide(F.col("__cum_c").cast("double"), F.col("n_cur"))
            )
        ).alias("__d")
    )
    raw = [F.col("__d").alias("__d_raw")] if include_raw else []
    if not g:
        # global: totals is one row even on an all-NULL/empty input — it
        # anchors the output so counts always report
        return totals.crossJoin(F.broadcast(d)).select(
            "n_base", "n_cur", rnd(F.col("__d"), 6).alias("d_stat"), *raw
        )
    # grouped: totals is the full group set (anchor); a group whose D
    # never materialized (one-sided or all-NULL) gets NULL via the
    # left join
    out = totals.join(
        d.select(
            *[F.col(c).alias(f"__g{i}") for i, c in enumerate(g)], "__d"
        ),
        reduce(
            lambda a, b: a & b,
            [F.col(c).eqNullSafe(F.col(f"__g{i}")) for i, c in enumerate(g)],
        ),
        "left",
    ).drop(*[f"__g{i}" for i in range(len(g))])
    return out.select(
        *g, "n_base", "n_cur", rnd(F.col("__d"), 6).alias("d_stat"), *raw
    )


def cdf_at_edges(
    df: DataFrame, value_col: str, edges: list[float]
) -> list[float]:
    """The empirical CDF of ``value_col`` evaluated at each edge —
    ``F(e) = count(v <= e) / count(v)`` over non-NULL values — as a
    plain Python list (one map-side-combined aggregate collected to
    ``len(edges)`` doubles, the same bounded-collect discipline as
    ``psi_edges``). Raises when the frame has no non-NULL values: no
    CDF exists, and a silent all-zeros answer would read as "everything
    sits above every edge".

    The precompute half of the binned-KS tier (``ks_binned``): a
    streaming monitor derives the BASELINE's edge CDF once, then every
    micro-batch pays only its own edge CDF — never re-aggregating the
    baseline multiset (r12 VERDICT #4)."""
    if not edges:
        raise ValueError("edges must be non-empty")
    if sorted(edges) != list(edges):
        raise ValueError("edges must be ascending")
    v = F.col(value_col).cast("double")
    row = (
        df.filter(v.isNotNull())
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum((v <= F.lit(float(e))).cast("long")).alias(f"__c{i}")
                for i, e in enumerate(edges)
            ],
        )
        .collect()[0]
    )
    if row["__n"] == 0:
        raise ValueError(
            f"{value_col!r} has no non-NULL values — no CDF exists"
        )
    n = float(row["__n"])
    return [row[f"__c{i}"] / n for i in range(len(edges))]


def ks_binned(
    current: DataFrame,
    value_col: str,
    edges: list[float],
    base_cdf: list[float],
    *,
    include_raw: bool = False,
) -> DataFrame:
    """APPROXIMATE two-sample KS against a PRE-BINNED baseline:
    ``D_binned = max over edges e of |F_base(e) − F_cur(e)|`` with the
    baseline's edge CDF supplied precomputed (``cdf_at_edges``) — the
    constant-per-batch dual of the exact ``ks_drift`` for high-rate
    monitors (r12 VERDICT #4): the current side pays ONE
    map-side-combined aggregate (``len(edges)`` codegen comparisons per
    row), and the baseline is never touched.

    Approximation bound (docstring contract, pinned by
    ``tests/test_staged_eval_queries.py``): evaluating the CDF gap only
    at the edges can only UNDERestimate —

        D_binned <= D_exact <= D_binned + max_i max(p_i, q_i)

    where ``p_i`` / ``q_i`` are the two distributions' bin masses (for
    x inside bin i, ``F_b(x) − F_c(x) <= gap(e_i) + q_i`` and
    ``F_c(x) − F_b(x) <= gap(e_i) + p_i``). With edges at the
    baseline's K-quantiles, ``p_i ≈ 1/K`` by construction, so K = 100
    bounds the baseline-side error at ~0.01; a current batch
    concentrated inside one bin widens ``q_i`` — callers alerting on
    hair-trigger thresholds should keep the exact tier.

    NULL values in ``current`` are excluded. Returns ONE row:
    ``n_cur`` (bigint), ``d_stat`` (6dp; NULL when the current side has
    no non-NULL values — a fabricated 0 would hide a scorer emitting
    only NULLs); ``include_raw=True`` appends the unrounded ``__d_raw``
    (the ``mixture_drift`` thresholding convention)."""
    if len(base_cdf) != len(edges):
        raise ValueError(
            f"base_cdf must align with edges: {len(base_cdf)} != {len(edges)}"
        )
    if not edges:
        raise ValueError("edges must be non-empty")
    if sorted(edges) != list(edges):
        raise ValueError("edges must be ascending")
    v = F.col(value_col).cast("double")
    agg = current.filter(v.isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_cur"),
        *[
            F.sum((v <= F.lit(float(e))).cast("long")).alias(f"__c{i}")
            for i, e in enumerate(edges)
        ],
    )
    gaps = [
        F.abs(
            F.lit(float(base_cdf[i]))
            - F.try_divide(
                F.col(f"__c{i}").cast("double"), F.col("n_cur").cast("double")
            )
        )
        for i in range(len(edges))
    ]
    d = gaps[0] if len(gaps) == 1 else F.greatest(*gaps)
    raw = [d.alias("__d_raw")] if include_raw else []
    return agg.select(
        F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
        rnd(d, 6).alias("d_stat"),
        *raw,
    )


def ks_binned_from_counts(
    counts_full: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Per-group BINNED two-sample KS from a complete per-(group, bin)
    counts frame (columns: group cols, ``bin``, ``n_base``, ``n_cur`` —
    the exact frame ``psi_drift_by_group`` and the per-source monitor
    already build): ``D_binned = max_j |F_base(edge_j) − F_cur(edge_j)|``
    computed as the running-share gap over the ordered bins — a window
    over ≤ n_bins rows per group, nothing else. With the bins on the
    group's own base quantiles this is ``ks_binned``'s statistic at the
    group grain, carrying the same bound
    (``D_binned <= D_exact <= D_binned + max bin mass``, ~1/n_bins
    base-side by quantile construction).

    Returns one row per group: group cols, ``d_binned`` (6dp),
    ``__d_binned_raw`` (unrounded, the thresholding column — always
    included; this is an internal composition helper). A group whose
    current side is empty reports NULL (no CDF exists — the ``ks_drift``
    posture). Shares here are RAW (no eps floor — the floor is a PSI
    log-guard, not a CDF concept)."""
    g = list(group_cols)
    w = (
        Window.partitionBy(*g)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_group = Window.partitionBy(*g)
    tb = F.sum("n_base").over(per_group).cast("double")
    tc = F.sum("n_cur").over(per_group).cast("double")
    gap = F.abs(
        F.try_divide(F.sum("n_base").over(w).cast("double"), tb)
        - F.try_divide(F.sum("n_cur").over(w).cast("double"), tc)
    )
    d = counts_full.select(*g, gap.alias("__gap")).groupBy(*g).agg(
        F.max("__gap").alias("__d_binned_raw")
    )
    return d.select(
        *g,
        rnd(F.col("__d_binned_raw"), 6).alias("d_binned"),
        "__d_binned_raw",
    )


def score_quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    out_col: str = "pct_rank",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-group AVERAGE-RANK quantile normalization:
    ``pct = (avg_rank − 0.5) / N`` in (0, 1) — the standard fix before
    mixing classifier scores across heterogeneous sources (one source's
    0.8 is another's 0.5; a shared keep-threshold only means the same
    thing after each source's scores map onto its own rank scale).
    Average ranks on ties (the ``roc_auc_per_group`` convention, so a
    tied block maps to one value and the output is permutation-
    invariant); ``group_cols=[]`` normalizes globally.

    NULL values pass through with a NULL ``out_col`` (they have no rank
    — silently assigning 0 or 1 would smuggle them past a threshold).
    Every other input column rides along unchanged.

    Scale shape: the same two-level bucketed prefix sum as
    ``roc_auc_per_group`` computes per-(group, distinct-value)
    cumulative counts — no window ever sorts a whole group — and the
    per-ROW output comes from ONE (group, value)-keyed join back of the
    distinct-value mapping (|distinct values| rows), never a per-row
    window. ``n_buckets`` shapes parallelism only (bucket-invariance:
    the mapping is a pure function of the per-value counts).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} already exists in the input")
    # the pass-everything-through contract means internal temp names can
    # collide with user columns — refuse loudly instead of silently
    # clobbering __v / breaking on an ambiguous __pct (r13 review #4)
    reserved = {"__v", "__pct"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input columns collide with reserved temp names: "
            f"{sorted(reserved)} — rename them first"
        )
    g = list(group_cols)
    v = F.col(value_col).cast("double")
    tagged = df.withColumn("__v", v)
    per_value = (
        tagged.filter(F.col("__v").isNotNull())
        .groupBy(*g, "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__nb"))
    )
    bounds = per_value.groupBy(*g).agg(
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
        F.sum("__nb").alias("__N"),
    )
    with_bucket = _null_safe_join(per_value, bounds, g, []).select(
        *g,
        "__v",
        "__nb",
        "__N",
        F.when(
            F.col("__hi") > F.col("__lo"),
            F.least(
                F.floor(
                    (F.col("__v") - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * n_buckets
                ).cast("int"),
                F.lit(n_buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .alias("__bk"),
    )
    bucket_totals = with_bucket.groupBy(*g, "__bk").agg(
        F.sum("__nb").alias("__tb")
    )
    woff = (
        Window.partitionBy(*g)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if g
        else Window.orderBy("__bk").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    offsets = bucket_totals.select(
        *g,
        "__bk",
        (F.sum("__tb").over(woff) - F.col("__tb")).alias("__ob"),
    )
    win = Window.partitionBy(*g, "__bk").orderBy("__v")
    avg_rank = (
        F.sum("__nb").over(win)
        + F.col("__ob")
        - F.col("__nb")
        + (F.col("__nb").cast("double") + F.lit(1.0)) / F.lit(2.0)
    )
    mapping = _null_safe_join(with_bucket, offsets, g, ["__bk"]).select(
        *g,
        "__v",
        (
            (avg_rank - F.lit(0.5)) / F.col("__N").cast("double")
        ).alias("__pct"),
    )
    # the join-back's right side is the |distinct values| mapping —
    # UNBOUNDED, so global mode must NOT broadcast it (r13 review #1):
    # with g=[] the __v equality alone drives a plain shuffle equi-join
    out = _null_safe_join(
        tagged, mapping, g, ["__v"], how="left", broadcast_global=False
    )
    return out.withColumn(out_col, rnd(F.col("__pct"), 6)).drop(
        "__v", "__pct"
    )
