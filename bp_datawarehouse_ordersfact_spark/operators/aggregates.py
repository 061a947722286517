"""Aggregation operators (reference §2.5 A1–A12).

Spark's hash aggregate already does map-side partial aggregation
(`partial_sum` → shuffle → `sum`), which is the distributed version of
what the reference can't do at all. The helpers here keep the rollup
shapes declarative."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_sum(df: DataFrame, keys: list[str], measures: dict[str, Column]) -> DataFrame:
    """A4–A10 shape: N-key group-by with named summed measures."""
    return df.groupBy(*keys).agg(
        *[F.sum(expr).alias(name) for name, expr in measures.items()]
    )


def null_audit(df: DataFrame) -> DataFrame:
    """A12 (``dw5_order_royalty_fact.py:723``): per-column null counts,
    as a single-row frame (one pass, map-side combinable)."""
    return df.select(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    )


def group_sizes(df: DataFrame, keys: list[str]) -> DataFrame:
    """A2/A3/A11: group cardinality probe."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profiler (the Deequ/TFDV-style stats table a
    pipeline snapshots before training): one row per profiled column
    with count, null fraction, min, max, mean, stddev, and approximate
    p50/p95 — ALL columns in a SINGLE aggregation (no per-column scans;
    at 100 TB the difference between 1 pass and len(cols) passes is the
    whole job). Floats 6dp-rounded for engine-stable snapshots."""
    if not cols:
        raise ValueError("cols must be non-empty")
    from ..functions.rounding import rnd

    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).cast("long").alias(f"{c}__n"),
            rnd(
                F.coalesce(
                    F.sum(F.when(col.isNull(), 1).otherwise(0))
                    / F.count(F.lit(1)),
                    F.lit(0.0),
                ),
                6,
            ).alias(f"{c}__null_frac"),
            rnd(F.min(col), 6).alias(f"{c}__min"),
            rnd(F.max(col), 6).alias(f"{c}__max"),
            rnd(F.avg(col), 6).alias(f"{c}__mean"),
            rnd(F.coalesce(F.stddev_samp(col), F.lit(0.0)), 6).alias(f"{c}__std"),
            rnd(F.percentile_approx(col, 0.5), 6).alias(f"{c}__p50"),
            rnd(F.percentile_approx(col, 0.95), 6).alias(f"{c}__p95"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single wide row into one tidy row per column
    stats = ["n", "null_frac", "min", "max", "mean", "std", "p50", "p95"]
    pairs = [
        F.struct(
            F.lit(c).alias("column"),
            *[F.col(f"{c}__{s}").cast("double").alias(s) for s in stats],
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*pairs)).alias("p")).select(
        "p.column", *[F.col(f"p.{s}") for s in stats]
    )


def profile_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    group_cols: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """One-pass EMBEDDING-column audit — the vector counterpart of
    ``profile_numeric``, and the gate a pipeline runs before handing a
    corpus to the ANN/PQ/SemDeDup tier (every one of which degrades
    silently on exactly the pathologies this reports):

    - ``n_null`` / ``null_frac`` — rows the downstream operators will
      route to their kept-with-NULLs paths;
    - ``n_dims_distinct`` / ``dim_min`` / ``dim_max`` — RAGGED
      dimensionality (n_dims_distinct > 1 means subspace splits and
      zip_with folds are comparing different-length vectors: fail the
      batch, don't train on it);
    - ``n_zero_norm`` / ``zero_norm_frac`` — vectors with undefined
      cosine (the r13 ADVICE #1 class: they can win no argmax and must
      be kept unjudged, so their rate is a data-quality signal);
    - ``n_nonfinite`` / ``nonfinite_frac`` — vectors carrying NaN/Inf
      elements (a NaN poisons every dot product it touches);
    - ``norm_mean`` / ``norm_p50`` / ``norm_p95`` — the L2-norm
      profile over CLEAN vectors only (finite, nonzero), the drift
      signal for an embedding-model swap (norm distributions shift
      before cosine neighborhoods do).

    One aggregation pass; all derivations are per-row map-side
    (size / exists / the double-precision dot fold), so the corpus
    never shuffles — the ``profile_numeric`` discipline. ``exact``
    picks the percentile tier exactly as ``corpus_stats_report`` does:
    the scale default is ``percentile_approx``; ``exact=True`` swaps
    in interpolated ``percentile`` for cross-engine verification
    twins. Floats 6dp-rounded for engine-stable snapshots.

    ``group_cols`` runs the audit at the GROUP grain (one row per
    group, every rate over the group's own denominator) — the r13
    evaluation-layer convention: the grain a real pipeline ships at is
    per-source/per-language, and a pathology concentrated in one
    source drowns in the corpus-wide rate (a 2% global zero-norm rate
    can be one source at 100%). Same single aggregation; the group key
    just keys the shuffle. NULL group labels are groups (groupBy keeps
    them), matching `_null_safe_join`'s alignment rule."""
    from ..functions import vectors as V
    from ..functions.rounding import rnd

    vec = F.col(vec_col)
    dim = F.when(vec.isNotNull(), F.size(vec))
    nonfinite = F.when(
        vec.isNotNull(),
        F.exists(
            vec,
            lambda x: F.isnan(x.cast("double"))
            | (F.abs(x.cast("double")) == F.lit(float("inf"))),
        ),
    )
    norm2 = F.when(vec.isNotNull() & ~F.coalesce(nonfinite, F.lit(False)),
                   V.dot(vec, vec))
    zero_norm = F.when(norm2.isNotNull(), norm2 == F.lit(0.0))
    clean_norm = F.when(
        F.coalesce(zero_norm, F.lit(True)) == F.lit(False), F.sqrt(norm2)
    )
    pctl = F.percentile if exact else F.percentile_approx
    n = F.count(F.lit(1))
    g = list(group_cols or [])
    derived = df.select(
        *g,
        dim.alias("__dim"),
        nonfinite.alias("__nf"),
        zero_norm.alias("__zn"),
        clean_norm.alias("__norm"),
    )
    grouped = derived.groupBy(*g) if g else derived
    row = grouped.agg(
        n.cast("long").alias("n_rows"),
        # empty-input sums coalesce to 0 (the r12 ADVICE class: SUM over
        # zero rows is NULL, and a NULL count reads as "unchecked")
        F.coalesce(
            F.sum(F.when(F.col("__dim").isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_null"),
        F.count_distinct(F.col("__dim")).cast("long").alias("n_dims_distinct"),
        F.min("__dim").cast("long").alias("dim_min"),
        F.max("__dim").cast("long").alias("dim_max"),
        F.coalesce(F.sum(F.when(F.col("__zn"), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_zero_norm"),
        F.coalesce(F.sum(F.when(F.col("__nf"), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_nonfinite"),
        rnd(F.avg("__norm"), 6).alias("norm_mean"),
        rnd(pctl(F.col("__norm"), F.lit(0.5)), 6).alias("norm_p50"),
        rnd(pctl(F.col("__norm"), F.lit(0.95)), 6).alias("norm_p95"),
    )
    total = F.col("n_rows").cast("double")
    frac = lambda c: rnd(
        F.when(total > 0, F.col(c) / total).otherwise(F.lit(0.0)), 6
    )  # noqa: E731
    return row.select(
        *g,
        "n_rows",
        "n_null",
        frac("n_null").alias("null_frac"),
        "n_dims_distinct",
        "dim_min",
        "dim_max",
        "n_zero_norm",
        frac("n_zero_norm").alias("zero_norm_frac"),
        "n_nonfinite",
        frac("n_nonfinite").alias("nonfinite_frac"),
        "norm_mean",
        "norm_p50",
        "norm_p95",
    )


def corpus_stats_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """The DATASET-CARD stats table for a text corpus, in ONE
    aggregation pass: per ``source_col`` stratum plus an all-corpus
    rollup row (``source`` NULL), each with document count, char and
    whitespace-token totals, char-length mean/p50/p95, and an
    exact-duplicate rate (1 − distinct(md5(text)) / n).

    ``exact`` picks the estimator tier for the two sketch columns —
    the SCALE path (default) uses ``percentile_approx`` + HLL
    ``approx_count_distinct`` (the corpus never shuffles by text, ~2%
    HLL error, clamped at 0); ``exact=True`` swaps in interpolated
    ``percentile`` and exact ``count_distinct`` — cross-engine
    reproducible (a DuckDB ``quantile_cont`` / ``count(DISTINCT ...)``
    twin matches to 6dp), the VERIFICATION tier for driver rows and
    snapshot audits. Column names are identical either way
    (``approx_dup_rate`` keeps its name — it records the REPORT's
    field, not the estimator), so downstream card renderers don't fork.
    The approx tier is pinned within tolerance of the exact tier in
    tests/test_operators.py.

    The default (sketch) tier is ONE map-side-combinable aggregate over
    one ``rollup`` shuffle whose key cardinality is the number of
    sources — the report over 100 TB costs one corpus scan, same as
    ``profile_numeric``. ``exact=True`` aggregates the duplicate-rate
    ``count_distinct`` SEPARATELY from the percentile pair and joins
    the two (sources+1)-row rollups on (grouping_id, key): mixing the
    distinct with the exact percentiles forced the whole rollup
    through RewriteDistinctAggregates' Expand as a four-stage
    ObjectHashAggregate chain, carrying the percentile buffers through
    every stage and both exchanges (the ``sketch_approx_stats``
    pathology — measured ~4x there). Floats 6dp-rounded for
    engine-stable snapshots."""
    from ..functions.rounding import rnd
    from ..functions.text import tokens

    text = F.col(text_col)
    n = F.count(F.lit(1))
    src = (
        F.col(source_col)
        if source_col is not None
        else F.lit(None).cast("string")
    )
    sel = df.select(
        src.alias("source"),
        text.alias("_t"),
        F.length(text).alias("_chars"),
        F.size(tokens(text)).alias("_toks"),
    )
    gcol = "source" if source_col is not None else "_g"

    def _rollup(d: DataFrame):
        return d.rollup(
            "source" if source_col is not None else F.lit(1).alias("_g")
        )

    chars_d = F.col("_chars").cast("double")
    if exact:
        p50 = F.percentile(chars_d, F.lit(0.5))
        p95 = F.percentile(chars_d, F.lit(0.95))
    else:
        p50 = F.percentile_approx(chars_d, 0.5)
        p95 = F.percentile_approx(chars_d, 0.95)
    if exact:
        main = _rollup(sel).agg(
            F.grouping_id().alias("__gid"),
            n.cast("long").alias("n_docs"),
            F.sum("_chars").cast("long").alias("n_chars"),
            F.sum("_toks").cast("long").alias("n_tokens"),
            rnd(F.avg("_chars"), 6).alias("chars_mean"),
            rnd(p50, 6).alias("chars_p50"),
            rnd(p95, 6).alias("chars_p95"),
        )
        dup = _rollup(sel).agg(
            F.grouping_id().alias("__gid"),
            F.count_distinct(F.md5("_t")).alias("__ndist"),
        )
        m, d2 = main.alias("__csm"), dup.alias("__csd")
        out = m.join(
            d2,
            (F.col("__csm.__gid") == F.col("__csd.__gid"))
            & F.col(f"__csm.{gcol}").eqNullSafe(F.col(f"__csd.{gcol}")),
        ).select(
            F.col(f"__csm.{gcol}").alias(gcol),
            F.col("__csm.n_docs").alias("n_docs"),
            F.col("__csm.n_chars").alias("n_chars"),
            F.col("__csm.n_tokens").alias("n_tokens"),
            F.col("__csm.chars_mean").alias("chars_mean"),
            F.col("__csm.chars_p50").alias("chars_p50"),
            F.col("__csm.chars_p95").alias("chars_p95"),
            rnd(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0) - F.col("__csd.__ndist") / F.col("__csm.n_docs"),
                ),
                6,
            ).alias("approx_dup_rate"),
        )
    else:
        out = _rollup(sel).agg(
            n.cast("long").alias("n_docs"),
            F.sum("_chars").cast("long").alias("n_chars"),
            F.sum("_toks").cast("long").alias("n_tokens"),
            rnd(F.avg("_chars"), 6).alias("chars_mean"),
            rnd(p50, 6).alias("chars_p50"),
            rnd(p95, 6).alias("chars_p95"),
            rnd(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0) - F.approx_count_distinct(F.md5("_t")) / n,
                ),
                6,
            ).alias("approx_dup_rate"),
        )
    if source_col is None:
        # single-stratum corpus: the rollup's grand-total row IS the
        # report; drop the synthetic grouping column and the per-group twin
        return out.filter(F.col("_g").isNull()).drop("_g").withColumn(
            "source", F.lit(None).cast("string")
        ).select(
            "source", "n_docs", "n_chars", "n_tokens",
            "chars_mean", "chars_p50", "chars_p95", "approx_dup_rate",
        )
    return out


def outlier_iqr_per_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    fence_k: float = 1.5,
    exact: bool = True,
    broadcast_stats: bool | None = None,
    max_broadcast_groups: int = 4_000_000,
) -> DataFrame:
    """Per-group robust (Tukey-fence) outlier audit — the data-quality
    step between ``null_audit`` (missingness) and ``profile_numeric``
    (moments): moments are themselves corrupted by the outliers they
    would flag, so the fences come from quartiles, which are not.

    Per distinct ``group_cols`` value — NULL group labels included
    (the join-back is null-safe; an audit that silently dropped the
    unlabeled rows would hide exactly the data it exists to surface):
    ``n`` (non-NULL values), ``q1``/``q3`` (2dp), and ``n_low``/
    ``n_high`` — values strictly outside ``[q1 - fence_k·iqr,
    q3 + fence_k·iqr]``. NULL VALUES count in neither ``n_low`` nor
    ``n_high`` (missingness is ``null_audit``'s job).

    Two-pass by necessity (the fences must exist before rows can be
    judged), but both passes aggregate on the SAME group key: pass 1
    reduces to one stats row per group, which joins back onto pass 2.
    ``broadcast_stats`` controls the join-back strategy (the
    ``bigram_logprob`` switchable pattern — an r11 review flagged the
    original unconditional broadcast as an OOM-by-construction at high
    group cardinality, e.g. per-user fences over 10^9 users): ``True``
    forces the broadcast (stats land on pass 2's map side — the detail
    rows shuffle once, never twice), ``False`` uses a shuffled
    null-safe equi-join (AQE still converts to broadcast at runtime
    when the measured size allows), and the default ``None`` probes the
    group count once (capped at ``max_broadcast_groups + 1`` — the
    probe re-runs pass 1's aggregate, paid only in auto mode) and
    broadcasts iff it fits under ``max_broadcast_groups``.

    ``exact=True`` uses ``percentile`` (exact sort-based; right at audit
    scale and for the cross-engine driver row — DuckDB's
    ``quantile_cont`` is bit-identical linear interpolation).
    ``exact=False`` swaps in ``percentile_approx`` (KLL-style bounded
    memory): at 100 TB a single group's values need not fit a task, and
    an audit's fences don't need the exact tie-break.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if fence_k <= 0:
        raise ValueError(f"fence_k must be > 0, got {fence_k}")
    from ..functions.rounding import rnd

    v = F.col(value_col).cast("double")
    # DSL percentile functions, never an F.expr with the user's column
    # name interpolated into SQL (quoting hazard — same class as the
    # bloom_prefilter review fix)
    if exact:
        q1_agg = F.percentile(F.col(value_col), F.lit(0.25))
        q3_agg = F.percentile(F.col(value_col), F.lit(0.75))
    else:
        q1_agg = F.percentile_approx(F.col(value_col), 0.25)
        q3_agg = F.percentile_approx(F.col(value_col), 0.75)
    stats = df.groupBy(*group_cols).agg(
        q1_agg.alias("__q1"), q3_agg.alias("__q3")
    )
    iqr = F.col("__q3") - F.col("__q1")
    lo = F.col("__q1") - F.lit(fence_k) * iqr
    hi = F.col("__q3") + F.lit(fence_k) * iqr
    # null-SAFE join back: a NULL group label is still a group (an
    # audit that silently drops the unlabeled rows would hide exactly
    # the data it exists to surface), and a plain equi-join would
    # never match pass 1's NULL-keyed stats row
    st = stats.select(
        *[F.col(c).alias(f"__g{i}") for i, c in enumerate(group_cols)],
        "__q1",
        "__q3",
    )
    cond = F.lit(True)
    for i, c in enumerate(group_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__g{i}"))
    if broadcast_stats is None:
        # bounded probe: never counts past the knob, so the decision
        # job is O(min(|groups|, knob)) stats rows however many groups
        broadcast_stats = (
            st.limit(max_broadcast_groups + 1).count() <= max_broadcast_groups
        )
    hint = F.broadcast if broadcast_stats else (lambda d: d)
    return (
        df.join(hint(st), cond)
        .groupBy(*group_cols)
        .agg(
            F.count(v).cast("long").alias("n"),
            rnd(F.first("__q1"), 2).alias("q1"),
            rnd(F.first("__q3"), 2).alias("q3"),
            F.sum(F.when(v < lo, 1).otherwise(0)).cast("long").alias("n_low"),
            F.sum(F.when(v > hi, 1).otherwise(0)).cast("long").alias("n_high"),
        )
    )


def mixture_drift(
    base: DataFrame,
    current: DataFrame,
    *,
    key_col: str,
    weight_col: str | None = None,
    include_raw: bool = False,
) -> DataFrame:
    """Corpus-mixture drift monitor: per ``key_col`` value, the share of
    the baseline snapshot vs the current one and that key's contribution
    to the Jensen–Shannon divergence between the two mixtures (natural
    log, so the total ranges [0, ln 2]) — the standard data-drift alarm
    a training pipeline runs before a refreshed corpus is allowed to
    replace the one the last model saw. JS rather than KL because a key
    present in only ONE snapshot (new source appearing, old source
    vanishing) must contribute a FINITE penalty, not ±inf.

    ``weight_col`` weighs rows (e.g. token counts or FRACTIONAL quality
    weights — sums run in double, never truncated); ``None`` counts
    rows. Keys absent from a side get share 0 there (the 0·ln(0/m)
    limit term is 0 by definition — the CASE guard, identical on both
    engines). A NULL key is still a key: the snapshot alignment is
    null-safe, so an unchanged unlabeled-source mass can never split
    into two phantom one-sided rows and fire the alarm. An EMPTY
    snapshot contributes zero shares everywhere (every key goes
    one-sided; the total stays finite at 0.5·ln 2) rather than
    NULL-poisoning the report through a 0/0.

    Scale shape: each snapshot reduces via ONE map-side-combined
    aggregate to a rows-per-key frame; the full-outer join, window
    totals, and JS arithmetic all run on those tiny frames — nothing
    after the two aggregates scales with the corpus.

    Returns per key: ``n_base``/``n_cur`` (weight sums, 6dp doubles —
    exact integers for count/integer-weight inputs), ``p_share``/
    ``q_share`` and ``js_contrib`` (6dp). ``sum(js_contrib)`` is the
    corpus-level divergence; alert thresholds are the caller's policy.
    ``include_raw=True`` appends ``__js_contrib_raw`` (UNROUNDED) for
    callers that threshold the TOTAL — summing the 6dp column drifts
    from the true divergence by up to ~5e-7 per key, which at high key
    cardinality can flip an alert comparison (ADVICE r11); the
    streaming monitor sums the raw column and reports the rounded one.
    """
    from ..functions.rounding import rnd

    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1).cast("double")
    )

    def side(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy(F.col(key_col).alias("key")).agg(
            F.sum(w).alias(out)
        )

    b = side(base, "n_base")
    c = side(current, "n_cur").withColumnRenamed("key", "__ckey")
    joined = b.join(
        c, F.col("key").eqNullSafe(F.col("__ckey")), "full_outer"
    ).select(
        F.coalesce(F.col("key"), F.col("__ckey")).alias("key"),
        F.coalesce("n_base", F.lit(0.0)).alias("n_base"),
        F.coalesce("n_cur", F.lit(0.0)).alias("n_cur"),
    )
    from pyspark.sql import Window

    everything = Window.partitionBy()
    tb = F.sum("n_base").over(everything)
    tc = F.sum("n_cur").over(everything)
    p = F.when(tb > 0, F.col("n_base") / tb).otherwise(F.lit(0.0))
    q = F.when(tc > 0, F.col("n_cur") / tc).otherwise(F.lit(0.0))
    m = (p + q) / F.lit(2.0)
    contrib = F.lit(0.5) * F.when(p > 0, p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.lit(0.5) * F.when(q > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    out_cols = [
        F.col("key"),
        rnd(F.col("n_base"), 6).alias("n_base"),
        rnd(F.col("n_cur"), 6).alias("n_cur"),
        rnd(p, 6).alias("p_share"),
        rnd(q, 6).alias("q_share"),
        rnd(contrib, 6).alias("js_contrib"),
    ]
    if include_raw:
        out_cols.append(contrib.alias("__js_contrib_raw"))
    return joined.select(*out_cols)


def corr_matrix(
    df: DataFrame, cols: list[str], *, pairs_per_pass: int = 512
) -> DataFrame:
    """Pairwise Pearson correlation over ``cols`` in ONE aggregation
    pass — the profiling step past ``profile_numeric``'s per-column
    moments (which features are redundant, which label leaks). The
    built-in ``df.stat.corr`` computes one pair per JOB — n·(n−1)/2
    corpus scans for the matrix; here every pairwise ``corr`` aggregate
    lands in a single map-side-combined pass, so the matrix over
    100 TB costs one scan like every other profiling report.

    Rows with a NULL in either column of a pair are excluded from that
    pair only (the pairwise-deletion convention). Constant columns have
    undefined correlation: reported NULL, never NaN and never an ANSI
    DIVIDE_BY_ZERO (Spark 4's ``F.corr`` aggregate THROWS on a
    zero-variance column under ANSI mode — the moments are summed
    explicitly and combined with ``try_divide`` instead, so the
    undefined case degrades to NULL by construction).

    Returns the upper triangle as narrow rows (col_a, col_b, n_pairs,
    corr 6dp) — n·(n−1)/2 rows for n columns, never a wide matrix. The
    one-pass moment form trades a little numerical headroom for the
    single scan — right for profiling; center the columns first if
    their means dwarf their variances.

    ``pairs_per_pass`` bounds the aggregate-expression count PER PASS
    (6 per pair): an r11 review showed a literal single-pass 1000-column
    profile (499,500 pairs → ~3M aggregate expressions) never survives
    planning/codegen, so past the knob the pair list chunks into
    ``ceil(P / pairs_per_pass)`` aggregation passes unioned narrow —
    each pass re-scans the input, so the 1000-column matrix costs ~977
    scans of only the referenced columns (column-pruned), not one
    unplannable pass. The default 512 pairs (3,072 aggregates/pass)
    plans in seconds; a ≤32-column profile still fits one pass.
    """
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {cols!r}")
    if pairs_per_pass < 1:
        raise ValueError(f"pairs_per_pass must be >= 1, got {pairs_per_pass}")
    from ..functions.rounding import rnd

    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]

    def one_pass(chunk: list[tuple[str, str]]) -> DataFrame:
        # index-keyed INTERNAL aliases — never the user's column names,
        # whose dots/spaces would break F.col re-resolution (the same
        # quoting-hazard class as the bloom/IQR review fixes)
        aggs = []
        for i, (a, b) in enumerate(chunk):
            ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
            both = ca.isNotNull() & cb.isNotNull()
            x = F.when(both, ca)
            y = F.when(both, cb)
            aggs += [
                F.sum(both.cast("long")).alias(f"__n{i}"),
                F.sum(x).alias(f"__sx{i}"),
                F.sum(y).alias(f"__sy{i}"),
                F.sum(x * x).alias(f"__sxx{i}"),
                F.sum(y * y).alias(f"__syy{i}"),
                F.sum(x * y).alias(f"__sxy{i}"),
            ]
        wide = df.agg(*aggs)

        def pair_corr(i):
            n = F.col(f"__n{i}").cast("double")
            sx, sy = F.col(f"__sx{i}"), F.col(f"__sy{i}")
            cov = n * F.col(f"__sxy{i}") - sx * sy
            # clamp tiny negative fp residue before the sqrt
            varx = F.greatest(F.lit(0.0), n * F.col(f"__sxx{i}") - sx * sx)
            vary = F.greatest(F.lit(0.0), n * F.col(f"__syy{i}") - sy * sy)
            return F.try_divide(cov, F.sqrt(varx * vary))

        rows = [
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.coalesce(F.col(f"__n{i}"), F.lit(0))
                .cast("long")
                .alias("n_pairs"),
                rnd(pair_corr(i), 6).alias("corr"),
            )
            for i, (a, b) in enumerate(chunk)
        ]
        return wide.select(F.explode(F.array(*rows)).alias("p")).select(
            "p.col_a", "p.col_b", "p.n_pairs", "p.corr"
        )

    out = one_pass(pairs[:pairs_per_pass])
    for start in range(pairs_per_pass, len(pairs), pairs_per_pass):
        out = out.unionByName(one_pass(pairs[start : start + pairs_per_pass]))
    return out
