"""Deterministic weighted sampling without replacement (A-ES).

Corpus-mix building needs more than the Bernoulli hash-mod sample the
registry already has (``sample_stratified``'s md5-bucket rule and
``corpus_mix_resample``'s ppm thresholds): picking a FIXED-SIZE sample
where each document's inclusion odds follow a quality/importance weight.
That is weighted sampling without replacement — the Efraimidis–Spirakis
A-ES scheme (IPL 2006, public literature): draw u_i ~ U(0,1) per row,
rank by the exponential race key ``-ln(u_i) / w_i``, keep the n
smallest. Equivalent to sequential weighted draws without replacement,
and embarrassingly parallel.

Spark-first and deterministic:
- u_i is md5-derived (first 13 hex chars → 52-bit uniform), the same
  hashlib-reproducible rule the stratified sampler pins, so the sample
  is a pure function of (row key, seed) — stable under repartitioning,
  retries, and AQE re-plans, unlike ``rand()``.
- the global top-n is a TakeOrdered (per-partition heap of n, driver
  merges n·P rows) — ZERO shuffles; the per-group variant is one
  shuffle on the group key (window row_number), the minimum possible.

Rows with NULL or non-positive weight never sample (a zero-weight doc
must have zero inclusion probability; the race key would be +inf).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U_BITS = 52  # 13 hex chars; 2^52 is exactly representable in a double


def deterministic_uniform(key: Column, seed: str = "0") -> Column:
    """U(0,1) double as a pure function of (key, seed): the first 52 bits
    of md5(key:seed), centered (+0.5) so 0 and 1 are unreachable."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", key.cast("string"), F.lit(seed))), 1, 13),
        16,
        10,
    ).cast("double")
    return (h + F.lit(0.5)) / F.lit(float(2**_U_BITS))


def exp_race_key(weight: Column, u: Column) -> Column:
    """A-ES race key ``-ln(u)/w`` — the i-th smallest key wins the i-th
    draw of sequential weighted sampling without replacement."""
    return -F.log(u) / weight.cast("double")


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    seed: str = "0",
) -> DataFrame:
    """The ``n`` rows winning the weighted race, original columns plus
    ``es_key``, ordered (es_key ASC, key ASC). ``key_col`` must uniquely
    identify rows (a doc_id, not a category): duplicate keys share one
    md5-derived u — identical race keys the tie-break cannot separate —
    so which duplicate wins would depend on partition scan order, voiding
    the determinism contract. Fewer than ``n`` rows with positive weight
    → all of them. Plan: map-side key computation + TakeOrdered; no
    shuffle."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    u = deterministic_uniform(F.col(key_col), seed)
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("es_key", exp_race_key(F.col(weight_col), u))
        .orderBy(F.asc("es_key"), F.asc(key_col))
        .limit(n)
    )


def weighted_sample_per_group(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    group_cols: list[str],
    seed: str = "0",
) -> DataFrame:
    """Per-group A-ES: up to ``n`` winners per distinct ``group_cols``
    value (a weighted stratified sample with hard per-stratum caps).
    Same unique-``key_col`` contract as ``weighted_sample``.
    One shuffle, on the group key; the window is rank-limit pushed
    (WindowGroupLimit) so partial top-n happens map-side."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    u = deterministic_uniform(F.col(key_col), seed)
    w = Window.partitionBy(*group_cols).orderBy(F.asc("es_key"), F.asc(key_col))
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("es_key", exp_race_key(F.col(weight_col), u))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def quality_stratified_resample(
    df: DataFrame,
    score_col: str,
    id_col: str,
    keep_ppm: list[int],
    boundaries: list[float] | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """QUALITY-PACED resampling: partition the corpus into
    ``len(keep_ppm)`` quality buckets by score quantile and keep each
    bucket at its own parts-per-million rate — the data-mixing move
    where ``corpus_mix_resample`` paces SOURCES, this paces QUALITY
    (e.g. keep_ppm=[0, 250_000, 1_000_000]: drop the bottom tercile of
    a perplexity/classifier score, thin the middle to 25%, keep the top
    whole; pair with ``operators.ml.bigram_logprob`` or
    ``apply_text_quality_filter`` for the score).

    Bucket edges come from ``percentile_approx`` over the score (one
    tiny aggregate — a map-side-combined sketch whose result is a
    (n_buckets−1)-row driver pull, the k-row manifest-pull class), or
    pass ``boundaries`` explicitly to reuse edges fitted on another
    snapshot — the production posture, where the quantile fit and the
    daily filter are separate jobs. Bucket ``i`` holds scores in
    ``(b[i-1], b[i]]`` (±sketch error at the edges when fitted).

    Membership is the repo's canonical deterministic rule —
    ``h32(id) % 1e6 < keep_ppm[bucket]`` — a pure function of the row
    id, stable under repartitioning, appends, retries, and AQE
    re-plans, and reproducible from ``hashlib`` (fuzz-pinned for
    ``sample_stratified``). After the one aggregate the filter is
    MAP-ONLY: no shuffle of the corpus at any scale.

    Rows with NULL score are DROPPED (a doc the scorer could not rate
    has no bucket; gate upstream if they must survive). Returns the
    surviving rows plus a ``quality_bucket`` int column."""
    from ..functions.text import h32

    n_buckets = len(keep_ppm)
    if n_buckets < 1:
        raise ValueError("keep_ppm must name at least one bucket")
    for p in keep_ppm:
        if not 0 <= p <= 1_000_000:
            raise ValueError(f"keep_ppm entries must be in [0, 1e6]; got {p}")
    if boundaries is None:
        if n_buckets == 1:
            boundaries = []
        else:
            qs = [i / n_buckets for i in range(1, n_buckets)]
            [row] = (
                df.agg(
                    F.percentile_approx(
                        F.col(score_col).cast("double"),
                        qs,
                        F.lit(int(1.0 / relative_error)),
                    ).alias("b")
                ).collect()
            )
            boundaries = [float(x) for x in row["b"]]
    elif len(boundaries) != n_buckets - 1:
        raise ValueError(
            f"{n_buckets} buckets need {n_buckets - 1} boundaries; "
            f"got {len(boundaries)}"
        )
    bucket = F.lit(0)
    for b in boundaries:
        bucket = bucket + (F.col(score_col).cast("double") > F.lit(float(b))).cast(
            "int"
        )
    ppm_arr = F.array(*[F.lit(int(p)) for p in keep_ppm])
    return (
        df.filter(F.col(score_col).isNotNull())
        .withColumn("quality_bucket", bucket)
        .filter(
            h32(F.col(id_col).cast("string")) % 1_000_000
            < F.element_at(ppm_arr, F.col("quality_bucket") + 1)
        )
    )


def seeded_global_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "0",
    n_shards: int | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """Deterministic GLOBAL pseudo-random reorder — the final shuffle a
    training-data delivery needs before sharding (``write_tar_shards``
    follows physical partition order, so whatever order this stage
    establishes IS the training order).

    Every row gets the repo's canonical hashlib-reproducible key
    ``h32(seed || ':' || id)``; ``repartitionByRange`` over
    ``(key, id)`` then ``sortWithinPartitions`` yields one total order
    — a pure function of (id, seed), independent of the input's
    partitioning, task retries, and AQE re-plans (``rand()`` is none of
    those things). Re-seeding per epoch (``seed=f"ep{k}"``) gives
    independent epoch orders from the same staged corpus.

    Scale shape: ONE range shuffle of the corpus — the unavoidable cost
    of a global permutation — into ``n_shards`` near-equal output
    partitions (hash keys are uniform, so the range sampler's splits
    balance; no skew by construction, even when the input is sorted by
    source or quality). ``n_shards=None`` keeps the session's shuffle
    parallelism. ``keep_key`` retains the ``_shuffle_key`` column for
    audit; otherwise the frame comes back with its original columns.
    """
    from ..functions.text import h32

    key = h32(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    out = df.withColumn("_shuffle_key", key)
    parts = [F.col("_shuffle_key"), F.col(id_col)]
    out = (
        out.repartitionByRange(n_shards, *parts)
        if n_shards is not None
        else out.repartitionByRange(*parts)
    )
    out = out.sortWithinPartitions(*parts)
    return out if keep_key else out.drop("_shuffle_key")


def plan_token_mixture(
    df: DataFrame,
    *,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    token_budget: int,
    max_epochs: float = 10.0,
) -> list[dict]:
    """Plan a token-budgeted source mixture WITH repetition: given target
    mixture weights and a total token budget, compute how many epochs
    (possibly fractional, possibly >1) of each source to take — the
    published pretraining recipe shape ("books ×2.5 epochs, web ×0.4").
    `corpus_mix_resample` / `weighted_sample` only ever DOWN-sample;
    this planner adds the up-weighting dimension by repeating scarce
    high-value sources, capped at `max_epochs` (repetition beyond a few
    epochs has diminishing returns — the cap makes over-asked plans fail
    loudly in the report rather than silently looping one source).

    ONE aggregate over the corpus (map-side-combined per-source token
    sums — a rows-per-source driver pull, the k-row manifest class),
    then pure driver math. Returns one plan dict per source in
    `weights`: ``source, weight, avail_tokens, target_tokens,
    full_epochs (int), final_epoch_ppm (int), planned_tokens,
    shortfall_tokens`` (>0 only when the cap bit). Sources present in
    the corpus but absent from `weights` get weight 0 (dropped by
    `apply_token_mixture`); sources in `weights` but absent from the
    corpus plan 0 tokens with full shortfall.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative weights: {bad}")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum > 0")

    avail = {
        r["s"]: int(r["t"])
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(F.col(token_col).cast("long")).alias("t"))
        .collect()  # rows-per-source: the tiny-aggregate driver pull class
    }
    plan = []
    for source in sorted(weights):
        w = weights[source] / wsum
        have = avail.get(source, 0)
        target = int(round(token_budget * w))
        if have <= 0:
            epochs = 0.0
        else:
            epochs = min(target / have, max_epochs)
        full = int(epochs)
        ppm = int(round((epochs - full) * 1_000_000))
        if ppm == 1_000_000:  # float edge: x.9999995 rounds up to a full epoch
            full, ppm = full + 1, 0
        planned = int(round(have * (full + ppm / 1_000_000)))
        plan.append(
            {
                "source": source,
                "weight": round(w, 6),
                "avail_tokens": have,
                "target_tokens": target,
                "full_epochs": full,
                "final_epoch_ppm": ppm,
                "planned_tokens": planned,
                "shortfall_tokens": max(0, target - planned),
            }
        )
    return plan


def apply_token_mixture(
    df: DataFrame,
    plan: list[dict],
    *,
    source_col: str,
    id_col: str,
) -> DataFrame:
    """Materialize a `plan_token_mixture` plan: each source appears
    `full_epochs` whole times plus a `final_epoch_ppm` fraction of one
    more, with an ``epoch`` int column distinguishing the copies (so the
    delivery layer can re-shuffle per epoch via
    ``seeded_global_shuffle(seed=f"ep{k}")``).

    The partial final epoch uses the canonical deterministic rule keyed
    by (epoch, id) — ``h32(epoch ':' id) % 1e6 < ppm`` — so it is a
    uniform, repartition/rerun-stable subset, independent across
    sources' epoch boundaries, and reproducible from hashlib.

    Scale shape: the plan joins on as a BROADCAST (rows-per-source);
    epoch copies come from ``explode(sequence(...))`` — map-only row
    amplification bounded by max_epochs; the ppm filter is map-only.
    The corpus itself never shuffles. Sources with weight 0 / no plan
    row are dropped (inner join).
    """
    from ..functions.text import h32

    spark = df.sparkSession
    rows = [
        (p["source"], int(p["full_epochs"]), int(p["final_epoch_ppm"]))
        for p in plan
        if p["full_epochs"] > 0 or p["final_epoch_ppm"] > 0
    ]
    if not rows:
        return df.filter(F.lit(False)).withColumn("epoch", F.lit(0))
    plan_df = spark.createDataFrame(
        rows, f"{source_col} string, __full int, __ppm int"
    )
    keyed = df.join(F.broadcast(plan_df), source_col, "inner")
    # epochs 0..full-1 are whole; epoch==full is the ppm-partial one
    # (emitted only when ppm > 0)
    last = F.col("__full") + F.when(F.col("__ppm") > 0, 1).otherwise(0) - 1
    out = keyed.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), last))
    )
    partial = F.col("epoch") == F.col("__full")
    keep_hash = (
        h32(
            F.concat_ws(
                ":", F.col("epoch").cast("string"), F.col(id_col).cast("string")
            )
        )
        % 1_000_000
        < F.col("__ppm")
    )
    return out.filter(~partial | keep_hash).drop("__full", "__ppm")


def length_bucketed_order(
    df: DataFrame,
    *,
    id_col: str,
    length_col: str,
    bucket_width: int,
    seed: str = "0",
    n_shards: int | None = None,
    keep_bucket: bool = False,
) -> DataFrame:
    """Training order that co-locates similar-length examples while
    staying pseudo-random WITHIN each length bucket — the padding-waste
    fix: a batch drawn from a fully random order pads every sequence to
    the batch max (a 2k-token straggler makes 63 short neighbors pay
    for it), while strict length sort destroys shuffling. Bucketing by
    ``floor(length / bucket_width)`` bounds intra-batch padding to
    `bucket_width` and keeps the order within a bucket a pure function
    of (id, seed) — the `seeded_global_shuffle` contract (rerun-,
    repartition-, and retry-stable; re-seed per epoch).

    Scale shape: ONE range shuffle over (bucket, hash key) — identical
    cost to the unbucketed global shuffle; downstream sequential
    loaders (`write_tar_shards` follows physical order) see buckets in
    ascending length order, shuffled inside.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    from ..functions.text import h32

    bucket = F.floor(F.col(length_col) / bucket_width).cast("long")
    key = h32(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    out = df.withColumn("_len_bucket", bucket).withColumn("_shuffle_key", key)
    parts = [F.col("_len_bucket"), F.col("_shuffle_key"), F.col(id_col)]
    out = (
        out.repartitionByRange(n_shards, *parts)
        if n_shards is not None
        else out.repartitionByRange(*parts)
    )
    out = out.sortWithinPartitions(*parts)
    drop = ["_shuffle_key"] + ([] if keep_bucket else ["_len_bucket"])
    return out.drop(*drop)


def quality_stratified_resample_by_group(
    df: DataFrame,
    score_col: str,
    id_col: str,
    group_col: str,
    keep_ppm: list[int],
    boundaries: dict[str, list[float]] | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """`quality_stratified_resample` with PER-GROUP quantile edges —
    the multilingual/multi-source posture: perplexity and classifier
    score distributions differ wildly across languages and sources, so
    GLOBAL bucket edges judge low-resource groups against the dominant
    group's distribution (crushing e.g. non-English text whose scores
    run lower). Each group gets its own edges; the keep_ppm policy
    ("drop the bottom tercile, thin the middle") then means the same
    thing in every group.

    ``boundaries`` maps group → explicit edges (the production reuse
    path; every group present in the data must have an entry — missing
    groups raise rather than silently falling back to a refit; the
    check rides the edges join as a ``raise_error`` branch on the
    unmatched side, so it costs nothing — the previous
    ``distinct().collect()`` validation was a FULL extra corpus pass
    per call before any real work). When None, edges come from one
    grouped ``percentile_approx`` (a rows-per-group driver pull, the
    k-row manifest class).

    Membership is the same canonical ``h32(id) % 1e6 < keep_ppm[b]``
    rule; after the one grouped aggregate the filter is MAP-ONLY — the
    per-group edges join on as a broadcast rows-per-group frame. NULL
    scores are dropped (the base operator's contract); NULL groups form
    their own '' group. Returns survivors + ``quality_bucket``.
    """
    from ..functions.text import h32

    n_buckets = len(keep_ppm)
    if n_buckets < 1:
        raise ValueError("keep_ppm must name at least one bucket")
    for p in keep_ppm:
        if not 0 <= p <= 1_000_000:
            raise ValueError(f"keep_ppm entries must be in [0, 1e6]; got {p}")

    grp = F.coalesce(F.col(group_col).cast("string"), F.lit(""))
    scored = df.filter(F.col(score_col).isNotNull()).withColumn("__grp", grp)

    if boundaries is not None:
        bad = {g: len(v) for g, v in boundaries.items() if len(v) != n_buckets - 1}
        if bad:
            raise ValueError(
                f"{n_buckets} buckets need {n_buckets - 1} boundaries per "
                f"group; wrong lengths: {bad}"
            )
        edges_rows = [(g, [float(x) for x in v]) for g, v in boundaries.items()]
    else:
        if n_buckets == 1:
            edges_rows = None  # single bucket: no edges needed
        else:
            qs = [i / n_buckets for i in range(1, n_buckets)]
            edges_rows = [
                (r["__grp"], [float(x) for x in r["b"]])
                for r in scored.groupBy("__grp").agg(
                    F.percentile_approx(
                        F.col(score_col).cast("double"),
                        qs,
                        F.lit(int(1.0 / relative_error)),
                    ).alias("b")
                ).collect()  # rows-per-group: the k-row manifest class
            ]

    if edges_rows is None:
        bucketed = scored.withColumn("quality_bucket", F.lit(0))
    else:
        spark = df.sparkSession
        edges = spark.createDataFrame(
            edges_rows, "__grp string, __edges array<double>"
        )
        # the unmatched (missing-group) side of the left join RAISES in
        # the row path instead of a pre-pass validation: same loud
        # refusal ("explicit boundaries missing groups"), zero extra
        # corpus passes. The fitted path (boundaries=None) derives an
        # edge row per present group, so its left join always matches.
        bucketed = scored.join(F.broadcast(edges), "__grp", "left").withColumn(
            "quality_bucket",
            F.when(
                F.col("__edges").isNotNull(),
                F.size(
                    F.filter(
                        F.col("__edges"),
                        lambda b: F.col(score_col).cast("double") > b,
                    )
                ),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "explicit boundaries missing groups (refusing "
                            "to refit silently): "
                        ),
                        F.col("__grp"),
                    )
                ).cast("int")
            ),
        ).drop("__edges")
    ppm_arr = F.array(*[F.lit(int(p)) for p in keep_ppm])
    return bucketed.filter(
        h32(F.col(id_col).cast("string")) % 1_000_000
        < F.element_at(ppm_arr, F.col("quality_bucket") + 1)
    ).drop("__grp")


def temperature_mixture_weights(
    df: DataFrame,
    *,
    source_col: str,
    token_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Derive mixture weights from corpus sizes by temperature scaling:
    ``w_i = n_i^α / Σ n_j^α`` (the exponentiated-share sampling rule of
    the multilingual pretraining literature — XLM-R/mT5-style α-sampling,
    public). α = 1 reproduces the natural distribution; α → 0 approaches
    uniform; the standard α ≈ 0.3 lifts low-resource sources without
    letting any source dominate. This is the WEIGHT-DERIVATION step in
    front of ``plan_token_mixture`` (which takes the weights as given and
    budgets epochs) — together they close the loop from raw corpus to
    executable sampling plan.

    ONE map-side-combined aggregate to a rows-per-source frame, then
    window arithmetic over that tiny frame — nothing downstream of the
    aggregate scales with the corpus.

    Returns per source: ``n_tokens``, ``raw_share`` (natural
    distribution), ``temp_share`` (the derived weight), ``boost``
    (temp/raw — >1 means the source is up-sampled), 6dp-rounded.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from pyspark.sql import Window

    from ..functions.rounding import rnd

    per_src = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(token_col).cast("long")).alias("n_tokens")
    )
    everything = Window.partitionBy()
    n = F.col("n_tokens").cast("double")
    raw = n / F.sum(n).over(everything)
    temp = F.pow(n, F.lit(alpha)) / F.sum(F.pow(n, F.lit(alpha))).over(everything)
    return per_src.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        rnd(raw, 6).alias("raw_share"),
        rnd(temp, 6).alias("temp_share"),
        rnd(temp / raw, 6).alias("boost"),
    )
