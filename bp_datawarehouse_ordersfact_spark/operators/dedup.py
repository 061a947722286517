"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-minimal by construction:

- **exact**: hash-groupBy on md5(text). One shuffle on a uniformly
  distributed key — the optimal distributed plan at any scale.
- **MinHash + LSH**: signature is a narrow map-only transform
  (`functions.text.minhash_signature`); candidate generation is a
  band-bucket equi-join (shuffle on (band, band_hash) — tiny keys), and
  only candidates pay the Jaccard verification. This is the 100 TB path:
  no all-pairs comparison ever materializes.
- **SimHash**: 32-bit fingerprint map-only; near-dup = hamming ≤ k,
  found via bucket join on the fingerprint's band halves.
- **n-gram Jaccard**: the exact (quadratic) verifier, used standalone
  only at small scale or behind LSH blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..core.persist import (
    release_results,  # noqa: F401 — re-exported; callers free result blocks here
    tracked_local_checkpoint,
)
from ..functions.rounding import rnd

from ..functions import text as Tx
from ..functions import vectors as V


class _CacheScope:
    """Tracks cache+eager-fill intermediates and frees them when the
    (small) final result is materialized. Use as a context manager so
    the exception path (e.g. an analysis error in a transform built
    between ``materialize`` and ``finish``) also unpersists.

    Why cache at all: a lazily-cached frame referenced by BOTH sides of a
    self-join gets computed twice concurrently on first action (the join
    branches race before either fills the cache) — at sf0.1 that race
    alone tripled simhash/minhash wall time. One count() up front fills
    the cache once; every branch then reads InMemoryTableScan.

    Why free eagerly: leaving the shingle/band/fingerprint caches pinned
    for the session's lifetime compounds across a query suite — the r02
    bench ran late queries on top of every earlier dedup's leaked blocks
    (stream_session_agg 8.9×, ann_cosine_lsh 4.9× regressions); at 100 TB
    that leak is an executor OOM, not a slowdown. ``finish`` runs the full
    computation into a lineage-truncating ``localCheckpoint`` (pair
    results are tiny — at cluster scale this is the staged output table),
    then unpersists every intermediate before returning.

    The checkpointed RESULT's blocks stay pinned until the caller is done
    with the frame; their RDD ids are registered so ``release_results``
    can free them (``DataFrame.unpersist`` cannot — the blocks belong to
    an internal RDD the SQL cache manager never sees)."""

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def __enter__(self) -> "_CacheScope":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        # no-op after a normal finish(); frees intermediates on the
        # exception path so the pre-finish leak can't recur
        for f in self._frames:
            f.unpersist()
        self._frames.clear()
        return False

    def materialize(self, df: DataFrame) -> DataFrame:
        df = df.cache()
        df.count()
        self._frames.append(df)
        return df

    def materialize_with(self, df: DataFrame) -> DataFrame:
        """Cache ``df`` WITHOUT its own fill job: the next
        ``materialize`` (or any other single-lineage action) that
        consumes it fills this cache as a side effect of computing its
        own. The up-front ``count()`` exists to beat the
        concurrent-branch race on an unfilled cache (two join branches
        computing the same InMemoryRelation at once); a frame whose
        FIRST action reaches it through exactly one downstream lineage
        has no race to beat, so its fill job is a pure extra scheduling
        round (r16: one job saved per minhash-family construction).
        Registered for the same exception-path unpersist as
        ``materialize``."""
        df = df.cache()
        self._frames.append(df)
        return df

    def finish(self, result: DataFrame) -> DataFrame:
        try:
            # tracked_local_checkpoint registers the result's RDD ids for
            # a later release_results
            ck, _ = tracked_local_checkpoint(result, eager=True)
            return ck
        finally:
            for f in self._frames:
                f.unpersist()
            self._frames.clear()


class _LazyScope:
    """No-op scope for ``eager=False``: the operator returns its plain
    lazy plan — no caches, no checkpoint — so downstream filters/limits a
    caller composes can still prune work and the caller owns persistence.
    The tradeoff: frames referenced by both sides of the self-joins get
    recomputed per branch unless the caller caches them first."""

    def __enter__(self) -> "_LazyScope":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        return False

    def materialize(self, df: DataFrame) -> DataFrame:
        return df

    def materialize_with(self, df: DataFrame) -> DataFrame:
        return df

    def finish(self, result: DataFrame) -> DataFrame:
        return result


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the smallest id per identical text (md5 bucket)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def with_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col),
        Tx.word_shingles(Tx.tokens(F.col(text_col)), n).alias("shingles"),
    )


def shingle_rows(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows — same shingle multiset as
    ``functions.text.word_shingles`` (pre-distinct) but built with
    posexplode + window leads so every operator stays in whole-stage
    codegen (the transform/element_at array form evaluates interpreted,
    ~10× slower). NOT deduplicated: min-hashing is duplicate-insensitive
    and Jaccard-set consumers dedup via ``collect_set``.

    Semantics mirrored exactly: full n-grams only; documents with fewer
    than n tokens contribute one shingle of all their tokens joined;
    NULL-text documents contribute the empty-string shingle (the
    ``posexplode_outer`` null row — no repair join needed), while
    empty/whitespace-only text yields NO rows at all (its lone ""
    token is filtered, so the doc never reaches the shingle index —
    the contract the containment property test pins).

    One shuffle, on the doc id (the window), which is uniform — the
    100 TB shape.
    """
    # raw split keeps boundary empties; the row-level filter that drops
    # them is codegen'd (an array-lambda F.filter is not), and one regex
    # pass beats the strip-then-split double pass
    raw = df.select(
        F.col(id_col),
        F.posexplode_outer(F.split(F.lower(F.col(text_col)), Tx.TOKEN_SPLIT_RE)).alias(
            "pos", "tok"
        ),
    ).filter(F.col("tok").isNull() | (F.col("tok") != ""))
    w = Window.partitionBy(id_col).orderBy("pos")
    wn = Window.partitionBy(id_col)
    leads = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, n)]
    return (
        raw.select(
            F.col(id_col),
            F.row_number().over(w).alias("rn"),
            F.count("tok").over(wn).alias("n_toks"),
            F.col("tok"),
            # concat_ws skips the null leads, so the rn==1 row of a short
            # doc is exactly "all tokens joined" (and "" for empty docs)
            F.concat_ws(" ", *leads).alias("shingle"),
        )
        .filter(
            F.col("tok").isNull()
            | (F.col("rn") + (n - 1) <= F.col("n_toks"))
            | ((F.col("n_toks") < n) & (F.col("rn") == 1))
        )
        .select(id_col, "shingle")
    )


def minhash_band_rows(
    shingles: DataFrame, id_col: str, k: int = 16, bands: int = 4
) -> DataFrame:
    """(doc, band, bh) LSH band rows from (id, shingle) rows — the
    signature+banding stage of ``minhash_lsh_pairs``, factored out so a
    persisted signature STORE (pipelines/dedup_store.py) and the
    in-memory pair operator share one definition: band hashes computed
    by either are comparable byte-for-byte.

    Plan: hash columns → groupBy-min signature (codegen, map-side
    partial min-combine) → band structs exploded; one shuffle total."""
    rows_per_band = k // bands
    hashed = shingles.select(
        F.col(id_col).alias("doc"),
        Tx.h32(F.col("shingle")).alias("ha"),
        Tx.h32b(F.col("shingle")).alias("hb"),
    )
    mod = F.lit(2**32).cast("long")
    sig = hashed.groupBy("doc").agg(
        *[
            F.min((F.col("ha") + F.lit(j).cast("long") * F.col("hb")) % mod).alias(
                f"mh{j}"
            )
            for j in range(k)
        ]
    )
    return sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"mh{b * rows_per_band + r}").cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bh")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
    eager: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (a < b) via MinHash-LSH banding + exact
    Jaccard verification of candidates only.

    Plan shape: map (signature) → explode bands (k/bands rows per doc)
    → self equi-join on (band, band_hash) → distinct pairs → join back
    shingles → filter jaccard ≥ threshold. The only shuffles are the
    band join and the two shingle lookups; all are on uniform hash keys.

    ``eager=True`` (default) EXECUTES the operator now: intermediates are
    cached, the result is localCheckpoint-ed (lineage-truncated; free its
    blocks later via ``release_results``) and the caches freed before
    returning — the right call when the pair set is the next action
    anyway. Pass ``eager=False`` for a pure lazy plan (composable, caller
    owns persistence; see ``_LazyScope`` for the tradeoff). On clusters
    with executor loss / dynamic allocation, prefer ``eager=False`` plus
    a caller-side write to a staged table: localCheckpoint blocks are not
    replicated and die with their executor.
    """
    # Materialization boundaries matter here: without them Catalyst
    # inlines the shingle computation into every downstream reference
    # (signature build plus the two verification joins), recomputing the
    # window/distinct work. Locally a cache() is the boundary; at 100 TB
    # this is a staged signature table.
    with (_CacheScope() if eager else _LazyScope()) as scope:
        # shingles cache fills as a side effect of the band fill below
        # (one lineage, one job — materialize_with): the race the
        # up-front count exists to beat needs TWO branches over the
        # unfilled cache, and the first action to reach `rows` is the
        # band fill alone. The verify joins later read the then-filled
        # cache.
        rows = scope.materialize_with(
            shingle_rows(df, text_col, id_col, shingle_n)
        )
        # Signature via hash columns → groupBy-min (minhash_band_rows):
        # every operator stays inside whole-stage codegen (the
        # higher-order-function form in functions.text.minhash_signature
        # evaluates its lambdas interpreted, ~k array allocations per
        # shingle — 10-20× slower on the same data). The shuffle is
        # (id, a, b) rows — 24 bytes each — partially min-combined
        # map-side before the exchange.
        banded = scope.materialize(minhash_band_rows(rows, id_col, k, bands))

        cand = (
            banded.alias("x")
            .join(
                banded.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bh") == F.col("y.bh"))
                & (F.col("x.doc") < F.col("y.doc")),
            )
            .select(F.col("x.doc").alias("id_a"), F.col("y.doc").alias("id_b"))
            .distinct()
        )

        # shingle sets for exact verification, rebuilt from the cached rows
        # (collect_set dedups; intersect is order-insensitive)
        sh = rows.groupBy(id_col).agg(F.collect_set("shingle").alias("shingles"))
        verified = (
            cand.join(sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a")
            .join(sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
            .withColumn("jaccard", rnd(Tx.jaccard(F.col("sh_a"), F.col("sh_b")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        return scope.finish(verified)


def fp64_band_pairs(
    fp: DataFrame, max_hamming: int, n_bands: int = 4
) -> DataFrame:
    """Hamming-≤k candidate pairs over a 64-bit fingerprint held as two
    32-bit halves ``(doc, fp1, fp2)`` — the blocking core shared by
    ``simhash_pairs`` (text) and ``phash_pairs`` (image/binary).

    Pigeonhole: a pair within hamming ≤ k of 64 bits must agree EXACTLY
    on at least one of n_bands equal-width bands whenever
    ``k < n_bands`` — so candidates come from ``n_bands`` band
    equi-joins (shuffle on tiny (band, band_value) keys), never an
    all-pairs product, and recall is exact, not probabilistic. Raises if
    ``max_hamming >= n_bands`` rather than silently losing recall.

    Returns (id_a, id_b, hamming) with id_a < id_b, hamming ≤ k, exact
    distances verified on candidates only. The plan is lazy; callers own
    caching of ``fp`` (it feeds both sides of the self-join)."""
    if n_bands not in (4, 8, 16):
        raise ValueError("n_bands must be 4, 8, or 16 (bands of 16/8/4 bits)")
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands for "
            f"exact pigeonhole recall; got n_bands={n_bands}"
        )
    width = 64 // n_bands
    mask = (1 << width) - 1
    per_half = n_bands // 2
    band_structs = [
        F.struct(
            F.lit(per_half * half + i).alias("band"),
            F.shiftright(F.col(f"fp{half + 1}"), width * i)
            .bitwiseAND(F.lit(mask))
            .alias("bv"),
        )
        for half in range(2)
        for i in range(per_half)
    ]
    banded = fp.select(
        "doc", "fp1", "fp2", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc", "fp1", "fp2", "bb.band", "bb.bv")
    # hamming filter BEFORE the dedup of band-duplicate pairs: bit_count
    # is a cheap row expression, and filtering first shrinks the distinct
    # shuffle by up to the band count (a ≤k-bit pair can match in all
    # n_bands bands)
    hamming = F.bit_count(
        F.col("x.fp1").bitwiseXOR(F.col("y.fp1"))
    ) + F.bit_count(F.col("x.fp2").bitwiseXOR(F.col("y.fp2")))
    return (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(
            F.col("x.doc").alias("id_a"),
            F.col("y.doc").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    eager: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance over a 64-bit
    fingerprint (two independent 32-bit halves — md5 hex 1-8 and 9-16 —
    so every value stays inside DuckDB's signed BIGINT for the oracle).

    Blocking: a pair within hamming ≤ 3 of the 64-bit fingerprint must
    agree exactly on at least one of 4 16-bit bands (pigeonhole) — so
    candidates come from 4 band equi-joins, never an all-pairs product.
    The 16-bit band space (65,536 buckets/band) is what keeps candidate
    fan-out sane: the previous 32-bit/8-bit-band form produced 1.5M
    hamming-≤3 "pairs" from 5,000 docs — a 32-bit simhash saturates at
    corpus sizes where doc vocabularies overlap, and 256 buckets/band
    made the band join quadratic-ish. At 64 bits the same corpus yields
    a small, meaningful near-dup set and the band join stays sparse.

    ``eager``: executes now and checkpoints the result — semantics and
    cluster caveats as in ``minhash_lsh_pairs``.
    """
    # Fingerprint via explode → groupBy bit-vote sums (whole-stage
    # codegen; higher-order folds run interpreted — see minhash_lsh_pairs
    # note). One md5 per token feeds both halves. Zero-token docs drop
    # out of the explode but explode_outer keeps the doc with h NULL →
    # all votes 0 → fp=0 for both halves. cache = materialization
    # boundary: the fingerprint would otherwise be recomputed on both
    # sides of the self-join.
    with (_CacheScope() if eager else _LazyScope()) as scope:
        toks = df.select(
            F.col(id_col).alias("doc"),
            F.explode_outer(F.array_distinct(Tx.tokens(F.col(text_col)))).alias("t"),
        ).select(
            "doc",
            F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5("t"), 9, 8), 16, 10).cast("long").alias("h2"),
        )

        # Bit votes as NARROW ROWS, not a 64-wide aggregate: explode each
        # token into (doc, b, bit) via a sequence(0,63) — every expression
        # stays tiny, so whole-stage codegen compiles in milliseconds (the
        # 64-column sum(CASE…) aggregate generated so much Java that janino
        # compilation alone dominated first-run latency: 8.2s vs 4.3s total
        # at sf0.1). Map-side partial aggregation combines the bit rows to
        # ≤64 per doc per partition before the shuffle, so the row explosion
        # never crosses the wire — the same state size as the wide-agg form.
        # `sum(±1) > 0 ⟺ 2*ones > n`; empty docs (h NULL → bit NULL) give
        # n=0 → every vote predicate NULL → fp=0, as in the vote form.
        bit_rows = toks.select(
            "doc", "h1", "h2", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b")
        ).select(
            "doc",
            "b",
            F.expr(
                "CAST((CASE WHEN b < 32 THEN h1 >> b ELSE h2 >> (b - 32) END) & 1 AS INT)"
            ).alias("bit"),
        )
        votes = bit_rows.groupBy("doc", "b").agg(
            F.sum("bit").alias("ones"), F.count("bit").alias("n")
        )
        vote_set = 2 * F.col("ones") > F.col("n")
        fp = scope.materialize(
            votes.groupBy("doc").agg(
                F.sum(
                    F.when(
                        (F.col("b") < 32) & vote_set,
                        F.expr("shiftleft(CAST(1 AS BIGINT), b)"),
                    ).otherwise(F.lit(0).cast("long"))
                ).alias("fp1"),
                F.sum(
                    F.when(
                        (F.col("b") >= 32) & vote_set,
                        F.expr("shiftleft(CAST(1 AS BIGINT), b - 32)"),
                    ).otherwise(F.lit(0).cast("long"))
                ).alias("fp2"),
            )
        )
        return scope.finish(fp64_band_pairs(fp, max_hamming))


def phash_pairs(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    eager: bool = True,
    decode=None,
) -> DataFrame:
    """Near-duplicate IMAGE/binary pairs by perceptual-hash hamming
    distance: the multimodal member of the dedup family (exact/MinHash/
    SimHash cover text; embedding LSH covers vectors; this covers the
    opaque payload columns a multimodal corpus carries).

    Fingerprint = ``operators.multimodal.ahash64`` (64-bit average hash;
    default decode is that module's documented fake tier — bytes ARE
    pixels — with the PIL swap point marked; pooling/threshold real.
    Pass ``decode=multimodal.decode_bmp_gray`` to fingerprint REAL
    pixels of uncompressed BMP payloads — the end-to-end-real image
    path, r8 VERDICT #5). Blocking =
    ``fp64_band_pairs``: pigeonhole band equi-join, exact recall for
    ``max_hamming < n_bands``, never an all-pairs product. Returns
    (id_a, id_b, hamming), id_a < id_b.

    ``eager`` caches the fingerprint frame (it feeds both sides of the
    self-join) and checkpoints the pair result — semantics and cluster
    caveats as in ``minhash_lsh_pairs``.

    Scale notes: the fingerprint is one map-only Arrow pass (64 bits per
    image regardless of payload size); the only corpus shuffle is the
    (band, band_value) exchange — the same posture as ``simhash_pairs``,
    so the operator holds at any corpus size where SimHash does."""
    from .multimodal import ahash64

    with (_CacheScope() if eager else _LazyScope()) as scope:
        fp = scope.materialize(
            ahash64(df, payload_col, id_col, decode=decode).withColumnRenamed(
                id_col, "doc"
            )
        )
        return scope.finish(fp64_band_pairs(fp, max_hamming, n_bands))


def minhash_lsh_pairs_ml(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hash_tables: int = 4,
    threshold: float = 0.5,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Spark ML variant of MinHash-LSH dedup: HashingTF(binary) →
    MinHashLSH → approxSimilarityJoin. Same plan shape as the hand-rolled
    pipeline (map-side signatures, band-bucket join), with MLlib owning
    the hash family.

    The hand-rolled ``minhash_lsh_pairs`` remains the oracle-checked
    default (its md5 hashes reproduce in any engine); this one is the
    library path when cross-engine determinism isn't required. Note
    approxSimilarityJoin returns JACCARD DISTANCE — filtered here to
    ``1 - threshold`` and re-emitted as similarity.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = with_shingles(df, text_col, id_col)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", binary=True, numFeatures=num_features
    )
    feats = tf.transform(sh).filter(F.size("shingles") > 0)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jaccard_dist"
    )
    return (
        pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            rnd(1.0 - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.999,
    n_bits: int = 8,
    eager: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b): sign-pattern LSH bucket
    self-join + exact cosine on candidates only.

    Near-identical vectors have identical sign patterns, so every true
    near-dup pair shares a bucket; the equi-join on the bucket key
    replaces the all-pairs product. SMALL-SCALE / ORACLE TWIN: one table
    of 2^n_bits buckets caps the reduction at 2^n_bits (256 by default),
    so at 10⁹ rows the bucket self-join is a within-bucket quadratic —
    use ``embedding_near_dup_pairs_banded`` (b tables × r bits, 2^32
    keys per table, MinHash-band candidate structure) at scale. This
    form stays because ``sign_bucket`` reproduces in ANSI SQL for the
    DuckDB oracle; the banded twin is pinned to it by
    tests/test_operators.py recall parity instead.

    ``eager``: executes now and checkpoints the result — semantics and
    cluster caveats as in ``minhash_lsh_pairs``.
    """
    with (_CacheScope() if eager else _LazyScope()) as scope:
        b = scope.materialize(
            df.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
                V.sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
            )
        )  # both sides of the self-join
        pairs = (
            b.alias("x")
            .join(
                b.alias("y"),
                (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id")),
            )
            .select(
                F.col("x.id").alias("id_a"),
                F.col("y.id").alias("id_b"),
                rnd(V.cosine(F.col("x.v"), F.col("y.v")), 6).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )
        return scope.finish(pairs)


def embedding_near_dup_pairs_banded(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.999,
    bands: int = 8,
    bits_per_band: int = 32,
    dim: int | None = None,
    seed: int = 42,
    eager: bool = True,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b) via BANDED random-
    hyperplane LSH — the 100 TB path (scale fix for the 2^8-bucket cap
    of ``embedding_near_dup_pairs``).

    Plan shape — exactly ``minhash_lsh_pairs``'s candidate structure:
    map (``functions.vectors.hyperplane_band_keys``: one Arrow batch
    pass, ``bands`` int64 keys per vector, zero shuffles) → explode
    bands → self equi-join on the key → distinct pairs → exact cosine
    verification of candidates only. Each table has 2^bits_per_band
    buckets (2^32 by default — effectively unbounded key cardinality),
    so no within-bucket quadratic exists at any scale: two vectors meet
    only if all ``r`` hyperplane signs agree in some table, P = (1 −
    θ/π)^r per table. At the defaults (r=32, b=8) recall for θ ≤ 2.6°
    (cos ≥ 0.999) is ≥ 99.9% while random pairs collide with P ≈ b·2⁻³²
    per table pair.

    ``dim`` is the vector width (drives the seeded hyperplane matrix);
    when None it is probed with a 1-row ``first()`` — pass it explicitly
    in composed pipelines to keep the plan action-free.

    ``eager``: executes now and checkpoints the result — semantics and
    cluster caveats as in ``minhash_lsh_pairs``.
    """
    if dim is None:
        dim = df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    with (_CacheScope() if eager else _LazyScope()) as scope:
        keyed = scope.materialize(
            df.select(
                F.col(id_col).alias("id"),
                F.col(vec_col).alias("v"),
                V.hyperplane_band_keys(
                    F.col(vec_col), dim, bands, bits_per_band, seed
                ).alias("keys"),
            )
        )  # referenced by both sides of the band join AND the verify joins
        bucketed = keyed.select("id", F.explode("keys").alias("bk"))
        cand = (
            bucketed.alias("x")
            .join(
                bucketed.alias("y"),
                (F.col("x.bk") == F.col("y.bk")) & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        vecs = keyed.select("id", "v")
        verified = (
            cand.join(vecs.withColumnsRenamed({"id": "id_a", "v": "v_a"}), "id_a")
            .join(vecs.withColumnsRenamed({"id": "id_b", "v": "v_b"}), "id_b")
            .withColumn("cosine", rnd(V.cosine(F.col("v_a"), F.col("v_b")), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )
        return scope.finish(verified)


def embedding_cross_pairs_banded(
    left: DataFrame,
    right: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bands: int = 16,
    bits_per_band: int = 8,
    dim: int | None = None,
    seed: int = 42,
    probe_flips: int = 0,
    eager: bool = True,
) -> DataFrame:
    """CROSS-FRAME embedding-cosine near pairs: (left_id, right_id,
    cosine ≥ threshold) — the two-table form of
    ``embedding_near_dup_pairs_banded``, for probing one corpus against
    another (semantic decontamination, cross-snapshot dedup, join of a
    query workload against a reference set) without a store.

    Both sides are keyed with the SAME seeded hyperplane matrix (one
    Arrow batch pass each, zero shuffles), bands explode to (id, key)
    rows, and candidates come from a pure band-key equi-join LEFT ×
    RIGHT — never a cartesian; each side only meets the other, so the
    self-pair/a<b bookkeeping of the one-table operator disappears.
    Exact cosine verifies candidates only.

    Default band geometry differs from the dedup twin deliberately:
    near-DUP thresholds (≥ 0.999, θ ≤ 2.6°) suit few wide bands (8×32
    bits), but SEMANTIC thresholds (≈ 0.95, θ ≈ 18°) would see
    per-table collision P = (1 − θ/π)^32 ≈ 3% — recall ruin. At 16
    bands × 8 bits, P per table = (1 − θ/π)^8 ≈ 0.43 and recall =
    1 − (1 − P)^16 ≈ 99.99% at θ = 18°, while random pairs (θ ≈ 90°)
    collide at ≈ 16·2⁻⁸ per pair of tables — tune ``bands``/
    ``bits_per_band`` to the threshold via this formula.

    ``probe_flips`` is MULTI-PROBE on the RIGHT side only: each right
    (holdout/query) vector also emits every band key with its
    ``probe_flips`` lowest-|margin| bits flipped — the vectors most
    likely to have landed just across a hyperplane get a second look.
    Recall rises at zero LEFT-side (corpus) cost: the corpus keeps
    ``bands`` keys per vector; only the small side fans out to
    ``bands × (1 + probe_flips)`` keys (Lv et al. multi-probe — see
    ``functions.vectors.hyperplane_band_keys``).

    Returns (left_id, right_id, cosine). ``dim`` as in the one-table
    operator (probed with a 1-row ``first()`` when None)."""
    if dim is None:
        dim = left.select(F.size(F.col(vec_col)).alias("d")).first()["d"]

    def _keyed(df: DataFrame, tag: str, flips: int) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{tag}_id"),
            F.col(vec_col).alias(f"{tag}_v"),
            V.hyperplane_band_keys(
                F.col(vec_col), dim, bands, bits_per_band, seed,
                probe_flips=flips,
            ).alias("keys"),
        )

    with (_CacheScope() if eager else _LazyScope()) as scope:
        lk = scope.materialize(_keyed(left, "left", 0))
        rk = scope.materialize(_keyed(right, "right", probe_flips))
        cand = (
            lk.select("left_id", F.explode("keys").alias("bk"))
            .join(rk.select("right_id", F.explode("keys").alias("bk")), "bk")
            .select("left_id", "right_id")
            .distinct()
        )
        verified = (
            cand.join(lk.select("left_id", "left_v"), "left_id")
            .join(rk.select("right_id", "right_v"), "right_id")
            .withColumn(
                "cosine", rnd(V.cosine(F.col("left_v"), F.col("right_v")), 6)
            )
            .filter(F.col("cosine") >= threshold)
            .select("left_id", "right_id", "cosine")
        )
        return scope.finish(verified)


def decontaminate_semantic(
    corpus: DataFrame,
    holdout: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bands: int = 16,
    bits_per_band: int = 8,
    dim: int | None = None,
    seed: int = 42,
    probe_flips: int = 0,
) -> DataFrame:
    """SEMANTIC decontamination: drop corpus rows whose embedding is
    within ``threshold`` cosine of ANY holdout row — the embedding-level
    complement of n-gram decontamination (``q_decontaminate_ngram
    _overlap``): paraphrased or lightly-rewritten benchmark items share
    no 5-gram but sit close in embedding space, and a training corpus
    that keeps them leaks the benchmark anyway.

    Plan: ``embedding_cross_pairs_banded`` (band equi-join, exact-verify
    candidates only) → distinct contaminated ids → one left_anti join.
    The holdout is benchmark-sized — typically thousands of rows — so
    its keyed/exploded side broadcasts; the corpus-sized work is the
    map-only Arrow key pass plus one narrow-key shuffle. Returns the
    surviving corpus rows unchanged."""
    hits = embedding_cross_pairs_banded(
        corpus,
        holdout,
        vec_col=vec_col,
        id_col=id_col,
        threshold=threshold,
        bands=bands,
        bits_per_band=bits_per_band,
        dim=dim,
        seed=seed,
        probe_flips=probe_flips,
    )
    contaminated = hits.select(F.col("left_id").alias(id_col)).distinct()
    return corpus.join(contaminated, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    block_col: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (optionally blocked by a column).

    The quadratic baseline — correct at any threshold, O(n²) pairs. Use
    blocked (``block_col``) or behind MinHash-LSH at scale. Without
    ``block_col`` the pair set itself can be O(n²) at low thresholds —
    with ``eager=True`` those rows are checkpointed, so prefer
    ``eager=False`` (lazy; semantics as in ``minhash_lsh_pairs``) when
    composing a downstream filter/limit that would prune them.
    """
    with (_CacheScope() if eager else _LazyScope()) as scope:
        sh = (
            shingle_rows(df, text_col, id_col, shingle_n)
            .groupBy(id_col)
            .agg(F.collect_set("shingle").alias("shingles"))
        )
        if block_col is not None:
            sh = sh.join(df.select(id_col, block_col), id_col)
        sh = scope.materialize(sh)  # referenced by both sides of the pair join
        a = sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"})
        b = sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"})
        cond = F.col("id_a") < F.col("id_b")
        if block_col is not None:
            a = a.withColumnRenamed(block_col, "blk_a")
            b = b.withColumnRenamed(block_col, "blk_b")
            joined = a.join(b, (F.col("blk_a") == F.col("blk_b")) & cond)
        else:
            joined = a.crossJoin(b).filter(cond)
        pairs = (
            joined.withColumn("jaccard", rnd(Tx.jaccard(F.col("sh_a"), F.col("sh_b")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
        return scope.finish(pairs)


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    max_shingle_df: int = 5,
    eager: bool = True,
) -> DataFrame:
    """ASYMMETRIC near-duplicate pairs by n-gram containment:
    ``containment(A→B) = |A∩B| / |A|`` over distinct shingle sets.

    Catches what Jaccard-based MinHash-LSH structurally cannot: a short
    document embedded inside a much longer one has containment ≈ 1 but
    Jaccard ≈ |A|/|B| ≈ 0, so its minhash signatures almost never band
    together — yet it is exactly the quote/boilerplate/excerpt
    duplication a training corpus needs to find.

    Candidate generation is therefore NOT minhash banding but a
    rare-shingle inverted index: only shingles whose document frequency
    is ≤ ``max_shingle_df`` generate candidates (two docs sharing any
    rare shingle pair up). Ubiquitous shingles — the quadratic hazard —
    never join; a contained doc almost surely shares a rare shingle with
    its container (a doc ALL of whose shingles are corpus-common is
    boilerplate by definition and better handled by the repetition
    filter). Verification then computes exact containment both
    directions on the candidate pairs only.

    Returns (id_a, id_b, containment_a_in_b, containment_b_in_a,
    jaccard) for pairs with max-direction containment ≥ ``threshold``,
    a < b.

    Scale shape: shingle fan-out (one shuffle), a document-frequency
    aggregate reusing the shingle key, the rare-shingle self equi-join
    (bounded: ≤ max_shingle_df²/2 pairs per rare shingle), and two
    shingle-set lookups — the same join skeleton as ``minhash_lsh_pairs``
    with the band index swapped for the rare-shingle index.
    """
    with (_CacheScope() if eager else _LazyScope()) as scope:
        rows = scope.materialize(
            shingle_rows(df, text_col, id_col, shingle_n).distinct()
        )
        freq = rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfreq"))
        rare = rows.join(
            freq.filter(F.col("dfreq") <= max_shingle_df).select("shingle"),
            "shingle",
        )
        cand = (
            rare.alias("x")
            .join(
                rare.alias("y"),
                (F.col("x.shingle") == F.col("y.shingle"))
                & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
            )
            .select(
                F.col(f"x.{id_col}").alias("id_a"),
                F.col(f"y.{id_col}").alias("id_b"),
            )
            .distinct()
        )
        sh = rows.groupBy(id_col).agg(F.collect_set("shingle").alias("shingles"))
        verified = (
            cand.join(
                sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a"
            )
            .join(sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
            .withColumn(
                "n_inter", F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
            )
            .withColumn(
                "containment_a_in_b",
                rnd(F.col("n_inter") / F.size("sh_a"), 6),
            )
            .withColumn(
                "containment_b_in_a",
                rnd(F.col("n_inter") / F.size("sh_b"), 6),
            )
            .withColumn(
                "jaccard",
                rnd(
                    F.col("n_inter")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
                    6,
                ),
            )
            .filter(
                F.greatest("containment_a_in_b", "containment_b_in_a") >= threshold
            )
            .select(
                "id_a", "id_b", "containment_a_in_b", "containment_b_in_a", "jaccard"
            )
        )
        return scope.finish(verified)


def _anchor_window_rows(
    df: DataFrame, text_col: str, id_col: str, window: int, stride: int
) -> DataFrame:
    """(__id, __p, __h) rows — winnowing anchors + window hashes for the
    passage-dedup family, in ONE vectorized Arrow pass per document.

    Position ``p`` anchors iff a polynomial rolling hash of the 8-char
    gram at ``p`` is ≡ 0 mod ``stride`` (content-defined, so shared
    passages anchor at passage-relative positions in every host); each
    anchor's ``window``-char substring is md5'd for the cross-doc match.
    A pure-DataFrame formulation needs ``explode`` to ONE ROW PER
    CHARACTER before the anchor filter — ~100 TB of text becomes ~100 T
    rows through an exchange-free but very real row pipeline. Here the
    anchor test is a numpy sliding-window matmul over the document's
    code points (utf-32 decode keeps offsets CHARACTER-indexed, matching
    Python/Spark substring semantics for any script), and only the
    ~1/stride surviving anchors materialize as rows — the
    ``hyperplane_band_keys`` justification: batch-vectorized Arrow where
    per-element codegen would fan out absurdly. uint64 arithmetic wraps
    mod 2^64 — deterministic everywhere.

    Parallelism note: mapInPandas inherits the scan's partitioning — on
    few large files repartition the docs first (the testdata's
    one-row-group-per-file caveat)."""
    import pandas as pd

    k = 8

    def gen(batches):
        import hashlib

        import numpy as np

        # polynomial base then a golden-ratio multiply + top-bits fold:
        # a small base alone degenerates mod small strides (31 ≡ 1 mod
        # 10 collapsed the hash to a character-sum — measured), and the
        # anchor decision uses ``% stride`` where stride IS small
        powers = np.power(
            np.uint64(1_000_003), np.arange(k, dtype=np.uint64), dtype=np.uint64
        )
        golden = np.uint64(0x9E3779B97F4A7C15)
        for pdf in batches:
            out_id, out_p, out_h = [], [], []
            for i, t in zip(pdf["__id"], pdf["__t"]):
                # the anchor gram is k=8 chars, so texts shorter than
                # max(window, k) have no testable position — with a
                # window in [1, 8) a bare len<window guard would let a
                # 7-char text reach sliding_window_view(arr, 8), which
                # raises and fails the whole Arrow pass (ADVICE r7)
                if t is None or len(t) < max(window, k):
                    continue
                arr = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
                grams = np.lib.stride_tricks.sliding_window_view(arr, k)[
                    : len(arr) - window + 1
                ]
                h = (grams.astype(np.uint64) * powers).sum(
                    axis=1, dtype=np.uint64
                )
                h = (h * golden) >> np.uint64(32)
                for p in np.nonzero(h % np.uint64(stride) == 0)[0]:
                    out_id.append(i)
                    out_p.append(int(p))
                    out_h.append(
                        hashlib.md5(t[p : p + window].encode()).hexdigest()
                    )
            yield pd.DataFrame({"__id": out_id, "__p": out_p, "__h": out_h})

    return df.select(
        F.col(id_col).cast("long").alias("__id"), F.col(text_col).alias("__t")
    ).mapInPandas(gen, "__id long, __p long, __h string")



def duplicated_passage_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 50,
    stride: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Exact DUPLICATED-PASSAGE detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — public
    literature): find the character spans of each document that occur
    verbatim in at least ``min_docs`` distinct documents — boilerplate
    headers, license blocks, templated paragraphs — which document-level
    near-dup (MinHash) deliberately ignores because the HOST documents
    are distinct.

    The paper builds one corpus-wide suffix array — inherently
    single-machine. The Spark-native shape hashes ``window``-char
    substrings at CONTENT-DEFINED anchor positions (the winnowing /
    content-defined-chunking idea, Schleimer et al. 2003 — public
    literature): position ``p`` is an anchor iff the hash of the 8-char
    gram at ``p`` — a base-1000003 polynomial over the gram's code
    points, folded by a golden-ratio multiply + top-32-bit shift, all
    in wrapping uint64 (``_anchor_window_rows``) — is
    ``≡ 0 (mod stride)``. A fixed offset grid would
    only match passages that happen to be stride-ALIGNED across
    documents (measured: it silently misses almost everything);
    content-defined anchors land at the same positions RELATIVE TO THE
    PASSAGE in every document that contains it, so shared passages
    produce identical window hashes regardless of where they sit. A
    window hash held by ≥ ``min_docs`` DISTINCT docs marks its windows
    duplicated; each doc's surviving ``[p, p+window)`` spans merge into
    maximal islands via ``operators.temporal.coalesce_intervals`` (one
    shuffle, reused partitioning).

    Cost: the anchor test runs as ONE vectorized Arrow pass per document
    (``_anchor_window_rows`` — numpy sliding-window rolling hash; only
    the ~1/stride surviving anchors materialize as rows), linear in
    corpus characters with a BLAS-ish constant — the price of alignment
    robustness without a global suffix sort, which does not distribute.
    Expected anchors in a shared passage of length L: (L −
    window)/stride — passages shorter than ~window + stride may be
    probabilistically missed (raise precision by lowering ``stride``).

    Returns (id_col, span_start, span_end, n_windows) with 0-based
    [start, end) character offsets. Windows are md5-hashed, not
    compared — collisions are negligible at any corpus size. The anchor
    gram is fixed at k=8 chars, so texts shorter than max(window, 8)
    contribute no anchors (and windows narrower than 8 anchor on the
    8-char gram, not the window).
    """
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1, got {window}/{stride}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    from .temporal import coalesce_intervals

    wins = _anchor_window_rows(df, text_col, id_col, window, stride)
    # distinct-doc count per window hash WITHOUT a second derivation of
    # `wins` (r15): the groupBy(count_distinct) + join-back form
    # referenced the lazy Arrow anchor pass twice, so the whole
    # per-character Python pass ran TWICE per action (and the two
    # exchanges carry different payloads, so AQE exchange reuse cannot
    # collapse them). DISTINCT isn't allowed in a window aggregate, so
    # the count is the classic dense_rank-then-max pair over the SAME
    # __h partitioning — one derivation, one exchange, one sort. Skew
    # posture unchanged: a corpus-wide boilerplate hash concentrates
    # its rows in one partition exactly as the old __h join did.
    w_h = Window.partitionBy("__h")
    dup_wins = (
        wins.withColumn("__dr", F.dense_rank().over(w_h.orderBy("__id")))
        .withColumn("__nd", F.max("__dr").over(w_h))
        .filter(F.col("__nd") >= min_docs)
        .select("__id", "__p", (F.col("__p") + window).alias("__e"))
    )
    spans = coalesce_intervals(dup_wins, "__id", "__p", "__e", "__p")
    return spans.select(
        F.col("__id").alias(id_col),
        F.col("interval_start").cast("long").alias("span_start"),
        F.col("interval_end").cast("long").alias("span_end"),
        F.col("n_intervals").cast("long").alias("n_windows"),
    )


def duplicated_passage_fraction(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 50,
    stride: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-passage load: the fraction of each doc's
    characters covered by ``duplicated_passage_spans`` — the scalar a
    corpus gate thresholds on (drop or trim docs that are mostly shared
    boilerplate). Docs with no duplicated span report 0.0. Returns
    (id_col, n_chars, dup_chars, dup_fraction)."""
    from ..functions.rounding import rnd

    spans = duplicated_passage_spans(
        df, text_col, id_col, window=window, stride=stride, min_docs=min_docs
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_chars")
    )
    return (
        df.select(F.col(id_col), F.length(F.col(text_col)).alias("n_chars"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.col("n_chars").cast("long").alias("n_chars"),
            F.coalesce(F.col("dup_chars"), F.lit(0)).cast("long").alias(
                "dup_chars"
            ),
            rnd(
                F.coalesce(F.col("dup_chars"), F.lit(0))
                / F.greatest(F.col("n_chars"), F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
    )


def cut_duplicated_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 50,
    stride: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """The CUT half of the Lee et al. 2021 recipe: remove each shared
    passage from every document EXCEPT one canonical keeper, so the
    corpus retains exactly one copy of its boilerplate instead of
    dropping whole documents (``duplicated_passage_fraction`` gates;
    this trims).

    Keeper election is per window hash — the smallest ``id_col`` holding
    it (deterministic); a non-keeper doc's duplicated windows merge into
    maximal cut spans exactly as in ``duplicated_passage_spans``. The
    string surgery (splice out [start, end) ranges) runs as ONE Arrow
    ``mapInPandas`` pass over (text, spans-array) rows — per-doc python
    slicing is genuinely not expressible as codegen, and the pass is
    map-side after the span join. Untouched docs pass through unchanged.

    Returns (id_col, text_col, n_cut_chars) — ``text_col`` holds the
    trimmed text. Edges are ±``stride`` approximate, as in the span
    detector."""
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1, got {window}/{stride}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    import pandas as pd

    from .temporal import coalesce_intervals

    wins = _anchor_window_rows(df, text_col, id_col, window, stride)
    # same single-derivation rewrite as duplicated_passage_spans (r15):
    # distinct-doc count via dense_rank→max and the keeper election via
    # min(__id), all over ONE __h partitioning — the groupBy + join-back
    # form ran the per-character Arrow anchor pass twice per action
    w_h = Window.partitionBy("__h")
    cut_wins = (
        wins.withColumn("__dr", F.dense_rank().over(w_h.orderBy("__id")))
        .withColumn("__nd", F.max("__dr").over(w_h))
        .withColumn("__keeper", F.min("__id").over(w_h))
        .filter(
            (F.col("__nd") >= min_docs) & (F.col("__id") != F.col("__keeper"))
        )
        .select("__id", "__p", (F.col("__p") + window).alias("__e"))
    )
    spans = coalesce_intervals(cut_wins, "__id", "__p", "__e", "__p").select(
        F.col("__id"),
        F.struct(
            F.col("interval_start").cast("long").alias("s"),
            F.col("interval_end").cast("long").alias("e"),
        ).alias("__span"),
    )
    per_doc = spans.groupBy("__id").agg(F.collect_list("__span").alias("__spans"))
    joined = df.join(
        per_doc.withColumnRenamed("__id", id_col), id_col, "left"
    ).select(F.col(id_col), F.col(text_col), F.col("__spans"))

    out_schema = f"{id_col} long, {text_col} string, n_cut_chars long"

    def splice(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                t, spans_ = r[text_col], r["__spans"]
                if spans_ is None or len(spans_) == 0:
                    rows.append((r[id_col], t, 0))
                    continue
                ordered = sorted((s["s"], s["e"]) for s in spans_)
                kept, prev, cut = [], 0, 0
                for s, e in ordered:
                    kept.append(t[prev:s])
                    cut += e - s
                    prev = e
                kept.append(t[prev:])
                rows.append((r[id_col], "".join(kept), cut))
            yield pd.DataFrame(rows, columns=[id_col, text_col, "n_cut_chars"])

    return joined.mapInPandas(splice, out_schema)


def contamination_report(
    docs: DataFrame,
    holdout: DataFrame,
    *,
    holdout_id_col: str,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    max_example_ids: int = 5,
    eager: bool = True,
) -> DataFrame:
    """Per-benchmark-item contamination audit: for each holdout item,
    how many training documents share at least one word n-gram with it,
    how many DISTINCT n-grams are shared, and a bounded sample of the
    offending doc ids. The drop-stage (`build_corpus` 03_decontam)
    answers "is the corpus clean?"; this answers the QA follow-ups —
    "WHICH benchmark items leak, how badly, and through which docs" —
    before anyone decides whether the leak is real contamination or a
    common phrase that needs a longer n.

    Items with zero hits are included (left join) so the report's row
    count is the benchmark's size — absence of a row can't be confused
    with absence of leakage.

    Scale shape: holdout n-grams are benchmark-sized → broadcast; the
    corpus explodes to (doc_id, gram) rows that are FILTERED by the
    broadcast join before any shuffle, so only matched rows (rare by
    construction) reach the per-item aggregates. ``example_doc_ids`` is
    a sorted, `max_example_ids`-bounded sample serialized to a string —
    scalar output columns per the repo's oracle conventions — and the
    bound is applied BEFORE any aggregation (r8 VERDICT #1): a
    benchmark item containing one common phrase matches a corpus-sized
    doc set, and the old ``slice(array_sort(collect_set(...)))`` form
    aggregated EVERY matching id into a single grouped value before
    truncating — an executor-OOM shape in exactly the
    common-phrase case this report exists to adjudicate. Now a
    ``row_number() <= max_example_ids`` rank-limit over distinct
    (item, doc) pairs feeds the example list — Spark rewrites the
    filtered window to a WindowGroupLimit (plan-pinned in
    tests/test_contamination_report.py), so no per-item state ever
    exceeds `max_example_ids` rows — while separate ``count_distinct``
    aggregates (bounded sketch-free exact counts over matched rows)
    keep the true totals. Totals and examples share the holdout_id
    hash partitioning, so the final join adds no exchange.

    ``eager`` (default True) caches the matched rows — they feed BOTH
    the totals and examples branches, and without the cache Catalyst
    computes the corpus n-gram explode + broadcast join once per branch
    (review-verified: duplicated Generate/BroadcastHashJoin, zero
    ReusedExchange), doubling the report's dominant cost at 100 TB.
    Matched rows are rare by construction, so the cache is small; the
    result is localCheckpoint-ed and every intermediate freed, the
    ``minhash_lsh_pairs`` lifecycle.
    """
    from ..functions.text import word_ngrams_fast

    # word_ngrams_fast: codegen + map-only gram explode (9x the
    # interpreted word_shingles form on the corpus side, r10); its
    # non-distinct grams are safe here — the hold side dedups, the
    # totals are count_distinct, and the example list dedups
    # (holdout_id, doc) pairs before ranking
    hold = holdout.select(
        F.col(holdout_id_col).alias("holdout_id"),
        F.explode(word_ngrams_fast(F.col(text_col), n)).alias("gram"),
    ).distinct()
    doc_grams = docs.select(
        F.col(doc_id_col).alias("__doc"),
        F.explode(word_ngrams_fast(F.col(text_col), n)).alias("gram"),
    )
    with (_CacheScope() if eager else _LazyScope()) as scope:
        matched = scope.materialize(
            doc_grams.join(F.broadcast(hold), "gram")
        )
        return scope.finish(
            _contamination_rollup(
                matched, holdout, holdout_id_col, max_example_ids
            )
        )


def _contamination_rollup(
    matched: DataFrame,
    holdout: DataFrame,
    holdout_id_col: str,
    max_example_ids: int,
) -> DataFrame:
    totals = matched.groupBy("holdout_id").agg(
        F.count_distinct("__doc").cast("bigint").alias("contaminated_docs"),
        F.count_distinct("gram").cast("bigint").alias("shared_grams"),
    )
    w = Window.partitionBy("holdout_id").orderBy("__doc")
    examples = (
        matched.select("holdout_id", "__doc")
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_example_ids)
        .groupBy("holdout_id")
        .agg(
            F.concat_ws(
                ",",
                F.array_sort(F.collect_list("__doc")).cast("array<string>"),
            ).alias("example_doc_ids")
        )
    )
    hits = totals.join(examples, "holdout_id", "left")
    all_items = holdout.select(
        F.col(holdout_id_col).alias("holdout_id")
    ).distinct()
    return (
        all_items.join(hits, "holdout_id", "left")
        .select(
            "holdout_id",
            F.coalesce("contaminated_docs", F.lit(0)).alias("contaminated_docs"),
            F.coalesce("shared_grams", F.lit(0)).alias("shared_grams"),
            F.coalesce("example_doc_ids", F.lit("")).alias("example_doc_ids"),
        )
        .orderBy(F.desc("contaminated_docs"), F.asc("holdout_id"))
    )


def semantic_diversity_prune(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    keep_frac: float,
    n_cells: int = 64,
    n_iter: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic DIVERSITY pruning (Abbas et al. 2023,
    arXiv:2303.09540 — the rank-cut tier): cluster the embedding space,
    then within each cluster DROP the points most similar to their
    centroid (the semantically redundant core) and keep the
    ``keep_frac`` least-redundant fraction — corpus-level redundancy
    removal, the step after near-dup PAIR detection
    (`embedding_near_dup_pairs_banded` finds copies; this thins
    clouds of the same content that never cross a pair threshold).

    Mechanics, all existing primitives: centroids from
    ``similarity.kmeans_lloyd_centroids`` trained on the non-NULL
    subset (or pass a persisted ``centroids`` frame — train once,
    prune many); assignment is a ROW-LOCAL argmax against the
    driver-collected k x dim centroid literal
    (``functions.vectors.nearest_cells_local`` — zero shuffle; the
    r13 crossJoin + per-id window formulation hash-exchanged
    corpus x n_cells full-width rows, text and vectors included);
    redundancy = cosine(v, own centroid); the per-cell rank cut is
    ``evaluation.score_quantile_normalize`` over cell groups — the
    bucketed prefix sum, so no window ever sorts a whole cell (cells
    are corpus-scale/n_cells — exactly the single-task trap a naive
    per-cell ``percent_rank`` would hit). A TIED redundancy block maps
    to one average-rank value, so it is kept or dropped atomically —
    deterministic and permutation-invariant.

    Rows the pruner cannot judge are KEPT, with NULL ``cell_id`` /
    ``centroid_sim`` / ``keep_rank``: both NULL embeddings and
    zero-norm embeddings (whose cosine is undefined — the null-safe
    form, so ANSI mode cannot turn them into a divide error). The
    pruner cannot judge redundancy it cannot see, and silently
    dropping such rows would shrink the corpus on a data bug (the
    module's audit posture; r13 ADVICE #1).

    Returns the kept rows: every input column plus ``cell_id``,
    ``centroid_sim`` (6dp), ``keep_rank`` (the per-cell average-rank
    percentile of redundancy — low = diverse = kept first).
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    # pass-everything-through contract: output/temp names must not
    # collide with user columns (the r13 review-#4 bug class — refuse
    # loudly instead of silently clobbering or failing ambiguous)
    reserved = {
        "cell_id", "centroid_sim", "keep_rank", "__nc",
    } & set(df.columns)
    if reserved:
        raise ValueError(
            f"input columns collide with this operator's output/temp "
            f"names: {sorted(reserved)} — rename them first"
        )
    from .evaluation import score_quantile_normalize
    from .similarity import collect_cells, kmeans_lloyd_centroids

    has_vec = df.filter(F.col(vec_col).isNotNull())
    if centroids is None:
        # train on the non-NULL subset (r13 ADVICE #2): with min_id
        # seeding a NULL-vector row with a small id would become a
        # NULL-centroid seed, wasting a cell and perturbing assignment
        centroids = kmeans_lloyd_centroids(
            has_vec, vec_col=vec_col, id_col=id_col,
            n_cells=n_cells, n_iter=n_iter,
        )
    cells = collect_cells(centroids)
    null_triple = (
        F.lit(None).cast("long").alias("cell_id"),
        F.lit(None).cast("double").alias("centroid_sim"),
        F.lit(None).cast("double").alias("keep_rank"),
    )
    if not cells:
        # nothing to judge against: keep everything, unjudged
        return df.select(*df.columns, *null_triple)
    nearest = F.element_at(
        V.nearest_cells_local(F.col(vec_col), cells, 1), 1
    )
    assigned = has_vec.select(*df.columns, nearest.alias("__nc"))
    judged = assigned.filter(F.col("__nc")["sim"].isNotNull()).select(
        *df.columns,
        F.col("__nc")["cell_id"].alias("cell_id"),
        F.col("__nc")["sim"].alias("centroid_sim"),
    )
    # zero-norm embeddings: cosine undefined -> NULL sim -> kept with
    # NULLs (they must not fall through the keep_rank filter; ADVICE #1)
    unjudgeable = assigned.filter(F.col("__nc")["sim"].isNull()).select(
        *df.columns, *null_triple
    )
    ranked = score_quantile_normalize(
        judged, "centroid_sim", ["cell_id"], out_col="keep_rank"
    )
    kept = ranked.filter(F.col("keep_rank") <= F.lit(float(keep_frac)))
    skipped = df.filter(F.col(vec_col).isNull()).select(
        *df.columns, *null_triple
    )
    return kept.unionByName(skipped).unionByName(unjudgeable)
