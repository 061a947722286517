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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import rnd

from ..functions import text as Tx


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


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (a < b) via MinHash-LSH banding + exact
    Jaccard verification of candidates only.

    Plan shape: map (signature) → explode bands (k/bands rows per doc)
    → self equi-join on (band, band_hash) → distinct pairs → join back
    shingles → filter jaccard ≥ threshold. The only shuffles are the
    band join and the two shingle lookups; all are on uniform hash keys.
    """
    rows_per_band = k // bands
    # Materialization boundaries matter here: without them Catalyst
    # inlines the shingle/signature expressions into every downstream
    # reference (both sides of the band self-join, plus the two
    # verification joins), recomputing millions of md5 folds. Locally a
    # cache() is the boundary; at 100 TB this is a staged signature table.
    sh_base = with_shingles(df, text_col, id_col, shingle_n).cache()
    sig = sh_base.withColumn("sig", Tx.minhash_signature(F.col("shingles"), k))
    banded = sig.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bh").cache()

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

    sh = sh_base.select(F.col(id_col), "shingles")
    verified = (
        cand.join(sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"}), "id_b")
        .withColumn("jaccard", rnd(Tx.jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Blocking: a pair within hamming ≤ 3 of a 32-bit fingerprint must agree
    exactly on at least one of 4 8-bit bands (pigeonhole) — so candidates
    come from 4 band equi-joins, never an all-pairs product.
    """
    # cache = materialization boundary: the 32-fold SimHash expression
    # would otherwise be recomputed on both sides of the self-join
    fp = df.select(
        F.col(id_col).alias("doc"),
        Tx.simhash32(Tx.tokens(F.col(text_col))).alias("fp"),
    ).cache()
    banded = fp.select(
        "doc",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("fp"), 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc", "fp", "bb.band", "bb.bv")
    cand = (
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
            F.col("x.fp").alias("fp_a"),
            F.col("y.fp").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (optionally blocked by a column).

    The quadratic baseline — correct at any threshold, O(n²) pairs. Use
    blocked (``block_col``) or behind MinHash-LSH at scale.
    """
    sh = with_shingles(df, text_col, id_col, shingle_n)
    if block_col is not None:
        sh = sh.join(df.select(id_col, block_col), id_col)
    sh = sh.cache()  # referenced by both sides of the pair join
    a = sh.withColumnsRenamed({id_col: "id_a", "shingles": "sh_a"})
    b = sh.withColumnsRenamed({id_col: "id_b", "shingles": "sh_b"})
    cond = F.col("id_a") < F.col("id_b")
    if block_col is not None:
        a = a.withColumnRenamed(block_col, "blk_a")
        b = b.withColumnRenamed(block_col, "blk_b")
        joined = a.join(b, (F.col("blk_a") == F.col("blk_b")) & cond)
    else:
        joined = a.crossJoin(b).filter(cond)
    return (
        joined.withColumn("jaccard", rnd(Tx.jaccard(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
