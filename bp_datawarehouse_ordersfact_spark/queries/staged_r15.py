"""STAGED registry query for the round-15 rotation (not yet in
``queries._MODULES`` — the sketches_r6/staged_r10 staging discipline:
write the query + oracle + driver-style test ahead of activation, so
the activation is a mechanical edit).

One query: ``phash_near_dup`` — `operators.dedup.phash_pairs` (the
perceptual-hash multimodal member of the dedup family) is the last
dedup path with only pytest pins: exact/MinHash/SimHash/embedding-LSH/
passage-span all have driver rows; the pHash band join does not.

The fixture follows the planted recipe (ids >= 4x10^7, above every
testdata id range and the other staged plants): five engineered 64-byte
payloads — under the documented fake decode tier (bytes ARE pixels,
one byte per aHash block) each byte maps to exactly one fingerprint
bit, so hamming distances between plants are pure byte arithmetic
(flip-k-blocks => hamming k), re-derived from the pure-numpy aHash
replica in the staged test. The real corpus unions in as
``encode(text)`` payloads, so the bench pays the operator's true cost
shape — the Arrow fingerprint pass over every payload byte and the
(band, band_value) self-join — while the output filter keeps only
pairs whose BOTH sides are planted (id_a >= the plant floor implies
id_b too, since id_a < id_b), making the planted answer unperturbable
by real near-dups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..operators.dedup import phash_pairs

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _plant_bytes() -> list[tuple[int, bytes]]:
    """Five 64-byte payloads; one byte per aHash block (n=64 pixels).

    Base pattern A = [200]*32 + [10]*32 (bits: 32 ones then 32 zeros).
    B flips blocks {0, 63} of A (same value multiset, same mean) ->
    hamming(A,B)=2; C flips block {1} -> hamming(A,C)=1, hamming(B,C)=3;
    D is A inverted -> hamming 64 from all of A/B/C (never pairs);
    E duplicates A byte-for-byte -> hamming 0.
    """
    a = [200] * 32 + [10] * 32
    b = list(a)
    b[0], b[63] = 10, 200
    c = list(a)
    c[1] = 10
    d = [10] * 32 + [200] * 32
    return [
        (40_000_000, bytes(a)),
        (40_000_001, bytes(b)),
        (40_000_002, bytes(c)),
        (40_000_003, bytes(d)),
        (40_000_004, bytes(a)),
    ]


@register(
    "phash_near_dup",
    """
    SELECT * FROM (VALUES
      (CAST(40000000 AS BIGINT), CAST(40000001 AS BIGINT), CAST(2 AS INT)),
      (CAST(40000000 AS BIGINT), CAST(40000002 AS BIGINT), CAST(1 AS INT)),
      (CAST(40000000 AS BIGINT), CAST(40000004 AS BIGINT), CAST(0 AS INT)),
      (CAST(40000001 AS BIGINT), CAST(40000002 AS BIGINT), CAST(3 AS INT)),
      (CAST(40000001 AS BIGINT), CAST(40000004 AS BIGINT), CAST(2 AS INT)),
      (CAST(40000002 AS BIGINT), CAST(40000004 AS BIGINT), CAST(1 AS INT))
    ) AS t(id_a, id_b, hamming)
    """,
)
def q_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over opaque binary payloads
    (`operators.dedup.phash_pairs`): 64-bit aHash fingerprint in one
    Arrow pass, then the pigeonhole (band, band_value) equi-join —
    exact recall for hamming <= 3 with 4 bands, never an all-pairs
    product.

    Why a typed VALUES oracle is a deterministic twin: the planted
    payloads are 64 bytes each, so under the fake decode tier every
    byte is one aHash block and every pairwise hamming is byte
    arithmetic over the invented literals — re-derived from the
    pure-numpy aHash replica in the staged test (which also re-checks
    the pigeonhole premise: every expected pair shares at least one
    exact 16-bit band). The real corpus unions in as encoded text
    payloads and pays the full fingerprint + band-join cost at bench
    scale; real near-dups (duplicate documents DO exist in the
    testdata) cannot perturb the output because both pair sides must
    be planted, and id_a < id_b makes `id_a >= plant floor` imply
    that."""
    real = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    planted = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in _plant_bytes()],
        "doc_id long, payload binary",
    )
    pool = real.unionByName(planted)
    pairs = phash_pairs(pool, "payload", "doc_id", max_hamming=3, n_bands=4)
    return pairs.filter(F.col("id_a") >= 40_000_000).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )
