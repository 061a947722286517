"""STAGED registry queries for the round-15 rotation (not yet in
``queries._MODULES`` — the sketches_r6/staged_r10 staging discipline:
write the query + oracle + driver-style test ahead of activation, so
the activation is a mechanical edit).

Two queries closing the last pytest-only operator gaps:

- ``phash_near_dup`` — `operators.dedup.phash_pairs` (the
  perceptual-hash multimodal member of the dedup family) is the last
  dedup path with only pytest pins: exact/MinHash/SimHash/embedding-
  LSH/passage-span all have driver rows; the pHash band join does not.
- ``sft_ingest_stream`` — `streaming.jobs.run_sft_ingest_stream` (the
  foreachBatch three-way-routed conversation ingest) is the one
  streaming job without a driver row. Fixture-bound by necessity (it
  ingests a rendered JSONL feed, not the sf tables) — the
  `host_authority`/`domain_e2e` class: at activation add it to bench
  EXCLUDED ("fixture-bound — ignores sf_dir").

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


# ---------------------------------------------------------------------------
# sft_ingest_stream — two JSONL micro-batch files (ids >= 4.1x10^7)
# covering every route: two training-ready dialogs (with and without a
# leading system turn), three structurally-invalid ones (stray system,
# empty dialog, non-alternating roles — distinct validate_conversations
# reasons), and one unparseable raw line. The query renders the feed
# into a fresh temp dir, runs the availableNow stream to completion,
# and reads the three sinks back as one scalar-columns frame.
# ---------------------------------------------------------------------------


def _sft_rec(cid: int, turns: list[tuple[str, str]]) -> str:
    import json

    return json.dumps(
        {
            "conv_id": cid,
            "conversation": [
                {"role": r, "content": c} for r, c in turns
            ],
        }
    )


_SFT_BAD_LINE = "{not valid json at all"

# file name -> raw lines; names sort in landing order, so the
# batch-id->file assignment (and therefore the whole run) reproduces
# across invocations and replays
_SFT_FEED = [
    (
        "b1.jsonl",
        [
            _sft_rec(41_000_000, [("user", "hi"), ("assistant", "hello")]),
            _sft_rec(41_000_001, [("user", "q"), ("system", "late prompt")]),
            _SFT_BAD_LINE,
        ],
    ),
    (
        "b2.jsonl",
        [
            _sft_rec(
                41_000_002,
                [("system", "be terse"), ("user", "a"), ("assistant", "b")],
            ),
            _sft_rec(41_000_003, []),
            _sft_rec(41_000_004, [("user", "x"), ("user", "y")]),
        ],
    ),
]


def _sft_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("conv_id", T.LongType()),
            T.StructField(
                "conversation",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("role", T.StringType()),
                            T.StructField("content", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )


@register(
    "sft_ingest_stream",
    """
    SELECT * FROM (VALUES
      (CAST(41000000 AS BIGINT), 'ready',      CAST(2 AS INT), ''),
      (CAST(41000002 AS BIGINT), 'ready',      CAST(3 AS INT), ''),
      (CAST(41000001 AS BIGINT), 'invalid',    CAST(2 AS INT), 'system_not_leading'),
      (CAST(41000003 AS BIGINT), 'invalid',    CAST(0 AS INT), 'empty'),
      (CAST(41000004 AS BIGINT), 'invalid',    CAST(2 AS INT), 'non_alternating_roles'),
      (CAST(-1 AS BIGINT),       'quarantine', CAST(0 AS INT), '{not valid json at all')
    ) AS t(conv_id, route, n_turns, detail)
    """,
)
def q_sft_ingest_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SFT ingest (`streaming.jobs.run_sft_ingest_stream`):
    JSONL files -> availableNow micro-batches -> one shared from_json
    pass -> three-way route (training-ready / invalid-with-reason /
    parse quarantine), every sink an own-partition overwrite so
    replays are idempotent.

    Why a typed VALUES oracle is a deterministic twin: every routed
    row is a pure function of the planted JSONL literals under the
    documented parse + validate_conversations contracts — the reason
    vocabulary is re-derived in the staged test by running the batch
    validator directly on the same records, so the literals are never
    the only place the answer lives. Fixture-bound (the feed is
    rendered, not read from sf_dir): the stream runs end-to-end each
    invocation in a fresh temp dir (file names sort in landing order,
    so batch assignment reproduces), and the result reads the sinks
    back as scalar columns (conv_id, route, n_turns, detail; the
    quarantine row keys as -1 — no NULL sort keys, no array columns).
    The temp dir is left for the OS tmp reaper: the returned frame is
    lazy over the sink files. At activation: bench-EXCLUDE
    ("fixture-bound — ignores sf_dir")."""
    import os
    import tempfile

    from ..streaming.jobs import run_sft_ingest_stream

    work = tempfile.mkdtemp(prefix="sft_ingest_query_")
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    for fname, lines in _SFT_FEED:
        with open(os.path.join(feed, fname), "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")
    sink = os.path.join(work, "sink")
    run_sft_ingest_stream(
        spark, feed, sink, _sft_schema(), files_per_trigger=1
    )

    ready = spark.read.parquet(sink).select(
        "conv_id",
        F.lit("ready").alias("route"),
        F.size("conversation").cast("int").alias("n_turns"),
        F.lit("").alias("detail"),
    )
    invalid = spark.read.parquet(sink + "_invalid").select(
        "conv_id",
        F.lit("invalid").alias("route"),
        F.coalesce(F.size("conversation"), F.lit(0)).cast("int").alias("n_turns"),
        F.col("conv_invalid_reason").alias("detail"),
    )
    quarantine = spark.read.parquet(sink + "_parse_quarantine").select(
        F.lit(-1).cast("long").alias("conv_id"),
        F.lit("quarantine").alias("route"),
        F.lit(0).cast("int").alias("n_turns"),
        F.col("_corrupt_record").alias("detail"),
    )
    return ready.unionByName(invalid).unionByName(quarantine)
