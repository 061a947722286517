"""Perceptual-hash (aHash) near-dup for binary/image payloads — the
multimodal member of the dedup family — plus the factored 64-bit
pigeonhole band join it shares with SimHash.

Pins: the Spark fingerprint is byte-identical to a pure-numpy replica
(incl. short / empty / null payloads), the pair set equals an all-pairs
numpy brute force at every pigeonhole-valid (max_hamming, n_bands)
combination, invalid band configs raise instead of silently losing
recall, and the plan is a band equi-join — never a cartesian.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("phash-dedup")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _ahash_halves(buf: bytes) -> tuple[int, int]:
    """Pure-numpy replica of operators.multimodal.ahash64's fake tier."""
    px = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    if len(px) < 64:
        px = np.pad(px, (0, 64 - len(px)))
    n = len(px)
    bounds = (np.arange(64, dtype=np.int64) * n) // 64
    sums = np.add.reduceat(px, bounds)
    widths = np.diff(np.append(bounds, n))
    means = sums / widths
    bits = (means > means.mean()).astype(np.uint64)
    w32 = 1 << np.arange(32, dtype=np.uint64)
    return int(bits[:32] @ w32), int(bits[32:] @ w32)


def _hamming(a: tuple[int, int], b: tuple[int, int]) -> int:
    return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")


def _planted_images(n_base=12, n_noise=30, size=256, seed=23):
    """Random byte 'images': each base gets an exact copy (hamming 0)
    and a lightly perturbed copy (a few bytes nudged — flips few of the
    64 block-mean bits), plus unrelated noise payloads."""
    rng = np.random.default_rng(seed)
    payloads = []
    for _ in range(n_base):
        base = rng.integers(0, 256, size=size, dtype=np.uint8)
        near = base.copy()
        idx = rng.choice(size, size=3, replace=False)
        near[idx] = np.clip(near[idx].astype(np.int64) + 7, 0, 255).astype(np.uint8)
        payloads += [base.tobytes(), base.tobytes(), near.tobytes()]
    for _ in range(n_noise):
        payloads.append(
            rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        )
    return payloads


def _brute_pairs(payloads, max_hamming):
    fps = [_ahash_halves(b) for b in payloads]
    return {
        (i, j, _hamming(fps[i], fps[j]))
        for i in range(len(fps))
        for j in range(i + 1, len(fps))
        if _hamming(fps[i], fps[j]) <= max_hamming
    }


def test_ahash64_matches_pure_numpy_replica(spark):
    from bp_datawarehouse_ordersfact_spark.operators.multimodal import ahash64

    rng = np.random.default_rng(5)
    payloads = [
        rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        for n in (256, 300, 64, 63, 7, 1)
    ] + [b""]
    rows = [Row(img_id=i, payload=bytearray(b)) for i, b in enumerate(payloads)]
    rows.append(Row(img_id=len(payloads), payload=None))
    df = spark.createDataFrame(rows, schema="img_id long, payload binary")
    got = {r.img_id: (r.fp1, r.fp2) for r in ahash64(df, "payload", "img_id").collect()}
    want = {i: _ahash_halves(b) for i, b in enumerate(payloads)}
    want[len(payloads)] = _ahash_halves(b"")  # null hashes like empty
    assert got == want
    # empty payload: zero pixels -> all block means 0 -> no bit set
    assert got[len(payloads) - 1] == (0, 0)


def test_phash_pairs_equal_bruteforce(spark):
    """Pair set == numpy all-pairs truth at the default (3, 4 bands):
    pigeonhole recall is exact, hamming verify kills false candidates."""
    from bp_datawarehouse_ordersfact_spark.operators.dedup import phash_pairs

    payloads = _planted_images()
    truth = _brute_pairs(payloads, max_hamming=3)
    # the plant worked: every exact-copy pair (hamming 0) is in truth
    assert len([t for t in truth if t[2] == 0]) >= 12
    df = spark.createDataFrame(
        [Row(img_id=i, payload=bytearray(b)) for i, b in enumerate(payloads)],
        schema="img_id long, payload binary",
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_pairs(df, "payload", "img_id").collect()
    }
    assert got == truth


def test_phash_pairs_wider_bands_match_bruteforce(spark):
    """n_bands=8 widens the exact-recall regime to hamming <= 7; the
    pair set still equals brute force (same corpus, looser threshold)."""
    from bp_datawarehouse_ordersfact_spark.operators.dedup import phash_pairs

    payloads = _planted_images(n_base=8, n_noise=16)
    truth = _brute_pairs(payloads, max_hamming=7)
    df = spark.createDataFrame(
        [Row(img_id=i, payload=bytearray(b)) for i, b in enumerate(payloads)],
        schema="img_id long, payload binary",
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_pairs(df, "payload", "img_id", max_hamming=7, n_bands=8).collect()
    }
    assert got == truth
    assert truth > _brute_pairs(payloads, max_hamming=0)  # threshold matters


def test_fp64_band_pairs_rejects_recall_losing_configs(spark):
    from bp_datawarehouse_ordersfact_spark.operators.dedup import phash_pairs

    df = spark.createDataFrame(
        [Row(img_id=0, payload=bytearray(b"\x00" * 64))],
        schema="img_id long, payload binary",
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_pairs(df, "payload", "img_id", max_hamming=4, n_bands=4)
    with pytest.raises(ValueError, match="n_bands"):
        phash_pairs(df, "payload", "img_id", max_hamming=3, n_bands=5)


def test_phash_pairs_plan_is_band_equijoin(spark):
    """The candidate join is an equi-join on (band, bv) — no cartesian
    product / nested-loop join may appear for the self-join."""
    from bp_datawarehouse_ordersfact_spark.operators.dedup import phash_pairs

    payloads = _planted_images(n_base=4, n_noise=8)
    df = spark.createDataFrame(
        [Row(img_id=i, payload=bytearray(b)) for i, b in enumerate(payloads)],
        schema="img_id long, payload binary",
    )
    pairs = phash_pairs(df, "payload", "img_id", eager=False)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_unchanged_by_band_join_factoring(spark):
    """The shared fp64_band_pairs extraction is behavior-preserving for
    simhash_pairs: planted near-identical texts still pair at low
    hamming, unrelated texts stay unpaired."""
    from bp_datawarehouse_ordersfact_spark.operators.dedup import simhash_pairs

    dup = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        Row(doc_id=1, text=dup),
        Row(doc_id=2, text=dup),  # exact dup: hamming 0 by construction
        Row(doc_id=3, text="completely unrelated legal boilerplate about indemnification clauses"),
    ]
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(
            spark.createDataFrame(rows), "text", "doc_id", max_hamming=3
        ).collect()
    }
    assert (1, 2, 0) in got
    assert all(3 not in p[:2] for p in got)
