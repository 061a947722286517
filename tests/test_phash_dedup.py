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


# ---------------------------------------------------------------------------
# Real-pixel tier (r8 VERDICT #5): numpy-only BMP decode behind ahash64's
# decode swap point — the image path end-to-end real for one format.
# ---------------------------------------------------------------------------


def _make_bmp(pixels_rgb, top_down=False) -> bytes:
    """Pure-Python 24-bpp BI_RGB BMP writer (the test's independent
    reference — struct only, no numpy): pixels_rgb is a list of rows,
    each a list of (r, g, b). Writes bottom-up (the format default) or
    top-down (negative height), with rows padded to 4-byte boundaries."""
    import struct

    h, w = len(pixels_rgb), len(pixels_rgb[0])
    row_pad = (-(w * 3)) % 4
    rows = pixels_rgb if top_down else list(reversed(pixels_rgb))
    body = b"".join(
        b"".join(bytes((b_, g, r)) for r, g, b_ in row) + b"\x00" * row_pad
        for row in rows
    )
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    return header + dib + body


def _gray_py(pixels_rgb):
    """Pure-Python BT.601 integer luma — the decoder's reference."""
    return [
        [(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in row]
        for row in pixels_rgb
    ]


def test_decode_bmp_gray_matches_pure_python_reference():
    from bp_datawarehouse_ordersfact_spark.operators.multimodal import (
        decode_bmp_gray,
    )

    # 3x5 image (w=5 → 15 row bytes → 1 pad byte) with asymmetric
    # content so a row-order or channel-order bug can't cancel out
    px = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30), (200, 100, 50)],
        [(0, 0, 0), (255, 255, 255), (128, 128, 128), (1, 2, 3), (40, 50, 60)],
        [(5, 5, 5), (250, 10, 10), (10, 250, 10), (10, 10, 250), (77, 88, 99)],
    ]
    want = _gray_py(px)
    for top_down in (False, True):
        got = decode_bmp_gray(_make_bmp(px, top_down=top_down))
        assert got.shape == (3, 5)
        assert got.tolist() == want, f"top_down={top_down}"


def test_decode_bmp_gray_rejects_unsupported_loudly():
    import struct

    from bp_datawarehouse_ordersfact_spark.operators.multimodal import (
        decode_bmp_gray,
    )

    with pytest.raises(ValueError, match="magic"):
        decode_bmp_gray(b"PNG" + b"\x00" * 60)
    ok = _make_bmp([[(1, 2, 3)]])
    # flip bpp to 8 (palette) — must refuse, not decode garbage
    bad_bpp = ok[:28] + struct.pack("<H", 8) + ok[30:]
    with pytest.raises(ValueError, match="24-bpp"):
        decode_bmp_gray(bad_bpp)
    # declare RLE compression — must refuse
    bad_comp = ok[:30] + struct.pack("<I", 1) + ok[34:]
    with pytest.raises(ValueError, match="24-bpp"):
        decode_bmp_gray(bad_comp)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp_gray(ok[:-2])


def _bmp_fixture(seed=7, n=6, w=16, h=8):
    """Deterministic random BMPs + a near-dup (few pixels nudged) and an
    exact copy of image 0."""
    rng = np.random.default_rng(seed)
    imgs = []
    for _ in range(n):
        imgs.append(
            [[tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(w)]
             for _ in range(h)]
        )
    near = [row[:] for row in imgs[0]]
    near[0][0] = (255, 255, 255)
    near[h // 2][w // 2] = (0, 0, 0)
    return imgs, near


def test_ahash64_real_bmp_pixels_match_pure_python_hash(spark):
    """Known-hash pin: ahash64(decode=decode_bmp_gray) over planted BMP
    bytes equals the pure-Python pipeline (BMP writer → integer luma →
    the block-mean hash replica) — the whole image path real, no numpy
    in the reference."""
    from bp_datawarehouse_ordersfact_spark.operators.multimodal import (
        ahash64,
        decode_bmp_gray,
    )

    imgs, near = _bmp_fixture()
    payloads = [_make_bmp(p) for p in imgs] + [_make_bmp(near)]
    df = spark.createDataFrame(
        [Row(img_id=i, payload=bytearray(p)) for i, p in enumerate(payloads)],
        "img_id long, payload binary",
    )
    got = {
        r.img_id: (r.fp1, r.fp2)
        for r in ahash64(df, "payload", "img_id", decode=decode_bmp_gray).collect()
    }
    for i, (p, px) in enumerate(zip(payloads, imgs + [near])):
        flat = bytes(v for row in _gray_py(px) for v in row)
        assert got[i] == _ahash_halves(flat), f"img {i}"
    # the near-dup hashes close to its base; an unrelated image doesn't
    d_near = _hamming(got[0], got[len(payloads) - 1])
    d_far = min(_hamming(got[0], got[j]) for j in range(1, len(imgs)))
    assert d_near <= 3 < d_far, (d_near, d_far)


def test_phash_pairs_real_bmp_decode_finds_planted_near_dup(spark):
    from bp_datawarehouse_ordersfact_spark.operators.dedup import phash_pairs
    from bp_datawarehouse_ordersfact_spark.operators.multimodal import (
        decode_bmp_gray,
    )

    imgs, near = _bmp_fixture()
    payloads = [_make_bmp(p) for p in imgs] + [_make_bmp(near), _make_bmp(imgs[0])]
    df = spark.createDataFrame(
        [Row(img_id=i, payload=bytearray(p)) for i, p in enumerate(payloads)],
        "img_id long, payload binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_pairs(
            df, "payload", "img_id", decode=decode_bmp_gray
        ).collect()
    }
    n_near, n_copy = len(payloads) - 2, len(payloads) - 1
    assert pairs[(0, n_copy)] == 0  # exact copy
    assert (0, n_near) in pairs and pairs[(0, n_near)] <= 3  # near-dup
    assert (n_near, n_copy) in pairs  # transitively near


def test_ahash64_real_decode_raises_on_null_payload(spark):
    """r9 ADVICE: with a real decoder a NULL payload is a decode
    failure — it must raise with the offending ids, never silently
    produce the all-zero fake-tier fingerprint (which would pair NULL
    rows as near-duplicates of each other and of dark images)."""
    import pytest as _pytest

    from bp_datawarehouse_ordersfact_spark.operators.multimodal import (
        ahash64,
        decode_bmp_gray,
    )

    imgs, _ = _bmp_fixture()
    rows = [Row(img_id=0, payload=bytearray(_make_bmp(imgs[0]))),
            Row(img_id=7, payload=None)]
    df = spark.createDataFrame(rows, "img_id long, payload binary")
    with _pytest.raises(Exception, match="NULL payload.*img_ids \\[7\\]|img_ids \\[7\\]"):
        ahash64(df, "payload", "img_id", decode=decode_bmp_gray).collect()
    # filtering NULLs upstream is the documented opt-out
    ok = ahash64(
        df.filter("payload IS NOT NULL"), "payload", "img_id",
        decode=decode_bmp_gray,
    ).collect()
    assert [r.img_id for r in ok] == [0]
    # the fake tier's null-hashes-like-empty contract is unchanged
    fake = {r.img_id: (r.fp1, r.fp2) for r in ahash64(df, "payload", "img_id").collect()}
    assert fake[7] == _ahash_halves(b"")


def test_ahash64_null_payload_guard_reports_nonint_ids(spark):
    """r10 ADVICE: the guard used int(i) on the offending ids, so a
    non-integer id column made the ERROR PATH ITSELF raise an unrelated
    ValueError and hide the real diagnosis. The message must name the
    ids verbatim whatever their type."""
    import pytest as _pytest

    from bp_datawarehouse_ordersfact_spark.operators.multimodal import (
        ahash64,
        decode_bmp_gray,
    )

    df = spark.createDataFrame(
        [Row(img_id="frame-00042", payload=None)],
        "img_id string, payload binary",
    )
    with _pytest.raises(Exception, match="NULL payload.*frame-00042"):
        ahash64(df, "payload", "img_id", decode=decode_bmp_gray).collect()

    # worst case (r11 review): a NULL id next to a real one — sorted()
    # over mixed None/str must not TypeError before the diagnosis.
    # coalesce(1): both rows must share one Arrow batch, or whichever
    # partition raises first reports only ITS ids (seen flaky under
    # local[32]'s 2-partition split of a 2-row frame)
    df2 = spark.createDataFrame(
        [Row(img_id=None, payload=None), Row(img_id="frame-7", payload=None)],
        "img_id string, payload binary",
    ).coalesce(1)
    with _pytest.raises(Exception, match="NULL payload.*frame-7"):
        ahash64(df2, "payload", "img_id", decode=decode_bmp_gray).collect()
