"""Driver-style verification for the STAGED round-17 registry queries
(queries/staged_r17.py). Each typed-VALUES oracle is re-derived from a
pure-Python twin — shingle-set containment arithmetic for the
asymmetric dedup row, numpy-free windowed RMS/ZCR (including the
repo's epsilon-shifted 6dp floor) for the audio row — so the literals
are never the only place the expected answer lives.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r17
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r17")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.mark.parametrize("name", list(staged_r17.QUERIES))
def test_staged_r17_query_passes_driver_comparison(spark, name):
    sdf = staged_r17.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r17.ORACLES[name])
    ddf = duckdb.connect().execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_activated():
    """Activation contract (round 14, per the accelerated schedule):
    `containment_near_dup` and `audio_pcm_features` are live in the
    registry and oracle-paired, holding capped slots freed by the
    round-14 retirements (`set_intersect_except`, `date_dim_generate` —
    both stay oracle-pinned via relational.RETIRED / pipeline.RETIRED).
    Window membership is NOT pinned (activation-round-only fact)."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    missing = set(staged_r17.QUERIES) - live
    assert not missing, f"staged queries not in the registry: {missing}"
    assert set(staged_r17.QUERIES) <= set(Q.all_oracles())


def _rnd6(x: float) -> float:
    """The repo's epsilon-shifted 6dp floor (functions/rounding form)."""
    return math.floor(x * 1e6 + (0.5 + 1e-4)) / 1e6


# --- containment twin --------------------------------------------------------


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_containment_values_rederive_from_shingle_twin():
    sh = {did: _shingles(t) for did, t in staged_r17._CONTAIN_DOCS}
    ids = sorted(sh)
    expect = {}
    candidates = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = sh[a] & sh[b]
            if not inter:
                continue  # no shared shingle -> never a candidate
            candidates += 1
            c_ab = len(inter) / len(sh[a])
            c_ba = len(inter) / len(sh[b])
            if max(c_ab, c_ba) >= 0.8:
                jac = len(inter) / len(sh[a] | sh[b])
                expect[(a, b)] = (_rnd6(c_ab), _rnd6(c_ba), _rnd6(jac))
    got = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in duckdb.connect()
        .execute(staged_r17.ORACLES["containment_near_dup"])
        .fetchall()
    }
    assert got == expect
    # the fixture exercises the interesting structure: a full-containment
    # direction, a candidate that DIED at the threshold (shared shingle
    # but max containment < 0.8), and a no-candidate decoy
    assert candidates == 2 and len(got) == 1
    [(c_ab, c_ba, _)] = got.values()
    assert c_ba == 1.0 and c_ab < 0.8


# --- audio twin --------------------------------------------------------------


def _windows_twin(vals: list[int], win: int = 256, hop: int = 128):
    if len(vals) < win:
        return []
    out = []
    n_win = (len(vals) - win) // hop + 1
    for w in range(n_win):
        seg = vals[w * hop : w * hop + win]
        rms = math.sqrt(sum(float(v) ** 2 for v in seg) / win)
        # numpy signbit: True for negatives only (0 is non-negative)
        flips = sum(
            1 for x, y in zip(seg, seg[1:]) if (x < 0) != (y < 0)
        )
        out.append((w * hop, win, _rnd6(rms), _rnd6(flips / (win - 1))))
    return out


def test_audio_values_rederive_from_pure_python_twin():
    expect = set()
    for did, vals in staged_r17._AUDIO_CLIPS:
        for win_idx, n, rms, zcr in _windows_twin(vals):
            expect.add((did, win_idx, n, rms, zcr))
    got = set(
        map(
            tuple,
            duckdb.connect()
            .execute(staged_r17.ORACLES["audio_pcm_features"])
            .fetchall(),
        )
    )
    assert got == expect
    # absence pin: the sub-window clip contributes no rows; presence
    # pins: the square wave crosses, the ramp never does, silence is 0
    ids = {r[0] for r in got}
    assert 44_000_003 not in ids and ids == {
        44_000_000, 44_000_001, 44_000_002,
    }
    assert all(r[4] > 0 for r in got if r[0] == 44_000_000)
    assert all(r[4] == 0 for r in got if r[0] != 44_000_000)


def test_containment_operator_matches_twin_on_randomized_batch(spark):
    """Beyond the planted branches: one seeded batch of 40 random short
    docs over a SMALL token alphabet (so shingles genuinely collide and
    the document-frequency cutoff actually fires) through the REAL
    operator vs a pure-Python twin that mirrors the full contract —
    candidates exist iff the docs share a shingle whose corpus-wide
    document frequency is <= max_shingle_df, then exact two-direction
    containment with the threshold on the max direction."""
    import random

    from bp_datawarehouse_ordersfact_spark.operators.dedup import (
        containment_pairs,
    )

    rng = random.Random(1117)
    alphabet = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(alphabet) for _ in range(rng.randint(3, 14))))
        for i in range(40)
    ]
    # guarantee high-containment structure: six docs are contiguous
    # token slices of random bases (the doc-inside-doc shape the
    # operator exists for)
    for j in range(6):
        base_toks = docs[rng.randrange(40)][1].split()
        if len(base_toks) >= 5:
            lo = rng.randrange(len(base_toks) - 4)
            docs.append((100 + j, " ".join(base_toks[lo : lo + 5])))
    # and a UBIQUITOUS boilerplate shingle across 10 docs (df=10 > 5),
    # so the document-frequency cutoff genuinely fires: docs sharing
    # ONLY boilerplate must never become candidates
    docs = [
        (i, t + " cc1 cc2 cc3" if i < 10 else t) for i, t in docs
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (
            r["containment_a_in_b"], r["containment_b_in_a"], r["jaccard"]
        )
        for r in containment_pairs(
            df, "text", "doc_id", threshold=0.6, shingle_n=3, max_shingle_df=5
        ).collect()
    }

    sh = {i: _shingles(t) for i, t in docs}
    dfreq: dict[str, int] = {}
    for s in sh.values():
        for g in s:
            dfreq[g] = dfreq.get(g, 0) + 1
    expect = {}
    for i, a in enumerate(sorted(sh)):
        for b in sorted(sh)[i + 1 :]:
            inter = sh[a] & sh[b]
            if not any(dfreq[g] <= 5 for g in inter):
                continue  # no RARE shared shingle -> never a candidate
            c_ab = len(inter) / len(sh[a])
            c_ba = len(inter) / len(sh[b])
            if max(c_ab, c_ba) >= 0.6:
                expect[(a, b)] = (
                    _rnd6(c_ab), _rnd6(c_ba),
                    _rnd6(len(inter) / len(sh[a] | sh[b])),
                )
    assert got == expect
    # non-degenerate: pairs exist, and the dfreq cutoff excluded at
    # least one shared-shingle pair the naive any-shared rule would keep
    naive = sum(
        1
        for i, a in enumerate(sorted(sh))
        for b in sorted(sh)[i + 1 :]
        if sh[a] & sh[b]
    )
    candidates = sum(
        1
        for i, a in enumerate(sorted(sh))
        for b in sorted(sh)[i + 1 :]
        if sh[a] & sh[b] and any(dfreq[g] <= 5 for g in sh[a] & sh[b])
    )
    assert got and naive > candidates


def test_audio_operator_matches_twin_on_randomized_batch(spark):
    """One seeded batch of random PCM16 clips (lengths straddling the
    window size, odd trailing bytes, a NULL payload) through the REAL
    operator vs the pure-Python window twin — full-output equality
    including the epsilon-shifted 6dp floor."""
    import random

    from bp_datawarehouse_ordersfact_spark.operators.multimodal import (
        audio_pcm_features,
    )
    from bp_datawarehouse_ordersfact_spark.queries.staged_r17 import _pcm_bytes

    rng = random.Random(2026)
    clips = []
    for i in range(12):
        n = rng.randint(100, 900)
        clips.append((i, [rng.randint(-32000, 32000) for _ in range(n)]))
    rows = [(i, _pcm_bytes(v)) for i, v in clips]
    # odd trailing byte must be ignored; NULL payload contributes nothing
    rows[3] = (3, rows[3][1] + b"\x7f")
    rows.append((99, None))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        (r["doc_id"], r["win_idx"]): (r["n_samples"], r["rms"], r["zcr"])
        for r in audio_pcm_features(df, "payload", "doc_id").collect()
    }
    expect = {}
    for i, vals in clips:
        for win_idx, n, rms, zcr in _windows_twin(vals):
            expect[(i, win_idx)] = (n, rms, zcr)
    assert got == expect
    assert all(k[0] != 99 for k in got)
