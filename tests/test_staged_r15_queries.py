"""Driver-style verification for the STAGED round-15 registry query
(queries/staged_r15.py) — run ahead of the driver ever seeing it, so
the round-15 activation is a mechanical edit. The typed-VALUES oracle
is re-derived from the pure-numpy aHash replica in
tests/test_phash_dedup.py (flip-k-blocks fixtures => hamming k), so the
literals are never the only place the expected answer lives; the
pigeonhole premise (every expected pair shares an exact 16-bit band)
is re-checked on the same fingerprints.
"""

from __future__ import annotations

from itertools import combinations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r15
from tests.parity import frames_match
from tests.test_phash_dedup import _ahash_halves, _hamming

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r15")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.mark.parametrize("name", list(staged_r15.QUERIES))
def test_staged_r15_query_passes_driver_comparison(spark, name):
    sdf = staged_r15.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r15.ORACLES[name])
    ddf = duckdb.connect().execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_activated():
    """Activation contract (round 13, two rounds ahead of the original
    plan per the accelerated schedule): both names are live in the
    registry and oracle-paired, holding capped slots freed by the
    round-13 retirements. `sft_ingest_stream` is fixture-bound and
    bench-EXCLUDED with a recorded reason
    (tests/test_bench_coverage.py). Window membership is NOT pinned
    (activation-round-only fact)."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    missing = set(staged_r15.QUERIES) - live
    assert not missing, f"staged queries not in the registry: {missing}"
    assert set(staged_r15.QUERIES) <= set(Q.all_oracles())


def test_phash_values_rederive_from_numpy_replica():
    # _ahash_halves/_hamming are THE phash twin pair (one definition,
    # tests/test_phash_dedup.py) — no local copy to drift (r11 review)
    plants = staged_r15._plant_bytes()
    fps = {did: _ahash_halves(p) for did, p in plants}
    expect = set()
    for (ia, _), (ib, _) in combinations(plants, 2):
        a, b = min(ia, ib), max(ia, ib)
        h = _hamming(fps[a], fps[b])
        if h <= 3:
            expect.add((a, b, h))
    got = set(
        duckdb.connect()
        .execute(staged_r15.ORACLES["phash_near_dup"])
        .fetchall()
    )
    assert got == expect
    # the fixture exercises the interesting distances: an exact dup
    # (hamming 0), the max-in-threshold (3), and a non-pair (the
    # inverted plant appears in NO pair)
    hams = {h for _, _, h in got}
    assert {0, 3} <= hams
    paired_ids = {i for a, b, _ in got for i in (a, b)}
    assert 40_000_003 not in paired_ids and len(got) == 6
    # pigeonhole premise re-checked: every expected pair agrees exactly
    # on at least one 16-bit band of the 64-bit fingerprint
    for a, b, _ in got:
        fa, fb = fps[a], fps[b]
        bands_a = [
            (fa[half] >> (16 * i)) & 0xFFFF for half in (0, 1) for i in (0, 1)
        ]
        bands_b = [
            (fb[half] >> (16 * i)) & 0xFFFF for half in (0, 1) for i in (0, 1)
        ]
        assert any(x == y for x, y in zip(bands_a, bands_b)), (a, b)


def test_sft_values_rederive_from_batch_validator(spark):
    """The oracle's route/reason/n_turns literals re-derive by running
    the BATCH validator (`operators.conversations.validate_conversations`
    — the stream's own routing rule) directly over the parsed planted
    records; the quarantine line is proven unparseable with json.loads."""
    import json

    from pyspark.sql import Row

    from bp_datawarehouse_ordersfact_spark.operators.conversations import (
        validate_conversations,
    )
    from bp_datawarehouse_ordersfact_spark.queries.staged_r15 import (
        _SFT_BAD_LINE,
        _SFT_FEED,
        _sft_schema,
    )

    parsed, quarantined = [], []
    for _, lines in _SFT_FEED:
        for ln in lines:
            try:
                parsed.append(json.loads(ln))
            except json.JSONDecodeError:
                quarantined.append(ln)
    assert quarantined == [_SFT_BAD_LINE]

    df = spark.createDataFrame(
        [
            Row(
                conv_id=r["conv_id"],
                conversation=[
                    Row(role=t["role"], content=t["content"])
                    for t in r["conversation"]
                ],
            )
            for r in parsed
        ],
        _sft_schema(),
    )
    flagged = {
        r["conv_id"]: (r["conv_invalid_reason"], len(r["conversation"]))
        for r in validate_conversations(df, conv_col="conversation").collect()
    }
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.connect()
        .execute(staged_r15.ORACLES["sft_ingest_stream"])
        .fetchall()
    }
    for cid, (reason, n_turns) in flagged.items():
        route, o_turns, detail = oracle[cid]
        assert o_turns == n_turns, cid
        if reason is None:
            assert route == "ready" and detail == "", cid
        else:
            assert route == "invalid" and detail == reason, cid
    # quarantine row: keyed -1, detail is the raw line verbatim
    assert oracle[-1] == ("quarantine", 0, _SFT_BAD_LINE)
    assert set(oracle) == set(flagged) | {-1}
    # three distinct invalid reasons exercised — the fixture is not
    # one failure mode repeated
    reasons = {v[2] for k, v in oracle.items() if v[0] == "invalid"}
    assert len(reasons) == 3
