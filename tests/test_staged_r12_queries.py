"""Driver-style verification for the STAGED round-12 registry queries
(queries/staged_r12.py) — written in round 10, two rounds ahead of
activation (they only age in place; the conventions gate rides them
meanwhile). Each typed-VALUES oracle is re-derived from pure Python so
the literals are never the only place the expected answer lives: the
line rules from string twins, pacing membership from hashlib.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r12
from tests.parity import frames_match, h32_md5

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r12")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents",):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", list(staged_r12.QUERIES))
def test_staged_r12_query_passes_driver_comparison(spark, con, name):
    sdf = staged_r12.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r12.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_activated():
    """Activation contract (round 12): all three names are live in the
    registry and oracle-paired, holding the capped slots freed by the
    round-12 relational.RETIRED twins. Window membership is NOT pinned
    (activation-round-only fact; later rotations move these out under
    the generic staleness invariant in tests/test_window_rotation.py)."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    missing = set(staged_r12.QUERIES) - live
    assert not missing, f"staged queries not in the registry: {missing}"
    assert set(staged_r12.QUERIES) <= set(Q.all_oracles())


# --- pure-Python twin of the C4 line rules ----------------------------------

_BLOCKLIST = ("javascript", "lorem ipsum", "cookie policy",
              "terms of use", "all rights reserved")


def _line_quality_twin(text, min_words=3, min_ratio=0.4):
    kept = []
    lines = text.split("\n")
    for ln in lines:
        t = ln.strip()
        if t == "":
            kept.append(ln)
            continue
        ok = len(re.split(r"\s+", t)) >= min_words
        ok = ok and re.search(r'[.!?"”’]\s*$', t) is not None
        ok = ok and not any(p in t.lower() for p in _BLOCKLIST)
        if ok:
            kept.append(ln)
    ratio = round(len(kept) / max(len(lines), 1), 6)
    if ratio < min_ratio:
        return None
    return ratio, "\n".join(kept)


def test_line_quality_values_rederive_from_python_twin():
    expect = set()
    for did, text in staged_r12._LQ_PLANTED:
        r = _line_quality_twin(text)
        if r is not None:
            expect.add((did, r[0], r[1]))
    got = {
        tuple(r)
        for r in duckdb.connect()
        .execute(staged_r12.ORACLES["line_quality"])
        .fetchall()
    }
    assert got == expect
    # the document gate is exercised: one planted doc must be ABSENT
    assert 36_000_001 not in {r[0] for r in got}


# --- pure-Python twin of the boilerplate drop rule ---------------------------


def _boilerplate_twin(planted, min_docs=3, min_chars=6):
    from collections import defaultdict

    docs_per_key = defaultdict(set)
    for did, grp, text in planted:
        for ln in text.split("\n"):
            t = ln.strip()
            if len(t) >= min_chars:
                docs_per_key[(grp, t.lower())].add(did)
    bad = {k for k, ids in docs_per_key.items() if len(ids) >= min_docs}
    out = {}
    for did, grp, text in planted:
        kept, dropped = [], 0
        for ln in text.split("\n"):
            t = ln.strip()
            if len(t) >= min_chars and (grp, t.lower()) in bad:
                dropped += 1
                continue
            kept.append(ln)
        out[did] = (dropped, "\n".join(kept))
    return out


def test_boilerplate_values_rederive_from_python_twin():
    expect = {
        (did, n, text)
        for did, (n, text) in _boilerplate_twin(staged_r12._BP_PLANTED).items()
    }
    got = {
        tuple(r)
        for r in duckdb.connect()
        .execute(staged_r12.ORACLES["boilerplate_lines"])
        .fetchall()
    }
    assert got == expect
    # the scoping contract: the other-group doc keeps the footer intact
    by_id = {r[0]: r for r in got}
    assert by_id[37_000_010][1] == 0
    assert staged_r12._BP_FOOTER in by_id[37_000_010][2]
    # and the normalize path unified three spellings (upper, padded)
    assert all(by_id[i][1] == 1 for i in (37_000_000, 37_000_001, 37_000_002))


def test_quality_pacing_by_group_values_rederive_from_hashlib():
    ppm = [0, 400_000, 1_000_000]
    expect = set()
    for did, score, grp in staged_r12._PBG_PLANTED:
        bounds = staged_r12._PBG_BOUNDARIES[grp]
        b = sum(score > x for x in bounds)
        if h32_md5(str(did)) % 1_000_000 < ppm[b]:
            expect.add((did, b))
    got = {
        tuple(r)
        for r in duckdb.connect()
        .execute(staged_r12.ORACLES["quality_pacing_by_group"])
        .fetchall()
    }
    assert got == expect
    # the per-group-edges contract: B's score 15 is bucket 1 under B's
    # edges (and dropped by the middle ppm); under A's edges the same
    # score would be bucket 2 and KEPT — so its absence proves the
    # group's own boundaries were applied
    assert 38_000_101 not in {r[0] for r in got}
    a_edges = staged_r12._PBG_BOUNDARIES["grp-a.example"]
    assert sum(15.0 > x for x in a_edges) == 2  # would be top bucket
    assert h32_md5(str(38_000_101)) % 1_000_000 < 1_000_000  # kept if top
