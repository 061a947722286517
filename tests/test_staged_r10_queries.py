"""Driver-style verification for the STAGED round-10 registry queries
(queries/staged_r10.py) — run a full round before the driver first sees
them, so the round-10 activation is a mechanical edit (the sketches_r6
discipline). Each typed-VALUES oracle is additionally re-derived from
pure Python/hashlib so the literals are never the only place the
expected answer lives.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r10
from tests.parity import frames_match, h32_md5

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r10")
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


@pytest.mark.parametrize("name", list(staged_r10.QUERIES))
def test_staged_r10_query_passes_driver_comparison(spark, con, name):
    sdf = staged_r10.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r10.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_activated():
    """Activation contract (round 10): all three names are live in the
    registry, oracle-paired, holding the capped slots freed by the three
    llmops.RETIRED twins. Window membership is deliberately NOT pinned
    here — it was the round-10 activation condition only; from round 11
    on these rotate through the window on the generic 2-round staleness
    invariant (tests/test_window_rotation.py), and a window pin here
    would fail on every later rotation (found by the r11 full-suite
    run)."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    missing = set(staged_r10.QUERIES) - live
    assert not missing, f"staged queries not in the registry: {missing}"
    assert set(staged_r10.QUERIES) <= set(Q.all_oracles())


def test_host_cap_values_rederive_from_hashlib():
    seed = "0"
    a_ids = [i for i, h in staged_r10._CAP_PLANTED if h == "alpha-host.example"]
    b_ids = [i for i, h in staged_r10._CAP_PLANTED if h == "beta-host.example"]
    ranked = sorted(a_ids, key=lambda i: (h32_md5(f"{seed}:{i}"), i))
    expect = sorted(ranked[:3]) + sorted(b_ids)  # cap 3; B under-cap
    got = sorted(
        r[0]
        for r in duckdb.connect()
        .execute(staged_r10.ORACLES["host_cap"])
        .fetchall()
    )
    assert got == sorted(expect)


def test_quality_pacing_values_rederive_from_hashlib():
    bounds, ppm = [0.3, 0.7], [0, 400_000, 1_000_000]
    expect = set()
    for i, s in staged_r10._PACE_PLANTED:
        b = sum(s > x for x in bounds)
        if h32_md5(str(i)) % 1_000_000 < ppm[b]:
            expect.add((i, b))
    got = {
        tuple(r)
        for r in duckdb.connect()
        .execute(staged_r10.ORACLES["quality_pacing"])
        .fetchall()
    }
    assert got == expect


def test_line_dedupe_values_rederive_from_pure_python():
    def twin(text, min_chars=1):
        seen, kept, dropped = set(), [], 0
        for ln in text.split("\n"):
            basis = ln.strip().lower()
            if len(ln.strip()) >= min_chars:
                key = (basis, len(basis))
                if key in seen:
                    dropped += 1
                    continue
                seen.add(key)
            kept.append(ln)
        return "\n".join(kept), dropped

    expect = set()
    for did, text in staged_r10._LINE_PLANTED:
        out, n = twin(text)
        expect.add((did, n, out))
    got = {
        tuple(r)
        for r in duckdb.connect()
        .execute(staged_r10.ORACLES["line_dedupe"])
        .fetchall()
    }
    assert got == expect
