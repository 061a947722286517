"""Driver-style verification for the round-9 curation/SFT registry
queries (queries/curation_r9.py) BEFORE the driver first sees them —
the staged-activation discipline from tests/test_sketches_r6.py: the
exact fetchdf + dtype-sensitive frames_match comparison the driver
runs, plus independent pure-Python pins of each typed-VALUES oracle's
planted arithmetic (the VALUES literals must never be the only place
the expected answer lives).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import curation_r9
from tests.parity import frames_match, h32_md5

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("curation-r9")
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


@pytest.mark.parametrize("name", list(curation_r9.QUERIES))
def test_staged_r9_query_passes_driver_comparison(spark, con, name):
    sdf = curation_r9.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(curation_r9.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_token_mixture_values_rederive_from_hashlib():
    """The token_mixture VALUES rows are not hand-trusted: re-derive the
    whole plan (driver arithmetic) and the partial-epoch membership
    (md5 ppm rule) from the planted constants with hashlib alone, and
    regenerate the exact (source, epoch, n_docs, sum_tokens) set."""
    planted = curation_r9._MIX_PLANTED
    weights, budget = curation_r9._MIX_WEIGHTS, curation_r9._MIX_BUDGET
    wsum = sum(weights.values())
    by_src: dict[str, list[tuple[int, int]]] = {}
    for doc_id, src, toks in planted:
        by_src.setdefault(src, []).append((doc_id, toks))

    expect = set()
    for src in sorted(weights):
        docs = by_src[src]
        have = sum(t for _, t in docs)
        target = int(round(budget * weights[src] / wsum))
        epochs = min(target / have, 10.0)
        full = int(epochs)
        ppm = int(round((epochs - full) * 1_000_000))
        if ppm == 1_000_000:
            full, ppm = full + 1, 0
        for ep in range(full):
            expect.add((src, ep, len(docs), have))
        if ppm > 0:
            kept = [
                (i, t)
                for i, t in docs
                if h32_md5(f"{full}:{i}") % 1_000_000 < ppm
            ]
            if kept:
                expect.add((src, full, len(kept), sum(t for _, t in kept)))

    got = set()
    con = duckdb.connect()
    for row in con.execute(curation_r9.ORACLES["token_mixture"]).fetchall():
        got.add(tuple(row))
    assert got == expect


def test_conversation_pack_values_rederive_from_pure_python():
    """Re-derive every packed span and sliced block from the fixture
    with pure Python (render template + first-fit packing recurrence),
    and check the VALUES oracle row-for-row — including that each block
    string equals the packed text slice at the shifted offsets."""

    def render_turn(role, content):
        return f"<|{role}|>\n{content}<|end|>\n"

    budget, sep = 120, "\n\n"
    convs = [(cid, turns) for cid, turns in curation_r9._CONV_FIXTURE]
    texts = {
        cid: "".join(render_turn(r, c) for r, c in turns)
        for cid, turns in convs
    }
    spans = {}
    for cid, turns in convs:
        pos, out = 0, []
        for i, (r, c) in enumerate(turns):
            blk = render_turn(r, c)
            if r == "assistant":
                out.append((i, pos, pos + len(blk)))
            pos += len(blk)
        spans[cid] = out

    before, assign = 0, {}
    for cid, _ in convs:
        assign[cid] = before // budget
        before += len(texts[cid]) + len(sep)
    bins: dict[int, list[int]] = {}
    offsets = {}
    for cid, _ in convs:
        b = assign[cid]
        members = bins.setdefault(b, [])
        offsets[cid] = sum(len(texts[i]) + len(sep) for i in members)
        members.append(cid)
    packed = {b: sep.join(texts[i] for i in ids) for b, ids in bins.items()}

    expect = set()
    for cid, _ in convs:
        b, off = assign[cid], offsets[cid]
        for ti, s, e in spans[cid]:
            block = packed[b][s + off : e + off]
            # the block must be exactly the rendered assistant turn —
            # the slice-through-the-packed-string invariant
            role, content = dict(convs)[cid][ti]
            assert block == render_turn(role, content)
            expect.add((b, cid, ti, s + off, e + off, block))

    con = duckdb.connect()
    got = {
        tuple(r)
        for r in con.execute(curation_r9.ORACLES["conversation_pack"]).fetchall()
    }
    assert got == expect
