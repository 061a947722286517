"""Driver-style verification for the STAGED round-13 registry queries
(queries/staged_r13.py) — staged in round 10 alongside r11/r12. The
host_authority VALUES literals are re-derived from a pure-Python replay
of the operator's exact PageRank update; corpus_stats_exact has a
COMPUTED DuckDB oracle (no literals to re-derive — the driver
comparison IS the check), plus cross-checks of its fixture-free
invariants.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r13
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r13")
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


@pytest.mark.parametrize("name", list(staged_r13.QUERIES))
def test_staged_r13_query_passes_driver_comparison(spark, con, name):
    sdf = staged_r13.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r13.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_activated():
    """Activation contract (round 12 — pulled one round forward under
    the r11 VERDICT #4 accelerated schedule): both names live in the
    registry and oracle-paired, holding the slots freed by retiring
    `retention_cohorts` (relational.RETIRED) and
    `sketch_kll_quantile_merge` (sketches_r6.RETIRED)."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    missing = set(staged_r13.QUERIES) - live
    assert not missing, f"staged queries not in the registry: {missing}"
    assert set(staged_r13.QUERIES) <= set(Q.all_oracles())


def test_host_authority_values_rederive_from_pure_power_iteration():
    """Replays operators/graph.pagerank's EXACT update formula
    (r = p * ((1-d) + d*d_mass) + d*inflow, 20 steps, tol=0) over the
    planted graph parsed from the fixture's own hrefs — so the literals
    in the oracle can never be the only place the answer lives, and a
    formula change in the operator breaks this twin loudly."""
    import re

    # parse the fixture's graph exactly as the operator does: absolute
    # hrefs only, host → registrable domain, self-links dropped
    def dom(url):
        m = re.match(r"^[a-z+.-]+://([^/@]*@)?([^/:?#]+)", url.strip().lower())
        if not m:
            return ""
        host = m.group(2).rstrip(".")
        labels = host.split(".")
        return ".".join(labels[-2:]) if len(labels) > 2 else host

    edges, nodes = set(), set()
    for url, html in staged_r13._HA_PLANTED:
        src = dom(url)
        nodes.add(src)
        for target in re.findall(r"""(?i)href\s*=\s*["']([^"'#\s]+)""", html):
            dst = dom(target)
            if dst and dst != src:
                edges.add((src, dst))
                nodes.add(dst)
    out = {}
    for s, t in sorted(edges):
        out.setdefault(s, []).append(t)
    # single-in-edge precondition: what makes float VALUES literals safe
    indeg = {}
    for s, ts in out.items():
        for t in ts:
            indeg[t] = indeg.get(t, 0) + 1
    assert all(v <= 1 for v in indeg.values()), indeg

    n, d = len(nodes), 0.85
    ranks = {h: 1.0 / n for h in sorted(nodes)}
    for _ in range(20):
        d_mass = sum(r for h, r in ranks.items() if h not in out)
        base_factor = (1.0 - d) + d * d_mass
        inflow = {h: 0.0 for h in ranks}
        for s, ts in out.items():
            for t in ts:
                inflow[t] += ranks[s] / len(ts)
        ranks = {
            h: (1.0 / n) * base_factor + d * inflow[h] for h in ranks
        }
    expect = {
        h: math.floor(v * 1e6 + (0.5 + 1e-4)) / 1e6 for h, v in ranks.items()
    }
    got = dict(
        duckdb.connect()
        .execute(staged_r13.ORACLES["host_authority"])
        .fetchall()
    )
    assert got == expect
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_corpus_stats_exact_invariants(spark):
    """Fixture-free invariants of the exact report over the real
    corpus: the '<ALL>' rollup row equals the sum/weighted-combine of
    the per-source rows where that must hold exactly."""
    rep = {
        r["source"]: r
        for r in staged_r13.QUERIES["corpus_stats_exact"](spark, SF_DIR).collect()
    }
    total = rep.pop("<ALL>")
    assert total["n_docs"] == sum(r["n_docs"] for r in rep.values())
    assert total["n_chars"] == sum(r["n_chars"] for r in rep.values())
    assert total["n_tokens"] == sum(r["n_tokens"] for r in rep.values())
    assert 0.0 <= total["approx_dup_rate"] <= 1.0
    assert total["chars_p50"] <= total["chars_p95"]
