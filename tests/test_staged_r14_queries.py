"""Driver-style verification for the STAGED round-14 registry query
(queries/staged_r14.py) — run ahead of the driver ever seeing it, so
the round-14 activation is a mechanical edit (the staged_r10/staged_r11
discipline). The typed-VALUES oracle is additionally re-derived from a
pure-Python public-suffix-list twin (exception > longest-match
precedence, wildcard label matching), so the literals are never the
only place the expected answer lives.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r14
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r14")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.mark.parametrize("name", list(staged_r14.QUERIES))
def test_staged_r14_query_passes_driver_comparison(spark, name):
    sdf = staged_r14.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r14.ORACLES[name])
    ddf = duckdb.connect().execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_activated():
    """Activation contract (round 13, one round ahead of the original
    plan per the accelerated schedule): `registrable_domain_psl` is live
    in the registry and oracle-paired, holding a capped slot freed by
    the round-13 retirements (`url_canonicalize` — which this exact-PSL
    row supersedes — stays oracle-pinned via curation_r9.RETIRED).
    Window membership is NOT pinned (activation-round-only fact)."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    missing = set(staged_r14.QUERIES) - live
    assert not missing, f"staged queries not in the registry: {missing}"
    assert set(staged_r14.QUERIES) <= set(Q.all_oracles())


# --- pure-Python PSL twin ----------------------------------------------------
# Same semantics as functions/urls.py registrable_domain_psl, independently
# expressed: parse the raw published-format lines with the spec's line
# rules, then per host pick the prevailing rule (exceptions beat all,
# otherwise longest match), public suffix = match minus leftmost label
# for exceptions, and registrable = one label more — passthrough for
# IPv4, no-match, and host==public-suffix.


def _parse_rules_py(raw_lines: list[str]) -> list[tuple[list[str], bool]]:
    rules = []
    for ln in raw_lines:
        s = ln.strip().lower()
        if not s or s.startswith("//"):
            continue
        tok = s.split()[0]
        exc = tok.startswith("!")
        rules.append(((tok[1:] if exc else tok).split("."), exc))
    return rules


def _psl_domain_py(host: str, rules) -> str:
    h = host.strip().lower().rstrip(".")
    if re.fullmatch(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+", h):
        return h
    labels = h.split(".")
    best = None  # (is_exception, pub_len)
    for klabels, exc in rules:
        k = len(klabels)
        if k > len(labels):
            continue
        tail = labels[-k:]
        if all(a == b or a == "*" for a, b in zip(klabels, tail)):
            cand = (int(exc), k - int(exc))
            if best is None or cand > best:
                best = cand
    if best is None:
        return h
    pub_len = best[1]
    if len(labels) <= pub_len:
        return h
    return ".".join(labels[-(pub_len + 1):])


def test_psl_values_rederive_from_python_twin():
    rules = _parse_rules_py(staged_r14._PSL_RAW_LINES)
    expect = {
        did: _psl_domain_py(host, rules)
        for did, host in staged_r14._PSL_PLANTED
    }
    got = dict(
        duckdb.connect()
        .execute(staged_r14.ORACLES["registrable_domain_psl"])
        .fetchall()
    )
    assert got == expect
    # the fixture is non-degenerate on every documented branch:
    # an exception override actually fired (two hosts collapse to the
    # exception's domain), a wildcard kept 4 labels, a passthrough
    # survived (host == public suffix), and normalization folded the
    # cased/dotted spelling onto the plain one
    assert got[39_000_004] == got[39_000_005] == "city.kobe.jp"
    assert got[39_000_002].count(".") == 3
    assert got[39_000_003] == "x.kobe.jp"
    assert got[39_000_009] == got[39_000_000] == "example.com"
    # and the comment line with dotted URL text parsed as NO rule
    assert all(klabels[-1] != "details" for klabels, _ in rules)
    assert len(rules) == 7


def test_psl_lookup_matches_python_twin_on_randomized_hosts(spark):
    """Beyond the ten planted branches: one seeded randomized batch —
    30 rules (plain/wildcard/exception over a small label alphabet so
    collisions actually happen) x 300 hosts of depth 1-6 — run through
    the REAL Spark lookup and the pure-Python twin; full-output
    equality. Catches prevailing-rule ordering bugs the hand-picked
    fixture can't reach (e.g. a longest-match tie against an exception
    at a different depth)."""
    import random

    from bp_datawarehouse_ordersfact_spark.functions.urls import (
        registrable_domain_psl,
    )

    rng = random.Random(1107)
    labels = ["aa", "bb", "cc", "dd", "ee"]

    def rand_suffix(depth):
        return ".".join(rng.choice(labels) for _ in range(depth))

    rules = set()
    while len(rules) < 30:
        depth = rng.randint(1, 3)
        base = rand_suffix(depth)
        form = rng.choice(["plain", "plain", "wild", "exc"])
        if form == "wild":
            rules.add("*." + base)
        elif form == "exc" and depth >= 2:
            rules.add("!" + base)
        else:
            rules.add(base)
    rule_list = sorted(rules)

    hosts = sorted(
        {rand_suffix(rng.randint(1, 6)) for _ in range(300)}
    )
    psl = spark.createDataFrame([(r,) for r in rule_list], "suffix string")
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["domain"]
        for r in registrable_domain_psl(
            df, psl, host_col="host"
        ).collect()
    }
    twin_rules = _parse_rules_py(rule_list)
    want = {h: _psl_domain_py(h, twin_rules) for h in hosts}
    assert got == want
    # non-degenerate: the batch exercised a cut, a passthrough, and at
    # least one host where an exception or wildcard decided the answer
    assert any(got[h] != h for h in hosts)
    assert any(got[h] == h for h in hosts)
