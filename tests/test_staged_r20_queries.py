"""Driver-style verification for the STAGED round-20 registry queries
(queries/staged_r20.py), plus the premises each row rests on:

- ``weighted_sample_by_group``'s VALUES oracle is re-derived from pure
  Python hashlib/math (the A-ES race over the planted literals), and
  the planted group name can never collide with a real source;
- ``bloom_join_prune``'s contract (no false negatives ⇒ prefilter +
  exact join ≡ plain join) is checked directly on the operator, along
  with the pruning actually happening and false positives dying at the
  exact join;
- ``outlier_iqr_per_group``'s exact quartiles match numpy's linear
  interpolation on an explicit fixture (the definition both engines
  must share), and the ``exact=False`` 100 TB tier runs;
- the module's planted-id floor (47M) is disjoint from every other
  staged module's plants.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r20
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r20")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.mark.parametrize("name", list(staged_r20.QUERIES))
def test_staged_r20_query_passes_driver_comparison(spark, name):
    sdf = staged_r20.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r20.ORACLES[name])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_not_yet_registered():
    """Staging contract: the names must NOT be in the live registry (the
    registry is at its 100-entry rotation cap) until the round-20
    activation swaps them in."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    assert not (set(staged_r20.QUERIES) & live)


def test_planted_id_floor_is_disjoint_from_other_staged_modules():
    """Each staged module owns a 10^6-wide planted-id range; r20's floor
    (47M) must sit above every other module's plants so range-selected
    outputs can never capture a sibling's rows. The path anchors to
    THIS file (not the cwd) and the glob must actually find the sibling
    modules — a vacuous pass is itself a failure; ids are matched in
    both the Python underscore form and the plain-digit oracle form."""
    import re
    from pathlib import Path

    qdir = (
        Path(__file__).resolve().parent.parent
        / "bp_datawarehouse_ordersfact_spark"
        / "queries"
    )
    mods = sorted(qdir.glob("staged_r1*.py"))
    assert len(mods) >= 9, f"expected the staged sibling modules, found {mods}"
    any_ids = False
    for mod in mods:
        ids = [
            int(m.replace("_", ""))
            for m in re.findall(  # 8+ digits, underscore form or plain —
                # ids ABOVE the floor (9+ digits) must not escape the gate
                r"\b(\d{2,}(?:_\d{3}){2}|\d{8,})\b", mod.read_text()
            )
        ]
        big = [i for i in ids if i >= 10_000_000]
        any_ids = any_ids or bool(big)
        # the precise invariant: no sibling number may land INSIDE r20's
        # 10^6-wide range (a 15-digit math constant in a sibling is fine;
        # an id at 47_000_500 is not — and a 9-digit one can't hide from
        # the \d{8,} form)
        inside = [i for i in big if 47_000_000 <= i < 48_000_000]
        assert not inside, (
            f"{mod.name} plants ids inside r20's 47M range: {inside}"
        )
    # non-vacuity: the regex must have matched SOMEWHERE (staged_r13
    # legitimately plants no ids — its oracles are computed, not VALUES)
    assert any_ids, "no planted ids matched in any sibling — regex drifted?"


def test_weighted_sample_oracle_rederived_from_pure_python():
    """The VALUES oracle's four (doc_id, rank) rows are exactly the A-ES
    winners of the planted race: u = first 52 md5 bits of 'id:seed'
    (+0.5 centering), key = -ln(u)/w, four smallest keys win."""

    def u(key: int) -> float:
        h = int(
            hashlib.md5(f"{key}:{staged_r20._WS_SEED}".encode()).hexdigest()[:13],
            16,
        )
        return (h + 0.5) / 2**52

    keyed = sorted(
        (-math.log(u(d)) / w, d) for d, _grp, w in staged_r20._WS_PLANTED
    )
    expect = [(d, r) for r, (_k, d) in enumerate(keyed[: staged_r20._WS_N], 1)]
    assert expect == [
        (47_000_003, 1),
        (47_000_005, 2),
        (47_000_009, 3),
        (47_000_002, 4),
    ]


def test_weighted_sample_planted_group_never_collides_with_real_sources():
    """The planted group must stay its own window partition: no real
    `documents.source` value may equal it at any test sf (real sources
    are 'srcN'; the plant is not)."""
    import glob

    for sf in sorted(glob.glob("/root/testdata/sf*")):
        hit = duckdb.sql(
            f"SELECT count(*) FROM '{sf}/documents.parquet' "
            f"WHERE source = '{staged_r20._WS_GRP}'"
        ).fetchone()[0]
        assert hit == 0, f"{sf}: real source collides with the planted group"


def test_bloom_prefilter_contract_on_real_corpus(spark):
    """No false negatives (prefilter + exact ≡ plain, as SETS of rows)
    and the prefilter genuinely prunes (the pass-through fraction tracks
    the true match fraction, not 1.0)."""
    from bp_datawarehouse_ordersfact_spark.operators.joins import bloom_prefilter

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    build = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_totalprice") > 400_000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .distinct()
    )
    pre = bloom_prefilter(li, "l_orderkey", build, "l_orderkey")
    plain = li.join(F.broadcast(build), "l_orderkey", "left_semi")
    via_bloom = pre.join(F.broadcast(build), "l_orderkey", "left_semi")
    n_plain = plain.count()
    assert via_bloom.count() == n_plain
    # the exact join must also drop any Bloom false positives
    assert (
        via_bloom.select("l_orderkey", "l_linenumber")
        .exceptAll(plain.select("l_orderkey", "l_linenumber"))
        .count()
        == 0
    )
    n_pre, n_all = pre.count(), li.count()
    assert n_plain <= n_pre < n_all


def test_bloom_prefilter_passes_false_positives_but_never_drops_matches(spark):
    """Tiny-bitmap stress: with m_bits=64 and one hash the filter is
    nearly saturated — false positives are expected and allowed; every
    true match must still pass (the one-sided error the driver row
    pins at full size)."""
    from bp_datawarehouse_ordersfact_spark.operators.joins import bloom_prefilter

    probe = spark.createDataFrame([(i,) for i in range(500)], "k long")
    build = spark.createDataFrame([(i,) for i in range(0, 500, 50)], "k long")
    pre = {r["k"] for r in bloom_prefilter(probe, "k", build, "k", m_bits=64, k=1).collect()}
    assert set(range(0, 500, 50)) <= pre


def test_bloom_prefilter_bitmap_is_broadcast_data_not_plan_literals(spark):
    """r11 VERDICT #2 pin: the bitmap must travel as broadcast DATA, not
    as ``m_bits/64`` literal expressions in the plan — the literal form
    blew up analysis/codegen around m_bits ≈ 2^20, defeating the
    operator's too-big-to-broadcast sizing. At m_bits = 2^24 (256 Ki
    words, ~2 MiB of bitmap) the literal encoding would put hundreds of
    thousands of expressions in the plan string; the broadcast form's
    plan stays small and shows the one-row BroadcastNestedLoopJoin."""
    import time

    from bp_datawarehouse_ordersfact_spark.operators.joins import bloom_prefilter

    probe = spark.range(10_000).select(F.col("id").alias("k"))
    build = spark.range(0, 10_000, 13).select(F.col("id").alias("k"))
    t0 = time.perf_counter()
    pre = bloom_prefilter(probe, "k", build, "k", m_bits=1 << 24, k=5)
    plan = pre._jdf.queryExecution().optimizedPlan().toString()
    analysis_s = time.perf_counter() - t0
    # the literal form at 2^24 bits would be a ~250k-element array in
    # the plan text (multi-MB) and take minutes to analyze
    assert len(plan) < 100_000, f"plan text {len(plan)} bytes — literal bitmap?"
    assert analysis_s < 30, f"analysis took {analysis_s:.1f}s"
    physical = pre._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in physical, physical[:2000]
    # correctness unchanged at this size: every true match passes
    kept = {r["k"] for r in pre.collect()}
    assert set(range(0, 10_000, 13)) <= kept


def test_bloom_prefilter_null_probe_keys_pass_through(spark):
    from bp_datawarehouse_ordersfact_spark.operators.joins import bloom_prefilter

    probe = spark.createDataFrame([(1,), (None,)], "k long")
    build = spark.createDataFrame([(99,)], "k long")
    out = bloom_prefilter(probe, "k", build, "k")
    assert [r["k"] for r in out.collect()] == [None]


def test_bloom_bitmap_rejects_bad_shape(spark):
    from bp_datawarehouse_ordersfact_spark.operators.joins import bloom_bitmap

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        bloom_bitmap(df, "k", m_bits=100)
    with pytest.raises(ValueError):
        bloom_bitmap(df, "k", k=0)


def test_outlier_iqr_matches_numpy_linear_interpolation(spark):
    """The exact tier's quartiles must be numpy's method='linear' (the
    shared Spark/DuckDB definition), and the strict fences must count
    the planted outliers exactly."""
    import numpy as np

    from bp_datawarehouse_ordersfact_spark.operators.aggregates import (
        outlier_iqr_per_group,
    )

    vals = [10.0, 12.0, 11.0, 13.0, 12.5, 11.5, 10.5, 100.0, -50.0, 12.2]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v double")
    row = outlier_iqr_per_group(df, "v", ["grp"]).collect()[0]
    q1 = float(np.percentile(vals, 25, method="linear"))
    q3 = float(np.percentile(vals, 75, method="linear"))
    iqr = q3 - q1
    def rnd2(x: float) -> float:  # the repo's portable half-up form
        return math.floor(x * 100 + 0.5001) / 100

    assert row["n"] == len(vals)
    assert abs(row["q1"] - rnd2(q1)) < 1e-9
    assert abs(row["q3"] - rnd2(q3)) < 1e-9
    assert row["n_low"] == sum(v < q1 - 1.5 * iqr for v in vals) == 1
    assert row["n_high"] == sum(v > q3 + 1.5 * iqr for v in vals) == 1


def test_outlier_iqr_approx_tier_runs_and_nulls_dont_count(spark):
    from bp_datawarehouse_ordersfact_spark.operators.aggregates import (
        outlier_iqr_per_group,
    )

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", None), ("g", 3.0)], "grp string, v double"
    )
    row = outlier_iqr_per_group(df, "v", ["grp"], exact=False).collect()[0]
    assert row["n"] == 3 and row["n_low"] == 0 and row["n_high"] == 0
    with pytest.raises(ValueError):
        outlier_iqr_per_group(df, "v", [])
    with pytest.raises(ValueError):
        outlier_iqr_per_group(df, "v", ["grp"], fence_k=0.0)


def test_outlier_iqr_broadcast_is_conditional_on_group_cardinality(spark):
    """r11 VERDICT #3 pin: the stats join-back must NOT be an
    unconditional broadcast — per-user fences over 10^9 users would OOM
    the executors by construction. Above the knob (here forced tiny,
    and separately via broadcast_stats=False) the pre-AQE plan carries
    NO BroadcastExchange; results are identical across all three
    strategies, and auto mode picks broadcast for a small group set."""
    from bp_datawarehouse_ordersfact_spark.operators.aggregates import (
        outlier_iqr_per_group,
    )

    df = spark.createDataFrame(
        [(f"g{i % 7}", float(i % 13)) for i in range(200)],
        "grp string, v double",
    )

    def plan_of(out):
        # executedPlan BEFORE any action = the static (initial) plan
        # with exchanges inserted; sparkPlan() precedes
        # EnsureRequirements and never shows exchanges, so a
        # no-BroadcastExchange assertion there would be vacuous. AQE
        # converting the shuffled join to broadcast AT RUNTIME when the
        # measured size fits is allowed and desirable — the pin is on
        # what the operator REQUESTS.
        return out._jdf.queryExecution().executedPlan().toString()

    forced_off = outlier_iqr_per_group(df, "v", ["grp"], broadcast_stats=False)
    assert "BroadcastHashJoin" not in plan_of(forced_off), plan_of(forced_off)
    auto_above_knob = outlier_iqr_per_group(
        df, "v", ["grp"], max_broadcast_groups=3
    )
    assert "BroadcastHashJoin" not in plan_of(auto_above_knob)
    forced_on = outlier_iqr_per_group(df, "v", ["grp"], broadcast_stats=True)
    assert "BroadcastHashJoin" in plan_of(forced_on), plan_of(forced_on)
    auto_small = outlier_iqr_per_group(df, "v", ["grp"])  # 7 groups < knob
    assert "BroadcastHashJoin" in plan_of(auto_small)

    def rows(out):
        return sorted(tuple(r) for r in out.collect())

    expect = rows(forced_on)
    assert rows(forced_off) == expect
    assert rows(auto_above_knob) == expect
    assert rows(auto_small) == expect


def test_pmi_collocations_matches_pure_python_twin(spark):
    """PMI on a tiny corpus vs the direct formula: counts from adjacent
    pairs, pmi = ln((bc/Np) / ((u1/Nt)*(u2/Nt))), threshold on count."""
    from collections import Counter

    from bp_datawarehouse_ordersfact_spark.operators.ml import pmi_collocations

    docs = [
        (1, "new york new york city of new york"),
        (2, "york new and new york again new york"),
        (3, "city of the city of"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["pair_cnt"], r["pmi"])
        for r in pmi_collocations(df, "text", "doc_id", min_pair_count=2).collect()
    }
    toks = {i: t.split() for i, t in docs}
    uni = Counter(w for ts in toks.values() for w in ts)
    pairs = Counter(
        (ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1)
    )
    nt, np_ = sum(uni.values()), sum(pairs.values())
    expect = {}
    for (w1, w2), c in pairs.items():
        if c >= 2:
            pmi = math.log((c / np_) / ((uni[w1] / nt) * (uni[w2] / nt)))
            expect[(w1, w2)] = (c, math.floor(pmi * 1e6 + 0.5001) / 1e6)
    assert got == expect
    assert ("new", "york") in got and got[("new", "york")][0] == 5


def test_pmi_collocations_rejects_bad_threshold(spark):
    from bp_datawarehouse_ordersfact_spark.operators.ml import pmi_collocations

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pmi_collocations(df, "text", "doc_id", min_pair_count=0)


def test_temperature_mixture_matches_pure_python_twin(spark):
    """α-sampling weights vs the direct formula, and the contract: at
    α<1 the smallest source's share is lifted (boost>1), the largest
    source's is cut (boost<1), and the derived shares sum to 1."""
    from bp_datawarehouse_ordersfact_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    sizes = {"big": 90_000, "mid": 9_000, "small": 1_000}
    rows = [(s, n) for s, n in sizes.items()]
    df = spark.createDataFrame(rows, "source string, n_tokens_in long")
    got = {
        r["source"]: r
        for r in temperature_mixture_weights(
            df, source_col="source", token_col="n_tokens_in", alpha=0.3
        ).collect()
    }
    nt = sum(sizes.values())
    pow_sum = sum(n**0.3 for n in sizes.values())
    for s, n in sizes.items():
        raw, temp = n / nt, n**0.3 / pow_sum
        assert got[s]["n_tokens"] == n
        assert abs(got[s]["raw_share"] - raw) < 1e-5
        assert abs(got[s]["temp_share"] - temp) < 1e-5
        assert abs(got[s]["boost"] - temp / raw) < 1e-4
    assert got["small"]["boost"] > 1.0 > got["big"]["boost"]
    assert abs(sum(r["temp_share"] for r in got.values()) - 1.0) < 1e-4
    with pytest.raises(ValueError):
        temperature_mixture_weights(
            df, source_col="source", token_col="n_tokens_in", alpha=0.0
        )


def test_bloom_prefilter_rejects_mismatched_key_types(spark):
    """xxhash64 hashes representations, not join-coerced values: an INT
    probe against a BIGINT build would silently drop EVERY true match
    (the exact violation the operator forbids), so mismatched key types
    must refuse loudly."""
    from bp_datawarehouse_ordersfact_spark.operators.joins import bloom_prefilter

    probe = spark.createDataFrame([(5,)], "k int")
    build = spark.createDataFrame([(5,)], "k long")
    with pytest.raises(ValueError, match="same type"):
        bloom_prefilter(probe, "k", build, "k")
    # cast to a common type and the match passes
    out = bloom_prefilter(
        probe.select(F.col("k").cast("long").alias("k")), "k", build, "k"
    )
    assert [r["k"] for r in out.collect()] == [5]


def test_outlier_iqr_keeps_null_group_labels(spark):
    """A NULL group label is still a group: the null-safe join-back must
    report it rather than silently dropping the unlabeled rows."""
    from bp_datawarehouse_ordersfact_spark.operators.aggregates import (
        outlier_iqr_per_group,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 3.0), (None, 4.0), (None, 500.0)],
        "grp string, v double",
    )
    out = {r["grp"]: r for r in outlier_iqr_per_group(df, "v", ["grp"]).collect()}
    assert set(out) == {"a", None}
    assert out[None]["n"] == 3


def test_mixture_drift_matches_pure_python_and_handles_one_sided_keys(spark):
    """JS drift vs the direct formula on planted snapshots, including a
    source present in only ONE side (the finite-penalty case KL cannot
    express — p=0 or q=0 terms take the 0·ln(0)=0 limit)."""
    from bp_datawarehouse_ordersfact_spark.operators.aggregates import mixture_drift

    base = spark.createDataFrame(
        [("a", 60), ("a", 30), ("b", 10), ("gone", 20)], "src string, w int"
    )
    cur = spark.createDataFrame(
        [("a", 50), ("b", 40), ("new", 10)], "src string, w int"
    )
    got = {
        r["key"]: r
        for r in mixture_drift(base, cur, key_col="src", weight_col="w").collect()
    }
    nb = {"a": 90, "b": 10, "gone": 20}
    nc = {"a": 50, "b": 40, "new": 10}
    tb, tc = sum(nb.values()), sum(nc.values())
    total_js = 0.0
    for k in set(nb) | set(nc):
        p, q = nb.get(k, 0) / tb, nc.get(k, 0) / tc
        m = (p + q) / 2.0
        contrib = 0.5 * (p * math.log(p / m) if p > 0 else 0.0) + 0.5 * (
            q * math.log(q / m) if q > 0 else 0.0
        )
        total_js += contrib
        r = got[k]
        assert r["n_base"] == nb.get(k, 0) and r["n_cur"] == nc.get(k, 0)
        assert abs(r["p_share"] - p) < 1e-5 and abs(r["q_share"] - q) < 1e-5
        assert abs(r["js_contrib"] - contrib) < 1e-5, k
        assert r["js_contrib"] >= 0.0  # JS contributions are non-negative
    assert 0.0 <= total_js <= math.log(2) + 1e-12
    # identical snapshots drift zero
    same = mixture_drift(base, base, key_col="src", weight_col="w").collect()
    assert all(r["js_contrib"] == 0.0 for r in same)


def test_mixture_drift_null_key_fractional_weights_and_empty_side(spark):
    """Second-review regression pins: (1) a NULL key is ONE key — the
    null-safe alignment may never split it into two phantom one-sided
    rows, so identical snapshots drift zero even with NULL keys; (2)
    fractional weights sum in double, never truncating to zero; (3) an
    empty snapshot yields finite one-sided penalties, never NULLs."""
    from bp_datawarehouse_ordersfact_spark.operators.aggregates import mixture_drift

    # (1) NULL key, identical snapshots
    df = spark.createDataFrame(
        [(None, 10.0), ("a", 10.0)], "src string, w double"
    )
    rows = mixture_drift(df, df, key_col="src", weight_col="w").collect()
    assert len(rows) == 2  # exactly one row for the NULL key
    assert all(r["js_contrib"] == 0.0 for r in rows)

    # (2) sub-1.0 fractional weights
    base = spark.createDataFrame(
        [("a", 0.9), ("b", 0.1)], "src string, w double"
    )
    got = {
        r["key"]: r
        for r in mixture_drift(base, base, key_col="src", weight_col="w").collect()
    }
    assert abs(got["a"]["p_share"] - 0.9) < 1e-5
    assert abs(got["a"]["n_base"] - 0.9) < 1e-9
    assert all(r["js_contrib"] == 0.0 for r in got.values())

    # (3) empty baseline: all keys one-sided, finite, total 0.5*ln(2)
    empty = base.filter("w < 0")
    rows = mixture_drift(empty, base, key_col="src", weight_col="w").collect()
    assert all(r["js_contrib"] is not None for r in rows)
    assert abs(sum(r["js_contrib"] for r in rows) - 0.5 * math.log(2)) < 1e-5


def test_bloom_prefilter_key_resolution_matches_sparks(spark):
    """Second-review pin: the dtype guard resolves names the way the
    (case-insensitive by default) analyzer does — a case-mismatched
    name works, an unknown name raises a real diagnosis, not KeyError."""
    from bp_datawarehouse_ordersfact_spark.operators.joins import bloom_prefilter

    probe = spark.createDataFrame([(5,)], "k long")
    build = spark.createDataFrame([(5,)], "k long")
    out = bloom_prefilter(probe, "K", build, "k")
    assert [r["k"] for r in out.collect()] == [5]
    with pytest.raises(ValueError, match="not found"):
        bloom_prefilter(probe, "nope", build, "k")


def test_outlier_iqr_handles_awkward_column_names(spark):
    """Second-review pin: no user column name is ever interpolated into
    SQL — a space-bearing value column works in both tiers."""
    from bp_datawarehouse_ordersfact_spark.operators.aggregates import (
        outlier_iqr_per_group,
    )

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 2.0), ("g", 100.0)], ["grp", "my value"]
    )
    for exact in (True, False):
        row = outlier_iqr_per_group(df, "my value", ["grp"], exact=exact).collect()[0]
        assert row["n"] == 3
