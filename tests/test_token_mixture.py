"""Token-budget mixture planner (operators/sampling.plan_token_mixture /
apply_token_mixture).

Pins: driver math vs hand computation (down-sample, multi-epoch
up-sample, max_epochs cap + shortfall, missing source), the hashlib
reproducibility of the partial-epoch subset, epoch-count exactness,
repartition stability, the broadcast plan-join shape, and planned-token
accuracy of the materialized mixture.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.operators.sampling import (
    apply_token_mixture,
    plan_token_mixture,
)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("mixture")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _corpus(spark):
    # web: 400 docs x 100 tokens = 40_000; books: 40 x 500 = 20_000;
    # code: 100 x 60 = 6_000
    rows = (
        [(i, "web", 100) for i in range(400)]
        + [(1000 + i, "books", 500) for i in range(40)]
        + [(2000 + i, "code", 60) for i in range(100)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")


def _by_source(plan):
    return {p["source"]: p for p in plan}


def test_plan_math(spark):
    plan = _by_source(
        plan_token_mixture(
            _corpus(spark),
            source_col="source",
            token_col="n_tokens",
            weights={"web": 0.5, "books": 0.4, "code": 0.1},
            token_budget=50_000,
        )
    )
    # web: target 25k of 40k avail -> 0 full epochs + 625000 ppm
    assert plan["web"]["full_epochs"] == 0
    assert plan["web"]["final_epoch_ppm"] == 625_000
    assert plan["web"]["shortfall_tokens"] == 0
    # books: target 20k of 20k -> exactly 1.0 epoch
    assert plan["books"]["full_epochs"] == 1
    assert plan["books"]["final_epoch_ppm"] == 0
    # code: target 5k of 6k -> 0 + 833333 ppm
    assert plan["code"]["full_epochs"] == 0
    assert abs(plan["code"]["final_epoch_ppm"] - 833_333) <= 1
    assert sum(p["target_tokens"] for p in plan.values()) == 50_000


def test_plan_upsamples_scarce_source(spark):
    plan = _by_source(
        plan_token_mixture(
            _corpus(spark),
            source_col="source",
            token_col="n_tokens",
            weights={"books": 1.0},
            token_budget=50_000,
        )
    )
    # 50k wanted, 20k available -> 2.5 epochs
    assert plan["books"]["full_epochs"] == 2
    assert plan["books"]["final_epoch_ppm"] == 500_000
    assert plan["books"]["planned_tokens"] == 50_000


def test_plan_cap_and_shortfall(spark):
    plan = _by_source(
        plan_token_mixture(
            _corpus(spark),
            source_col="source",
            token_col="n_tokens",
            weights={"code": 1.0},
            token_budget=100_000,
            max_epochs=3.0,
        )
    )
    assert plan["code"]["full_epochs"] == 3
    assert plan["code"]["final_epoch_ppm"] == 0
    assert plan["code"]["planned_tokens"] == 18_000
    assert plan["code"]["shortfall_tokens"] == 82_000


def test_plan_missing_source_and_validation(spark):
    plan = _by_source(
        plan_token_mixture(
            _corpus(spark),
            source_col="source",
            token_col="n_tokens",
            weights={"wiki": 1.0},
            token_budget=1_000,
        )
    )
    assert plan["wiki"]["avail_tokens"] == 0
    assert plan["wiki"]["planned_tokens"] == 0
    assert plan["wiki"]["shortfall_tokens"] == 1_000
    df = _corpus(spark)
    for kwargs in (
        {"token_budget": 0},
        {"token_budget": 10, "max_epochs": 0},
    ):
        with pytest.raises(ValueError):
            plan_token_mixture(
                df, source_col="source", token_col="n_tokens",
                weights={"web": 1.0}, **kwargs,
            )
    with pytest.raises(ValueError, match="negative"):
        plan_token_mixture(
            df, source_col="source", token_col="n_tokens",
            weights={"web": -1.0}, token_budget=10,
        )


from tests.parity import h32_md5 as _h32


def test_apply_matches_hashlib_reference(spark):
    df = _corpus(spark)
    plan = plan_token_mixture(
        df,
        source_col="source",
        token_col="n_tokens",
        weights={"books": 0.6, "web": 0.4},
        token_budget=60_000,
    )
    out = apply_token_mixture(df, plan, source_col="source", id_col="doc_id")
    got = sorted((r["doc_id"], r["epoch"]) for r in out.collect())

    by = {p["source"]: p for p in plan}
    expect = []
    for src, ids in (("books", range(1000, 1040)), ("web", range(400))):
        p = by[src]
        for i in ids:
            for e in range(p["full_epochs"]):
                expect.append((i, e))
            if p["final_epoch_ppm"] > 0:
                e = p["full_epochs"]
                if _h32(f"{e}:{i}") % 1_000_000 < p["final_epoch_ppm"]:
                    expect.append((i, e))
    assert got == sorted(expect)
    # code had weight 0 -> absent entirely
    assert out.filter(F.col("source") == "code").count() == 0


def test_apply_token_total_near_target(spark):
    df = _corpus(spark)
    plan = plan_token_mixture(
        df, source_col="source", token_col="n_tokens",
        weights={"web": 0.5, "books": 0.5}, token_budget=40_000,
    )
    out = apply_token_mixture(df, plan, source_col="source", id_col="doc_id")
    total = out.agg(F.sum("n_tokens")).first()[0]
    # ppm sampling is exact-in-expectation; tolerance ~ a few doc sizes
    assert abs(total - 40_000) < 4_000


def test_apply_repartition_stable_and_broadcast(spark):
    df = _corpus(spark)
    plan = plan_token_mixture(
        df, source_col="source", token_col="n_tokens",
        weights={"web": 1.0}, token_budget=10_000,
    )
    a = sorted(
        (r["doc_id"], r["epoch"])
        for r in apply_token_mixture(
            df, plan, source_col="source", id_col="doc_id"
        ).collect()
    )
    b = sorted(
        (r["doc_id"], r["epoch"])
        for r in apply_token_mixture(
            df.repartition(13), plan, source_col="source", id_col="doc_id"
        ).collect()
    )
    assert a == b
    physical = (
        apply_token_mixture(df, plan, source_col="source", id_col="doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in physical
    assert "SortMergeJoin" not in physical


def test_apply_empty_plan_yields_empty_frame(spark):
    df = _corpus(spark)
    out = apply_token_mixture(
        df,
        [{"source": "web", "full_epochs": 0, "final_epoch_ppm": 0}],
        source_col="source",
        id_col="doc_id",
    )
    assert out.count() == 0
    assert "epoch" in out.columns


def test_length_bucketed_order(spark):
    import hashlib

    from bp_datawarehouse_ordersfact_spark.operators.sampling import (
        length_bucketed_order,
    )

    rows = [(i, (i * 37) % 500 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int").repartition(7)
    out = length_bucketed_order(
        df, id_col="doc_id", length_col="n_tokens", bucket_width=100,
        n_shards=4, keep_bucket=True,
    )
    collected = []
    for pid, it in enumerate(out.rdd.glom().collect()):
        collected.extend((pid, r) for r in it)
    # physical order == (bucket asc, h32 key asc, id asc) globally
    def h(i):
        return int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:8], 16)

    keys = [
        (r["_len_bucket"], h(r["doc_id"]), r["doc_id"]) for _, r in collected
    ]
    assert keys == sorted(keys)
    # buckets are length-coherent: padding waste bounded by bucket_width
    for _, r in collected:
        assert r["_len_bucket"] == (r["n_tokens"]) // 100
    # rerun-stable; different seed reorders within buckets
    again = [
        r["doc_id"]
        for r in length_bucketed_order(
            spark.createDataFrame(rows, "doc_id long, n_tokens int"),
            id_col="doc_id", length_col="n_tokens", bucket_width=100,
            n_shards=4,
        ).rdd.flatMap(lambda r: [r]).collect()
    ]
    base = [r["doc_id"] for _, r in collected]
    assert again == base
    reseeded = [
        r["doc_id"]
        for r in length_bucketed_order(
            df, id_col="doc_id", length_col="n_tokens", bucket_width=100,
            seed="ep1", n_shards=4,
        ).rdd.flatMap(lambda r: [r]).collect()
    ]
    assert reseeded != base
    assert sorted(reseeded) == sorted(base)
    with pytest.raises(ValueError, match="bucket_width"):
        length_bucketed_order(
            df, id_col="doc_id", length_col="n_tokens", bucket_width=0
        )


def test_quality_resample_by_group_per_language_edges(spark):
    import hashlib

    from bp_datawarehouse_ordersfact_spark.operators.sampling import (
        quality_stratified_resample_by_group,
    )

    # two languages with DISJOINT score ranges: global edges would put
    # every French doc in the bottom bucket; per-group edges must not
    rows = [(i, "en", 100.0 + i) for i in range(90)] + [
        (1000 + i, "fr", float(i)) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    out = quality_stratified_resample_by_group(
        df, "score", "doc_id", "lang", keep_ppm=[0, 0, 1_000_000]
    )
    got = {r["doc_id"]: r["quality_bucket"] for r in out.collect()}
    # survivors are top-tercile WITHIN each language
    assert all(b == 2 for b in got.values())
    en = [i for i in got if i < 1000]
    fr = [i - 1000 for i in got if i >= 1000]
    assert en and fr  # both languages keep their own top tercile
    assert min(en) >= 55 and min(fr) >= 55  # ~top third by per-group score

    # explicit per-group boundaries: exact + hashlib-pinned membership
    out2 = quality_stratified_resample_by_group(
        df, "score", "doc_id", "lang",
        keep_ppm=[0, 500_000],
        boundaries={"en": [144.5], "fr": [44.5]},
    )
    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
    expect = {
        i for i, lang, s in rows
        if (s > (144.5 if lang == "en" else 44.5)) and h(i) % 1_000_000 < 500_000
    }
    assert {r["doc_id"] for r in out2.collect()} == expect

    # missing group in explicit boundaries -> loud refusal. The check
    # rides the edges join as a raise_error branch (r15: the previous
    # distinct().collect() pre-validation was a full extra corpus pass
    # per call), so the refusal surfaces at ACTION time as a Spark
    # runtime error carrying the same message.
    with pytest.raises(Exception, match="missing groups"):
        quality_stratified_resample_by_group(
            df, "score", "doc_id", "lang",
            keep_ppm=[0, 1_000_000], boundaries={"en": [144.5]},
        ).collect()
    with pytest.raises(ValueError, match="wrong lengths"):
        quality_stratified_resample_by_group(
            df, "score", "doc_id", "lang",
            keep_ppm=[0, 1_000_000], boundaries={"en": [], "fr": [1.0]},
        )


def test_epoch_copies_get_independent_delivery_orders(spark):
    """Composition pin: apply_token_mixture's epoch column feeds
    seeded_global_shuffle(seed=f"ep{k}") — each epoch's copy of the same
    docs must come out in a DIFFERENT (but individually deterministic)
    training order."""
    from bp_datawarehouse_ordersfact_spark.operators.sampling import (
        seeded_global_shuffle,
    )

    df = _corpus(spark).filter("source = 'books'")
    plan = plan_token_mixture(
        df, source_col="source", token_col="n_tokens",
        weights={"books": 1.0}, token_budget=40_000,
    )
    mixed = apply_token_mixture(df, plan, source_col="source", id_col="doc_id")
    orders = {}
    for e in (0, 1):
        epoch = mixed.filter(F.col("epoch") == e)
        shuffled = seeded_global_shuffle(epoch, "doc_id", seed=f"ep{e}")
        orders[e] = [
            r["doc_id"] for part in shuffled.rdd.glom().collect() for r in part
        ]
    assert sorted(orders[0]) == sorted(orders[1])  # same 2-epoch doc set
    assert orders[0] != orders[1]  # different training order per epoch
    # each epoch's order is reproducible
    again = [
        r["doc_id"]
        for part in seeded_global_shuffle(
            mixed.filter("epoch = 0"), "doc_id", seed="ep0"
        ).rdd.glom().collect()
        for r in part
    ]
    assert again == orders[0]
