"""Weighted sampling (A-ES) pinned against a hashlib/math reference.

The md5-derived uniform makes the whole sample a pure function of
(key, seed), so the reference recomputes the identical race keys in
Python and the tests assert the exact winner sets — plus the statistical
contract (higher weight → higher inclusion frequency across seeds).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.operators.sampling import (
    weighted_sample,
    weighted_sample_per_group,
)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("unit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _ref_u(key, seed: str) -> float:
    h = int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:13], 16)
    return (h + 0.5) / 2**52


def _ref_key(key, weight: float, seed: str) -> float:
    return -math.log(_ref_u(key, seed)) / weight


ROWS = [
    # (doc_id, source, weight)
    (1, "web", 1.0),
    (2, "web", 5.0),
    (3, "web", 0.2),
    (4, "web", 10.0),
    (5, "books", 2.0),
    (6, "books", 2.0),
    (7, "books", 0.5),
    (8, "code", 4.0),
    (9, "code", None),
    (10, "code", 0.0),
    (11, "code", -3.0),
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "doc_id int, source string, weight double"
    ).repartition(4)


def _ref_winners(n: int, seed: str, rows=ROWS):
    eligible = [(d, s, w) for d, s, w in rows if w is not None and w > 0]
    ranked = sorted(eligible, key=lambda r: (_ref_key(r[0], r[2], seed), r[0]))
    return [r[0] for r in ranked[:n]]


class TestWeightedSample:
    def test_winners_match_reference(self, spark):
        for seed in ("0", "7", "round5"):
            out = weighted_sample(_df(spark), 4, "weight", "doc_id", seed=seed)
            got = [r["doc_id"] for r in out.collect()]
            assert got == _ref_winners(4, seed), seed

    def test_race_keys_match_reference(self, spark):
        out = weighted_sample(_df(spark), 8, "weight", "doc_id", seed="x").collect()
        for r in out:
            assert r["es_key"] == pytest.approx(
                _ref_key(r["doc_id"], r["weight"], "x"), rel=1e-12
            )

    def test_excludes_null_zero_negative_weights(self, spark):
        out = weighted_sample(_df(spark), 100, "weight", "doc_id").collect()
        got = {r["doc_id"] for r in out}
        assert got == {1, 2, 3, 4, 5, 6, 7, 8}  # 9/10/11 never eligible

    def test_partitioning_independence(self, spark):
        df1 = _df(spark).coalesce(1)
        df4 = _df(spark).repartition(7, "source")
        a = [r["doc_id"] for r in weighted_sample(df1, 5, "weight", "doc_id").collect()]
        b = [r["doc_id"] for r in weighted_sample(df4, 5, "weight", "doc_id").collect()]
        assert a == b

    def test_inclusion_tracks_weight(self, spark):
        # across 40 seeds, the weight-10 doc must sample far more often
        # than the weight-0.2 doc (A-ES inclusion is monotone in weight)
        wins = {4: 0, 3: 0}
        for i in range(40):
            for d in _ref_winners(3, f"s{i}"):
                if d in wins:
                    wins[d] += 1
        assert wins[4] > wins[3] + 10
        # and the Spark side agrees with the reference on a few of them
        for i in (0, 13, 37):
            got = [
                r["doc_id"]
                for r in weighted_sample(
                    _df(spark), 3, "weight", "doc_id", seed=f"s{i}"
                ).collect()
            ]
            assert got == _ref_winners(3, f"s{i}")

    def test_per_group_caps_and_reference(self, spark):
        out = weighted_sample_per_group(
            _df(spark), 2, "weight", "doc_id", ["source"], seed="g"
        ).collect()
        by_src: dict[str, list[int]] = {}
        for r in sorted(out, key=lambda r: r["es_key"]):
            by_src.setdefault(r["source"], []).append(r["doc_id"])
        assert all(len(v) <= 2 for v in by_src.values())
        for src in ("web", "books", "code"):
            rows = [r for r in ROWS if r[1] == src]
            assert by_src[src] == _ref_winners(2, "g", rows), src

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            weighted_sample(_df(spark), 0, "weight", "doc_id")
        with pytest.raises(ValueError):
            weighted_sample_per_group(_df(spark), 0, "weight", "doc_id", ["source"])


class TestQualityStratifiedResample:
    def _docs(self, spark, n=600):
        # score == doc_id: quantile edges are knowable exactly
        return spark.createDataFrame(
            [(i, float(i)) for i in range(n)], "doc_id long, score double"
        )

    def test_membership_matches_hashlib_reference(self, spark):
        import hashlib

        from bp_datawarehouse_ordersfact_spark.operators.sampling import (
            quality_stratified_resample,
        )

        n = 600
        keep = [0, 250_000, 1_000_000]
        out = quality_stratified_resample(
            self._docs(spark, n), "score", "doc_id", keep
        )
        got = {(r.doc_id, r.quality_bucket) for r in out.collect()}

        def ref_bucket(i, b):  # terciles of 0..599 land at ~200/400
            return sum(float(i) > x for x in b)

        # recover the fitted boundaries from the bucket column itself:
        # bucket edges must sit within sketch error of 200/400
        edges = sorted({r.quality_bucket for r in out.collect()})
        assert set(edges) <= {0, 1, 2}

        def ppm(i):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            return h % 1_000_000

        # bottom bucket ppm=0: nothing below ~the first tercile survives
        assert all(b != 0 for _, b in got)
        assert min(i for i, _ in got) >= 190  # edge within sketch error
        # top bucket kept whole: every id above the second edge is present
        top_ids = {i for i, b in got if b == 2}
        assert all(i in {g[0] for g in got} for i in range(410, n))
        assert len(top_ids) >= 190
        # middle bucket membership is EXACTLY the hashlib rule
        mid = {i for i, b in got if b == 1}
        mid_range = range(max(201, min(mid)), min(401, max(mid) + 1))
        for i in mid_range:
            assert (i in mid) == (ppm(i) < 250_000), i

    def test_explicit_boundaries_and_determinism(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.sampling import (
            quality_stratified_resample,
        )

        df = self._docs(spark).repartition(7)
        a = quality_stratified_resample(
            df, "score", "doc_id", [0, 1_000_000], boundaries=[299.5]
        )
        b = quality_stratified_resample(
            df.repartition(3), "score", "doc_id", [0, 1_000_000],
            boundaries=[299.5],
        )
        ids_a = sorted(r.doc_id for r in a.collect())
        ids_b = sorted(r.doc_id for r in b.collect())
        assert ids_a == ids_b == list(range(300, 600))  # exact cut, ppm 1e6

    def test_null_scores_dropped_and_validation(self, spark):
        import pytest as _pytest

        from bp_datawarehouse_ordersfact_spark.operators.sampling import (
            quality_stratified_resample,
        )

        df = spark.createDataFrame(
            [(1, 5.0), (2, None)], "doc_id long, score double"
        )
        out = quality_stratified_resample(
            df, "score", "doc_id", [1_000_000], boundaries=[]
        )
        assert [r.doc_id for r in out.collect()] == [1]
        with _pytest.raises(ValueError, match="boundaries"):
            quality_stratified_resample(
                df, "score", "doc_id", [1, 2], boundaries=[1.0, 2.0]
            )
        with _pytest.raises(ValueError, match="keep_ppm"):
            quality_stratified_resample(df, "score", "doc_id", [2_000_000])


class TestSeededGlobalShuffle:
    """The training-order shuffle is a pure function of (id, seed):
    the hashlib reference recomputes the exact global order."""

    def _ref_order(self, ids, seed):
        def k(i):
            return int(
                hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16
            )

        return sorted(ids, key=lambda i: (k(i), i))

    def test_order_matches_hashlib_reference(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.sampling import (
            seeded_global_shuffle,
        )

        ids = list(range(200))
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        out = seeded_global_shuffle(df, "doc_id", seed="ep0")
        got = [r.doc_id for r in out.collect()]
        assert sorted(got) == ids  # a permutation
        assert got == self._ref_order(ids, "ep0")

    def test_partitioning_independence_and_seed_sensitivity(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.sampling import (
            seeded_global_shuffle,
        )

        ids = list(range(300))
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        a = [
            r.doc_id
            for r in seeded_global_shuffle(df, "doc_id", seed="ep0").collect()
        ]
        b = [
            r.doc_id
            for r in seeded_global_shuffle(
                df.repartition(7), "doc_id", seed="ep0"
            ).collect()
        ]
        assert a == b  # physical input layout is irrelevant
        c = [
            r.doc_id
            for r in seeded_global_shuffle(df, "doc_id", seed="ep1").collect()
        ]
        assert sorted(c) == ids and c != a  # epoch reseed = new order

    def test_shards_balanced_even_on_sorted_input(self, spark):
        from pyspark.sql import functions as F

        from bp_datawarehouse_ordersfact_spark.operators.sampling import (
            seeded_global_shuffle,
        )

        # input sorted by id (the adversarial layout for naive range
        # sharding); hash keys spread it uniformly
        df = spark.createDataFrame(
            [(i,) for i in range(4000)], "doc_id long"
        ).orderBy("doc_id")
        out = seeded_global_shuffle(df, "doc_id", n_shards=8)
        assert out.rdd.getNumPartitions() == 8
        sizes = [
            r.n
            for r in out.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        assert len(sizes) == 8
        assert max(sizes) <= 2 * min(sizes)

    def test_keep_key_toggle(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.sampling import (
            seeded_global_shuffle,
        )

        df = spark.createDataFrame([(1, "a")], "doc_id long, body string")
        assert seeded_global_shuffle(df, "doc_id").columns == [
            "doc_id",
            "body",
        ]
        assert "_shuffle_key" in seeded_global_shuffle(
            df, "doc_id", keep_key=True
        ).columns
