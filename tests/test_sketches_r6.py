"""Driver-style verification for the STAGED round-6 sketch queries.

Runs the exact comparison the driver will run (tests/parity.py's
fetchdf + dtype-sensitive frames_match, with the central round()
rewrite applied as queries/__init__.all_oracles will) so that round 6's
registry activation is a mechanical two-line edit."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import sketches_r6
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("sketches-r6")
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
    for t in "events".split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", list(sketches_r6.QUERIES))
def test_staged_r6_query_passes_driver_comparison(spark, con, name):
    sdf = sketches_r6.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(sketches_r6.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


class TestFrequentItemsMg:
    """Misra-Gries heavy hitters: bounds and capture guarantees must hold
    under EVERY physical partitioning (summaries may differ; guarantees
    may not)."""

    def _data(self):
        # skewed: two heavy hitters over a 300-item tail
        rows = (
            [("h1",)] * 5000
            + [("h2",)] * 3000
            + [("mid",)] * 400
            + [(f"t{i}",) for i in range(300) for _ in range(i % 7 + 1)]
            + [(None,)] * 50
        )
        exact: dict[str, int] = {}
        for (it,) in rows:
            if it is not None:
                exact[it] = exact.get(it, 0) + 1
        return rows, exact

    def test_bounds_and_capture_under_partitionings(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.sketches import (
            frequent_items_mg,
        )

        rows, exact = self._data()
        df = spark.createDataFrame(rows, "item string")
        for parts in (1, 4, 13):
            out = frequent_items_mg(df.repartition(parts), "item", k=16).collect()
            got = {r["item"]: (r["est_lo"], r["est_hi"]) for r in out}
            total_dec = out[0]["est_hi"] - out[0]["est_lo"]
            # every reported bound brackets the exact count
            for item, (lo, hi) in got.items():
                assert lo <= exact[item] <= hi, (parts, item)
            # anything heavier than the total decrement must be reported
            for item, c in exact.items():
                if c > total_dec:
                    assert item in got, (parts, item)
            # the two real hitters always surface, heaviest first
            assert out[0]["item"] == "h1" and out[1]["item"] == "h2"

    def test_exact_when_capacity_covers_domain(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.sketches import (
            frequent_items_mg,
        )

        rows, exact = self._data()
        df = spark.createDataFrame(rows, "item string").repartition(4)
        out = frequent_items_mg(df, "item", k=1000).collect()
        got = {r["item"]: r["est_lo"] for r in out}
        assert got == exact  # no decrements ever fire -> exact counts
        assert all(r["est_hi"] == r["est_lo"] for r in out)

    def test_validation(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.sketches import (
            frequent_items_mg,
        )

        df = spark.createDataFrame([("a",)], "item string")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            frequent_items_mg(df, "item", k=0)


class TestFrequentItemsMgByGroup:
    def test_per_group_bounds_and_capture(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.sketches import (
            frequent_items_mg_by_group,
        )

        rows = (
            [("web", "h1")] * 2000
            + [("web", "h2")] * 900
            + [("web", f"t{i}") for i in range(200) for _ in range(i % 5 + 1)]
            + [("code", "c1")] * 1500
            + [("code", f"u{i}") for i in range(150) for _ in range(i % 3 + 1)]
            + [(None, "x")] * 20
            + [("web", None)] * 20
        )
        exact: dict[tuple[str, str], int] = {}
        for g, it in rows:
            if g is not None and it is not None:
                exact[(g, it)] = exact.get((g, it), 0) + 1
        df = spark.createDataFrame(rows, "source string, item string")
        for parts in (1, 7):
            out = frequent_items_mg_by_group(
                df.repartition(parts), "source", "item", k=12
            ).collect()
            decs = {}
            for r in out:
                decs.setdefault(r["source"], r["est_hi"] - r["est_lo"])
                assert (
                    r["est_lo"]
                    <= exact[(r["source"], r["item"])]
                    <= r["est_hi"]
                ), (parts, r)
            got = {(r["source"], r["item"]) for r in out}
            for (g, it), c in exact.items():
                if c > decs.get(g, 0):
                    assert (g, it) in got, (parts, g, it)
            # heaviest item leads each group
            firsts = {}
            for r in out:
                firsts.setdefault(r["source"], r["item"])
            assert firsts == {"web": "h1", "code": "c1"}
