"""Driver-style verification for the STAGED round-18 registry queries
(queries/staged_r18.py). The PQ oracle re-derives from a pure-Python
PQ twin (per-subspace argmin encode, ADC distance table); the CMS row
is the self-validation pattern (booleans + exact counts), so the test
additionally re-checks the booleans' premises directly: the guarantee
bound arithmetic, and the exact merge identity on the planted counts.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r18
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r18")
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
    for t in ("events", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", list(staged_r18.QUERIES))
def test_staged_r18_query_passes_driver_comparison(spark, con, name):
    sdf = staged_r18.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r18.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_not_yet_registered():
    """Staging contract: the names must NOT be in the live registry (the
    registry is at its 100-entry rotation cap) until the round-18
    activation swaps them in."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    assert not (set(staged_r18.QUERIES) & live)


# --- pure-Python PQ twin -----------------------------------------------------


def test_pq_values_rederive_from_python_twin():
    cb = {
        (s, c): cent for s, c, cent in staged_r18._pq_codebooks_rows()
    }
    m, d = staged_r18._PQ_M, staged_r18._PQ_D

    def encode(vec):
        codes = []
        for s in range(m):
            sub = vec[s * d : (s + 1) * d]
            best = min(
                (c for (ss, c) in cb if ss == s),
                key=lambda c: sum((a - b) ** 2 for a, b in zip(sub, cb[(s, c)])),
            )
            codes.append(best)
        return codes

    def adc(codes, q):
        total = 0.0
        for s in range(m):
            qs = q[s * d : (s + 1) * d]
            total += sum((a - b) ** 2 for a, b in zip(qs, cb[(s, codes[s])]))
        return total

    expect = {}
    for vid, codes, off in staged_r18._PQ_PLANTS:
        vec = staged_r18._vec_from_codes(codes, off)
        got_codes = encode(vec)
        assert got_codes == codes, (vid, got_codes)  # assignment closed-form
        expect[vid] = (" ".join(map(str, got_codes)), adc(got_codes, staged_r18._PQ_QUERY))
    got = {
        r[0]: (r[1], r[2])
        for r in duckdb.connect()
        .execute(staged_r18.ORACLES["pq_adc_topk"])
        .fetchall()
    }
    assert got == expect
    # the off-centroid plant is genuinely OFF every centroid yet assigns
    # to its nearest — the fixture pins nearest-not-equal, not identity
    off_vec = staged_r18._vec_from_codes([1] * m, 0.5)
    assert all(
        off_vec[s * d : (s + 1) * d] != cb[(s, 1)] for s in range(m)
    )
    # distances strictly ordered: the top-k ordering is value-decided
    dists = sorted(v[1] for v in got.values())
    assert len(set(dists)) == 3


# --- CMS premises -------------------------------------------------------------


def test_cms_booleans_premises_hold_directly(spark):
    """The self-validating booleans' premises, re-checked without the
    oracle: true counts are the planted literals (invented names cannot
    appear in real events), the never-seen item reads 0 from an
    untouched-bucket coalesce, and the merge identity is exact."""
    sdf = staged_r18.QUERIES["cms_point_freq"](spark, SF_DIR).toPandas()
    rows = {r.item: r for r in sdf.itertuples()}
    assert rows["plantedtype-a"].true_cnt == staged_r18._CMS_PLANT_A
    assert rows["plantedtype-b"].true_cnt == staged_r18._CMS_PLANT_B
    assert rows["never-seen-item"].true_cnt == 0
    for r in rows.values():
        assert r.est_ge_true and r.est_within_bound and r.merge_consistent, r
