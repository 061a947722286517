"""STAGED registry queries for the round-18 rotation (not yet in
``queries._MODULES`` — the sketches_r6/staged_r10 staging discipline:
write the query + oracle + driver-style test ahead of activation, so
the activation is a mechanical edit).

Two queries closing the last sketch/compression operator gaps:

- ``cms_point_freq`` — `operators.sketches.cms_build/cms_merge/
  cms_query` (count-min point-frequency: the sketch that answers "how
  often did X occur" for ANY item decided after the scan, persisting
  as a (depth x width)-row frame that merges by counter addition).
- ``pq_adc_topk`` — `operators.pq.pq_encode/pq_search_adc` (product
  quantization: 64-dim floats -> 8 uint8 codes; asymmetric-distance
  top-k as joinless codegen over the codes column).

Fixture recipes:

- CMS: the sketch hashes with Spark's seeded xxhash64, which no other
  engine reproduces — so the row uses the `sketch_approx_stats`
  SELF-VALIDATION pattern: planted invented item names (37/3/0 true
  counts, unperturbable by real events) flow through build/merge/query
  and the output pins BOOLEANS (est >= true; est <= true + e*N/width;
  whole-stream estimate == merged-halves estimate — the last is exact
  by construction, counters add) next to the exact true counts the
  DuckDB oracle recomputes from the same pool. Real events pay the
  d-hash explode and the counter shuffle at corpus scale.
- PQ: a PLANTED literal codebook (8 subspaces x 4 codes, constant
  centroid vectors 10*code+sub) makes every planted vector's codes and
  ADC distances pure arithmetic (two vectors sit exactly ON centroid
  grids, one sits at a +0.5 offset pinning nearest-not-equal
  assignment). The REAL embeddings table unions into the encode (the
  operator's corpus-scale cost: subvector explode, broadcast argmin,
  re-assembly shuffle); the ADC search ranks only the planted codes
  (ids >= 4.6x10^7), so the top-k is sf-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..operators.pq import pq_encode, pq_search_adc
from ..operators.sketches import cms_build, cms_merge, cms_query

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- CMS fixture --------------------------------------------------------------

_CMS_PLANT_A, _CMS_PLANT_B = 37, 3
_CMS_ITEMS = ["plantedtype-a", "plantedtype-b", "never-seen-item"]
_CMS_DEPTH, _CMS_WIDTH, _CMS_SEED = 5, 1 << 12, 42


@register(
    "cms_point_freq",
    f"""
    WITH pool AS (
      SELECT event_type AS item FROM events
      UNION ALL SELECT 'plantedtype-a' FROM range({_CMS_PLANT_A})
      UNION ALL SELECT 'plantedtype-b' FROM range({_CMS_PLANT_B})
    ),
    q(item) AS (VALUES ('plantedtype-a'), ('plantedtype-b'),
                       ('never-seen-item'))
    SELECT q.item,
           CAST((SELECT count(*) FROM pool WHERE pool.item = q.item)
                AS BIGINT) AS true_cnt,
           TRUE AS est_ge_true,
           TRUE AS est_within_bound,
           TRUE AS merge_consistent
    FROM q
    """,
)
def q_cms_point_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point frequency with merge
    (`operators.sketches.cms_build/cms_merge/cms_query`): build over the
    event stream, split the same stream in half and merge the halves'
    sketches, query planted items plus a never-seen one.

    Why self-validation instead of pinned estimates: the counters hash
    with Spark's seeded xxhash64, which DuckDB cannot reproduce — the
    same reason `sketch_approx_stats` pins within-bound BOOLEANS. The
    exact side (true counts per queried item over events + plants) IS
    cross-engine recomputed by the oracle; the booleans pin the CMS
    guarantees (one-sided overestimate; est <= true + e*N/width — the
    classic bound at depth 5 holds unless all 5 rows collide, and it is
    verified at sf0.001/0.01/0.1 in staging) and the exact
    merge-consistency contract (whole-stream estimate == summed-halves
    estimate for EVERY item — counters add, no probability involved).
    Invented item names keep the true counts unperturbable by real
    events at any sf. Real events pay the depth-hash explode and the
    bounded (<= depth*width groups) counter shuffle; the total-count
    pull is one 1-row driver aggregate (the trained-sketch pattern)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("event_type").alias("item")
    )
    planted = spark.createDataFrame(
        [(45_000_000 + i, "plantedtype-a") for i in range(_CMS_PLANT_A)]
        + [(45_000_100 + i, "plantedtype-b") for i in range(_CMS_PLANT_B)],
        "event_id long, item string",
    )
    pool = ev.unionByName(planted)
    kw = dict(depth=_CMS_DEPTH, width=_CMS_WIDTH, seed=_CMS_SEED)
    whole = cms_build(pool, "item", **kw)
    merged = cms_merge(
        cms_build(pool.filter(F.col("event_id") % 2 == 0), "item", **kw),
        cms_build(pool.filter(F.col("event_id") % 2 == 1), "item", **kw),
    )
    [n_total] = pool.agg(F.count(F.lit(1)).alias("n")).collect()
    bound_slack = 2.718281828459045 * n_total["n"] / _CMS_WIDTH

    est_w = cms_query(whole, _CMS_ITEMS, **kw).withColumnRenamed("est", "est_w")
    est_m = cms_query(merged, _CMS_ITEMS, **kw).withColumnRenamed("est", "est_m")
    truth = (
        spark.createDataFrame([(i,) for i in _CMS_ITEMS], "item string")
        .join(pool.groupBy("item").agg(F.count(F.lit(1)).alias("n")), "item", "left")
        .select("item", F.coalesce("n", F.lit(0)).cast("long").alias("true_cnt"))
    )
    return (
        truth.join(est_w, "item")
        .join(est_m, "item")
        .select(
            "item",
            "true_cnt",
            (F.col("est_w") >= F.col("true_cnt")).alias("est_ge_true"),
            (F.col("est_w") <= F.col("true_cnt") + F.lit(bound_slack)).alias(
                "est_within_bound"
            ),
            (F.col("est_w") == F.col("est_m")).alias("merge_consistent"),
        )
    )


# --- PQ fixture ---------------------------------------------------------------

_PQ_M, _PQ_D, _PQ_KSUB = 8, 8, 4


def _pq_codebooks_rows() -> list[tuple[int, int, list[float]]]:
    return [
        (s, c, [float(10 * c + s)] * _PQ_D)
        for s in range(_PQ_M)
        for c in range(_PQ_KSUB)
    ]


def _vec_from_codes(codes: list[int], off: float = 0.0) -> list[float]:
    v: list[float] = []
    for s, c in enumerate(codes):
        v += [10.0 * c + s + off] * _PQ_D
    return v


_PQ_PLANTS = [
    (46_000_000, [0, 1, 2, 3, 0, 1, 2, 3], 0.0),
    (46_000_001, [3, 2, 1, 0, 3, 2, 1, 0], 0.0),
    (46_000_002, [1, 1, 1, 1, 1, 1, 1, 1], 0.5),
]
_PQ_QUERY = [5.0] * (_PQ_M * _PQ_D)


@register(
    "pq_adc_topk",
    """
    SELECT * FROM (VALUES
      (CAST(46000002 AS BIGINT), '1 1 1 1 1 1 1 1',
       CAST(4960.0 AS DOUBLE)),
      (CAST(46000001 AS BIGINT), '3 2 1 0 3 2 1 0',
       CAST(18400.0 AS DOUBLE)),
      (CAST(46000000 AS BIGINT), '0 1 2 3 0 1 2 3',
       CAST(21600.0 AS DOUBLE))
    ) AS t(vec_id, codes, adc_d2)
    """,
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode + asymmetric-distance top-k
    (`operators.pq.pq_encode/pq_search_adc`): 64-dim vectors to 8
    subspace codes against a codebook, then joinless codegen ADC
    ranking (the 32x-compression interactive-search story).

    Why a typed VALUES oracle is a deterministic twin: the codebook is
    PLANTED literals (centroid vectors constant at 10*code+sub), so
    each planted vector's nearest-code assignment and the query's
    per-subspace distance table are closed-form arithmetic — re-derived
    from a pure-Python PQ twin in the staged test (two plants sit
    exactly ON centroid grids; one sits +0.5 off every centroid,
    pinning nearest-not-equal assignment; all distances are exact in
    doubles, no rounding ambiguity). The REAL embeddings table unions
    into the ENCODE and pays the operator's corpus cost — subvector
    explode, broadcast codebook argmin, per-id re-assembly shuffle —
    while the ADC search ranks only the planted codes (the planted id
    floor), keeping the top-k sf-independent."""
    codebooks = spark.createDataFrame(
        _pq_codebooks_rows(), "sub int, code int, cent array<double>"
    )
    real = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = spark.createDataFrame(
        [(i, _vec_from_codes(c, off)) for i, c, off in _PQ_PLANTS],
        "vec_id long, embedding array<double>",
    )
    pool = real.unionByName(planted)
    codes = pq_encode(pool, codebooks, vec_col="embedding", id_col="vec_id")
    topk = pq_search_adc(
        codes.filter(F.col("vec_id") >= 46_000_000),
        codebooks,
        _PQ_QUERY,
        k=3,
        id_col="vec_id",
    )
    # the codes column for the OUTPUT comes from a planted-only encode
    # (3 rows, identical per-row arithmetic): joining the corpus-scale
    # `codes` lineage a second time would re-run the whole encode
    # subtree in the same plan (r11 review — verified duplicated)
    planted_only = pq_encode(
        planted, codebooks, vec_col="embedding", id_col="vec_id"
    )
    return topk.join(planted_only, "vec_id").select(
        "vec_id",
        F.array_join(F.transform("codes", lambda c: c.cast("string")), " ").alias(
            "codes"
        ),
        "adc_d2",
    )
