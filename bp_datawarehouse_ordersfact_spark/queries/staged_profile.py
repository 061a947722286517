"""STAGED registry query for a buffer-round rotation (earliest r20;
not yet in ``queries._MODULES`` — the staging discipline: query +
oracle + driver-style test ahead of activation).

One query: ``embedding_profile`` — `operators.aggregates.
profile_embeddings` (round 14's embedding-corpus audit: the gate a
pipeline runs before the ANN/PQ/SemDeDup tier). The planted recipe
(ids >= 4.6x10^7, disjoint from every other staged floor) injects one
of EACH pathology the audit exists to catch — a NULL vector, a
zero-norm vector, a NaN carrier, an Inf carrier, and a ragged
3-dimensional vector — so every count column is pinned by construction
while the real embeddings table drives the norm profile at corpus
scale. The oracle recomputes the whole audit in SQL: the same
sequential double fold for the squared norm (the staged_eval2 SQL_DOT
convention), the same finite/zero routing, ``quantile_cont`` as the
interpolated-percentile twin of the exact tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..core.io import load_table
from ..operators.aggregates import profile_embeddings

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_SQL_DOT_SELF = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(len(embedding)), i -> "
    "CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))), "
    "(acc, v) -> acc + v)"
)

_PROFILE_ORACLE = f"""
    WITH pool AS (
      SELECT embedding FROM embeddings
      UNION ALL SELECT NULL::FLOAT[]
      UNION ALL SELECT list_transform(range(64), i -> CAST(0.0 AS FLOAT))
      UNION ALL SELECT list_transform(range(64), i ->
        CASE WHEN i = 0 THEN CAST('NaN' AS FLOAT) ELSE CAST(1.0 AS FLOAT) END)
      UNION ALL SELECT list_transform(range(64), i ->
        CASE WHEN i = 0 THEN CAST('Infinity' AS FLOAT) ELSE CAST(1.0 AS FLOAT) END)
      UNION ALL SELECT [CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(2.0 AS FLOAT)]
    ), derived AS (
      SELECT len(embedding) AS dim,
             CASE WHEN embedding IS NULL THEN NULL
                  ELSE len(list_filter(embedding, x ->
                         isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE)))) > 0
             END AS nf,
             CASE WHEN embedding IS NOT NULL AND NOT coalesce(
                    len(list_filter(embedding, x ->
                      isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE)))) > 0,
                    FALSE)
                  THEN {_SQL_DOT_SELF}
             END AS norm2
      FROM pool
    ), named AS (
      SELECT dim, nf,
             CASE WHEN norm2 IS NOT NULL THEN norm2 = 0.0 END AS zn,
             CASE WHEN norm2 IS NOT NULL AND norm2 <> 0.0 THEN sqrt(norm2) END
               AS clean_norm
      FROM derived
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(coalesce(sum(CASE WHEN dim IS NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_null,
           round(CASE WHEN count(*) > 0 THEN
             sum(CASE WHEN dim IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*)
             ELSE 0.0 END, 6) AS null_frac,
           CAST(count(DISTINCT dim) AS BIGINT) AS n_dims_distinct,
           CAST(min(dim) AS BIGINT) AS dim_min,
           CAST(max(dim) AS BIGINT) AS dim_max,
           CAST(coalesce(sum(CASE WHEN zn THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_zero_norm,
           round(CASE WHEN count(*) > 0 THEN
             sum(CASE WHEN zn THEN 1 ELSE 0 END) * 1.0 / count(*)
             ELSE 0.0 END, 6) AS zero_norm_frac,
           CAST(coalesce(sum(CASE WHEN nf THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_nonfinite,
           round(CASE WHEN count(*) > 0 THEN
             sum(CASE WHEN nf THEN 1 ELSE 0 END) * 1.0 / count(*)
             ELSE 0.0 END, 6) AS nonfinite_frac,
           round(avg(clean_norm), 6) AS norm_mean,
           round(quantile_cont(clean_norm, 0.5), 6) AS norm_p50,
           round(quantile_cont(clean_norm, 0.95), 6) AS norm_p95
    FROM named
    """


@register("embedding_profile", _PROFILE_ORACLE)
def q_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass embedding-corpus audit
    (`operators.aggregates.profile_embeddings`, exact tier): NULL /
    ragged-dim / zero-norm / non-finite rates plus the clean-vector
    L2-norm profile — the pre-flight gate for every vector operator in
    the repo.

    Why the oracle is a deterministic twin: every derivation is a pure
    per-row function replayed in SQL with the repo's sequential double
    fold (summation order identical in both engines), the planted
    pathologies pin each count column by construction (the real table
    carries none of them), and the exact percentile tier is
    interpolated exactly like DuckDB's ``quantile_cont``. One
    aggregation pass; the corpus never shuffles."""
    import math

    real = load_table(spark, sf_dir, "embeddings").select("embedding")
    planted = spark.createDataFrame(
        [
            (None,),
            ([0.0] * 64,),
            ([float("nan")] + [1.0] * 63,),
            ([float("inf")] + [1.0] * 63,),
            ([1.0, 2.0, 2.0],),
        ],
        "embedding array<float>",
    )
    pool = real.unionByName(planted)
    return profile_embeddings(pool, "embedding", exact=True)
