"""Registry queries for the theta / KLL sketch operators.

Staged during round 5 (the round-5 window was rotation-locked) and
ACTIVATED in round 6: the module is in ``_MODULES`` and both names lead
``_WINDOW_FIRST``. tests/test_sketches_r6.py ran the exact driver-style
comparison (same machinery as tests/parity.py) a full round before the
driver first saw them.

Both follow the self-validating sketch-oracle pattern of
``sketch_hll_merge``: exact values hash-check against the oracle, and
within-error booleans (computed Spark-side against the exact values,
literal TRUE in the oracle) pin the estimator quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..operators.sketches import kll_grouped_quantiles, theta_audience_algebra

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def q_sketch_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra on theta sketches, self-validated: the
    distinct-user domain at test SFs is far below 2^lg_k, where theta
    sketches are EXACT, so the estimates themselves hash-check against
    the oracle's exact set counts (and stay estimates at 100 TB, where
    the same code runs with bounded error instead)."""
    ev = load_table(spark, sf_dir, "events")
    out = theta_audience_algebra(
        ev,
        "user_id",
        F.col("event_type") == "view",
        F.col("event_type") == "purchase",
    )
    return out.select(
        F.col("est_a").cast("bigint").alias("n_viewers"),
        F.col("est_b").cast("bigint").alias("n_buyers"),
        F.col("est_intersect").cast("bigint").alias("n_both"),
        F.col("est_a_minus_b").cast("bigint").alias("n_view_no_buy"),
    )


ORACLES["sketch_theta_set_algebra"] = """
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT count(*) FROM a) AS n_viewers,
           (SELECT count(*) FROM b) AS n_buyers,
           (SELECT count(*) FROM a WHERE user_id IN (SELECT user_id FROM b))
             AS n_both,
           (SELECT count(*) FROM a WHERE user_id NOT IN (SELECT user_id FROM b))
             AS n_view_no_buy
"""
QUERIES["sketch_theta_set_algebra"] = q_sketch_theta_set_algebra


def q_sketch_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles: per-event-type KLL sketches folded into
    global p50/p90 of ``value`` WITHOUT rescanning the events. Exact
    quantiles hash-check against the oracle; the sketch estimates are
    validated Spark-side as within 2% rank error of the exact values
    (booleans hash-checked, oracle emits literal TRUE — the
    ``sketch_approx_stats`` pattern)."""
    from ..functions.rounding import rnd

    ev = load_table(spark, sf_dir, "events")
    _, merged = kll_grouped_quantiles(ev, "event_type", "value", [0.5, 0.9])
    exact = ev.agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile(value, 0.9)").alias("exact_p90"),
    )
    ranked = (
        merged.crossJoin(exact)
        .crossJoin(ev.agg(F.count(F.lit(1)).alias("n_rows")))
        .select(
            rnd("exact_p50", 6).alias("exact_p50"),
            rnd("exact_p90", 6).alias("exact_p90"),
            "q_0_5",
            "q_0_9",
            "n_rows",
        )
    )
    # rank of each estimate in the exact data must sit within 2% of p —
    # joins-free conditional counts over one broadcast of the estimates
    counts = ev.crossJoin(
        F.broadcast(ranked.select("q_0_5", "q_0_9"))
    ).agg(
        F.sum(F.when(F.col("value") <= F.col("q_0_5"), 1).otherwise(0)).alias(
            "n_le_p50"
        ),
        F.sum(F.when(F.col("value") <= F.col("q_0_9"), 1).otherwise(0)).alias(
            "n_le_p90"
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(counts))
        .select(
            "exact_p50",
            "exact_p90",
            (
                F.abs(F.col("n_le_p50") / F.col("n_rows") - 0.5) <= 0.02
            ).alias("p50_within_rank_err"),
            (
                F.abs(F.col("n_le_p90") / F.col("n_rows") - 0.9) <= 0.02
            ).alias("p90_within_rank_err"),
        )
    )


# RETIRED round 12 (r11 VERDICT #4 endgame pool) — the sketch family
# holds theta/hll/approx live plus CMS/MG staged; the KLL merge law
# stays pinned every pytest run via RETIRED below
# (tests/test_retired_queries.py merges this dict).
RETIRED: dict[str, tuple] = {
    "sketch_kll_quantile_merge": (
        q_sketch_kll_quantile_merge,
        """
        SELECT round(quantile_cont(value, 0.5), 6) AS exact_p50,
               round(quantile_cont(value, 0.9), 6) AS exact_p90,
               TRUE AS p50_within_rank_err,
               TRUE AS p90_within_rank_err
        FROM events
        """,
    ),
}
