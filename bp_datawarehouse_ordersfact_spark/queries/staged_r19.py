"""STAGED registry query for the round-19 rotation (not yet in
``queries._MODULES`` — the sketches_r6/staged_r10 staging discipline).

One query: ``mg_heavy_hitters`` — `operators.sketches.frequent_items_mg`
(Misra-Gries heavy hitters with deterministic error bounds) is the last
sketch-family operator without a driver row (HLL, theta, KLL, CMS, and
the approx-stats self-check all have live or staged rows).

Fixture (the CMS self-validation pattern — the per-partition summaries,
and so the exact bound VALUES, depend on physical partitioning, which
differs between the driver's session and test sessions; the GUARANTEES
hold under every partitioning and are what the row pins):

- the item stream is every event's id (all-distinct strings, so at
  k=64 the capacity decrement genuinely fires over the real corpus —
  cardinality ~N, not ~|event types|) unioned with two planted heavy
  hitters, 3000 and 2500 copies (ids cannot collide with stringified
  event ids). Total decrement <= N/(k+1) (~1.6k at sf0.1), so both
  plants' survival is GUARANTEED at every test sf, never probabilistic;
- output per queried item (two plants + a never-seen name):
  oracle-recomputed exact true count, `present` (guaranteed TRUE for
  the plants, FALSE for never-seen — MG never invents items), and
  `bounds_hold` (est_lo <= true <= est_hi when present; vacuously TRUE
  otherwise) — the Misra-Gries contract itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..operators.sketches import frequent_items_mg

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Plant sizes set for ~4x headroom over the largest existing testdata
# (survival needs count > N/(k+1); sf0.1's N ~ 105k gives worst_dec
# ~1.6k — 6500 holds to N ~ 420k). tests/test_staged_r19_queries.py
# enumerates EVERY /root/testdata/sf* dir, so a new, larger sf breaks
# the guard test before it can redden a driver row (r11 review).
_MG_PLANT_A, _MG_PLANT_B = 8000, 6500
_MG_K = 64
_MG_ITEMS = ["planted-hh-a", "planted-hh-b", "never-seen-item"]


@register(
    "mg_heavy_hitters",
    f"""
    WITH pool AS (
      SELECT CAST(event_id AS VARCHAR) AS item FROM events
      UNION ALL SELECT 'planted-hh-a' FROM range({_MG_PLANT_A})
      UNION ALL SELECT 'planted-hh-b' FROM range({_MG_PLANT_B})
    ),
    q(item) AS (VALUES ('planted-hh-a'), ('planted-hh-b'),
                       ('never-seen-item'))
    SELECT q.item,
           CAST((SELECT count(*) FROM pool WHERE pool.item = q.item)
                AS BIGINT) AS true_cnt,
           q.item <> 'never-seen-item' AS present,
           TRUE AS bounds_hold
    FROM q
    """,
)
def q_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters with deterministic bounds
    (`operators.sketches.frequent_items_mg`): capacity-k per-partition
    counter summaries, exact k*P-row merge, (est_lo, est_hi) bracketing
    every surviving item's true count.

    Why self-validation instead of pinned estimates: the summaries (and
    the exact bound values) are partition-dependent — a different
    session parallelism legitimately changes est_lo — while the
    GUARANTEES hold under every partitioning: any item with true count
    above the total decrement (<= N/(k+1); ~1.6k at sf0.1 against 3000/
    2500 plants) MUST survive, a never-seen item can never appear, and
    est_lo <= true <= est_hi for every candidate. Those three, plus the
    oracle-recomputed exact counts (invented plant names cannot collide
    with stringified event ids at any sf), are the row. The item stream
    is every event's ID — all-distinct, so the k=64 decrement truly
    fires over the real corpus and the bench pays the summary pass +
    the bounded k*P merge."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("item")
    )
    planted = spark.createDataFrame(
        [("planted-hh-a",)] * _MG_PLANT_A + [("planted-hh-b",)] * _MG_PLANT_B,
        "item string",
    )
    pool = ev.unionByName(planted)
    mg = frequent_items_mg(pool, "item", k=_MG_K)
    # truth side: filter to the 3 queried keys BEFORE aggregating — a
    # full-cardinality groupBy over the all-distinct pool would be the
    # exact O(N-distinct) shuffle the MG row exists to avoid (r11
    # review); the left join + coalesce(0) already handles absent keys
    truth = (
        spark.createDataFrame([(i,) for i in _MG_ITEMS], "item string")
        .join(
            pool.filter(F.col("item").isin(*_MG_ITEMS))
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("n")),
            "item",
            "left",
        )
        .select("item", F.coalesce("n", F.lit(0)).cast("long").alias("true_cnt"))
    )
    return truth.join(mg, "item", "left").select(
        "item",
        "true_cnt",
        F.col("est_lo").isNotNull().alias("present"),
        F.when(
            F.col("est_lo").isNotNull(),
            (F.col("est_lo") <= F.col("true_cnt"))
            & (F.col("true_cnt") <= F.col("est_hi")),
        )
        .otherwise(F.lit(True))
        .alias("bounds_hold"),
    )
