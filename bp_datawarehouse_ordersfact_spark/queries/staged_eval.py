"""STAGED registry queries for the classifier-audit / continuous-drift
evaluation & snapshot-audit layer (`operators/evaluation.py`,
`operators/scd.snapshot_diff`) — written in round 12 for
activation in a BUFFER round of the accelerated schedule (earliest
r17; see queries/__init__.py's window comment). Not yet in
``queries._MODULES``; they ride the oracle-conventions gate and their
driver-style tests every pytest run meanwhile.

- ``roc_auc_per_group`` — exact Mann–Whitney AUC per ``source`` with
  average-rank tie handling (the score is deliberately COARSE — 20
  distinct values over ~500 docs — so tie buckets dominate and the
  0.5-per-tied-pair convention is what the hash actually pins).
- ``calibration_ece`` — the reliability table + ECE over a
  deterministic synthetic score/label pair derived from doc_id
  arithmetic (identical integer arithmetic on both engines; the only
  floats are per-bin means, 6dp-rounded under the central rewrite).
- ``precision_recall_at`` — the operating-point sweep next to the AUC
  row: precision/recall/F1 at five thresholds in one corpus scan.
- ``ks_drift`` / ``ks_drift_by_group`` — exact two-sample KS between
  the even- and odd-doc_id halves' n_chars distributions, global and
  per-language. The oracles compute the same cumulative-CDF max with
  textbook windows (fine at oracle scale); the Spark side uses the
  two-level bucketed prefix sum that stays parallel at 100 TB — the
  hash match proves the (grouped) decomposition exact.

All five oracles are COMPUTED (DuckDB twins over the same real
corpus), not typed VALUES — the queries scale with sf and pay their
real aggregate cost at bench scale. Scores/labels derive from integer
arithmetic (`n_chars % 20`, `doc_id % 3`, `doc_id % 101`) so both
engines rank/bucket identical inputs; no float enters before the
final 6dp rounding.

No reference equivalent (beyond-reference training-pipeline layer);
public formulas: Mann–Whitney U, Naeini et al. 2015 ECE, classical
two-sample KS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..operators.evaluation import (
    calibration_ece,
    ks_drift,
    precision_recall_at,
    psi_drift,
    roc_auc_per_group,
)

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@register(
    "roc_auc_per_group",
    """
    WITH base AS (
      SELECT source,
             CAST(n_chars % 20 AS DOUBLE) / 19.0 AS s,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y
      FROM documents
    ), ranked AS (
      SELECT source, s, y,
             row_number() OVER (PARTITION BY source ORDER BY s) AS rn
      FROM base
    ), buckets AS (
      SELECT source, s, avg(rn) AS avg_rank,
             sum(y) AS pos_in_bucket, count(*) AS n_in_bucket
      FROM ranked GROUP BY source, s
    ), pg AS (
      SELECT source,
             CAST(sum(n_in_bucket) AS BIGINT) AS n,
             CAST(sum(pos_in_bucket) AS BIGINT) AS n_pos,
             sum(pos_in_bucket * avg_rank) AS pos_rank_sum
      FROM buckets GROUP BY source
    )
    SELECT source, n, n_pos, CAST(0 AS BIGINT) AS n_excluded,
           round((pos_rank_sum - n_pos * (n_pos + 1.0) / 2.0)
                 / (CAST(n_pos AS DOUBLE) * (n - n_pos)), 6) AS auc
    FROM pg
    """,
)
def q_roc_auc_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROC AUC of a coarse deterministic quality score
    (`operators.evaluation.roc_auc_per_group`): does the score rank the
    doc_id%3 "positives" above the rest within every source? The score
    takes only 20 values, so most of the mass sits in tie buckets — the
    hash pins the average-rank (0.5-per-tied-pair) convention, not just
    the easy strict-order case. One shuffle on source feeds the rank
    window; the per-(source, score) collapse happens before the rollup."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        ((F.col("n_chars") % 20).cast("double") / 19.0).alias("s"),
        F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0).alias("y"),
    )
    return roc_auc_per_group(scored, "s", "y", ["source"])


@register(
    "calibration_ece",
    """
    WITH t AS (
      SELECT CAST(doc_id % 101 AS DOUBLE) / 100.0 AS s,
             CASE WHEN (doc_id * 7) % 10 < 4 THEN 1 ELSE 0 END AS y
      FROM documents
    ), b AS (
      SELECT least(CAST(floor(s * 10) AS INT), 9) AS bin,
             count(*) AS n, avg(s) AS a, avg(CAST(y AS DOUBLE)) AS fp
      FROM t GROUP BY 1
    )
    SELECT bin, CAST(n AS BIGINT) AS n,
           round(a, 6) AS avg_score,
           round(fp, 6) AS frac_pos,
           round(abs(a - fp), 6) AS abs_gap,
           round(sum(abs(a - fp) * n) OVER ()
                 / CAST(sum(n) OVER () AS DOUBLE), 6) AS ece,
           CAST(0 AS BIGINT) AS n_excluded
    FROM b
    """,
)
def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table + expected calibration error
    (`operators.evaluation.calibration_ece`, 10 uniform bins) over a
    deterministic score/label pair derived purely from doc_id integer
    arithmetic — both engines bucket identical doubles, and the only
    order-sensitive float work is the per-bin means, absorbed by the
    central 6dp rounding. One corpus scan, ten output rows."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("doc_id") % 101).cast("double") / 100.0).alias("s"),
        F.when((F.col("doc_id") * 7) % 10 < 4, 1).otherwise(0).alias("y"),
    )
    return calibration_ece(scored, "s", "y", n_bins=10)


@register(
    "precision_recall_at",
    """
    WITH t AS (
      SELECT CAST(doc_id % 101 AS DOUBLE) / 100.0 AS s,
             CASE WHEN n_chars % 5 = 0 THEN 1 ELSE 0 END AS y
      FROM documents
    ), th AS (
      SELECT CAST(v AS DOUBLE) AS threshold
      FROM (VALUES (0.0), (0.25), (0.5), (0.75), (0.9)) AS x(v)
    ), agg AS (
      SELECT th.threshold,
             CAST(sum(CASE WHEN s >= th.threshold THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pred_pos,
             sum(CASE WHEN s >= th.threshold AND y = 1 THEN 1 ELSE 0 END)
               AS tp,
             sum(CASE WHEN s >= th.threshold AND y = 0 THEN 1 ELSE 0 END)
               AS fp,
             sum(y) AS pos
      FROM t, th GROUP BY th.threshold
    )
    SELECT threshold, n_pred_pos,
           round(tp / CAST(tp + fp AS DOUBLE), 6) AS "precision",
           round(tp / CAST(pos AS DOUBLE), 6) AS recall,
           round(2.0 * (tp / CAST(tp + fp AS DOUBLE))
                     * (tp / CAST(pos AS DOUBLE))
                 / (tp / CAST(tp + fp AS DOUBLE)
                    + tp / CAST(pos AS DOUBLE)), 6) AS f1,
           CAST(0 AS BIGINT) AS n_excluded
    FROM agg
    """,
)
def q_precision_recall_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep (`operators.evaluation.precision_recall_at`) over
    the same deterministic doc_id-derived score with an independent
    n_chars-derived label: precision/recall/F1 at five operating points
    in ONE corpus scan (2 conditional-sum aggregates per threshold,
    map-side combined; the oracle's threshold cross join is the
    textbook form at oracle scale). Every count is exact integer
    arithmetic on both engines; only the final ratios round. The
    test-data derivation guarantees tp+fp > 0 and pos > 0 at every
    threshold, so the oracle needs no 0/0 guard — the operator's NULL
    semantics for empty cuts are pinned in the unit twins instead."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("doc_id") % 101).cast("double") / 100.0).alias("s"),
        F.when(F.col("n_chars") % 5 == 0, 1).otherwise(0).alias("y"),
    )
    return precision_recall_at(scored, "s", "y", [0.0, 0.25, 0.5, 0.75, 0.9])


@register(
    "psi_drift",
    """
    WITH b AS (
      SELECT CAST(n_chars AS DOUBLE) AS v FROM documents WHERE doc_id % 2 = 0
    ), c AS (
      SELECT CAST(n_chars AS DOUBLE) AS v FROM documents WHERE doc_id % 2 = 1
    ), e AS (
      SELECT quantile_cont(v, 0.1) AS e1,
             quantile_cont(v, 0.2) AS e2,
             quantile_cont(v, 0.3) AS e3,
             quantile_cont(v, 0.4) AS e4,
             quantile_cont(v, 0.5) AS e5,
             quantile_cont(v, 0.6) AS e6,
             quantile_cont(v, 0.7) AS e7,
             quantile_cont(v, 0.8) AS e8,
             quantile_cont(v, 0.9) AS e9
      FROM b
    ), bb AS (
      SELECT CAST(v > e1 AS INT) + CAST(v > e2 AS INT) + CAST(v > e3 AS INT) + CAST(v > e4 AS INT) + CAST(v > e5 AS INT) + CAST(v > e6 AS INT) + CAST(v > e7 AS INT) + CAST(v > e8 AS INT) + CAST(v > e9 AS INT) AS bin FROM b, e
    ), cb AS (
      SELECT CAST(v > e1 AS INT) + CAST(v > e2 AS INT) + CAST(v > e3 AS INT) + CAST(v > e4 AS INT) + CAST(v > e5 AS INT) + CAST(v > e6 AS INT) + CAST(v > e7 AS INT) + CAST(v > e8 AS INT) + CAST(v > e9 AS INT) AS bin FROM c, e
    ), bins AS (
      SELECT CAST(range AS INT) AS bin FROM range(10)
    ), cnt AS (
      SELECT bins.bin,
             CAST(coalesce(nb.n, 0) AS BIGINT) AS n_base,
             CAST(coalesce(nc.n, 0) AS BIGINT) AS n_cur
      FROM bins
      LEFT JOIN (SELECT bin, count(*) AS n FROM bb GROUP BY bin) nb USING (bin)
      LEFT JOIN (SELECT bin, count(*) AS n FROM cb GROUP BY bin) nc USING (bin)
    ), sh AS (
      SELECT bin, n_base, n_cur,
             greatest(n_base / CAST(sum(n_base) OVER () AS DOUBLE), 1e-6) AS p,
             greatest(n_cur / CAST(sum(n_cur) OVER () AS DOUBLE), 1e-6) AS q
      FROM cnt
    )
    SELECT bin, n_base, n_cur,
           round(p, 6) AS p_share,
           round(q, 6) AS q_share,
           round((q - p) * ln(q / p), 6) AS psi_contrib,
           round(sum((q - p) * ln(q / p)) OVER (), 6) AS psi
    FROM sh
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index (`operators.evaluation.psi_drift`)
    between the even- and odd-doc_id halves' n_chars distributions over
    base-decile bins — the alert-rule drift metric next to the JS
    (`mixture_drift`) and KS rows. Edges are exact base quantiles
    (Spark `percentile` == DuckDB `quantile_cont`, bit-identical — the
    outlier_iqr verification), bin assignment is 9 codegen comparisons
    per row, and the eps=1e-6 empty-bin floor is written identically in
    both engines, so every share and contribution matches to the 6dp
    rounding grain."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        F.col("doc_id"), F.col("n_chars").cast("double").alias("v")
    )
    return psi_drift(
        v.filter(F.col("doc_id") % 2 == 0).select("v"),
        v.filter(F.col("doc_id") % 2 == 1).select("v"),
        "v",
    )


@register(
    "snapshot_diff",
    """
    WITH old_s AS (
      SELECT o_orderkey, o_totalprice FROM orders
    ), new_s AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0
                  THEN round(o_totalprice * 1.1, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 11 <> 0
      UNION ALL
      SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders),
             o_totalprice
      FROM orders WHERE o_orderkey % 13 = 0
    ), d AS (
      SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                    THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM old_s o FULL OUTER JOIN new_s n ON o.o_orderkey = n.o_orderkey
    )
    SELECT status, count(*) AS n FROM d GROUP BY status
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric snapshot reconciliation (`operators.scd.snapshot_diff`):
    the current orders snapshot vs a derived next snapshot with rows
    removed (%11), changed (%7 price bump — identical IEEE multiply +
    the central portable rounding on both engines) and added (%13
    clones shifted past the OBSERVED key range — max(o_orderkey)+1, so
    the shift cannot collide with real keys at any scale factor; an r12
    review caught a fixed +50M literal colliding above ~sf8). The
    driver row is the
    counts-by-status rollup — the audit a warehouse runs instead of
    trusting a truncate-load (reference SURVEY §2.1 S6) to have done
    the right thing. One full-outer equi-join on the key; per-column
    null-safe comparison, no content hashing."""
    from ..operators.scd import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    from ..functions.rounding import rnd

    kept = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, rnd(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    shift = o.agg((F.max("o_orderkey") + 1).alias("__shift"))
    added = (
        o.filter(F.col("o_orderkey") % 13 == 0)
        .crossJoin(F.broadcast(shift))
        .select(
            (F.col("o_orderkey") + F.col("__shift")).alias("o_orderkey"),
            "o_totalprice",
        )
    )
    new = kept.unionByName(added)
    return (
        snapshot_diff(o, new, ["o_orderkey"], compare_cols=["o_totalprice"])
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def _ks_inputs(spark: SparkSession, sf_dir: str, *cols: str):
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        *cols, F.col("doc_id"), F.col("n_chars").cast("double").alias("v")
    )
    return (
        v.filter(F.col("doc_id") % 2 == 0).drop("doc_id"),
        v.filter(F.col("doc_id") % 2 == 1).drop("doc_id"),
    )


@register(
    "ks_drift_by_group",
    """
    WITH t AS (
      SELECT lang, CAST(n_chars AS DOUBLE) AS v,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS b
      FROM documents
    ), pv AS (
      SELECT lang, v, sum(b) AS cb, sum(1 - b) AS cc FROM t GROUP BY lang, v
    ), cum AS (
      SELECT lang, v,
             sum(cb) OVER (PARTITION BY lang ORDER BY v) AS cum_b,
             sum(cc) OVER (PARTITION BY lang ORDER BY v) AS cum_c
      FROM pv
    ), tot AS (
      SELECT lang, CAST(sum(cb) AS BIGINT) AS n_base,
             CAST(sum(cc) AS BIGINT) AS n_cur
      FROM pv GROUP BY lang
    )
    SELECT tot.lang, n_base, n_cur,
           round(max(abs(cum_b / CAST(n_base AS DOUBLE)
                         - cum_c / CAST(n_cur AS DOUBLE))), 6) AS d_stat
    FROM cum JOIN tot ON cum.lang IS NOT DISTINCT FROM tot.lang
    GROUP BY tot.lang, n_base, n_cur
    """,
)
def q_ks_drift_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANGUAGE two-sample KS (`ks_drift` with ``group_cols`` — the
    grain a drift monitor actually alarms on: a global D near 0 can
    hide one language whose length distribution moved entirely). The
    oracle's per-group cumulative window is the textbook form; the
    Spark side's two-level prefix sum partitions every window by
    (lang, bucket), so no single task ever sees more than one group's
    one bucket — the hash match proves the grouped decomposition."""
    b, c = _ks_inputs(spark, sf_dir, "lang")
    return ks_drift(b, c, "v", group_cols=["lang"])



@register(
    "ks_drift",
    """
    WITH t AS (
      SELECT CAST(n_chars AS DOUBLE) AS v,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS b
      FROM documents
    ), pv AS (
      SELECT v, sum(b) AS cb, sum(1 - b) AS cc FROM t GROUP BY v
    ), cum AS (
      SELECT v, sum(cb) OVER (ORDER BY v) AS cum_b,
             sum(cc) OVER (ORDER BY v) AS cum_c
      FROM pv
    ), tot AS (
      SELECT CAST(sum(cb) AS BIGINT) AS n_base,
             CAST(sum(cc) AS BIGINT) AS n_cur
      FROM pv
    )
    SELECT tot.n_base, tot.n_cur,
           round(max(abs(cum_b / CAST(tot.n_base AS DOUBLE)
                         - cum_c / CAST(tot.n_cur AS DOUBLE))), 6) AS d_stat
    FROM cum, tot
    GROUP BY tot.n_base, tot.n_cur
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift statistic
    (`operators.evaluation.ks_drift`) between the even- and odd-doc_id
    halves' n_chars distributions — the continuous dual of the
    `mixture_drift` JS row. The oracle's single global cumulative
    window is the textbook form (fine at oracle scale); the Spark plan
    is the bucketed two-level prefix sum whose only serial window runs
    over n_buckets rows — the hash match IS the proof that the
    parallel decomposition computes the same D."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(F.col("doc_id"), F.col("n_chars").cast("double").alias("v"))
    return ks_drift(
        v.filter(F.col("doc_id") % 2 == 0).select("v"),
        v.filter(F.col("doc_id") % 2 == 1).select("v"),
        "v",
    )
