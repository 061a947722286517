"""STAGED registry queries for the round-13 GROUP-GRAIN evaluation
tiers (`operators/evaluation.py`: global `roc_auc_per_group`,
`precision_recall_at(group_cols=)`, `calibration_ece(group_cols=)`,
`psi_drift_by_group`, `score_quantile_normalize`) — written in round 13
for activation in a buffer
round of the accelerated schedule (earliest r18, after staged_eval's
seven at r17; see queries/__init__.py's window comment). Not yet in
``queries._MODULES``; they ride the oracle-conventions gate and their
driver-style tests every pytest run meanwhile.

All six oracles are COMPUTED (DuckDB twins over the real corpus —
the staged_eval discipline): scores/labels derive from integer
arithmetic (`doc_id % 101`, `n_chars % 5`, `doc_id % 40`) so both
engines rank/bucket identical inputs; no float enters before the final
6dp rounding. The ``doc_id % 40 < 20`` base/current split is chosen
deliberately: doc_id PARITY is constant per source in the testdata
(an even/odd split leaves one side empty for every source), while the
%40 block split lands ~half of every source and lang on each side at
every sf.

No reference equivalent (beyond-reference training-pipeline layer);
public formulas: Mann–Whitney U, Naeini et al. 2015 ECE, PSI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..operators.evaluation import (
    calibration_ece,
    precision_recall_at,
    psi_drift_by_group,
    roc_auc_per_group,
    score_quantile_normalize,
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
    "roc_auc_global",
    """
    WITH base AS (
      SELECT CAST(n_chars % 20 AS DOUBLE) / 19.0 AS s,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y
      FROM documents
    ), ranked AS (
      SELECT s, y, row_number() OVER (ORDER BY s) AS rn FROM base
    ), buckets AS (
      SELECT s, avg(rn) AS avg_rank,
             sum(y) AS pos_in_bucket, count(*) AS n_in_bucket
      FROM ranked GROUP BY s
    ), pg AS (
      SELECT CAST(sum(n_in_bucket) AS BIGINT) AS n,
             CAST(sum(pos_in_bucket) AS BIGINT) AS n_pos,
             sum(pos_in_bucket * avg_rank) AS pos_rank_sum
      FROM buckets
    )
    SELECT n, n_pos, CAST(0 AS BIGINT) AS n_excluded,
           round((pos_rank_sum - n_pos * (n_pos + 1.0) / 2.0)
                 / (CAST(n_pos AS DOUBLE) * (n - n_pos)), 6) AS auc
    FROM pg
    """,
)
def q_roc_auc_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL Mann–Whitney ROC AUC (`roc_auc_per_group` with
    ``group_cols=[]`` — the round-13 ks_drift-symmetry tier): one row
    for the whole corpus, same coarse 20-value score as the per-source
    row so tie buckets dominate and the average-rank convention is what
    the hash pins. Same two-level bucketed prefix sum; with no groups
    the only serial step is the offsets window over ≤ n_buckets rows."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        ((F.col("n_chars") % 20).cast("double") / 19.0).alias("s"),
        F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0).alias("y"),
    )
    return roc_auc_per_group(scored, "s", "y", [])


@register(
    "precision_recall_by_group",
    """
    WITH t AS (
      SELECT lang, CAST(doc_id % 101 AS DOUBLE) / 100.0 AS s,
             CASE WHEN n_chars % 5 = 0 THEN 1 ELSE 0 END AS y
      FROM documents
    ), th AS (
      SELECT CAST(v AS DOUBLE) AS threshold
      FROM (VALUES (0.25), (0.5), (0.75)) AS x(v)
    ), agg AS (
      SELECT t.lang, th.threshold,
             CAST(sum(CASE WHEN s >= th.threshold THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pred_pos,
             sum(CASE WHEN s >= th.threshold AND y = 1 THEN 1 ELSE 0 END)
               AS tp,
             sum(CASE WHEN s >= th.threshold AND y = 0 THEN 1 ELSE 0 END)
               AS fp,
             sum(y) AS pos
      FROM t, th GROUP BY t.lang, th.threshold
    )
    SELECT lang, threshold, n_pred_pos,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE round(tp / CAST(tp + fp AS DOUBLE), 6) END
             AS "precision",
           CASE WHEN pos = 0 THEN NULL
                ELSE round(tp / CAST(pos AS DOUBLE), 6) END AS recall,
           CASE WHEN tp = 0 OR tp + fp = 0 OR pos = 0 THEN NULL
                ELSE round(2.0 * (tp / CAST(tp + fp AS DOUBLE))
                               * (tp / CAST(pos AS DOUBLE))
                           / (tp / CAST(tp + fp AS DOUBLE)
                              + tp / CAST(pos AS DOUBLE)), 6) END AS f1,
           CAST(0 AS BIGINT) AS n_excluded
    FROM agg
    """,
)
def q_precision_recall_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-LANGUAGE threshold sweep
    (`precision_recall_at(group_cols=["lang"])`, round 13): the grain a
    corpus filter actually ships at — one cut can sit at very different
    precision across languages. Same one-scan shape; the group key
    joins the single shuffle and the arithmetic explodes a
    |groups|-row frame. The oracle guards the 0/0 cells with explicit
    CASE→NULL, mirroring the operator's try_divide semantics exactly
    (tp = 0 forces NULL f1 even when precision and recall are 0)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        ((F.col("doc_id") % 101).cast("double") / 100.0).alias("s"),
        F.when(F.col("n_chars") % 5 == 0, 1).otherwise(0).alias("y"),
    )
    return precision_recall_at(
        scored, "s", "y", [0.25, 0.5, 0.75], group_cols=["lang"]
    )


@register(
    "calibration_ece_by_group",
    """
    WITH t AS (
      SELECT lang, CAST(doc_id % 101 AS DOUBLE) / 100.0 AS s,
             CASE WHEN (doc_id * 7) % 10 < 4 THEN 1 ELSE 0 END AS y
      FROM documents
    ), b AS (
      SELECT lang, least(CAST(floor(s * 10) AS INT), 9) AS bin,
             count(*) AS n, avg(s) AS a, avg(CAST(y AS DOUBLE)) AS fp
      FROM t GROUP BY lang, bin
    )
    SELECT lang, bin, CAST(n AS BIGINT) AS n,
           round(a, 6) AS avg_score,
           round(fp, 6) AS frac_pos,
           round(abs(a - fp), 6) AS abs_gap,
           round(sum(abs(a - fp) * n) OVER (PARTITION BY lang)
                 / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6)
             AS ece,
           CAST(0 AS BIGINT) AS n_excluded
    FROM b
    """,
)
def q_calibration_ece_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-LANGUAGE reliability table + ECE
    (`calibration_ece(group_cols=["lang"])`, round 13): "score 0.9
    means 90%" can hold on the corpus and fail on one language. Same
    one-scan shape as the global row; the ECE window runs over
    ≤ n_bins rows per group. The score/label pair is the global row's
    doc_id arithmetic, so the per-group tables are a strict refinement
    the hash can cross-check."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        ((F.col("doc_id") % 101).cast("double") / 100.0).alias("s"),
        F.when((F.col("doc_id") * 7) % 10 < 4, 1).otherwise(0).alias("y"),
    )
    return calibration_ece(scored, "s", "y", n_bins=10, group_cols=["lang"])


@register(
    "psi_drift_by_group",
    """
    WITH b AS (
      SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents
      WHERE doc_id % 40 < 20
    ), c AS (
      SELECT source, CAST(n_chars AS DOUBLE) AS v FROM documents
      WHERE doc_id % 40 >= 20
    ), e AS (
      SELECT source,
             quantile_cont(v, 0.1) AS e1, quantile_cont(v, 0.2) AS e2,
             quantile_cont(v, 0.3) AS e3, quantile_cont(v, 0.4) AS e4,
             quantile_cont(v, 0.5) AS e5, quantile_cont(v, 0.6) AS e6,
             quantile_cont(v, 0.7) AS e7, quantile_cont(v, 0.8) AS e8,
             quantile_cont(v, 0.9) AS e9
      FROM b GROUP BY source
    ), bb AS (
      SELECT b.source,
             CAST(v > e1 AS INT) + CAST(v > e2 AS INT) + CAST(v > e3 AS INT)
             + CAST(v > e4 AS INT) + CAST(v > e5 AS INT) + CAST(v > e6 AS INT)
             + CAST(v > e7 AS INT) + CAST(v > e8 AS INT) + CAST(v > e9 AS INT)
               AS bin
      FROM b JOIN e USING (source)
    ), cb AS (
      SELECT c.source,
             CAST(v > e1 AS INT) + CAST(v > e2 AS INT) + CAST(v > e3 AS INT)
             + CAST(v > e4 AS INT) + CAST(v > e5 AS INT) + CAST(v > e6 AS INT)
             + CAST(v > e7 AS INT) + CAST(v > e8 AS INT) + CAST(v > e9 AS INT)
               AS bin
      FROM c JOIN e USING (source)
    ), bins AS (
      SELECT e.source, CAST(range AS INT) AS bin FROM e, range(10)
    ), cnt AS (
      SELECT bins.source, bins.bin,
             CAST(coalesce(nb.n, 0) AS BIGINT) AS n_base,
             CAST(coalesce(nc.n, 0) AS BIGINT) AS n_cur
      FROM bins
      LEFT JOIN (SELECT source, bin, count(*) AS n FROM bb
                 GROUP BY source, bin) nb USING (source, bin)
      LEFT JOIN (SELECT source, bin, count(*) AS n FROM cb
                 GROUP BY source, bin) nc USING (source, bin)
    ), sh AS (
      SELECT source, bin, n_base, n_cur,
             greatest(n_base / CAST(sum(n_base) OVER (PARTITION BY source)
                                    AS DOUBLE), 1e-6) AS p,
             greatest(n_cur / CAST(sum(n_cur) OVER (PARTITION BY source)
                                   AS DOUBLE), 1e-6) AS q
      FROM cnt
    )
    SELECT source, bin, n_base, n_cur,
           round(p, 6) AS p_share,
           round(q, 6) AS q_share,
           round((q - p) * ln(q / p), 6) AS psi_contrib,
           round(sum((q - p) * ln(q / p)) OVER (PARTITION BY source), 6)
             AS psi
    FROM sh
    """,
)
def q_psi_drift_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SOURCE PSI (`operators.evaluation.psi_drift_by_group`,
    round 13) between each source's two %40-block halves of the
    n_chars distribution — every source bins against its OWN exact
    base quantiles (Spark grouped `percentile` == DuckDB
    `quantile_cont`, bit-identical), the drift grain a monitor actually
    alarms on. Fully distributed: per-group edges from one grouped
    percentile aggregate (never collected), bin indices from a codegen
    fan-out join over distinct (source, value) rows, shares from a
    window over ≤ 10 rows per source. Every source has both halves
    populated at every sf (the %40 split — doc_id PARITY is constant
    per source in the testdata), so the unmeasurable-group anchor path
    stays pinned in the unit twins rather than this row."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        "source",
        (F.col("doc_id") % 40).alias("__blk"),
        F.col("n_chars").cast("double").alias("v"),
    )
    return psi_drift_by_group(
        v.filter(F.col("__blk") < 20).select("source", "v"),
        v.filter(F.col("__blk") >= 20).select("source", "v"),
        "v",
        ["source"],
    )


@register(
    "score_quantile_normalize",
    """
    WITH base AS (
      SELECT doc_id, lang, CAST(n_chars % 50 AS DOUBLE) AS s
      FROM documents
    ), ranked AS (
      SELECT lang, s, row_number() OVER (PARTITION BY lang ORDER BY s) AS rn
      FROM base
    ), avg_ranks AS (
      SELECT lang, s, avg(rn) AS ar FROM ranked GROUP BY lang, s
    ), totals AS (
      SELECT lang, count(*) AS n FROM base GROUP BY lang
    )
    SELECT b.doc_id, b.lang,
           round((ar - 0.5) / n, 6) AS pct_rank
    FROM base b
    JOIN avg_ranks a ON a.lang = b.lang AND a.s = b.s
    JOIN totals t ON t.lang = b.lang
    """,
)
def q_score_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quantile normalization of a coarse quality score
    (`operators.evaluation.score_quantile_normalize`): each language's
    scores map onto its own average-rank scale ((avg_rank − 0.5)/N, the
    permutation-invariant tie convention), so one keep-threshold means
    the same thing across languages — the score post-processing step in
    front of every cross-source corpus cut. The %50 score forces heavy
    tie blocks, so the hash pins the average-rank convention, not just
    strict orderings. PER-ROW output (one row per document): the bench
    pays the real join-back cost; the mapping itself is |distinct
    values| rows via the same two-level bucketed prefix sum as
    roc_auc_per_group — no whole-group sort window anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", ((F.col("n_chars") % 50).cast("double")).alias("s")
    )
    out = score_quantile_normalize(scored, "s", ["lang"])
    return out.select("doc_id", "lang", "pct_rank")


# DuckDB twin of functions.vectors.dot — identical left-fold in double
# (one definition with queries/llmops.py's SQL_DOT; re-stated here to
# keep this module import-light for the driver).
_SQL_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(len({a})), i -> CAST({a}[i+1] AS DOUBLE) * "
    "CAST({b}[i+1] AS DOUBLE))), (acc, v) -> acc + v)"
)

_SEM_PRUNE_ORACLE = f"""
    WITH cents AS (
      SELECT k AS cell_id,
             list_transform(range(64), i ->
               CASE WHEN i = k THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(0.0 AS DOUBLE) END) AS cent
      FROM (VALUES (0), (1), (2), (3)) AS t(k)
    ), scored AS (
      SELECT vec_id, cell_id,
             round({_SQL_DOT.format(a='embedding', b='cent')}
                   / (sqrt({_SQL_DOT.format(a='embedding', b='embedding')})
                      * sqrt({_SQL_DOT.format(a='cent', b='cent')})), 6)
               AS cos
      FROM embeddings CROSS JOIN cents
    ), best AS (
      SELECT vec_id, cell_id, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cell_id ASC) AS r
      FROM scored
    ), a AS (
      SELECT vec_id, cell_id, cos FROM best WHERE r = 1
    ), ranked AS (
      SELECT vec_id, cell_id, cos,
             row_number() OVER (PARTITION BY cell_id ORDER BY cos) AS rn
      FROM a
    ), avg_ranks AS (
      SELECT cell_id, cos, avg(rn) AS ar FROM ranked GROUP BY cell_id, cos
    ), n AS (SELECT cell_id, count(*) AS cnt FROM a GROUP BY cell_id)
    SELECT a.vec_id, a.cell_id, a.cos AS centroid_sim,
           round((ar - 0.5) / cnt, 6) AS keep_rank
    FROM a
    JOIN avg_ranks ON avg_ranks.cell_id = a.cell_id AND avg_ranks.cos = a.cos
    JOIN n ON n.cell_id = a.cell_id
    WHERE round((ar - 0.5) / cnt, 6) <= 0.5
    """


@register("semantic_prune", _SEM_PRUNE_ORACLE)
def q_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic diversity pruning
    (`operators.dedup.semantic_diversity_prune`) over the embeddings
    table with four PLANTED one-hot centroids (deterministic in both
    engines — the trained-kmeans tier is pinned by the operator's unit
    twin; this row pins the assignment + per-cell average-rank cut the
    hash can check cross-engine): keep the 50% least-redundant vectors
    per cell. The cosine is the repo's sequential double fold on both
    sides (SQL_DOT), the argmax tie-breaks (cos DESC, cell ASC), and
    the cut compares the ROUNDED keep_rank exactly as the operator
    filters it."""
    cents = spark.createDataFrame(
        [
            (k, [1.0 if i == k else 0.0 for i in range(64)])
            for k in range(4)
        ],
        "cell_id long, cent array<double>",
    )
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    from ..operators.dedup import semantic_diversity_prune

    out = semantic_diversity_prune(
        emb, "embedding", "vec_id", keep_frac=0.5, centroids=cents
    )
    return out.select("vec_id", "cell_id", "centroid_sim", "keep_rank")
