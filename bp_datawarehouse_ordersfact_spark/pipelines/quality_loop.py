"""The quality-classifier loop as a persisted pipeline: train → write →
load → filter.

``operators/ml.py`` holds the math (distributed full-batch logistic
regression, codegen scoring); this module is the production wrapper in
the ``ann_index``/``corpus_build`` mold — one job fits the quality
classifier on labeled embeddings and persists the weight vector, any
later corpus build loads the weights and filters with a pure map-side
expression. That is the FastText/fineweb-style quality loop every
pretraining pipeline runs: label a small sample, fit a cheap linear
model over embeddings, sweep the full corpus with it.

Artifacts under ``out_dir``:
- ``weights/``  — (pos, w) rows; pos 0 is the bias (dim+1 rows total,
  kilobytes — the whole model);
- ``meta/``     — (dim, n_iter, lr, threshold) fitting record.

Everything is deterministic (zero init, fixed epochs), so a refit on
the same labeled set reproduces the same weights and the same corpus
filter decisions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ml import logreg_score, logreg_train


def train_quality_filter(
    spark: SparkSession,
    labeled: DataFrame,
    out_dir: str,
    vec_col: str = "embedding",
    label_col: str = "label",
    n_iter: int = 30,
    lr: float = 1.0,
    threshold: float = 0.5,
    n_batches: int | None = None,
    id_col: str | None = None,
) -> dict:
    """Fit the binary quality classifier on (``vec_col``, ``label_col``
    0/1) and persist weights + meta. Returns a manifest with train-set
    accuracy at ``threshold`` (the number a curation run sanity-checks
    before sweeping 100 TB with the filter).

    ``n_batches``/``id_col`` pass through to ``logreg_train``'s
    deterministic mini-batch mode: the labeled frame is hashed once
    into md5 buckets and cached, so each of the ``n_iter`` updates
    costs ``|labeled|/n_batches`` memory-resident rows instead of a
    full recomputed pass — the right shape when the labeled sample is
    itself large."""
    w = logreg_train(
        labeled,
        vec_col,
        label_col,
        n_iter=n_iter,
        lr=lr,
        n_batches=n_batches,
        id_col=id_col,
    )
    paths = {n: os.path.join(out_dir, n) for n in ("weights", "meta")}
    spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(w)], "pos int, w double"
    ).write.mode("overwrite").parquet(paths["weights"])
    spark.createDataFrame(
        [(len(w) - 1, n_iter, float(lr), float(threshold))],
        "dim int, n_iter int, lr double, threshold double",
    ).write.mode("overwrite").parquet(paths["meta"])
    scored = labeled.select(
        F.col(label_col).cast("int").alias("y"),
        (logreg_score(labeled, F.col(vec_col), w) >= threshold)
        .cast("int")
        .alias("yhat"),
    )
    acc = scored.agg(
        F.avg((F.col("y") == F.col("yhat")).cast("double")).alias("acc")
    ).collect()[0]["acc"]
    return {
        "paths": paths,
        "dim": len(w) - 1,
        "train_accuracy": round(float(acc), 6),
        "threshold": threshold,
    }


def load_quality_weights(spark: SparkSession, out_dir: str) -> list[float]:
    rows = (
        spark.read.parquet(os.path.join(out_dir, "weights"))
        .orderBy("pos")
        .collect()
    )
    return [r["w"] for r in rows]


def apply_quality_filter(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    vec_col: str = "embedding",
    threshold: float | None = None,
) -> DataFrame:
    """Corpus rows that clear the persisted classifier: adds
    ``quality_prob`` and filters at ``threshold`` (default: the
    threshold recorded at fit time). The weights embed as literals, so
    the sweep is one codegen expression over the scan — zero joins,
    zero shuffles, exactly what a 100 TB filter pass must be. The
    corpus embedding dimension is checked against the dim recorded at
    fit time — a mismatch would otherwise score a silent prefix (or
    NULL-drop every row), the stale-artifact corruption class the ANN
    index also guards against."""
    w = load_quality_weights(spark, out_dir)
    meta = spark.read.parquet(os.path.join(out_dir, "meta")).collect()[0]
    # the sweep is a pure map-side expression, so it composes with a
    # STREAMING corpus unchanged — but a stream cannot be probed with
    # collect(), so the dim guard applies to batch input only (streaming
    # callers pin the schema at readStream time anyway)
    if not corpus.isStreaming:
        first = corpus.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
        if first and first[0]["d"] != meta["dim"]:
            raise ValueError(
                f"corpus {vec_col} dim {first[0]['d']} != trained dim "
                f"{meta['dim']} (stale weights?)"
            )
    if threshold is None:
        threshold = float(meta["threshold"])
    scored = corpus.withColumn(
        "quality_prob", logreg_score(corpus, F.col(vec_col), w)
    )
    return scored.filter(F.col("quality_prob") >= F.lit(threshold))
