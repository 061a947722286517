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
- ``meta/``     — (dim, n_iter, lr, threshold, mode) fitting record
  (mode: 'vector' scores an embedding column; 'text' must be swept
  through the hash featurizer — see train_text_quality_filter).

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
    _mode: str = "vector",
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
    # mode makes the artifact self-describing: 'vector' stores score an
    # embedding column directly; 'text' stores (train_text_quality_filter)
    # must be swept through the hash featurizer with the SAME width
    spark.createDataFrame(
        [(len(w) - 1, n_iter, float(lr), float(threshold), _mode)],
        "dim int, n_iter int, lr double, threshold double, mode string",
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
    mode = meta["mode"] if "mode" in meta.__fields__ else "vector"
    if mode != "vector":
        raise ValueError(
            f"quality artifact at {out_dir} has mode={mode!r}; "
            "apply_quality_filter scores an embedding column — sweep "
            "text-mode artifacts with apply_text_quality_filter"
        )
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


def train_text_quality_filter(
    spark: SparkSession,
    labeled_docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
    n_features: int = 256,
    n_iter: int = 30,
    lr: float = 1.0,
    threshold: float = 0.5,
) -> dict:
    """RAW-TEXT flavor of the loop: hash-featurize the labeled documents
    (``operators.ml.text_hash_features`` — vocabulary-free, fixed width,
    deterministic) and fit/persist the same logistic artifact. No
    embedding model is needed anywhere in the loop — this is the
    fastText-style corpus filter in its original text form. The persisted
    meta records mode='text' and dim=``n_features``, so a sweep through
    the wrong path fails loudly instead of scoring garbage."""
    from ..operators.ml import text_hash_features

    feats = text_hash_features(
        labeled_docs, text_col, id_col, n_features=n_features
    ).join(labeled_docs.select(id_col, label_col), id_col)
    return train_quality_filter(
        spark,
        feats,
        out_dir,
        vec_col="features",
        label_col=label_col,
        n_iter=n_iter,
        lr=lr,
        threshold=threshold,
        _mode="text",
    )


def apply_text_quality_filter(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float | None = None,
) -> DataFrame:
    """Sweep a raw-text corpus with a mode='text' artifact: featurize
    with the trained width, score, and join ``quality_prob`` back on
    ``id_col``. One id-keyed shuffle is the price of the vocabulary-free
    text path (the embedding sweep stays joinless); both are linear.
    A mode='vector' artifact is rejected — its weights index embedding
    dimensions, not hash buckets."""
    from ..operators.ml import logreg_score, text_hash_features

    meta = spark.read.parquet(os.path.join(out_dir, "meta")).collect()[0]
    mode = meta["mode"] if "mode" in meta.__fields__ else "vector"
    if mode != "text":
        raise ValueError(
            f"quality artifact at {out_dir} has mode={mode!r}; "
            "apply_text_quality_filter needs a train_text_quality_filter "
            "artifact (vector-mode weights index embedding dims, not hash "
            "buckets)"
        )
    w = load_quality_weights(spark, out_dir)
    if threshold is None:
        threshold = float(meta["threshold"])
    feats = text_hash_features(
        corpus, text_col, id_col, n_features=int(meta["dim"])
    )
    scored = feats.select(
        F.col(id_col),
        logreg_score(feats, F.col("features"), w).alias("quality_prob"),
    )
    return corpus.join(scored, id_col).filter(
        F.col("quality_prob") >= F.lit(threshold)
    )
