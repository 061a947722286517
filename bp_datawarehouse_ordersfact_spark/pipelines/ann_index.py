"""Persisted ANN index lifecycle: train → write → load → search.

``operators/pq.py`` and ``operators/similarity.py`` provide the pieces;
this module is the production shape (the ``corpus_build`` pattern
applied to retrieval): one job TRAINS and writes the index artifacts,
any number of later jobs LOAD and serve queries without ever touching
the raw vectors again.

On-disk layout under ``out_dir``:

- ``centroids/``  — the coarse IVF quantizer (cell_id, cent), kilobytes;
- ``codebooks/``  — the PQ codebooks (sub, code, n_members, cent);
- ``index/``      — (vec_id, codes) PARTITIONED BY cell_id: the only
  corpus-sized artifact, 32× smaller than the embeddings, laid out so a
  search's n_probe cell filter prunes whole directories.

Search is two-stage retrieval (the standard IVFADC serving plan):
ADC-rank the probed cells' codes (joinless literal-table scan), then
optionally RERANK the shortlist against the original vectors — the
shortlist is k-sized, so the rerank is a broadcast semi-join back to
the full-precision table, never a second corpus scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..functions.rounding import rnd
from ..operators.pq import build_ivfpq_index, pq_search_ivfpq, pq_train
from ..operators.similarity import kmeans_lloyd_centroids


def build_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
    seed: str = "min_id",
) -> dict:
    """Train the coarse quantizer and PQ codebooks, encode the corpus,
    and persist all three artifacts. Returns a manifest of paths and
    row counts. Deterministic end to end (min-id / farthest seeding,
    fixed tie-breaks), so a rebuild reproduces the index byte-for-byte."""
    cents = kmeans_lloyd_centroids(
        embeddings, vec_col, id_col, n_cells=n_cells, n_iter=n_iter, seed=seed
    ).select("cell_id", "cent")
    books = pq_train(embeddings, vec_col, id_col, m=m, ksub=ksub, n_iter=n_iter)
    paths = {name: os.path.join(out_dir, name) for name in ("centroids", "codebooks", "index")}
    cents.write.mode("overwrite").parquet(paths["centroids"])
    books.write.mode("overwrite").parquet(paths["codebooks"])
    cents = spark.read.parquet(paths["centroids"])
    books = spark.read.parquet(paths["codebooks"])
    index = build_ivfpq_index(embeddings, cents, books, vec_col, id_col)
    index.write.mode("overwrite").partitionBy("cell_id").parquet(paths["index"])
    return {
        "paths": paths,
        "n_cells": spark.read.parquet(paths["centroids"]).count(),
        "n_codes": spark.read.parquet(paths["codebooks"]).count(),
        "n_vectors": spark.read.parquet(paths["index"]).count(),
    }


def load_ann_index(
    spark: SparkSession, out_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(centroids, codebooks, index) read back from ``out_dir`` — the
    index frame keeps its cell_id partition column for pruning."""
    return (
        spark.read.parquet(os.path.join(out_dir, "centroids")),
        spark.read.parquet(os.path.join(out_dir, "codebooks")),
        spark.read.parquet(os.path.join(out_dir, "index")),
    )


def search_ann_index(
    spark: SparkSession,
    out_dir: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    rerank_with: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k for ``query`` against a persisted index.

    Without ``rerank_with``: (vec_id, adc_d2) straight from the
    quantized codes — cheapest, error bounded by the quantizer.
    With ``rerank_with`` (the original embeddings table): the ADC stage
    shortlists 4k candidates from the probed cells, then exact cosine
    reranks just those — the k-sized shortlist broadcasts into an
    equi-join, so full precision costs one dim-width lookup per
    candidate, not a corpus scan. Returns (vec_id, cosine) then."""
    cents, books, index = load_ann_index(spark, out_dir)
    shortlist_k = k if rerank_with is None else max(4 * k, k)
    shortlist = pq_search_ivfpq(
        index, cents, books, query, k=shortlist_k, n_probe=n_probe, id_col=id_col
    )
    if rerank_with is None:
        return shortlist
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        rerank_with.join(F.broadcast(shortlist.select(id_col)), id_col)
        .select(
            F.col(id_col),
            rnd(V.cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
