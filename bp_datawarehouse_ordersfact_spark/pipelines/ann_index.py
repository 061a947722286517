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
``search_ann_index_batch`` is the query-workload form (meta-dispatched
plain/residual batch searchers, broadcast rerank).

Maintenance completes the lifecycle CRUD: ``append_to_ann_index``
(frozen-quantizer inserts), ``delete_from_ann_index`` (rewrites only
the hit cells, removes emptied cell directories), ``compact_ann_index``
(the OPTIMIZE pass — one file per cell again after append batches,
promoted through the ``pipelines/artifact.py`` commit-pointer ledger:
readers resolve the live index directory through a committed version
row, so a rewrite in flight or a crashed compactor never leaves them
without an index), and ``maintain_ann_index`` (the composed
delete→append→compact pass whose staged result is promoted ONLY if the
``evaluate_ann_index`` recall gate clears — a mutation that guts recall
is rejected with the index left at its pre-maintenance version).

Metric coherence: the pipeline is cosine end to end (cosine coarse
cells, cosine rerank), but PQ/ADC is an L2 quantizer — so the index is
built over L2-NORMALIZED vectors and the query is normalized at search
time. On unit vectors ‖u − v‖² = 2 − 2·cos(u, v), making the ADC
shortlist order cosine order up to quantization error; without the
normalization, unnormalized corpora could systematically exclude the
true cosine top-k from the shortlist (magnitude would dominate the L2
distances).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..functions.rounding import rnd
from .artifact import (
    commit_artifact_version,
    current_artifact_dir,
    next_artifact_dir,
    reset_artifact,
)
from ..operators.pq import (
    build_ivfpq_index,
    pq_search_ivfpq,
    pq_search_ivfpq_residual,
    pq_train,
    residual_frame,
    residual_index_rows,
)
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
    residual: bool = False,
) -> dict:
    """Train the coarse quantizer and PQ codebooks over the NORMALIZED
    corpus (see the module docstring), encode it, and persist all the
    artifacts — including a ``meta`` table (m, ksub, residual) that makes
    the index SELF-DESCRIBING: ``search_ann_index`` reads it and picks
    the matching search plan, so a serving job cannot accidentally run
    plain ADC over a residual-encoded index. ``residual=True`` encodes
    each vector's offset from its coarse centroid instead of the raw
    vector (the literature's IVFADC default — residuals cluster tighter,
    so the same ksub codes resolve finer). Returns a manifest of paths
    and row counts. Deterministic end to end (min-id / farthest seeding,
    fixed tie-breaks), so a rebuild reproduces the index byte-for-byte."""
    unit = embeddings.select(
        F.col(id_col), V.l2_normalize(F.col(vec_col)).alias(vec_col)
    )
    cents = kmeans_lloyd_centroids(
        unit, vec_col, id_col, n_cells=n_cells, n_iter=n_iter, seed=seed
    ).select("cell_id", "cent")
    paths = {
        name: os.path.join(out_dir, name)
        for name in ("centroids", "codebooks", "index", "meta")
    }
    cents.write.mode("overwrite").parquet(paths["centroids"])
    cents = spark.read.parquet(paths["centroids"])
    if residual:
        # staged like the non-residual branch: the residual frame (the
        # costliest pass — coarse argmax over the corpus) is written
        # once and the training/encode plans read it back, so neither
        # the codebook fit nor the two assembly sides recompute it
        res_path = os.path.join(out_dir, "_residuals_staging")
        residual_frame(unit, cents, vec_col, id_col).write.mode(
            "overwrite"
        ).parquet(res_path)
        res = spark.read.parquet(res_path)
        books = pq_train(res, "resid", id_col, m=m, ksub=ksub, n_iter=n_iter)
        books.write.mode("overwrite").parquet(paths["codebooks"])
        books = spark.read.parquet(paths["codebooks"])
        index = residual_index_rows(res, books, id_col)
    else:
        books = pq_train(unit, vec_col, id_col, m=m, ksub=ksub, n_iter=n_iter)
        books.write.mode("overwrite").parquet(paths["codebooks"])
        books = spark.read.parquet(paths["codebooks"])
        index = build_ivfpq_index(unit, cents, books, vec_col, id_col)
    spark.createDataFrame(
        [(m, ksub, residual)], "m int, ksub int, residual boolean"
    ).write.mode("overwrite").parquet(paths["meta"])
    # count via an observed metric on the producing write (corpus_build's
    # _stage convention) — no second pass over the corpus-sized artifact;
    # cents/books are kilobyte frames already in hand
    # a REBUILD must become the resolved index again: drop any
    # compaction ledger + versioned directories from the previous
    # index's lifetime before writing the legacy plain directory
    reset_artifact(spark, out_dir, "index")
    obs = Observation("ann_index")
    index.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "overwrite"
    ).partitionBy("cell_id").parquet(paths["index"])
    if residual:
        # Hadoop FS delete, not shutil: the staging dir lives wherever
        # out_dir does (s3a://, hdfs://) — a driver-local rmtree would
        # silently leave corpus-sized residual garbage on object stores
        fs, _, jvm = _hadoop_fs(spark, out_dir)
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(out_dir, "_residuals_staging")
            ),
            True,
        )
    return {
        "paths": paths,
        "n_cells": cents.count(),
        "n_codes": books.count(),
        "n_vectors": int(obs.get["rows"]),
        "residual": residual,
    }


def _index_dir(spark: SparkSession, out_dir: str) -> str:
    """The LIVE index directory — resolved through the compaction
    commit ledger (plain ``index/`` until the first compaction)."""
    return current_artifact_dir(spark, out_dir, "index")


def load_ann_index(
    spark: SparkSession, out_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(centroids, codebooks, index) read back from ``out_dir`` — the
    index frame keeps its cell_id partition column for pruning, and its
    directory resolves through the commit-pointer ledger so a compaction
    in flight never leaves a reader without an index."""
    return (
        spark.read.parquet(os.path.join(out_dir, "centroids")),
        spark.read.parquet(os.path.join(out_dir, "codebooks")),
        spark.read.parquet(_index_dir(spark, out_dir)),
    )


def _load_meta(spark: SparkSession, out_dir: str) -> dict:
    """Index metadata, tolerant of PRE-meta artifacts: indexes persisted
    before the meta table existed are plain (non-residual) encodings, so
    a missing meta/ directory means residual=False rather than an
    unloadable index.

    Presence is probed through spark.read, NOT os.path — the index may
    live on any Hadoop filesystem (s3://, hdfs://) where a driver-local
    os.path.exists is always False and would silently misread a
    residual-encoded index as plain, searching it with the wrong ADC
    plan (r5 ADVICE)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    path = os.path.join(out_dir, "meta")
    try:
        row = spark.read.parquet(path).collect()[0]
    except AnalysisException:  # PATH_NOT_FOUND → pre-meta artifact
        return {"residual": False}
    return {"m": row["m"], "ksub": row["ksub"], "residual": row["residual"]}


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
    quantized codes — cheapest; over the normalized index adc_d2 tracks
    2 − 2·cosine, approximate only through quantization. With
    ``rerank_with`` (the original embeddings table): the ADC stage
    shortlists 4·k candidates from the probed cells, then exact cosine
    reranks just those — the k-sized shortlist broadcasts into an
    equi-join, so full precision costs one dim-width lookup per
    candidate, not a corpus scan. Returns (vec_id, cosine) then.
    The query is L2-normalized here to match the index (cosine itself is
    scale-invariant, so the rerank stage is unaffected). The encoding
    flavor (plain vs residual) is read from the persisted ``meta`` table
    and the matching search plan is chosen automatically."""
    cents, books, index = load_ann_index(spark, out_dir)
    meta = _load_meta(spark, out_dir)
    qn = math.sqrt(sum(float(x) * float(x) for x in query))
    unit_query = [float(x) / qn for x in query] if qn > 0 else list(query)
    shortlist_k = k if rerank_with is None else 4 * k
    search_fn = pq_search_ivfpq_residual if meta["residual"] else pq_search_ivfpq
    shortlist = search_fn(
        index, cents, books, unit_query, k=shortlist_k, n_probe=n_probe, id_col=id_col
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


def _encode_rows(
    spark: SparkSession,
    out_dir: str,
    new_embeddings: DataFrame,
    vec_col: str,
    id_col: str,
):
    """New vectors encoded with the index's FROZEN quantizers →
    (index_rows, residual_cache_or_None). Increment-sized batches get a
    cache boundary (not a staged write) on the residual frame so the two
    assembly sides don't recompute it; the caller unpersists after its
    action forces the plan."""
    cents, books, _ = load_ann_index(spark, out_dir)
    meta = _load_meta(spark, out_dir)
    unit = new_embeddings.select(
        F.col(id_col), V.l2_normalize(F.col(vec_col)).alias(vec_col)
    )
    if meta["residual"]:
        res = residual_frame(unit, cents, vec_col, id_col).cache()
        return residual_index_rows(res, books, id_col), res
    return build_ivfpq_index(unit, cents, books, vec_col, id_col), None


def append_to_ann_index(
    spark: SparkSession,
    new_embeddings: DataFrame,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Encode NEW vectors with the index's persisted centroids/codebooks
    (no retrain — the quantizers are frozen, the standard serving-index
    update) and append their (id, cell_id, codes) rows to the
    partitioned layout. Returns the number of rows appended.

    The append writes only the partitions the new batch touches; searches
    pick the new rows up on their next directory listing. Id uniqueness
    vs the existing index is the CALLER's contract (ids come from the
    upstream corpus); quantization drift — new data far from the trained
    centroids — degrades recall gracefully and is the signal to schedule
    a rebuild, exactly as with any frozen-quantizer ANN index."""
    rows, res = _encode_rows(spark, out_dir, new_embeddings, vec_col, id_col)
    obs = Observation("ann_append")
    rows.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "append"
    ).partitionBy("cell_id").parquet(_index_dir(spark, out_dir))
    appended = int(obs.get["rows"])
    if res is not None:
        # obs.get forced the write, so the cache has served its purpose —
        # free the blocks instead of pinning them for the session lifetime
        res.unpersist()
    return appended


def search_ann_index_batch(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    rerank_with: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "q_id",
    shortlist_factor: int = 4,
    index_path: str | None = None,
) -> DataFrame:
    """Batch twin of ``search_ann_index``: top-k for every ROW of a
    queries DataFrame against a persisted index — the serving shape for
    query WORKLOADS (offline eval sets, nightly retrieval jobs), where
    looping the single-query form would pay one driver plan per query.

    Queries are L2-normalized cluster-side to match the index (the
    single-query form normalizes on the driver); the encoding flavor
    (plain vs residual) comes from the persisted ``meta`` table and the
    matching batch searcher is dispatched automatically, including the
    probed-cell static IN-list pruning both of them push into the
    cell-partitioned index scan. With ``rerank_with`` the per-query ADC
    shortlist is ``shortlist_factor``·k ids (4 by default; raise it
    when PQ quantization error costs recall — evaluate_ann_index
    measures exactly this), and ONE broadcast semi-join + per-query
    window close the exact-cosine rerank for the whole workload —
    never a second corpus scan. Returns (q_id, vec_id, adc_d2, rnk) or,
    reranked, (q_id, vec_id, cosine, rnk). ``index_path`` overrides the
    ledger-resolved index directory — the hook ``maintain_ann_index``
    uses to evaluate a STAGED (uncommitted) rewrite before promoting
    it."""
    from pyspark.sql import Window

    from ..operators.pq import pq_search_ivfpq_batch, pq_search_ivfpq_residual_batch

    cents, books, index = load_ann_index(spark, out_dir)
    if index_path is not None:
        index = spark.read.parquet(index_path)
    meta = _load_meta(spark, out_dir)
    unit_q = queries.select(
        F.col(query_id_col).alias("q_id"),
        V.l2_normalize(F.col(vec_col)).alias(vec_col),
    )
    search_fn = (
        pq_search_ivfpq_residual_batch if meta["residual"] else pq_search_ivfpq_batch
    )
    shortlist_k = k if rerank_with is None else shortlist_factor * k
    shortlist = search_fn(
        unit_q,
        index,
        cents,
        books,
        k=shortlist_k,
        n_probe=n_probe,
        query_vec_col=vec_col,
        query_id_col="q_id",
        id_col=id_col,
    )
    if rerank_with is None:
        return shortlist
    # exact-cosine rerank: |Q|·factor·k (q_id, vec_id) pairs broadcast
    # against the full-precision table, then one per-query rank window
    pairs = shortlist.select("q_id", id_col)
    qvec = queries.select(
        F.col(query_id_col).alias("q_id"), F.col(vec_col).alias("__qv")
    )
    scored = (
        rerank_with.select(F.col(id_col), F.col(vec_col).alias("__cv"))
        .join(F.broadcast(pairs), id_col)
        .join(F.broadcast(qvec), "q_id")
        .select(
            "q_id",
            F.col(id_col),
            rnd(V.cosine(F.col("__cv"), F.col("__qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", id_col, "cosine", "rnk")
    )


def _hadoop_fs(spark: SparkSession, path: str):
    """Hadoop FileSystem for ``path`` — filesystem-agnostic (local,
    hdfs://, s3a://), the same API spark.read uses underneath."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _delete_set(ids: DataFrame, id_col: str) -> DataFrame:
    """Normalize a DataFrame delete batch to one distinct column named
    ``id_col``. (Python lists — the convenience form for query-sized
    batches — stay IN-list filters at the call sites, where they push
    into the parquet scan; a DataFrame is the scale form, whose
    membership tests run as semi/anti joins so the plan never embeds an
    unbounded literal list.)"""
    if id_col not in ids.columns:
        raise ValueError(
            f"delete-id frame must carry a {id_col!r} column; "
            f"has {ids.columns}"
        )
    return ids.select(id_col).distinct()


def delete_from_ann_index(
    spark: SparkSession,
    ids: list | DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
) -> int:
    """Delete ``ids`` from a persisted index by rewriting ONLY the cell
    partitions that contain them. Returns the number of rows removed.

    Plan: one pruned probe finds the affected cells, the surviving rows
    of just those cells are rewritten under dynamic partition overwrite
    (untouched cells' files are never read or rewritten), and any cell
    left EMPTY has its directory removed through the Hadoop FileSystem
    API — dynamic overwrite only replaces partitions it writes rows
    for, so an all-deleted cell would otherwise silently keep its stale
    files (the trap this function exists to handle).

    ``ids`` may be a driver-side list (query-sized batches — the probe
    filter pushes into the scan as an IN-list, so bloom/min-max skipping
    prunes row groups) or a DataFrame carrying ``id_col`` (large delete
    sets — membership runs as semi/anti joins, the
    ``mine_hard_negatives`` idiom, so the plan never embeds an unbounded
    literal list). Corpus-scale deletion is still better served by a
    rebuild than an incremental rewrite."""
    if isinstance(ids, DataFrame):
        ids_df = _delete_set(ids, id_col)
        hit_pred = lambda d: d.join(ids_df, id_col, "semi")  # noqa: E731
        drop_pred = lambda d: d.join(ids_df, id_col, "left_anti")  # noqa: E731
    else:
        if not ids:
            return 0
        id_list = list(ids)
        hit_pred = lambda d: d.filter(F.col(id_col).isin(id_list))  # noqa: E731
        drop_pred = lambda d: d.filter(~F.col(id_col).isin(id_list))  # noqa: E731
    index_path = _index_dir(spark, out_dir)
    index = spark.read.parquet(index_path)
    hit = (
        hit_pred(index)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .collect()
    )
    if not hit:
        return 0
    cells = sorted(r["cell_id"] for r in hit)
    n_deleted = sum(r["n_hit"] for r in hit)
    survivors = drop_pred(index.filter(F.col("cell_id").isin(cells)))
    # survivors per cell — cells that end empty need their directory
    # removed explicitly (tiny aggregate: ≤ |cells| rows)
    alive = {
        r["cell_id"]
        for r in survivors.select("cell_id").distinct().collect()
    }
    conf = spark.conf
    prev = conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors.write.mode("overwrite").partitionBy("cell_id").parquet(
            index_path
        )
    finally:
        conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    fs, _, jvm = _hadoop_fs(spark, index_path)
    for cell in cells:
        if cell not in alive:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    os.path.join(index_path, f"cell_id={cell}")
                ),
                True,
            )
    return int(n_deleted)


def compact_ann_index(spark: SparkSession, out_dir: str) -> dict:
    """Index maintenance: rewrite the index so each cell holds ONE file.

    Frozen-quantizer appends (``append_to_ann_index``) leave one file
    per append batch per touched cell; a serving scan then pays per-file
    open/footer costs inside exactly the directories it prunes down to.
    This is the OPTIMIZE pass: repartition by cell_id (each cell's rows
    land wholly in one task → one output file per cell), write the
    rewrite into a fresh ``index.v{N}`` directory that no reader
    resolves, then COMMIT it with one ledger append
    (``pipelines/artifact.py``). Readers mid-compaction keep resolving
    the previous version; a crashed compactor leaves the previous
    version live (the orphan directory is absorbed by the next
    attempt's overwrite) — there is no delete/rename window with no
    live index, the r6 ADVICE hazard of the old in-place swap. Search
    results are unchanged (pinned).

    Returns {"files_before", "files_after", "n_rows"}."""
    cur_path = _index_dir(spark, out_dir)
    index = spark.read.parquet(cur_path)
    before = len(index.inputFiles())
    n_live = index.count()
    version, staging = next_artifact_dir(spark, out_dir, "index")
    obs = Observation("ann_compact")
    (
        index.repartition("cell_id")
        .observe(obs, F.count(F.lit(1)).alias("rows"))
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(staging)
    )
    n_rows = int(obs.get["rows"])
    # commit GATE: a compaction is a pure rewrite — the staged row count
    # must equal the live one exactly, or the rewrite lost/duplicated
    # rows and must not be promoted (the staged dir is dropped, the live
    # index untouched)
    if n_rows != n_live:
        fs, _, jvm = _hadoop_fs(spark, staging)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
        raise RuntimeError(
            f"compact_ann_index: staged rewrite has {n_rows} rows but the "
            f"live index has {n_live} — refusing to promote"
        )
    commit_artifact_version(spark, out_dir, "index", version)
    after = len(spark.read.parquet(_index_dir(spark, out_dir)).inputFiles())
    return {"files_before": before, "files_after": after, "n_rows": n_rows}


def evaluate_ann_index(
    spark: SparkSession,
    out_dir: str,
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    shortlist_factor: int = 4,
    index_path: str | None = None,
) -> dict:
    """Recall@k of the persisted index against EXACT cosine top-k — the
    acceptance gate a retrain/append/compact pipeline runs before
    promoting an index to serving (the ``ann_recall_at_k`` pattern
    applied to the lifecycle).

    Queries are the ``n_queries`` smallest-id vectors (deterministic —
    an eval that samples randomly cannot gate a deterministic rebuild).
    Ground truth is brute force over the provided embeddings table
    (|Q| × |corpus| — an eval-sized cost, not a serving cost), the
    candidate list is the batch search WITH exact-cosine rerank, so the
    measured number isolates RETRIEVAL loss (cells not probed, PQ
    shortlist misses) rather than score error; probing every cell with
    a corpus-covering ``shortlist_factor`` provably recalls 1.0 (the
    pinned sanity bound), and each knob's cost is attributable by
    varying it alone. Returns
    {"recall_at_k", "n_queries", "k", "n_probe", "shortlist_factor"}."""
    from ..operators.similarity import cosine_topk_bruteforce

    q = embeddings.orderBy(id_col).limit(n_queries)
    truth = cosine_topk_bruteforce(
        q, embeddings, vec_col=vec_col, id_col=id_col, k=k
    ).select(F.col("q_id"), F.col("c_id"))
    # k+1 from the index: the brute-force baseline excludes q==c but
    # the index search returns the self-hit at rank 1 (cosine 1.0) — a
    # naive k-for-k comparison silently caps recall at (k-1)/k
    got = search_ann_index_batch(
        spark,
        out_dir,
        q.withColumnRenamed(id_col, "q_id"),
        k=k + 1,
        n_probe=n_probe,
        rerank_with=embeddings,
        vec_col=vec_col,
        id_col=id_col,
        query_id_col="q_id",
        shortlist_factor=shortlist_factor,
        index_path=index_path,
    )
    w = Window.partitionBy("q_id").orderBy("rnk")
    got = (
        got.filter(F.col("q_id") != F.col(id_col))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select("q_id", F.col(id_col).alias("c_id"))
    )
    hits = truth.join(got, ["q_id", "c_id"], "left_semi").count()
    denom = truth.count()
    return {
        "recall_at_k": round(hits / denom, 6) if denom else None,
        "n_queries": n_queries,
        "k": k,
        "n_probe": n_probe,
        "shortlist_factor": shortlist_factor,
    }


def mine_hard_negatives(
    spark: SparkSession,
    out_dir: str,
    pairs: DataFrame,
    embeddings: DataFrame,
    n_negatives: int = 5,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "q_id",
    pos_id_col: str = "pos_id",
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: for every
    (query, positive) pair, the ``n_negatives`` corpus items MOST
    similar to the query that are neither the query nor any of its
    positives — the negatives that actually move a contrastive loss
    (random negatives are trivially separable; the standard recipe mines
    them from the current index, e.g. DPR, Karpukhin et al. 2020 —
    public literature).

    One batch search over the persisted index serves every query; the
    positive set joins back as an anti-join (a query may have MANY
    positives — all excluded), and a rank window re-numbers the
    survivors 1..n_negatives. Returns (q_id, neg_id, cosine, rnk).
    Over-fetch is ``n_negatives + positives-per-query`` bounded by the
    observed max positives — computed with one tiny aggregate, not
    guessed."""
    max_pos = (
        pairs.groupBy(query_id_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    if max_pos is None:
        raise ValueError("pairs is empty")
    queries = (
        pairs.select(F.col(query_id_col).alias("q_id"))
        .distinct()
        .join(
            embeddings.select(
                F.col(id_col).alias("q_id"), F.col(vec_col)
            ),
            "q_id",
        )
    )
    # +1 for the self-hit, +max_pos for the excludable positives
    fetched = search_ann_index_batch(
        spark,
        out_dir,
        queries,
        k=n_negatives + max_pos + 1,
        n_probe=n_probe,
        rerank_with=embeddings,
        vec_col=vec_col,
        id_col=id_col,
        query_id_col="q_id",
    )
    pos = pairs.select(
        F.col(query_id_col).alias("q_id"), F.col(pos_id_col).alias(id_col)
    )
    w = Window.partitionBy("q_id").orderBy("rnk")
    return (
        fetched.filter(F.col("q_id") != F.col(id_col))
        .join(pos, ["q_id", id_col], "left_anti")
        .withColumn("neg_rnk", F.row_number().over(w))
        .filter(F.col("neg_rnk") <= n_negatives)
        .select(
            "q_id",
            F.col(id_col).alias("neg_id"),
            "cosine",
            F.col("neg_rnk").alias("rnk"),
        )
    )


def maintain_ann_index(
    spark: SparkSession,
    out_dir: str,
    embeddings: DataFrame,
    delete_ids: list | DataFrame | None = None,
    append_embeddings: DataFrame | None = None,
    min_recall: float = 0.9,
    n_queries: int = 20,
    k: int = 10,
    n_probe: int = 2,
    shortlist_factor: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """One GATED maintenance pass: apply deletes and frozen-quantizer
    appends, compact to one file per cell, measure recall@k of the
    result, and promote it ONLY if recall clears ``min_recall``.

    The staged rewrite lands in an uncommitted ``index.v{N}`` directory
    (``pipelines/artifact.py``), ``evaluate_ann_index`` runs against
    that directory via its ``index_path`` override, and the ledger
    append — the promotion — happens only on a passing gate. A failing
    gate deletes the staged directory and leaves the index at its
    pre-maintenance version untouched, so a delete batch that guts
    recall (or an append of garbage vectors) can never reach serving:
    ``evaluate_ann_index`` stops being advisory and becomes the
    promotion gate the lifecycle docstring promises.

    ``embeddings`` is the corpus the index SHOULD represent AFTER the
    maintenance (ground truth for the recall gate) — pass the
    post-delete corpus table. ``delete_ids`` accepts a list for
    query-sized batches or a DataFrame carrying ``id_col`` for large
    delete sets (anti-join, no literal IN-list in the plan). Returns
    {"promoted", "recall_at_k", "n_deleted", "n_appended", "version",
    "files_after"} with ``version`` None when not promoted."""
    if not 0.0 <= min_recall <= 1.0:
        raise ValueError(f"min_recall must be in [0, 1], got {min_recall}")
    cur_path = _index_dir(spark, out_dir)
    index = spark.read.parquet(cur_path)
    n_deleted = 0
    if isinstance(delete_ids, DataFrame):
        # large delete sets: semi/anti joins, never a literal IN-list
        ids_df = _delete_set(delete_ids, id_col)
        n_deleted = index.join(ids_df, id_col, "semi").count()
        index = index.join(ids_df, id_col, "left_anti")
    elif delete_ids:
        ids = list(delete_ids)
        n_deleted = index.filter(F.col(id_col).isin(ids)).count()
        index = index.filter(~F.col(id_col).isin(ids))
    n_appended = 0
    res = None
    if append_embeddings is not None:
        rows, res = _encode_rows(
            spark, out_dir, append_embeddings, vec_col, id_col
        )
        index = index.unionByName(rows.select(*index.columns))
        n_appended = rows.count()
    version, staging = next_artifact_dir(spark, out_dir, "index")
    # full rewrite of a fresh directory: emptied cells simply have no
    # directory (no dynamic-overwrite stale-file trap), and each cell's
    # rows land in one task → one file per cell (the compaction)
    index.repartition("cell_id").write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(staging)
    if res is not None:
        res.unpersist()
    stats = evaluate_ann_index(
        spark,
        out_dir,
        embeddings,
        n_queries=n_queries,
        k=k,
        n_probe=n_probe,
        vec_col=vec_col,
        id_col=id_col,
        shortlist_factor=shortlist_factor,
        index_path=staging,
    )
    recall = stats["recall_at_k"]
    promoted = recall is not None and recall >= min_recall
    if promoted:
        commit_artifact_version(spark, out_dir, "index", version)
        files_after = len(
            spark.read.parquet(_index_dir(spark, out_dir)).inputFiles()
        )
    else:
        fs, _, jvm = _hadoop_fs(spark, staging)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
        files_after = len(spark.read.parquet(cur_path).inputFiles())
    return {
        "promoted": promoted,
        "recall_at_k": recall,
        "n_deleted": int(n_deleted),
        "n_appended": int(n_appended),
        "version": version if promoted else None,
        "files_after": files_after,
    }


def tune_ann_index(
    spark: SparkSession,
    out_dir: str,
    embeddings: DataFrame,
    target_recall: float = 0.95,
    n_queries: int = 20,
    k: int = 10,
    n_probe_grid: list[int] | None = None,
    shortlist_grid: tuple[int, ...] = (4, 8, 16),
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """CHEAPEST serving config that meets ``target_recall`` — the
    evaluate gate turned into an optimizer, so "what n_probe do we
    serve with?" is measured instead of guessed.

    Walks (n_probe, shortlist_factor) in increasing serving-cost order —
    n_probe dominates (each probe scans a whole cell directory), the
    shortlist factor only widens the k-sized exact rerank — evaluating
    each via ``evaluate_ann_index`` on the SAME deterministic query set,
    and returns at the FIRST config whose recall@k clears the target
    (every evaluated config is in ``trace``, so the recall/cost curve is
    kept for the run log). ``n_probe_grid`` defaults to doubling from 1
    up to the index's cell count; an unmeetable target returns
    {"met": False} with the full trace rather than raising — the caller
    decides between rebuilding (more cells/ksub) and relaxing the
    target. Eval cost: one brute-force ground truth per (n_probe, sf)
    pair at n_queries×corpus — an offline tuning cost, not a serving
    cost; production would cache the ground truth across the grid."""
    if not 0.0 <= target_recall <= 1.0:
        raise ValueError(f"target_recall must be in [0, 1], got {target_recall}")
    if n_probe_grid is None:
        n_cells = spark.read.parquet(os.path.join(out_dir, "centroids")).count()
        n_probe_grid, p = [], 1
        while p < n_cells:
            n_probe_grid.append(p)
            p *= 2
        n_probe_grid.append(n_cells)
    trace = []
    for n_probe in sorted(set(n_probe_grid)):
        for sf in sorted(set(shortlist_grid)):
            stats = evaluate_ann_index(
                spark,
                out_dir,
                embeddings,
                n_queries=n_queries,
                k=k,
                n_probe=n_probe,
                vec_col=vec_col,
                id_col=id_col,
                shortlist_factor=sf,
            )
            trace.append(stats)
            if (
                stats["recall_at_k"] is not None
                and stats["recall_at_k"] >= target_recall
            ):
                return {
                    "met": True,
                    "n_probe": n_probe,
                    "shortlist_factor": sf,
                    "recall_at_k": stats["recall_at_k"],
                    "trace": trace,
                }
    return {"met": False, "trace": trace}
