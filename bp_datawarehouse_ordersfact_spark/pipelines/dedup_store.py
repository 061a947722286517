"""Incremental dedup against a persisted MinHash signature store.

The batch operator (``operators/dedup.minhash_lsh_pairs``) answers
"which pairs inside THIS frame are near-dups"; a continuously-ingesting
corpus needs the other question — "which of these NEW documents
duplicate something we already hold" — without rescanning the corpus
per batch. This is the standard production shape (the `ann_index`
lifecycle applied to dedup): one job builds the store from the corpus,
every ingest batch joins against it, survivors are admitted.

On-disk layout under ``out_dir``:

- ``bands/``    — (doc, band, bh) LSH band rows, PARTITIONED BY band:
  a batch's candidate probe equi-joins on (band, bh), so each band's
  directory is read once per batch — corpus-sized but 32 bytes/row;
- ``shingles/`` — (doc, shingles array) for exact-Jaccard verification,
  touched only for candidate docs (semi-join, never a full scan);
- ``meta/``     — (k, bands, shingle_n): the store is SELF-DESCRIBING,
  and a query with mismatched parameters RAISES instead of silently
  producing incomparable band hashes (the stale-artifact guard the ANN
  index also carries).

Scale shape per ingest batch: signatures for the batch are map-side;
the candidate join shuffles batch-sized band rows against the
band-partitioned store; verification joins shingle sets for candidate
ids only. Nothing ever touches the full corpus text again.

Cross-engine determinism: band hashes come from
``operators/dedup.minhash_band_rows`` — the exact code path the
oracle-checked ``dedup_minhash_lsh`` registry query uses — so pairs
found incrementally are pinned equal to running the batch operator
over (corpus ∪ batch) and keeping the cross pairs
(tests/test_dedup_store.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rnd
from ..functions import text as Tx
from ..operators.dedup import minhash_band_rows, shingle_rows
from .artifact import (
    commit_artifact_version,
    current_artifact_dir,
    next_artifact_dir,
    reset_artifact,
)


def _paths(out_dir: str) -> dict:
    return {n: os.path.join(out_dir, n) for n in ("bands", "shingles", "meta")}


def _live(spark: SparkSession, out_dir: str, name: str) -> str:
    """The artifact's LIVE directory — ledger-resolved after any
    compaction, the plain builder-written directory before the first
    (``pipelines/artifact.py``)."""
    return current_artifact_dir(spark, out_dir, name)


def _prep(
    docs: DataFrame, text_col: str, id_col: str, k: int, bands: int, shingle_n: int
) -> tuple[DataFrame, DataFrame]:
    """(band_rows, shingle_sets) for a document frame."""
    rows = shingle_rows(docs, text_col, id_col, shingle_n)
    banded = minhash_band_rows(rows, id_col, k, bands)
    sets = rows.groupBy(id_col).agg(F.collect_set("shingle").alias("shingles"))
    return banded, sets


def build_dedup_store(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> dict:
    """Build the signature store from the current corpus. Returns a
    manifest with paths and the observed document count."""
    paths = _paths(out_dir)
    banded, sets = _prep(docs, text_col, id_col, k, bands, shingle_n)
    # a rebuild must resolve again: drop any compaction ledger/versioned
    # dirs so readers don't stay pinned to a pre-rebuild version
    for name in ("bands", "shingles"):
        reset_artifact(spark, out_dir, name)
    banded.write.mode("overwrite").partitionBy("band").parquet(paths["bands"])
    obs = Observation("dedup_store")
    sets.observe(obs, F.count(F.lit(1)).alias("docs")).write.mode(
        "overwrite"
    ).parquet(paths["shingles"])
    spark.createDataFrame(
        [(k, bands, shingle_n)], "k int, bands int, shingle_n int"
    ).write.mode("overwrite").parquet(paths["meta"])
    return {"paths": paths, "n_docs": int(obs.get["docs"])}


def _load_meta(spark: SparkSession, out_dir: str) -> dict:
    row = spark.read.parquet(_paths(out_dir)["meta"]).collect()[0]
    return {"k": row["k"], "bands": row["bands"], "shingle_n": row["shingle_n"]}


def dedup_against_store(
    spark: SparkSession,
    batch: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, dup_of, jaccard) — batch documents whose exact Jaccard
    against some STORED document clears ``threshold`` (candidates from
    the band equi-join, verification on candidate shingle sets only).
    Signature parameters come from the store's meta; intra-batch
    near-dups are a separate concern — run ``minhash_lsh_pairs`` on the
    batch itself (the two compose: store-dedup then self-dedup)."""
    meta = _load_meta(spark, out_dir)
    banded, sets = _prep(
        batch, text_col, id_col, meta["k"], meta["bands"], meta["shingle_n"]
    )
    stored_bands = spark.read.parquet(_live(spark, out_dir, "bands"))
    cand = (
        banded.withColumnRenamed("doc", "new_doc")
        .join(
            stored_bands.withColumnRenamed("doc", "old_doc"),
            ["band", "bh"],
        )
        .select("new_doc", "old_doc")
        .distinct()
    )
    stored_sets = spark.read.parquet(
        _live(spark, out_dir, "shingles")
    ).withColumnsRenamed({id_col: "old_doc", "shingles": "sh_old"})
    new_sets = sets.withColumnsRenamed({id_col: "new_doc", "shingles": "sh_new"})
    return (
        cand.join(new_sets, "new_doc")
        .join(stored_sets, "old_doc")
        .withColumn("jaccard", rnd(Tx.jaccard(F.col("sh_new"), F.col("sh_old")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("new_doc").alias(id_col),
            F.col("old_doc").alias("dup_of"),
            "jaccard",
        )
    )


def admit_to_store(
    spark: SparkSession,
    batch: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Append a batch's band rows + shingle sets to the store (run it on
    the batch's NON-duplicate survivors after ``dedup_against_store``).
    Id uniqueness vs the store is the caller's contract, exactly as in
    ``append_to_ann_index``. Returns the number of documents admitted."""
    meta = _load_meta(spark, out_dir)
    banded, sets = _prep(
        batch, text_col, id_col, meta["k"], meta["bands"], meta["shingle_n"]
    )
    bands_path = _live(spark, out_dir, "bands")
    shingles_path = _live(spark, out_dir, "shingles")
    # align the batch's id type to the store before APPENDING — a batch
    # whose ids are int where the store holds bigint would otherwise
    # write mixed-physical-type files into one directory and corrupt the
    # store for every later reader (observed: INT32 vs INT64 crash)
    stored_id_type = spark.read.parquet(shingles_path).schema[id_col].dataType
    banded = banded.withColumn("doc", F.col("doc").cast(stored_id_type))
    sets = sets.withColumn(id_col, F.col(id_col).cast(stored_id_type))
    banded.write.mode("append").partitionBy("band").parquet(bands_path)
    obs = Observation("dedup_admit")
    sets.observe(obs, F.count(F.lit(1)).alias("docs")).write.mode(
        "append"
    ).parquet(shingles_path)
    return int(obs.get["docs"])


# ---------------------------------------------------------------------------
# Embedding twin: banded-hyperplane signature store for vector near-dups
# ---------------------------------------------------------------------------


def _emb_paths(out_dir: str) -> dict:
    return {n: os.path.join(out_dir, n) for n in ("keys", "vectors", "meta")}


def build_embedding_dedup_store(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 8,
    bits_per_band: int = 32,
    seed: int = 42,
    dim: int | None = None,
) -> dict:
    """Vector twin of ``build_dedup_store``: persist banded
    random-hyperplane keys (``functions.vectors.hyperplane_band_keys``)
    plus the vectors themselves for exact-cosine verification. The meta
    table records (bands, bits_per_band, seed, dim, plane_md5): the
    hyperplanes derive deterministically from (seed, dim) so no plane
    matrix is persisted, but NumPy's Generator streams may change across
    releases (NEP 19) — plane_md5 fingerprints the matrix the store was
    built with, and every later probe/admit verifies its regenerated
    planes against it, turning silent recall collapse after a numpy
    upgrade into a loud error (r6 ADVICE)."""
    from ..functions import vectors as V

    if dim is None:
        dim = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    paths = _emb_paths(out_dir)
    for name in ("keys", "vectors"):
        reset_artifact(spark, out_dir, name)
    keyed = embeddings.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
        V.hyperplane_band_keys(
            F.col(vec_col), dim, bands, bits_per_band, seed
        ).alias("keys"),
    )
    keyed.select(id_col, F.explode("keys").alias("bk")).write.mode(
        "overwrite"
    ).parquet(paths["keys"])
    obs = Observation("emb_store")
    keyed.select(id_col, "v").observe(
        obs, F.count(F.lit(1)).alias("rows")
    ).write.mode("overwrite").parquet(paths["vectors"])
    spark.createDataFrame(
        [
            (
                bands,
                bits_per_band,
                seed,
                dim,
                V.hyperplane_fingerprint(dim, bands, bits_per_band, seed),
            )
        ],
        "bands int, bits_per_band int, seed int, dim int, plane_md5 string",
    ).write.mode("overwrite").parquet(paths["meta"])
    return {"paths": paths, "n_vectors": int(obs.get["rows"])}


def _emb_meta(spark: SparkSession, out_dir: str) -> dict:
    """Store meta, with the plane-matrix fingerprint VERIFIED: the keys
    this process would generate from (seed, dim) must hash to the same
    matrix the store was built with, else every probe lands in foreign
    buckets (numpy Generator drift across releases — NEP 19). Stores
    persisted before the fingerprint existed skip the check."""
    from ..functions import vectors as V

    row = spark.read.parquet(_emb_paths(out_dir)["meta"]).collect()[0]
    meta = {k: row[k] for k in ("bands", "bits_per_band", "seed", "dim")}
    stored_md5 = row["plane_md5"] if "plane_md5" in row.__fields__ else None
    if stored_md5 is not None:
        local = V.hyperplane_fingerprint(
            meta["dim"], meta["bands"], meta["bits_per_band"], meta["seed"]
        )
        if local != stored_md5:
            raise RuntimeError(
                "embedding dedup store plane-matrix mismatch: store was "
                f"built with planes md5={stored_md5} but this runtime "
                f"regenerates md5={local} from the same seed — numpy "
                "Generator stream drift. Rebuild the store (or pin numpy) "
                "before querying; proceeding would hash into foreign "
                "buckets and silently return no duplicates."
            )
    return meta


def embedding_dedup_against_store(
    spark: SparkSession,
    batch: DataFrame,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.999,
    probe_flips: int = 0,
) -> DataFrame:
    """(vec_id, dup_of, cosine) — batch vectors whose exact cosine
    against some STORED vector clears ``threshold``. Key parameters
    (and thus the hyperplanes) come from the store's meta; a batch
    whose vector dim differs from the trained dim RAISES inside the
    key UDF rather than silently mis-hashing.

    ``probe_flips`` is the QUERY-side multi-probe knob (Lv et al.,
    VLDB 2007 — see ``functions.vectors.hyperplane_band_keys``): each
    batch vector additionally probes the buckets reached by flipping,
    one at a time, its ``probe_flips`` lowest-margin sign bits per band.
    Recall against an under-provisioned store rises WITHOUT touching the
    store's files — the store side stays at its built band count; only
    this batch emits extra keys (r6 VERDICT #3)."""
    from ..functions import vectors as V

    meta = _emb_meta(spark, out_dir)
    keyed = batch.select(
        F.col(id_col).alias("new_id"),
        F.col(vec_col).alias("v_new"),
        V.hyperplane_band_keys(
            F.col(vec_col),
            meta["dim"],
            meta["bands"],
            meta["bits_per_band"],
            meta["seed"],
            probe_flips=probe_flips,
        ).alias("keys"),
    )
    cand = (
        keyed.select("new_id", F.explode("keys").alias("bk"))
        .join(
            spark.read.parquet(
                _live(spark, out_dir, "keys")
            ).withColumnsRenamed({id_col: "old_id"}),
            "bk",
        )
        .select("new_id", "old_id")
        .distinct()
    )
    stored_vecs = spark.read.parquet(
        _live(spark, out_dir, "vectors")
    ).withColumnsRenamed({id_col: "old_id", "v": "v_old"})
    return (
        cand.join(keyed.select("new_id", "v_new"), "new_id")
        .join(stored_vecs, "old_id")
        .withColumn("cosine", rnd(V.cosine(F.col("v_new"), F.col("v_old")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("new_id").alias(id_col),
            F.col("old_id").alias("dup_of"),
            "cosine",
        )
    )


def admit_embeddings_to_store(
    spark: SparkSession,
    batch: DataFrame,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> int:
    """Append a batch's keys + vectors (run on non-duplicate survivors).
    Id and vector types are aligned to the store schema before the
    append — the mixed-physical-type corruption guard of
    ``admit_to_store``."""
    from ..functions import vectors as V

    meta = _emb_meta(spark, out_dir)
    keys_path = _live(spark, out_dir, "keys")
    vectors_path = _live(spark, out_dir, "vectors")
    vec_schema = spark.read.parquet(vectors_path).schema
    id_type = vec_schema[id_col].dataType
    v_type = vec_schema["v"].dataType
    keyed = batch.select(
        F.col(id_col).cast(id_type).alias(id_col),
        F.col(vec_col).cast(v_type).alias("v"),
        V.hyperplane_band_keys(
            F.col(vec_col),
            meta["dim"],
            meta["bands"],
            meta["bits_per_band"],
            meta["seed"],
        ).alias("keys"),
    )
    keyed.select(id_col, F.explode("keys").alias("bk")).write.mode(
        "append"
    ).parquet(keys_path)
    obs = Observation("emb_admit")
    keyed.select(id_col, "v").observe(
        obs, F.count(F.lit(1)).alias("rows")
    ).write.mode("append").parquet(vectors_path)
    return int(obs.get["rows"])


def compact_dedup_store(spark: SparkSession, out_dir: str) -> dict:
    """Maintenance for either store flavor (text bands/shingles or
    embedding keys/vectors): every admit appends one file per artifact,
    so a long-running ingest leaves thousands of small files that every
    later probe pays per-file open/footer costs on. Rewrites each
    artifact via repartition-to-content-size into a fresh versioned
    directory and COMMITS it with one ledger append
    (``pipelines/artifact.py`` — the ``compact_ann_index`` protocol):
    readers mid-compaction keep resolving the previous version, and a
    crashed compactor leaves the previous version live, instead of the
    old in-place delete/rename swap's dead window (r6 ADVICE).
    Band-partitioned artifacts keep their partitioning with one file
    per band. Returns {artifact: (files_before, files_after)}."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(out_dir).getFileSystem(spark._jsc.hadoopConfiguration())
    stats: dict = {}
    plans = [
        ("bands", ["band"]),
        ("shingles", None),
        ("keys", None),
        ("vectors", None),
    ]
    for name, part_cols in plans:
        path = _live(spark, out_dir, name)
        if not fs.exists(Path(path)):
            continue
        df = spark.read.parquet(path)
        before = len(df.inputFiles())
        n_live = df.count()
        version, staging = next_artifact_dir(spark, out_dir, name)
        if part_cols:
            w = df.repartition(*part_cols).write.partitionBy(*part_cols)
        else:
            w = df.coalesce(max(1, before // 8)).write
        w.mode("overwrite").parquet(staging)
        # commit GATE (same as compact_ann_index): a pure rewrite must
        # preserve the exact row count or it is not promoted
        n_staged = spark.read.parquet(staging).count()
        if n_staged != n_live:
            fs.delete(Path(staging), True)
            raise RuntimeError(
                f"compact_dedup_store[{name}]: staged rewrite has "
                f"{n_staged} rows but the live artifact has {n_live} — "
                "refusing to promote"
            )
        commit_artifact_version(spark, out_dir, name, version)
        live = _live(spark, out_dir, name)
        stats[name] = (before, len(spark.read.parquet(live).inputFiles()))
    return stats


def check_dedup_store_health(
    spark: SparkSession,
    out_dir: str,
    n_sample: int | None = 20,
    id_col: str = "doc_id",
) -> dict:
    """Referential-integrity gate for the TEXT store — the
    ``evaluate_ann_index`` idea applied to the signature store, run
    before trusting it for an ingest window.

    The two artifacts must describe the same document set: a doc with
    band rows but no shingle set verifies nothing (its candidates are
    silently dropped at the verify join); a doc with shingles but no
    band rows is INVISIBLE to every probe. Both states arise from a
    half-completed admit (bands append commits before shingles — see
    ``run_incremental_dedup_stream``'s replay notes) left unrepaired.
    Samples the ``n_sample`` LARGEST ids from each side and checks
    membership in the other: the divergence this gate exists to catch
    is produced by the most RECENT admits, which in streaming ingest
    carry the newest/largest ids — a smallest-id sample would keep
    reporting healthy on a store whose latest admit half-completed.
    Sampling keeps the gate probe-sized at any corpus scale;
    ``n_sample=None`` sweeps both sides in full.
    Returns {"n_sample", "bands_missing_shingles", "shingles_missing_bands",
    "healthy"}."""
    _load_meta(spark, out_dir)  # raises on unreadable/foreign meta
    bands = spark.read.parquet(_live(spark, out_dir, "bands"))
    sets = spark.read.parquet(_live(spark, out_dir, "shingles"))
    b_ids = bands.select(F.col("doc").alias("id")).distinct()
    s_ids = sets.select(F.col(id_col).alias("id")).distinct()
    if n_sample is None:
        b_sample, s_sample = b_ids, s_ids
    else:
        b_sample = b_ids.orderBy(F.col("id").desc()).limit(n_sample)
        s_sample = s_ids.orderBy(F.col("id").desc()).limit(n_sample)
    missing_sh = b_sample.join(s_ids, "id", "left_anti").count()
    missing_bd = s_sample.join(b_ids, "id", "left_anti").count()
    return {
        "n_sample": n_sample,
        "bands_missing_shingles": int(missing_sh),
        "shingles_missing_bands": int(missing_bd),
        "healthy": missing_sh == 0 and missing_bd == 0,
    }


def check_embedding_store_health(
    spark: SparkSession,
    out_dir: str,
    n_sample: int | None = 20,
    id_col: str = "vec_id",
) -> dict:
    """SELF-PROBE gate for the embedding store: the ``n_sample``
    LARGEST-id STORED vectors (the most recent admits — where a
    half-completed admit's keys/vectors divergence actually lives;
    ``n_sample=None`` probes every vector), pushed back through the
    full probe path (meta → hyperplane keys → band equi-join → exact
    cosine), must each rediscover themselves at cosine 1.0. A stored
    vector that cannot find itself proves the store is broken for real
    queries too — catches keys/vectors divergence from a half-completed
    admit, band truncation, and any plane drift the md5 fingerprint
    guard didn't get to veto.
    Returns {"n_sample", "n_self_found", "healthy"}."""
    vecs = spark.read.parquet(_live(spark, out_dir, "vectors"))
    if n_sample is None:
        newest = vecs
    else:
        newest = vecs.orderBy(F.col(id_col).desc()).limit(n_sample)
    probe = newest.select(F.col(id_col), F.col("v").alias("__probe_vec"))
    n_probe = probe.count()
    hits = embedding_dedup_against_store(
        spark, probe, out_dir, vec_col="__probe_vec", id_col=id_col,
        threshold=0.999,
    )
    n_self = (
        hits.filter(F.col(id_col) == F.col("dup_of")).select(id_col).distinct().count()
    )
    return {
        "n_sample": int(n_probe),
        "n_self_found": int(n_self),
        "healthy": n_self == n_probe,
    }
