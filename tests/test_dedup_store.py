"""Persisted MinHash signature store: incremental dedup of ingest
batches against the corpus, pinned equal to the batch operator run over
(corpus ∪ batch) restricted to cross pairs — both share
``operators/dedup.minhash_band_rows``, the oracle-checked code path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.core.io import load_table
from bp_datawarehouse_ordersfact_spark.pipelines import (
    admit_to_store,
    build_dedup_store,
    dedup_against_store,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("dedup-store")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def corpus_and_batch(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 400)
    # batch: 10 exact copies of stored docs (new ids) + 10 genuinely new
    copies = (
        docs.filter(F.col("doc_id") < 10)
        .select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    )
    fresh = docs.filter((F.col("doc_id") >= 400) & (F.col("doc_id") < 410)).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    return corpus, copies.unionByName(fresh)


def test_store_dedup_equals_batch_operator_cross_pairs(
    spark, corpus_and_batch, tmp_path
):
    from bp_datawarehouse_ordersfact_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    corpus, batch = corpus_and_batch
    out = str(tmp_path / "store")
    manifest = build_dedup_store(spark, corpus, out)
    assert manifest["n_docs"] == corpus.count()

    got = {
        (r["doc_id"], r["dup_of"], r["jaccard"])
        for r in dedup_against_store(spark, batch, out, threshold=0.5).collect()
    }
    # exact copies of stored docs must be flagged at jaccard 1.0
    assert {(d, o) for d, o, _ in got} >= {(i + 10_000, i) for i in range(10)}
    assert all(j == 1.0 for d, o, j in got if d - 10_000 == o)

    # ground truth: batch operator over corpus ∪ batch, cross pairs only
    union = corpus.unionByName(batch)
    all_pairs = minhash_lsh_pairs(union, "text", "doc_id", threshold=0.5)
    want = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]), r["jaccard"])
        for r in all_pairs.collect()
        # cross pairs: exactly one side is a batch id (>= 10_000)
        if (r["id_a"] >= 10_000) != (r["id_b"] >= 10_000)
    }
    assert got == want


def test_admit_then_redetect_and_store_growth(spark, corpus_and_batch, tmp_path):
    corpus, batch = corpus_and_batch
    out = str(tmp_path / "store2")
    build_dedup_store(spark, corpus, out)
    dups = {r["doc_id"] for r in dedup_against_store(spark, batch, out).collect()}
    survivors = batch.filter(~F.col("doc_id").isin(list(dups)))
    n = admit_to_store(spark, survivors, out)
    assert n == survivors.count() > 0
    # re-running the same batch now flags the admitted docs as dups of
    # THEMSELVES in the store (jaccard 1.0 self-match on identical text)
    again = dedup_against_store(spark, batch, out).collect()
    flagged = {r["doc_id"] for r in again}
    assert flagged >= {r[0] for r in survivors.select("doc_id").collect()}


def test_unreadable_or_foreign_params_fail_loudly(spark, corpus_and_batch, tmp_path):
    corpus, batch = corpus_and_batch
    out = str(tmp_path / "store3")
    build_dedup_store(spark, corpus, out, k=8, bands=2)
    # the query derives (k, bands, shingle_n) FROM the meta, so a store
    # built with different params still verifies exactly: copies hit 1.0
    got = dedup_against_store(spark, batch, out).collect()
    assert {(r["doc_id"], r["dup_of"]) for r in got} >= {
        (i + 10_000, i) for i in range(10)
    }
    with pytest.raises(Exception):
        dedup_against_store(spark, batch, str(tmp_path / "missing"))


def test_embedding_store_matches_banded_operator_cross_pairs(spark, tmp_path):
    """The embedding store's incremental results equal the banded
    operator over corpus ∪ batch restricted to cross pairs (same seed
    and params reproduce identical hyperplane keys from meta alone)."""
    from bp_datawarehouse_ordersfact_spark.operators.dedup import (
        embedding_near_dup_pairs_banded,
    )
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        admit_embeddings_to_store,
        build_embedding_dedup_store,
        embedding_dedup_against_store,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = emb.filter(F.col("vec_id") < 400)
    # batch: scaled copies of 10 stored vectors (cosine exactly 1.0) +
    # 10 fresh vectors
    copies = corpus.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
    )
    fresh = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 410)).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    batch = copies.unionByName(fresh)

    out = str(tmp_path / "emb_store")
    manifest = build_embedding_dedup_store(spark, corpus, out)
    assert manifest["n_vectors"] == corpus.count()

    got = {
        (r["vec_id"], r["dup_of"], r["cosine"])
        for r in embedding_dedup_against_store(spark, batch, out).collect()
    }
    assert {(d, o) for d, o, _ in got} >= {(i + 10_000, i) for i in range(10)}
    assert all(c == 1.0 for *_, c in got)

    union = corpus.unionByName(batch)
    want = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]), r["cosine"])
        for r in embedding_near_dup_pairs_banded(
            union, "embedding", "vec_id", 0.999, dim=64
        ).collect()
        if (r["id_a"] >= 10_000) != (r["id_b"] >= 10_000)
    }
    assert got == want

    # admit survivors; re-running flags them at cosine 1.0
    dups = {d for d, *_ in got}
    survivors = batch.filter(~F.col("vec_id").isin(list(dups)))
    n = admit_embeddings_to_store(spark, survivors, out)
    assert n == survivors.count() > 0
    again = {r["vec_id"] for r in embedding_dedup_against_store(spark, batch, out).collect()}
    assert again >= {r[0] for r in survivors.select("vec_id").collect()}

    # dim mismatch raises inside the key UDF (meta-driven planes)
    import pytest as _pytest

    short = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="dim"):
        embedding_dedup_against_store(spark, short, out).collect()


def test_compact_store_shrinks_files_and_preserves_results(
    spark, corpus_and_batch, tmp_path
):
    from bp_datawarehouse_ordersfact_spark.pipelines.dedup_store import (
        compact_dedup_store,
    )

    corpus, batch = corpus_and_batch
    out = str(tmp_path / "store_c")
    build_dedup_store(spark, corpus, out)
    # several appends → several files per artifact
    for i in range(3):
        sl = batch.filter(F.col("doc_id") % 3 == i).select(
            (F.col("doc_id") + 1000 * (i + 1)).alias("doc_id"), "text"
        )
        admit_to_store(spark, sl, out)
    before = {(r["doc_id"], r["dup_of"], r["jaccard"])
              for r in dedup_against_store(spark, batch, out).collect()}
    stats = compact_dedup_store(spark, out)
    assert set(stats) == {"bands", "shingles"}
    for name, (b, a) in stats.items():
        assert a <= b
    assert stats["shingles"][1] < stats["shingles"][0]
    after = {(r["doc_id"], r["dup_of"], r["jaccard"])
             for r in dedup_against_store(spark, batch, out).collect()}
    assert after == before


def test_store_probe_flips_raise_recall_without_touching_files(spark, tmp_path):
    """r6 VERDICT #3: an UNDER-provisioned store (one 16-bit band) misses
    many true near-dups; query-side multi-probe must strictly raise the
    number found while leaving the store's files byte-identical — the
    recall lever that doesn't require a rebuild."""
    import glob as _glob

    import numpy as np
    from pyspark.sql import Row

    from bp_datawarehouse_ordersfact_spark.pipelines import (
        build_embedding_dedup_store,
        embedding_dedup_against_store,
    )

    rng = np.random.default_rng(11)
    dim, n = 16, 80
    base = rng.standard_normal((n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noisy = base + 0.15 * rng.standard_normal((n, dim))
    corpus = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(base)]
    )
    batch = spark.createDataFrame(
        [
            Row(vec_id=10_000 + i, embedding=[float(x) for x in v])
            for i, v in enumerate(noisy)
        ]
    )
    out = str(tmp_path / "under_store")
    build_embedding_dedup_store(
        spark, corpus, out, bands=1, bits_per_band=16, seed=3
    )
    files_before = sorted(_glob.glob(os.path.join(out, "keys", "**"), recursive=True))

    def found(flips: int) -> set:
        return {
            (r["vec_id"], r["dup_of"])
            for r in embedding_dedup_against_store(
                spark, batch, out, threshold=0.9, probe_flips=flips
            ).collect()
        }

    base_found, probed_found = found(0), found(4)
    true_pairs = {
        (10_000 + i, i)
        for i in range(n)
        if float(
            base[i]
            @ (noisy[i] / np.linalg.norm(noisy[i]))
        )
        >= 0.9
    }
    assert base_found <= probed_found <= true_pairs | probed_found
    assert len(probed_found) > len(base_found), (
        len(base_found),
        len(probed_found),
    )
    # exact-cosine verification means multi-probe adds no false positives
    assert probed_found <= true_pairs
    # the store itself was never written
    assert (
        sorted(_glob.glob(os.path.join(out, "keys", "**"), recursive=True))
        == files_before
    )


def test_plane_fingerprint_guard_raises_on_drift(spark, tmp_path):
    """r6 ADVICE: the store meta pins an md5 of the hyperplane matrix;
    a runtime whose regenerated planes hash differently (numpy Generator
    stream drift) must fail LOUDLY instead of hashing every probe into
    foreign buckets and silently returning no duplicates."""
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        build_embedding_dedup_store,
        embedding_dedup_against_store,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = emb.filter(F.col("vec_id") < 50)
    out = str(tmp_path / "fp_store")
    build_embedding_dedup_store(spark, corpus, out)
    # healthy store round-trips
    assert embedding_dedup_against_store(spark, corpus.limit(5), out).count() >= 0

    # simulate generator drift: same meta params, different plane hash
    meta_path = os.path.join(out, "meta")
    row = spark.read.parquet(meta_path).collect()[0]
    spark.createDataFrame(
        [
            (
                row["bands"],
                row["bits_per_band"],
                row["seed"],
                row["dim"],
                "0" * 32,
            )
        ],
        "bands int, bits_per_band int, seed int, dim int, plane_md5 string",
    ).write.mode("overwrite").parquet(meta_path)
    with pytest.raises(RuntimeError, match="plane-matrix mismatch"):
        embedding_dedup_against_store(spark, corpus.limit(5), out).collect()


def test_store_health_checks_pass_on_healthy_and_catch_divergence(
    spark, corpus_and_batch, tmp_path
):
    """The integrity gates must pass on freshly-built stores and catch
    the half-completed-admit divergence they exist for: a doc visible in
    one artifact but not its sibling (text store), and stored vectors
    that can no longer rediscover themselves (embedding store)."""
    from bp_datawarehouse_ordersfact_spark.pipelines.dedup_store import (
        check_dedup_store_health,
        check_embedding_store_health,
    )
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        build_embedding_dedup_store,
    )

    corpus, _ = corpus_and_batch
    out = str(tmp_path / "health_store")
    build_dedup_store(spark, corpus, out)
    assert check_dedup_store_health(spark, out)["healthy"] is True

    # simulate a bands append whose shingles half never landed: the
    # divergent doc carries a NEW (largest) id, as a half-completed
    # streaming admit does — the DEFAULT-sized newest-id sample must
    # catch it (ADVICE r7: a smallest-id sample reported healthy here)
    spark.createDataFrame(
        [(99_999_999, 0, 123456)], "doc long, bh long, band int"
    ).write.mode("append").partitionBy("band").parquet(os.path.join(out, "bands"))
    h = check_dedup_store_health(spark, out)
    assert h["healthy"] is False and h["bands_missing_shingles"] == 1
    # n_sample=None sweeps both sides in full
    h_full = check_dedup_store_health(spark, out, n_sample=None)
    assert h_full["healthy"] is False and h_full["bands_missing_shingles"] == 1

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    eout = str(tmp_path / "health_emb")
    build_embedding_dedup_store(spark, emb.filter(F.col("vec_id") < 100), eout)
    eh = check_embedding_store_health(spark, eout, n_sample=10)
    assert eh == {"n_sample": 10, "n_self_found": 10, "healthy": True}

    # gut the keys artifact for the NEWEST vectors (what a
    # half-completed recent admit leaves behind): the newest-id
    # self-probe must fail loudly
    keys_path = os.path.join(eout, "keys")
    keys = spark.read.parquet(keys_path)
    half = keys.filter(F.col("vec_id") < 50).cache()
    half.count()
    half.write.mode("overwrite").parquet(keys_path)
    eh2 = check_embedding_store_health(spark, eout, n_sample=10)
    assert eh2["healthy"] is False and eh2["n_self_found"] == 0


def test_store_probe_plans_are_equijoins_no_cartesian(
    spark, corpus_and_batch, tmp_path
):
    """Scale-shape pin for the probe paths — the 100 TB-critical plans:
    the text store's candidate step is a (band, bh) equi-join and the
    embedding store's a band-key equi-join fed by ONE Arrow eval pass;
    neither may ever contain a cartesian / broadcast-nested-loop join."""
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        build_embedding_dedup_store,
        embedding_dedup_against_store,
    )

    corpus, batch = corpus_and_batch
    out = str(tmp_path / "plan_store")
    build_dedup_store(spark, corpus, out)
    p = (
        dedup_against_store(spark, batch, out)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    eout = str(tmp_path / "plan_emb")
    build_embedding_dedup_store(spark, emb.filter(F.col("vec_id") < 100), eout)
    p2 = (
        embedding_dedup_against_store(spark, emb.limit(20), eout, probe_flips=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in p2
    assert "CartesianProduct" not in p2
    assert "BroadcastNestedLoopJoin" not in p2
