"""Quality-classifier loop over the sf0.001 embeddings: fit → persist →
reload → sweep must reproduce the in-memory scorer exactly, filter at
the recorded threshold, and keep the sweep plan joinless/shuffle-free.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.core.io import load_table
from bp_datawarehouse_ordersfact_spark.operators.ml import logreg_score, logreg_train
from bp_datawarehouse_ordersfact_spark.pipelines.quality_loop import (
    apply_quality_filter,
    load_quality_weights,
    train_quality_filter,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("quality-loop")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def labeled(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    # binarize the synthetic label for the quality contract (1 = keep)
    return emb.select(
        "vec_id", "embedding", (F.col("label") % 2).alias("label")
    )


def test_train_persist_reload_roundtrip(spark, labeled, tmp_path):
    out = str(tmp_path / "q")
    manifest = train_quality_filter(spark, labeled, out, n_iter=15)
    assert manifest["dim"] == 64
    assert 0.0 <= manifest["train_accuracy"] <= 1.0
    w_disk = load_quality_weights(spark, out)
    w_mem = logreg_train(labeled, "embedding", "label", n_iter=15)
    assert w_disk == w_mem  # persisted weights identical to a refit
    assert len(w_disk) == 65


def test_train_minibatch_passthrough(spark, labeled, tmp_path):
    """n_batches/id_col reach logreg_train: the persisted weights equal a
    direct mini-batch fit, and n_batches=1 reproduces the full-batch
    manifest exactly."""
    out = str(tmp_path / "q_mb")
    train_quality_filter(
        spark, labeled, out, n_iter=6, n_batches=4, id_col="vec_id"
    )
    w_disk = load_quality_weights(spark, out)
    w_mem = logreg_train(
        labeled, "embedding", "label", n_iter=6, n_batches=4, id_col="vec_id"
    )
    assert w_disk == w_mem
    out_full = str(tmp_path / "q_full")
    out_one = str(tmp_path / "q_one")
    m_full = train_quality_filter(spark, labeled, out_full, n_iter=6)
    m_one = train_quality_filter(
        spark, labeled, out_one, n_iter=6, n_batches=1, id_col="vec_id"
    )
    assert m_full["train_accuracy"] == m_one["train_accuracy"]
    assert load_quality_weights(spark, out_full) == load_quality_weights(
        spark, out_one
    )


def test_apply_filter_matches_in_memory_scorer(spark, labeled, tmp_path):
    out = str(tmp_path / "q")
    manifest = train_quality_filter(spark, labeled, out, n_iter=15, threshold=0.4)
    kept = apply_quality_filter(spark, labeled, out)
    w = load_quality_weights(spark, out)
    want = labeled.withColumn(
        "quality_prob", logreg_score(labeled, F.col("embedding"), w)
    ).filter(F.col("quality_prob") >= 0.4)
    got_rows = {(r["vec_id"], r["quality_prob"]) for r in kept.collect()}
    want_rows = {(r["vec_id"], r["quality_prob"]) for r in want.collect()}
    assert got_rows == want_rows and got_rows
    assert manifest["threshold"] == 0.4
    # explicit threshold overrides the recorded one
    stricter = apply_quality_filter(spark, labeled, out, threshold=0.99)
    assert stricter.count() <= kept.count()


def test_sweep_plan_is_joinless_map_side(spark, labeled, tmp_path):
    out = str(tmp_path / "q")
    train_quality_filter(spark, labeled, out, n_iter=5)
    emb = load_table(spark, SF_DIR, "embeddings")
    plan = (
        apply_quality_filter(spark, emb, out)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_dim_mismatch_fails_loudly(spark, labeled, tmp_path):
    out = str(tmp_path / "q")
    train_quality_filter(spark, labeled, out, n_iter=3)
    short = labeled.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(ValueError, match="stale weights"):
        apply_quality_filter(spark, short, out)


def test_sweep_composes_with_structured_streaming(spark, labeled, tmp_path):
    """The persisted filter is a pure map-side expression, so the SAME
    call sweeps a readStream corpus — batch/streaming unification with
    identical results."""
    out = str(tmp_path / "q")
    train_quality_filter(spark, labeled, out, n_iter=10)
    src = str(tmp_path / "src")
    labeled.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    kept = apply_quality_filter(spark, stream, out)
    assert kept.isStreaming
    q = (
        kept.writeStream.format("memory")
        .queryName("qf_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["vec_id"], r["quality_prob"])
        for r in spark.sql("select vec_id, quality_prob from qf_stream").collect()
    }
    want = {
        (r["vec_id"], r["quality_prob"])
        for r in apply_quality_filter(spark, labeled, out).collect()
    }
    assert got == want and got


def test_text_mode_quality_loop_end_to_end_and_mode_guards(spark, tmp_path):
    """Raw-text quality loop: train on vocab-distinct labeled docs,
    sweep a corpus containing unseen docs of both vocabularies, and pin
    that (a) the filter keeps exactly the good-vocab docs, (b) each
    artifact mode rejects the other sweep path loudly."""
    import pytest as _pytest

    from bp_datawarehouse_ordersfact_spark.pipelines import (
        apply_quality_filter,
        apply_text_quality_filter,
        train_text_quality_filter,
    )

    good_words = ["science", "theory", "journal", "method", "proof"]
    bad_words = ["click", "winner", "free", "prize", "buy"]
    rows = []
    for i in range(25):
        rows.append((i, " ".join(good_words[j % 5] for j in range(i % 4 + 3)), 1))
        rows.append(
            (100 + i, " ".join(bad_words[(i + j) % 5] for j in range(i % 5 + 3)), 0)
        )
    labeled = spark.createDataFrame(rows, "doc_id long, text string, label int")
    out = str(tmp_path / "textq")
    m = train_text_quality_filter(
        spark, labeled, out, n_features=64, n_iter=40, lr=2.0
    )
    assert m["train_accuracy"] == 1.0
    assert m["dim"] == 64

    # UNSEEN docs from both vocabularies
    corpus = spark.createDataFrame(
        [
            (900, "proof method theory proof"),
            (901, "buy prize click free free"),
            (902, "journal science method"),
        ],
        "doc_id long, text string",
    )
    kept = apply_text_quality_filter(spark, corpus, out)
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {900, 902}
    assert set(kept.columns) == {"doc_id", "text", "quality_prob"}

    # mode guards, both directions
    with _pytest.raises(ValueError, match="mode='text'"):
        apply_quality_filter(spark, corpus, out, vec_col="text")
    vec_out = str(tmp_path / "vecq")
    from bp_datawarehouse_ordersfact_spark.pipelines import train_quality_filter

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0], 1), (2, [0.0, 1.0], 0)],
        "doc_id long, embedding array<double>, label int",
    )
    train_quality_filter(spark, vecs, vec_out, n_iter=5)
    with _pytest.raises(ValueError, match="mode='vector'"):
        apply_text_quality_filter(spark, corpus, vec_out)


def test_text_sweep_stream_filters_and_replays_idempotently(spark, tmp_path):
    """The foreachBatch text sweep: two micro-batches filtered against
    the persisted text artifact, survivors landed per-batch; a replay
    with a lost checkpoint rewrites identical rows (no duplicates)."""
    import shutil

    from bp_datawarehouse_ordersfact_spark.pipelines import (
        train_text_quality_filter,
    )
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_text_quality_sweep_stream,
    )

    good_words = ["science", "theory", "journal", "method", "proof"]
    bad_words = ["click", "winner", "free", "prize", "buy"]
    rows = []
    for i in range(25):
        rows.append((i, " ".join(good_words[j % 5] for j in range(i % 4 + 3)), 1))
        rows.append(
            (100 + i, " ".join(bad_words[(i + j) % 5] for j in range(i % 5 + 3)), 0)
        )
    labeled = spark.createDataFrame(rows, "doc_id long, text string, label int")
    qdir = str(tmp_path / "q")
    train_text_quality_filter(spark, labeled, qdir, n_features=64, n_iter=40, lr=2.0)

    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(900, "proof method theory"), (901, "buy prize click free")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(feed)
    spark.createDataFrame(
        [(902, "journal science method proof"), (903, "winner free buy")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(feed)

    sink = str(tmp_path / "clean")
    run_text_quality_sweep_stream(spark, feed, qdir, sink, files_per_trigger=1)
    got = spark.read.parquet(sink)
    assert {r["doc_id"] for r in got.collect()} == {900, 902}
    assert "quality_prob" in got.columns

    shutil.rmtree(sink + "_checkpoint")
    run_text_quality_sweep_stream(spark, feed, qdir, sink, files_per_trigger=1)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(sink).collect()
    ) == [900, 902]
