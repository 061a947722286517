"""Commit-pointer artifact protocol (r6 ADVICE) + gated maintenance
(r6 VERDICT #6).

The in-place compaction swap (delete live → rename staging) had a
window with NO live directory and stranded data on a crash between the
two calls; ``pipelines/artifact.py`` replaces it with versioned
directories resolved through an append-only commit ledger. These tests
pin the protocol's safety properties the way a crashed or concurrent
process would see them: an UNCOMMITTED version directory is invisible,
a commit flips resolution in one ledger append, a rebuild resets the
ledger, and ``maintain_ann_index`` promotes a staged rewrite only when
the recall gate clears — a destructive delete leaves the index at its
pre-maintenance version."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.core.io import load_table
from bp_datawarehouse_ordersfact_spark.pipelines import (
    build_ann_index,
    load_ann_index,
    maintain_ann_index,
    search_ann_index,
)
from bp_datawarehouse_ordersfact_spark.pipelines.artifact import (
    commit_artifact_version,
    current_artifact_dir,
    next_artifact_dir,
    reset_artifact,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("artifact-commits")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_uncommitted_version_is_invisible_and_commit_flips(spark, tmp_path):
    base = str(tmp_path / "art")
    legacy = os.path.join(base, "tbl")
    spark.createDataFrame([(1, "old")], "id int, v string").write.parquet(legacy)
    # no ledger → legacy resolution
    assert current_artifact_dir(spark, base, "tbl") == legacy

    # a fully-written but UNCOMMITTED rewrite (crash before commit):
    # readers keep resolving the legacy dir — no dead window
    version, staging = next_artifact_dir(spark, base, "tbl")
    assert version == 1
    spark.createDataFrame([(1, "new")], "id int, v string").write.mode(
        "overwrite"
    ).parquet(staging)
    assert current_artifact_dir(spark, base, "tbl") == legacy
    assert (
        spark.read.parquet(current_artifact_dir(spark, base, "tbl")).collect()[0]["v"]
        == "old"
    )

    # the ledger append IS the commit: resolution flips, superseded
    # legacy dir is dropped
    commit_artifact_version(spark, base, "tbl", version)
    live = current_artifact_dir(spark, base, "tbl")
    assert live == staging
    assert spark.read.parquet(live).collect()[0]["v"] == "new"
    assert not os.path.exists(legacy)

    # next rewrite allocates v2; committing drops v1
    v2, staging2 = next_artifact_dir(spark, base, "tbl")
    assert v2 == 2
    spark.createDataFrame([(1, "newer")], "id int, v string").write.parquet(staging2)
    commit_artifact_version(spark, base, "tbl", v2)
    assert current_artifact_dir(spark, base, "tbl") == staging2
    assert not os.path.exists(staging)


def test_reset_artifact_returns_resolution_to_legacy(spark, tmp_path):
    base = str(tmp_path / "art2")
    legacy = os.path.join(base, "tbl")
    spark.createDataFrame([(1,)], "id int").write.parquet(legacy)
    v, staging = next_artifact_dir(spark, base, "tbl")
    spark.createDataFrame([(2,)], "id int").write.parquet(staging)
    commit_artifact_version(spark, base, "tbl", v)
    # REBUILD: reset must drop ledger + versioned dirs so the fresh
    # legacy write resolves again (stale-pointer guard)
    reset_artifact(spark, base, "tbl")
    spark.createDataFrame([(3,)], "id int").write.parquet(legacy)
    assert current_artifact_dir(spark, base, "tbl") == legacy
    assert spark.read.parquet(legacy).collect()[0]["id"] == 3
    assert glob.glob(os.path.join(base, "tbl.v*")) == []


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("maint") / "index")
    emb = load_table(spark, SF_DIR, "embeddings")
    build_ann_index(spark, emb, out, n_cells=5, m=8, ksub=8, n_iter=2)
    return out, emb


def test_maintain_rejects_recall_gutting_delete(spark, built):
    """A delete of most of the corpus evaluated against the FULL corpus
    guts recall: the gate must refuse to promote and the live index
    must be byte-identically the pre-maintenance version."""
    out, emb = built
    q = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    before = [
        (r["vec_id"], r["adc_d2"])
        for r in search_ann_index(spark, out, q, k=10, n_probe=5).collect()
    ]
    live_before = current_artifact_dir(spark, out, "index")
    victims = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").collect()][
        5:
    ]
    stats = maintain_ann_index(
        spark,
        out,
        emb,  # ground truth: the index SHOULD still represent everything
        delete_ids=victims,
        min_recall=0.9,
        n_queries=5,
        k=5,
        n_probe=5,
        shortlist_factor=1000,
    )
    assert stats["promoted"] is False
    assert stats["version"] is None
    assert stats["recall_at_k"] < 0.9
    # live index untouched: same resolved dir, identical search results,
    # no staged leftovers
    assert current_artifact_dir(spark, out, "index") == live_before
    after = [
        (r["vec_id"], r["adc_d2"])
        for r in search_ann_index(spark, out, q, k=10, n_probe=5).collect()
    ]
    assert after == before
    assert glob.glob(os.path.join(out, "index.v*")) == []


def test_maintain_promotes_passing_pass_and_compacts(spark, built):
    """A no-op-delete + small-append maintenance with an achievable gate
    promotes: resolution moves to the committed version, deleted ids are
    gone, appended ids searchable, and the rewrite is one file/cell."""
    out, emb = built
    _, _, idx = load_ann_index(spark, out)
    some_id = idx.select("vec_id").orderBy("vec_id").limit(1).collect()[0]["vec_id"]
    first3 = emb.orderBy("vec_id").limit(3)
    extra = first3.select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "embedding"
    )
    truth = emb.filter(F.col("vec_id") != some_id)
    stats = maintain_ann_index(
        spark,
        out,
        truth,
        delete_ids=[some_id],
        append_embeddings=extra,
        min_recall=0.99,
        n_queries=5,
        k=5,
        n_probe=5,
        shortlist_factor=1000,
    )
    assert stats["promoted"] is True
    assert stats["n_deleted"] == 1
    assert stats["n_appended"] == 3
    live = current_artifact_dir(spark, out, "index")
    assert live.endswith(f"index.v{stats['version']}")
    _, _, after = load_ann_index(spark, out)
    ids = {r["vec_id"] for r in after.select("vec_id").collect()}
    assert some_id not in ids
    assert {500_000 + r["vec_id"] for r in first3.collect()} <= ids
    # one file per cell (the compaction half of the pass)
    assert stats["files_after"] == after.select("cell_id").distinct().count()


def test_maintain_accepts_dataframe_delete_set(spark, built):
    """VERDICT r7 #5: large delete sets as a DataFrame — the anti-join
    path — with gated-promotion behavior unchanged from the list form."""
    out, emb = built
    _, _, idx = load_ann_index(spark, out)
    two = [r["vec_id"] for r in
           idx.select("vec_id").orderBy("vec_id").limit(2).collect()]
    del_df = spark.createDataFrame([(i,) for i in two], "vec_id long")
    truth = emb.join(del_df, "vec_id", "left_anti")
    stats = maintain_ann_index(
        spark,
        out,
        truth,
        delete_ids=del_df,
        min_recall=0.5,
        n_queries=5,
        k=5,
        n_probe=5,
        shortlist_factor=1000,
    )
    assert stats["promoted"] is True
    assert stats["n_deleted"] == 2
    _, _, after = load_ann_index(spark, out)
    ids = {r["vec_id"] for r in after.select("vec_id").collect()}
    assert not (ids & set(two))


def test_nano_magnitude_bucketing_is_exact(spark):
    """r6 ADVICE (low): the skew twin's bucket division must be exact
    integer arithmetic — double division misbuckets above 2^53 (unix
    nanos ≈ 1.7e18 round to multiples of 256), splitting segments at
    wrong boundaries. Pin skew == plain on nano-magnitude intervals
    whose starts straddle a bucket boundary by ±1 nanosecond."""
    from bp_datawarehouse_ordersfact_spark.operators.temporal import (
        coalesce_intervals,
        coalesce_intervals_skew,
    )

    base = 1_700_000_000_000_000_000  # unix nanos, far above 2^53
    span = 1_000
    rows = []
    iid = 0
    for k in ("a", "b"):
        for off in (-1, 0, 1, span - 1, span, span + 1, 7 * span + 3):
            rows.append((k, base + off, base + off + 2, iid))
            iid += 1
        # one long interval spanning several buckets
        rows.append((k, base - span, base + 3 * span + 1, iid))
        iid += 1
    df = spark.createDataFrame(rows, "k string, s long, e long, iid long")
    plain = sorted(
        map(tuple, coalesce_intervals(df, "k", "s", "e", "iid").collect())
    )
    skew = sorted(
        map(
            tuple,
            coalesce_intervals_skew(df, "k", "s", "e", "iid", span).collect(),
        )
    )
    assert skew == plain


def test_maintain_residual_index_promotes_and_serves(spark, tmp_path):
    """maintain_ann_index over a RESIDUAL-encoded index: the staged
    rewrite re-encodes appends through the residual path (cache bounded,
    meta-dispatched), the gate promotes, and the served index reflects
    the delete + append."""
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        search_ann_index,
    )

    out = str(tmp_path / "res_idx")
    emb = load_table(spark, SF_DIR, "embeddings")
    build_ann_index(
        spark, emb, out, n_cells=4, m=8, ksub=8, n_iter=2, residual=True
    )
    victim = emb.orderBy("vec_id").limit(1).collect()[0]["vec_id"]
    extra = emb.orderBy(F.desc("vec_id")).limit(2).select(
        (F.col("vec_id") + 700_000).alias("vec_id"), "embedding"
    )
    stats = maintain_ann_index(
        spark,
        out,
        emb.filter(F.col("vec_id") != victim),
        delete_ids=[victim],
        append_embeddings=extra,
        min_recall=0.99,
        n_queries=4,
        k=4,
        n_probe=4,
        shortlist_factor=1000,
    )
    assert stats["promoted"] is True
    assert (stats["n_deleted"], stats["n_appended"]) == (1, 2)
    _, _, idx = load_ann_index(spark, out)
    ids = {r["vec_id"] for r in idx.select("vec_id").collect()}
    assert victim not in ids
    assert len([i for i in ids if i >= 700_000]) == 2
    # an appended vector is searchable through the residual ADC plan
    q_id = [i for i in ids if i >= 700_000][0]
    src = emb.filter(F.col("vec_id") == q_id - 700_000).collect()[0]["embedding"]
    got = {
        r["vec_id"]
        for r in search_ann_index(
            spark, out, [float(x) for x in src], k=2, n_probe=4
        ).collect()
    }
    assert q_id in got or (q_id - 700_000) in got
