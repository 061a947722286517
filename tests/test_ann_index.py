"""Persisted ANN index lifecycle over the sf0.001 embeddings table:
build → reload → search must reproduce the in-memory operators exactly,
the cell filter must prune partitions on the on-disk layout, and the
exact-rerank stage must return true cosine order on its shortlist.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.core.io import load_table
from bp_datawarehouse_ordersfact_spark.pipelines import (
    build_ann_index,
    load_ann_index,
    search_ann_index,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("ann-index")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann") / "index")
    emb = load_table(spark, SF_DIR, "embeddings")
    manifest = build_ann_index(
        spark, emb, out, n_cells=6, m=8, ksub=8, n_iter=2
    )
    return out, emb, manifest


def test_manifest_and_artifacts(spark, built):
    out, emb, manifest = built
    n = emb.count()
    assert manifest["n_vectors"] == n
    assert manifest["n_cells"] <= 6
    cents, books, index = load_ann_index(spark, out)
    assert set(index.columns) == {"vec_id", "cell_id", "codes"}
    # every vector encoded, codes are m ints
    assert index.count() == n
    assert len(index.limit(1).collect()[0]["codes"]) == 8
    # codebooks cover 8 subspaces
    assert books.select("sub").distinct().count() == 8


def test_search_matches_in_memory_path_and_prunes(spark, built):
    from bp_datawarehouse_ordersfact_spark.operators.pq import pq_search_ivfpq

    out, emb, _ = built
    query = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    got = search_ann_index(spark, out, query, k=10, n_probe=3)
    p = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in p and "cell_id" in p
    cents, books, index = load_ann_index(spark, out)
    want = pq_search_ivfpq(index, cents, books, query, k=10, n_probe=3)
    assert [(r["vec_id"], r["adc_d2"]) for r in got.collect()] == [
        (r["vec_id"], r["adc_d2"]) for r in want.collect()
    ]


def test_rerank_returns_exact_cosine_order(spark, built):
    out, emb, _ = built
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    query = [float(x) for x in first["embedding"]]
    got = search_ann_index(
        spark, out, query, k=5, n_probe=6, rerank_with=emb
    ).collect()
    assert [r["vec_id"] for r in got][0] == first["vec_id"]  # self-hit first
    # cosine column is descending and the order matches an exact
    # recompute over the same shortlist ids
    cos = [r["cosine"] for r in got]
    assert cos == sorted(cos, reverse=True)
    assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-4)


def test_rebuild_is_deterministic(spark, built, tmp_path):
    out, emb, manifest = built
    out2 = str(tmp_path / "index2")
    manifest2 = build_ann_index(spark, emb, out2, n_cells=6, m=8, ksub=8, n_iter=2)
    assert {k: v for k, v in manifest2.items() if k != "paths"} == {
        k: v for k, v in manifest.items() if k != "paths"
    }
    a = spark.read.parquet(f"{out}/index").orderBy("vec_id").collect()
    b = spark.read.parquet(f"{out2}/index").orderBy("vec_id").collect()
    assert [(r["vec_id"], r["cell_id"], list(r["codes"])) for r in a] == [
        (r["vec_id"], r["cell_id"], list(r["codes"])) for r in b
    ]


def test_unnormalized_magnitudes_cannot_exclude_cosine_neighbors(
    spark, tmp_path
):
    """The review scenario: a vector that is a large scalar multiple of
    the query (cosine 1.0) must still top the shortlist — the index
    normalizes, so magnitude cannot push it out of the ADC top-k."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 8)).round(3)
    vecs = {i + 1: [float(x) for x in base[i]] for i in range(40)}
    query = vecs[5]
    vecs[999] = [100.0 * x for x in query]  # huge twin of the query
    df = spark.createDataFrame(
        [(vid, v) for vid, v in vecs.items()], "vec_id int, embedding array<double>"
    )
    out = str(tmp_path / "idx")
    build_ann_index(spark, df, out, n_cells=4, m=4, ksub=8, n_iter=2)
    got = search_ann_index(spark, out, query, k=3, n_probe=4, rerank_with=df)
    top = got.collect()
    ids = [r["vec_id"] for r in top]
    assert set(ids[:2]) == {5, 999}  # both unit-identical to the query
    assert top[0]["cosine"] == pytest.approx(1.0, abs=1e-4)


def test_stale_codebooks_fail_loudly(spark, built):
    from bp_datawarehouse_ordersfact_spark.operators.pq import pq_search_adc

    out, emb, _ = built
    cents, books, index = load_ann_index(spark, out)
    # retrain with FEWER codes than the index references → any lookup of
    # a now-missing code must raise, never rank as a NULL-distance "hit"
    from bp_datawarehouse_ordersfact_spark.operators.pq import pq_train

    stale_books = pq_train(emb, m=8, ksub=2, n_iter=1)
    q = [0.0] * 64
    with pytest.raises(Exception, match="absent from the codebooks"):
        pq_search_adc(index, stale_books, q, k=5).collect()


def test_residual_index_lifecycle(spark, tmp_path):
    """residual=True: meta self-describes the encoding, search picks the
    residual plan automatically, the self-hit survives, and the rerank
    returns exact cosine order."""
    emb = load_table(spark, SF_DIR, "embeddings")
    out = str(tmp_path / "residx")
    manifest = build_ann_index(
        spark, emb, out, n_cells=6, m=8, ksub=8, n_iter=2, residual=True
    )
    assert manifest["residual"] is True
    assert manifest["n_vectors"] == emb.count()
    meta = spark.read.parquet(f"{out}/meta").collect()[0]
    assert (meta["m"], meta["ksub"], meta["residual"]) == (8, 8, True)
    first = emb.orderBy("vec_id").limit(1).collect()[0]
    query = [float(x) for x in first["embedding"]]
    got = search_ann_index(
        spark, out, query, k=5, n_probe=6, rerank_with=emb
    ).collect()
    assert got[0]["vec_id"] == first["vec_id"]
    assert got[0]["cosine"] == pytest.approx(1.0, abs=1e-4)
    cos = [r["cosine"] for r in got]
    assert cos == sorted(cos, reverse=True)
    # partition pruning still applies on the residual layout
    probe = search_ann_index(spark, out, query, k=5, n_probe=2)
    p = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in p and "cell_id" in p


def test_append_without_retrain(spark, built, tmp_path):
    from bp_datawarehouse_ordersfact_spark.pipelines import append_to_ann_index

    out, emb, manifest = built
    # copy the index dir so the module-scoped fixture stays pristine
    import shutil

    out2 = str(tmp_path / "copy")
    shutil.copytree(out, out2)
    base_n = manifest["n_vectors"]
    # new batch: exact copies of two existing vectors under fresh ids —
    # their codes must equal the originals' (frozen quantizers)
    two = emb.orderBy("vec_id").limit(2).collect()
    newdf = spark.createDataFrame(
        [(900001, list(two[0]["embedding"])), (900002, list(two[1]["embedding"]))],
        "vec_id long, embedding array<double>",
    )
    n = append_to_ann_index(spark, newdf, out2)
    assert n == 2
    idx = spark.read.parquet(f"{out2}/index")
    assert idx.count() == base_n + 2
    rows = {r["vec_id"]: (r["cell_id"], list(r["codes"])) for r in idx.collect()}
    assert rows[900001] == rows[two[0]["vec_id"]]
    assert rows[900002] == rows[two[1]["vec_id"]]
    # search now surfaces the appended twin next to its original
    q = [float(x) for x in two[0]["embedding"]]
    got = [r["vec_id"] for r in search_ann_index(spark, out2, q, k=4, n_probe=6).collect()]
    assert two[0]["vec_id"] in got and 900001 in got


def test_pre_meta_index_still_searchable(spark, built, tmp_path):
    """Indexes persisted before the meta table existed must keep
    serving: missing meta/ means plain (non-residual) encoding."""
    import shutil

    out, emb, _ = built
    legacy = str(tmp_path / "legacy")
    shutil.copytree(out, legacy)
    shutil.rmtree(f"{legacy}/meta")
    q = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    got = search_ann_index(spark, legacy, q, k=5, n_probe=6).collect()
    want = search_ann_index(spark, out, q, k=5, n_probe=6).collect()
    assert [(r["vec_id"], r["adc_d2"]) for r in got] == [
        (r["vec_id"], r["adc_d2"]) for r in want
    ]


def test_batch_search_matches_single_query_loop(spark, built):
    """search_ann_index_batch must equal looping search_ann_index per
    query — ADC stage and rerank stage both — and keep the static
    probed-cell pruning on the on-disk layout."""
    from bp_datawarehouse_ordersfact_spark.pipelines import search_ann_index_batch

    out, emb, _ = built
    qrows = emb.orderBy("vec_id").limit(3).collect()
    queries = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in qrows],
        "q_id long, embedding array<float>",
    )
    batch = search_ann_index_batch(spark, out, queries, k=5, n_probe=3)
    p = batch._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in p and "cell_id" in p
    by_q: dict[int, list] = {}
    for r in sorted(batch.collect(), key=lambda r: (r["q_id"], r["rnk"])):
        by_q.setdefault(r["q_id"], []).append((r["vec_id"], r["adc_d2"]))
    for r in qrows:
        single = [
            (x["vec_id"], x["adc_d2"])
            for x in search_ann_index(
                spark, out, [float(v) for v in r["embedding"]], k=5, n_probe=3
            ).collect()
        ]
        assert by_q[r["vec_id"]] == single, r["vec_id"]

    # rerank stage: exact cosine per query, equal to the single form
    rer = search_ann_index_batch(
        spark, out, queries, k=4, n_probe=3, rerank_with=emb
    )
    by_qr: dict[int, list] = {}
    for r in sorted(rer.collect(), key=lambda r: (r["q_id"], r["rnk"])):
        by_qr.setdefault(r["q_id"], []).append((r["vec_id"], r["cosine"]))
    for r in qrows:
        single = [
            (x["vec_id"], x["cosine"])
            for x in search_ann_index(
                spark,
                out,
                [float(v) for v in r["embedding"]],
                k=4,
                n_probe=3,
                rerank_with=emb,
            ).collect()
        ]
        assert by_qr[r["vec_id"]] == single, r["vec_id"]


def test_batch_search_dispatches_residual_from_meta(spark, tmp_path):
    """A residual-encoded index must be searched with the residual batch
    plan automatically (meta dispatch), matching the single-query loop."""
    from bp_datawarehouse_ordersfact_spark.pipelines import search_ann_index_batch

    out = str(tmp_path / "res_idx")
    emb = load_table(spark, SF_DIR, "embeddings")
    build_ann_index(spark, emb, out, n_cells=4, m=8, ksub=8, n_iter=2, residual=True)
    qrows = emb.orderBy("vec_id").limit(2).collect()
    queries = spark.createDataFrame(
        [(r["vec_id"], r["embedding"]) for r in qrows],
        "q_id long, embedding array<float>",
    )
    batch = search_ann_index_batch(spark, out, queries, k=5, n_probe=2)
    by_q: dict[int, list] = {}
    for r in sorted(batch.collect(), key=lambda r: (r["q_id"], r["rnk"])):
        by_q.setdefault(r["q_id"], []).append((r["vec_id"], r["adc_d2"]))
    for r in qrows:
        single = [
            (x["vec_id"], x["adc_d2"])
            for x in search_ann_index(
                spark, out, [float(v) for v in r["embedding"]], k=5, n_probe=2
            ).collect()
        ]
        assert by_q[r["vec_id"]] == single, r["vec_id"]


def test_delete_rewrites_only_affected_cells(spark, tmp_path):
    """Deletes rewrite the hit cells' partitions, leave others' files
    byte-identical, remove emptied cell directories entirely, and keep
    search results correct (deleted ids never come back)."""
    import glob
    import os

    from bp_datawarehouse_ordersfact_spark.pipelines.ann_index import (
        delete_from_ann_index,
    )

    out = str(tmp_path / "del_idx")
    emb = load_table(spark, SF_DIR, "embeddings")
    build_ann_index(spark, emb, out, n_cells=5, m=8, ksub=8, n_iter=2)
    _, _, index = load_ann_index(spark, out)
    rows = index.select("vec_id", "cell_id").collect()
    by_cell: dict[int, list[int]] = {}
    for r in rows:
        by_cell.setdefault(r["cell_id"], []).append(r["vec_id"])
    cells = sorted(by_cell, key=lambda c: len(by_cell[c]))
    empty_me = cells[0]          # delete an ENTIRE small cell
    partial = cells[-1]          # plus 2 ids from the biggest cell
    untouched = [c for c in cells if c not in (empty_me, partial)]
    victims = by_cell[empty_me] + by_cell[partial][:2]

    files_before = {
        c: sorted(glob.glob(os.path.join(out, "index", f"cell_id={c}", "*")))
        for c in untouched
    }
    n = delete_from_ann_index(spark, victims, out)
    assert n == len(victims)
    # untouched partitions: identical file listing (not rewritten)
    for c in untouched:
        assert (
            sorted(glob.glob(os.path.join(out, "index", f"cell_id={c}", "*")))
            == files_before[c]
        )
    # emptied cell directory is gone — the dynamic-overwrite trap
    assert not os.path.exists(os.path.join(out, "index", f"cell_id={empty_me}"))
    _, _, after = load_ann_index(spark, out)
    left = {r["vec_id"] for r in after.select("vec_id").collect()}
    assert left == {r["vec_id"] for r in rows} - set(victims)
    # no-op delete returns 0 and changes nothing
    assert delete_from_ann_index(spark, [999_999_999], out) == 0
    assert delete_from_ann_index(spark, [], out) == 0
    # probing every cell must never return a deleted id
    q = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    got = {r["vec_id"] for r in search_ann_index(spark, out, q, k=20, n_probe=5).collect()}
    assert not (got & set(victims))

    # DataFrame delete set (VERDICT r7 #5): same semantics as the list
    # form, but membership runs as semi/anti joins — the large-delete
    # path that never embeds a literal IN-list in the plan
    more = by_cell[partial][2:4]
    ids_df = spark.createDataFrame([(i,) for i in more], "vec_id long")
    assert delete_from_ann_index(spark, ids_df, out) == len(more)
    _, _, after2 = load_ann_index(spark, out)
    left2 = {r["vec_id"] for r in after2.select("vec_id").collect()}
    assert left2 == left - set(more)
    # empty + miss DataFrame batches are no-ops
    assert delete_from_ann_index(
        spark, spark.createDataFrame([(999_999_999,)], "vec_id long"), out
    ) == 0
    with pytest.raises(ValueError, match="vec_id"):
        delete_from_ann_index(
            spark, spark.createDataFrame([(1,)], "wrong_col long"), out
        )


def test_compact_restores_one_file_per_cell(spark, tmp_path):
    """Appends leave one file per batch per touched cell; compaction
    rewrites to one file per cell with identical search results."""
    from bp_datawarehouse_ordersfact_spark.pipelines.ann_index import (
        append_to_ann_index,
        compact_ann_index,
    )

    out = str(tmp_path / "cmp_idx")
    emb = load_table(spark, SF_DIR, "embeddings")
    build_ann_index(spark, emb, out, n_cells=4, m=8, ksub=8, n_iter=2)
    for shift in (1, 2):  # two append batches → extra files per cell
        batch = emb.limit(20).select(
            (F.col("vec_id") + 100000 * shift).alias("vec_id"), "embedding"
        )
        append_to_ann_index(spark, batch, out)
    q = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    before = [
        (r["vec_id"], r["adc_d2"])
        for r in search_ann_index(spark, out, q, k=10, n_probe=4).collect()
    ]
    stats = compact_ann_index(spark, out)
    assert stats["files_after"] < stats["files_before"]
    _, _, index = load_ann_index(spark, out)
    n_cells = index.select("cell_id").distinct().count()
    assert stats["files_after"] == n_cells  # ONE file per cell
    assert index.count() == stats["n_rows"]
    after = [
        (r["vec_id"], r["adc_d2"])
        for r in search_ann_index(spark, out, q, k=10, n_probe=4).collect()
    ]
    assert after == before


def test_evaluate_ann_index_recall_gate(spark, built):
    """The lifecycle acceptance gate: probing ALL cells with exact
    rerank must achieve recall 1.0 (no retrieval loss possible), fewer
    probes monotonically not-higher, and the manifest carries the run
    parameters."""
    from bp_datawarehouse_ordersfact_spark.pipelines.ann_index import (
        evaluate_ann_index,
    )

    out, emb, _ = built
    # all cells probed + corpus-covering shortlist: no retrieval loss
    # possible anywhere -> recall must be exactly 1.0
    full = evaluate_ann_index(
        spark, out, emb, n_queries=8, k=5, n_probe=6, shortlist_factor=1000
    )
    assert full["recall_at_k"] == 1.0
    assert (full["n_queries"], full["k"], full["n_probe"]) == (8, 5, 6)
    # the default 4x shortlist pays PQ quantization loss (measured ~0.5
    # on these random vectors), and fewer probes can only lose more
    short = evaluate_ann_index(spark, out, emb, n_queries=8, k=5, n_probe=6)
    assert 0.0 < short["recall_at_k"] <= full["recall_at_k"]
    narrow = evaluate_ann_index(spark, out, emb, n_queries=8, k=5, n_probe=1)
    assert narrow["recall_at_k"] <= full["recall_at_k"]
    assert narrow["recall_at_k"] > 0.0


def test_mine_hard_negatives_excludes_self_and_positives(spark, built):
    from bp_datawarehouse_ordersfact_spark.pipelines.ann_index import (
        mine_hard_negatives,
    )

    out, emb, _ = built
    # two queries; query 0 has TWO positives, query 1 has one
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (7, 9)], "q_id long, pos_id long"
    )
    got = mine_hard_negatives(
        spark, out, pairs, emb, n_negatives=4, n_probe=6
    ).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["q_id"], r["rnk"])):
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == {0, 7}
    for qid, rows in by_q.items():
        assert len(rows) == 4
        assert [r["rnk"] for r in rows] == [1, 2, 3, 4]
        negs = {r["neg_id"] for r in rows}
        assert qid not in negs                      # never the query
        pos = {1, 2} if qid == 0 else {9}
        assert not (negs & pos)                     # never a positive
        # hard negatives: descending similarity order
        cos = [r["cosine"] for r in rows]
        assert cos == sorted(cos, reverse=True)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        mine_hard_negatives(
            spark, out, pairs.limit(0), emb, n_negatives=2
        )
