"""End-to-end staged corpus build over the sf0.001 documents table.

Asserts the stage chain's semantics hold through REAL parquet staging
boundaries: monotone shrinking counts, exact-dup and near-dup survivors,
holdout decontamination, mix downsampling determinism, and a packed
chunk output whose token accounting is consistent with the surviving
docs. Also re-runs stage inputs from disk to show restartability (a
later stage reads the previous stage's parquet, not the original df).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.pipelines import build_corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("corpus-build")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_staged_corpus_build_manifest_and_semantics(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # make the dedup stage bite: append an exact duplicate and a holdout
    # contaminated doc with known ids beyond the testdata id range
    sample = docs.orderBy("doc_id").limit(1).collect()[0]
    extra = spark.createDataFrame(
        [
            Row(
                doc_id=10_000_001,
                text=sample.text,  # exact duplicate of doc 0's text
                lang=sample.lang,
                source=sample.source,
                n_chars=sample.n_chars,
            ),
            Row(
                doc_id=10_000_002,
                text="the secret benchmark sentence about quantum llamas "
                "must never appear in training data at all " * 3,
                lang="en",
                source="web",
                n_chars=400,
            ),
        ],
        docs.schema,
    )
    corpus = docs.unionByName(extra)
    holdout = spark.createDataFrame(
        [Row(text="the secret benchmark sentence about quantum llamas")]
    )

    out = str(tmp_path / "corpus")
    manifest = build_corpus(
        spark,
        corpus,
        out,
        holdout=holdout,
        min_chars=100,
        mix_ppm={"web": 500_000},  # halve 'web', keep other sources whole
    )
    st = manifest["stages"]
    names = list(st)
    assert names == ["01_gated", "02_deduped", "03_decontam", "04_mixed", "05_chunks"]

    # counts shrink monotonically through the filters
    assert st["01_gated"]["rows"] >= st["02_deduped"]["rows"]
    assert st["02_deduped"]["rows"] >= st["03_decontam"]["rows"]
    assert st["03_decontam"]["rows"] >= st["04_mixed"]["rows"]

    deduped = spark.read.parquet(st["02_deduped"]["path"])
    # the exact duplicate lost to the smaller original id
    assert deduped.filter(F.col("doc_id") == 10_000_001).count() == 0

    decontam = spark.read.parquet(st["03_decontam"]["path"])
    # the contaminated doc was removed by the holdout 5-gram join
    assert decontam.filter(F.col("doc_id") == 10_000_002).count() == 0

    mixed = spark.read.parquet(st["04_mixed"]["path"])
    web_before = decontam.filter(F.col("source") == "web").count()
    web_after = mixed.filter(F.col("source") == "web").count()
    if web_before >= 40:  # enough mass for the ppm bucket to be meaningful
        assert 0.3 * web_before <= web_after <= 0.7 * web_before
    other_before = decontam.filter(F.col("source") != "web").count()
    assert mixed.filter(F.col("source") != "web").count() == other_before

    chunks = spark.read.parquet(st["05_chunks"]["path"])
    assert st["05_chunks"]["rows"] == chunks.count() > 0
    # every surviving doc contributed at least one chunk; no phantom docs
    doc_ids_mixed = {r.doc_id for r in mixed.select("doc_id").collect()}
    doc_ids_chunks = {r.doc_id for r in chunks.select("doc_id").distinct().collect()}
    assert doc_ids_chunks <= doc_ids_mixed
    # chunk sizing: never exceeds the window, bins respect the budget at
    # the granularity of whole chunks
    mx = chunks.agg(F.max(F.size("chunk"))).collect()[0][0]
    assert mx <= 50
    bin_tot = (
        chunks.groupBy("source", "bin_id")
        .agg(F.sum(F.size("chunk")).alias("tot"))
        .agg(F.max("tot"))
        .collect()[0][0]
    )
    assert bin_tot <= 500 + 50  # budget + one chunk overshoot

    # determinism: rerunning the build reproduces identical stage counts
    manifest2 = build_corpus(
        spark,
        corpus,
        str(tmp_path / "corpus2"),
        holdout=holdout,
        min_chars=100,
        mix_ppm={"web": 500_000},
    )
    assert {k: v["rows"] for k, v in manifest2["stages"].items()} == {
        k: v["rows"] for k, v in st.items()
    }


def test_optional_sample_and_tokenizer_stages(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.operators.bpe import (
        _encode_word,
        load_merges,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "corpus")
    manifest = build_corpus(
        spark,
        docs,
        out,
        min_chars=1,
        sample_n=20,
        bpe_merges=12,
    )
    st = manifest["stages"]
    assert list(st) == [
        "01_gated",
        "02_deduped",
        "03_decontam",
        "04_mixed",
        "04b_sampled",
        "05_chunks",
        "06_tokenizer",
    ]

    sampled = spark.read.parquet(st["04b_sampled"]["path"])
    assert st["04b_sampled"]["rows"] == sampled.count()
    assert st["04b_sampled"]["rows"] == min(20, st["04_mixed"]["rows"])
    # the sample is a subset of the mixed stage; audit column dropped
    mixed_ids = {
        r.doc_id
        for r in spark.read.parquet(st["04_mixed"]["path"])
        .select("doc_id")
        .collect()
    }
    sampled_ids = {r.doc_id for r in sampled.select("doc_id").collect()}
    assert sampled_ids <= mixed_ids and "es_key" not in sampled.columns

    # chunks come only from sampled docs
    chunks = spark.read.parquet(st["05_chunks"]["path"])
    chunk_ids = {r.doc_id for r in chunks.select("doc_id").distinct().collect()}
    assert chunk_ids <= sampled_ids

    # the persisted tokenizer round-trips and is structurally valid BPE:
    # every merge operand is a base symbol (one char or the </w> marker)
    # or the product of an EARLIER merge
    merges = load_merges(spark.read.parquet(st["06_tokenizer"]["path"]))
    assert len(merges) == st["06_tokenizer"]["rows"] == 12
    buildable = {"</w>"}
    for a, b in merges:
        assert len(a) == 1 or a in buildable, (a, b)
        assert len(b) == 1 or b in buildable, (a, b)
        buildable.add(a + b)
    # and encoding with the fitted ranks compresses a corpus word: fewer
    # symbols out than chars+marker in
    ranks = {p: i for i, p in enumerate(merges)}
    a, b = merges[0]
    probe = (a + b).replace("</w>", "")
    if probe:  # a word ending exactly where the first merge applies
        assert len(_encode_word(probe, ranks)) < len(probe) + 1


def test_optional_tar_shard_stage(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.sources.files import read_tar_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "corpus")
    manifest = build_corpus(spark, docs, out, min_chars=1, tar_shard_rows=50)
    st = manifest["stages"]
    assert "05b_shards" in st
    assert st["05b_shards"]["rows"] == st["05_chunks"]["rows"]
    assert st["05b_shards"]["files"] >= 1
    # round trip: every chunk's text payload comes back intact
    back = read_tar_shards(spark, st["05b_shards"]["path"])
    assert back.count() == st["05_chunks"]["rows"]
    chunks = spark.read.parquet(st["05_chunks"]["path"])
    one = chunks.orderBy("doc_id", "chunk_idx").limit(1).collect()[0]
    key = f"{one['doc_id']}-{one['chunk_idx']}"
    payload = back.filter(back["key"] == key).collect()[0]["payload"]
    assert bytes(payload).decode() == " ".join(one["chunk"])


def test_tar_shard_stage_rerun_clears_stale_shards(spark, tmp_path):
    import pathlib

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "corpus")
    m1 = build_corpus(spark, docs, out, min_chars=1, tar_shard_rows=10)
    n_first = len(list(pathlib.Path(m1["stages"]["05b_shards"]["path"]).iterdir()))
    # rerun into the SAME out_dir with much bigger shards -> fewer files;
    # stale small shards from the first run must be gone
    m2 = build_corpus(spark, docs, out, min_chars=1, tar_shard_rows=10_000)
    files = list(pathlib.Path(m2["stages"]["05b_shards"]["path"]).iterdir())
    assert len(files) == m2["stages"]["05b_shards"]["files"] < n_first


def test_passage_gate_drops_boilerplate_heavy_docs(spark, tmp_path):
    """max_passage_dup_fraction: a doc that is mostly shared boilerplate
    is dropped at stage 02b; docs carrying the same boilerplate as a
    small part of unique content survive."""
    from bp_datawarehouse_ordersfact_spark.pipelines import build_corpus

    boiler = ("LICENSE NOTICE: this text is shared verbatim between many "
              "documents and keeps going for a while longer. ")
    words = ["alpha", "bravo", "carbon", "delta", "ember", "falcon"]
    rows = []
    for i, w in enumerate(words):
        # mostly unique WITH many distinct shingles: a single repeated
        # word gives the doc ONE unique set element, so MinHash (a SET
        # measure) would see boiler-dominated sets and legitimately
        # collapse the docs at stage 02 — the fixture must be unique in
        # both sequence and set terms
        body = " ".join(f"{w}{i}x{j}" for j in range(120)) + " " + boiler
        rows.append((i, "web", body, len(body)))
    heavy = boiler + "tiny unique bit seven"  # mostly boilerplate
    rows.append((7, "web", heavy, len(heavy)))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )
    m = build_corpus(
        spark,
        docs,
        str(tmp_path / "c"),
        min_chars=10,
        passage_dedup="drop",
        max_passage_dup_fraction=0.5,
    )
    assert "02b_passage" in m["stages"]
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(m["stages"]["02b_passage"]["path"]).collect()
    }
    assert 7 not in kept
    assert kept >= set(range(6))


def test_passage_cut_mode_trims_and_regates(spark, tmp_path):
    """passage_dedup='cut': the corpus keeps exactly ONE copy of the
    boilerplate — the keeper doc retains it, every other host is
    trimmed (n_chars recomputed), and a doc that was nothing but
    boilerplate shrinks below min_chars and is re-gated out."""
    from bp_datawarehouse_ordersfact_spark.pipelines import build_corpus

    boiler = ("LICENSE NOTICE: this text is shared verbatim between many "
              "documents and keeps going for a while longer. ")
    words = ["alpha", "bravo", "carbon", "delta", "ember", "falcon"]
    rows = []
    for i, w in enumerate(words):
        body = " ".join(f"{w}{i}x{j}" for j in range(120)) + " " + boiler
        rows.append((i, "web", body, len(body)))
    heavy = boiler + "tiny bit"
    rows.append((7, "web", heavy, len(heavy)))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )
    m = build_corpus(
        spark,
        docs,
        str(tmp_path / "c"),
        min_chars=40,
        passage_dedup="cut",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(m["stages"]["02b_passage"]["path"]).collect()
    }
    core = boiler[20:-20]
    # keeper (smallest id) retains the boilerplate; all other survivors
    # are trimmed
    assert core in out[0]
    for i in range(1, 6):
        assert i in out and core not in out[i]
    # the boilerplate-only doc shrank below min_chars and was re-gated
    assert 7 not in out
    # schema intact for downstream stages
    df = spark.read.parquet(m["stages"]["02b_passage"]["path"])
    assert {"doc_id", "source", "text", "n_chars"} <= set(df.columns)


def test_encoding_stage_unifies_spellings_before_dedup(spark, tmp_path):
    """encoding_normalize='exact' (stage 00): two docs that are the SAME
    text in different physical spellings (one mojibake'd) become
    byte-identical — equal md5s — at the hygiene stage, so the EXACT
    dedup tier collapses them; the staged parquet carries the repaired
    text with n_chars recomputed. (The near-dup tier can't be the
    control here: ``tokens`` strips non-alnum, so token shingles ignore
    spelling differences by construction.)"""
    from bp_datawarehouse_ordersfact_spark.pipelines import build_corpus

    clean = ("café résumé naïve déjà señor ça gâteau crème brûlée "
             "fiancée über pâté niño jalapeño cliché entrée façade")
    moji = clean.encode("utf-8").decode("cp1252")  # same text, mojibake'd
    rows = [
        (1, "web", clean, len(clean)),
        (2, "web", moji, len(moji)),
        (3, "web", "wholly different text " + " ".join(f"w{i}" for i in range(40)),
         200),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )
    # raw spellings hash apart — the stage is what creates the equality
    raw_md5 = {r.doc_id: r.h for r in
               docs.select("doc_id", F.md5("text").alias("h")).collect()}
    assert raw_md5[1] != raw_md5[2]

    m1 = build_corpus(
        spark, docs, str(tmp_path / "enc"), min_chars=10,
        encoding_normalize="exact",
    )
    names = list(m1["stages"])
    assert names[0] == "00_encoding"
    assert m1["stages"]["00_encoding"]["rows"] == 3
    staged = spark.read.parquet(m1["stages"]["00_encoding"]["path"])
    staged_rows = {r.doc_id: r for r in staged.collect()}
    # doc 2 repaired to doc 1's exact bytes; n_chars recomputed
    assert staged_rows[2].text == clean
    assert staged_rows[2].n_chars == len(clean) < len(moji)
    assert staged_rows[1].text == staged_rows[2].text

    # the twin collapses (exact tier: equal md5, smaller id wins)
    assert m1["stages"]["02_deduped"]["rows"] == 2
    kept = {
        r.doc_id
        for r in spark.read.parquet(m1["stages"]["02_deduped"]["path"]).collect()
    }
    assert kept == {1, 3}

    with pytest.raises(ValueError, match="encoding_normalize"):
        build_corpus(spark, docs, str(tmp_path / "bad"),
                     encoding_normalize="nope")


def test_semantic_decontam_stage_catches_paraphrased_leak(spark, tmp_path):
    """Stage 03b: a doc whose TEXT shares no 5-gram with the holdout
    (so stage 03 keeps it) but whose EMBEDDING is a scaled copy of a
    holdout embedding (cosine 1.0) is dropped by the semantic gate;
    everything else survives. Missing doc_embeddings raises."""
    from bp_datawarehouse_ordersfact_spark.pipelines import build_corpus

    mk = lambda i: " ".join(f"w{i}x{j}" for j in range(60))  # noqa: E731
    docs = spark.createDataFrame(
        [(i, "web", mk(i), 300) for i in range(4)],
        "doc_id long, source string, text string, n_chars long",
    )
    # deterministic orthogonal-ish embeddings; doc 2's embedding is the
    # first holdout embedding scaled by 2 (cosine exactly 1.0)
    base = [[1.0 if j == i else 0.1 for j in range(8)] for i in range(4)]
    hold_vec = [x * 2.0 for x in base[2]]
    doc_emb = spark.createDataFrame(
        [(i, base[i]) for i in range(4)],
        "doc_id long, embedding array<double>",
    )
    hold_emb = spark.createDataFrame(
        [(9000, hold_vec)], "doc_id long, embedding array<double>"
    )
    # text holdout shares no 5-gram with any doc
    holdout = spark.createDataFrame(
        [("completely unrelated benchmark sentence with its own words",)],
        "text string",
    )

    m = build_corpus(
        spark,
        docs,
        str(tmp_path / "sem"),
        holdout=holdout,
        holdout_embeddings=hold_emb,
        doc_embeddings=doc_emb,
        semantic_threshold=0.95,
        min_chars=10,
    )
    st = m["stages"]
    assert st["03_decontam"]["rows"] == 4   # 5-gram gate sees nothing
    assert st["03b_semantic"]["rows"] == 3  # the paraphrase leak is gone
    kept = {
        r.doc_id
        for r in spark.read.parquet(st["03b_semantic"]["path"]).collect()
    }
    assert kept == {0, 1, 3}

    with pytest.raises(ValueError, match="doc_embeddings"):
        build_corpus(
            spark, docs, str(tmp_path / "bad"),
            holdout_embeddings=hold_emb, min_chars=10,
        )


def test_quality_pacing_stage(spark, tmp_path):
    """Stage 04a: with keep_ppm=[0, 1_000_000] and an explicit boundary,
    every doc scoring at-or-below the edge is dropped and every doc
    above survives; unscored docs are dropped by the operator's NULL
    rule; missing quality_scores raises."""
    from bp_datawarehouse_ordersfact_spark.pipelines import build_corpus

    mk = lambda i: " ".join(f"w{i}x{j}" for j in range(60))  # noqa: E731
    docs = spark.createDataFrame(
        [(i, "web", mk(i), 300) for i in range(10)],
        "doc_id long, source string, text string, n_chars long",
    )
    scores = spark.createDataFrame(
        # doc 9 has no score row at all; doc 8's score is NULL
        [(i, float(i)) for i in range(8)] + [(8, None)],
        "doc_id long, score double",
    )
    m = build_corpus(
        spark,
        docs,
        str(tmp_path / "q"),
        min_chars=10,
        quality_scores=scores,
        quality_keep_ppm=[0, 1_000_000],
        quality_boundaries=[3.5],
    )
    st = m["stages"]
    assert st["04_mixed"]["rows"] == 10
    assert st["04a_quality"]["rows"] == 4  # scores 4..7 survive
    kept = {
        r.doc_id
        for r in spark.read.parquet(st["04a_quality"]["path"]).collect()
    }
    assert kept == {4, 5, 6, 7}
    # the staged frame keeps the docs schema (score columns dropped)
    cols = spark.read.parquet(st["04a_quality"]["path"]).columns
    assert "score" not in cols and "quality_bucket" not in cols
    # downstream chunks come only from the paced survivors
    chunk_ids = {
        r.doc_id
        for r in spark.read.parquet(st["05_chunks"]["path"])
        .select("doc_id").distinct().collect()
    }
    assert chunk_ids <= kept

    with pytest.raises(ValueError, match="quality_scores"):
        build_corpus(
            spark, docs, str(tmp_path / "bad"),
            quality_keep_ppm=[1_000_000], min_chars=10,
        )


def test_shard_shuffle_seed_sets_training_order(spark, tmp_path):
    """05b with shard_shuffle_seed: shard contents follow the
    deterministic global shuffle — reruns with the same seed are
    byte-identical, a different epoch seed re-orders the same chunks."""
    import hashlib
    import pathlib

    def _tar_bytes(shard_dir):
        return {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in sorted(pathlib.Path(shard_dir).iterdir())
        }

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    m1 = build_corpus(
        spark,
        docs,
        str(tmp_path / "c1"),
        min_chars=1,
        tar_shard_rows=50,
        shard_shuffle_seed="ep0",
    )
    m2 = build_corpus(
        spark,
        docs,
        str(tmp_path / "c2"),
        min_chars=1,
        tar_shard_rows=50,
        shard_shuffle_seed="ep0",
    )
    m3 = build_corpus(
        spark,
        docs,
        str(tmp_path / "c3"),
        min_chars=1,
        tar_shard_rows=50,
        shard_shuffle_seed="ep1",
    )
    s1 = m1["stages"]["05b_shards"]
    s2 = m2["stages"]["05b_shards"]
    s3 = m3["stages"]["05b_shards"]
    assert s1["rows"] == s2["rows"] == s3["rows"] == m1["stages"]["05_chunks"]["rows"]
    h1, h2, h3 = (_tar_bytes(s["path"]) for s in (s1, s2, s3))
    assert h1 == h2  # same seed -> byte-identical delivery
    assert h1 != h3  # new epoch seed -> different order/membership
    # and the shuffled delivery still round-trips every chunk
    from bp_datawarehouse_ordersfact_spark.sources.files import read_tar_shards

    back = read_tar_shards(spark, s1["path"])
    assert back.count() == s1["rows"]
    assert back.select("key").distinct().count() == s1["rows"]


def test_incremental_corpus_build_daily_delta(spark, tmp_path):
    """The daily-delta job: increment-only cost, corpus seen only via
    the signature store; survivors admitted + snapshot-committed."""
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        build_corpus_increment,
        build_dedup_store,
        dedup_against_store,
    )
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import (
        build_corpus_increment as _same,  # import path sanity
    )
    from bp_datawarehouse_ordersfact_spark.sources.versioned import (
        read_snapshot,
    )

    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .limit(20)
    )
    store_dir = str(tmp_path / "store")
    corpus_dir = str(tmp_path / "corpus")
    build_dedup_store(spark, base, store_dir)
    from bp_datawarehouse_ordersfact_spark.sources.versioned import (
        write_snapshot,
    )

    assert write_snapshot(base, corpus_dir, label="day0") == 0

    rows = base.orderBy("doc_id").collect()
    t0 = rows[0]["text"]
    near = rows[1]["text"].replace(rows[1]["text"].split()[0], "zzz", 1)
    fresh_a = "the quick brown fox jumps over a lazy dog " * 8
    fresh_b = "entirely new content about spark incremental corpora " * 8
    leaky = fresh_a + " secret holdout marker gram alpha beta gamma delta"
    inc = spark.createDataFrame(
        [
            (1001, t0),          # exact copy of a stored doc -> i03 drop
            (1002, near),        # near-dup of a stored doc   -> i03 drop
            (1003, fresh_a),     # intra-increment exact pair:
            (1004, fresh_a),     #   keep-min keeps 1003 at i02
            (1005, leaky),       # holdout 5-gram overlap     -> i04 drop
            (1006, fresh_b),     # clean survivor
        ],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    holdout = spark.createDataFrame(
        [("secret holdout marker gram alpha beta gamma delta",)],
        "text string",
    )

    m = build_corpus_increment(
        spark,
        inc,
        str(tmp_path / "delta"),
        store_dir,
        corpus_dir,
        holdout=holdout,
        min_chars=10,
        snapshot_label="day1",
    )
    st = m["stages"]
    assert st["i01_gated"]["rows"] == 6
    assert st["i02_dedup"]["rows"] == 5          # 1004 folded into 1003
    assert st["i03_store"]["rows"] == 3          # 1001, 1002 matched store
    assert st["i04_decontam"]["rows"] == 2       # 1005 leaked
    survivors = {1003, 1006}
    assert m["admitted"] == 2
    assert m["snapshot_version"] == 1
    snap = read_snapshot(spark, corpus_dir, version=1)
    assert {r.doc_id for r in snap.select("doc_id").collect()} == survivors
    # day-0 snapshot still readable (time travel intact)
    assert read_snapshot(spark, corpus_dir, version=0).count() == 20
    # the admitted signatures are live: re-probing a survivor's copy
    # against the store must now hit at jaccard 1.0
    reprobe = spark.createDataFrame(
        [(9001, fresh_b)], "doc_id long, text string"
    )
    hits = dedup_against_store(spark, reprobe, store_dir).collect()
    assert any(r["dup_of"] == 1006 and r["jaccard"] == 1.0 for r in hits)


def test_incremental_quality_pacing_requires_explicit_boundaries(
    spark, tmp_path
):
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        build_corpus_increment,
        build_dedup_store,
    )

    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .limit(5)
    )
    store_dir = str(tmp_path / "store")
    build_dedup_store(spark, base, store_dir)
    inc = spark.createDataFrame(
        [(2001, "completely novel increment text " * 10)],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    scores = spark.createDataFrame([(2001, 0.9)], "doc_id long, score double")
    with pytest.raises(ValueError, match="EXPLICIT"):
        build_corpus_increment(
            spark,
            inc,
            str(tmp_path / "d1"),
            store_dir,
            str(tmp_path / "c1"),
            quality_scores=scores,
            quality_keep_ppm=[0, 1_000_000],
            min_chars=10,
        )
    m = build_corpus_increment(
        spark,
        inc,
        str(tmp_path / "d2"),
        store_dir,
        str(tmp_path / "c2"),
        quality_scores=scores,
        quality_keep_ppm=[0, 1_000_000],
        quality_boundaries=[0.5],
        min_chars=10,
    )
    assert m["stages"]["i05_quality"]["rows"] == 1  # 0.9 > 0.5 -> top bucket


def test_incremental_snapshot_retention(spark, tmp_path):
    """Two daily increments with retain_snapshots=2: the day-0 base
    version is tombstoned, the two newest stay readable."""
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        build_corpus_increment,
        build_dedup_store,
    )
    from bp_datawarehouse_ordersfact_spark.sources.versioned import (
        list_snapshots,
        read_snapshot,
        write_snapshot,
    )

    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .limit(5)
    )
    store_dir = str(tmp_path / "store")
    corpus_dir = str(tmp_path / "corpus")
    build_dedup_store(spark, base, store_dir)
    write_snapshot(base, corpus_dir, label="day0")

    for day, doc_id in ((1, 3001), (2, 3002)):
        m = build_corpus_increment(
            spark,
            spark.createDataFrame(
                [(doc_id, f"novel day {day} text that nobody wrote before " * 6)],
                "doc_id long, text string",
            ).withColumn("n_chars", F.length("text")),
            str(tmp_path / f"delta{day}"),
            store_dir,
            corpus_dir,
            min_chars=10,
            retain_snapshots=2,
        )
    assert m["snapshot_version"] == 2
    assert m["expired_snapshots"] == [0]
    alive = [r["version"] for r in list_snapshots(spark, corpus_dir).collect()]
    assert alive == [1, 2]
    assert read_snapshot(spark, corpus_dir, version=2).count() == 1
    with pytest.raises(ValueError):
        read_snapshot(spark, corpus_dir, version=0)


def test_incremental_embedding_dedup_tier(spark, tmp_path):
    """A paraphrase-grade dup (new text, same embedding) passes the
    MinHash gate but dies at i03b; survivors' vectors are admitted so
    the NEXT increment's re-probe finds them."""
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        build_corpus_increment,
        build_dedup_store,
        build_embedding_dedup_store,
        embedding_dedup_against_store,
    )

    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .limit(4)
    )
    base_ids = [r.doc_id for r in base.select("doc_id").collect()]

    def vec(seedling):
        return [float(seedling == i) for i in range(8)]

    base_emb = spark.createDataFrame(
        [(d, vec(i % 8)) for i, d in enumerate(base_ids)],
        "doc_id long, embedding array<float>",
    )
    store = str(tmp_path / "sig")
    emb_store = str(tmp_path / "emb")
    corpus = str(tmp_path / "corpus")
    build_dedup_store(spark, base, store)
    build_embedding_dedup_store(
        spark, base_emb, emb_store, id_col="doc_id", bands=4, bits_per_band=8
    )
    from bp_datawarehouse_ordersfact_spark.sources.versioned import (
        write_snapshot,
    )

    write_snapshot(base, corpus, label="day0")

    inc = spark.createDataFrame(
        [
            (4001, "completely rewritten paraphrase sharing zero shingles " * 5),
            (4002, "an honestly new document with its own embedding " * 5),
        ],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    inc_emb = spark.createDataFrame(
        [(4001, vec(0)), (4002, [0.5] * 8)],  # 4001 == base doc 0's vector
        "doc_id long, embedding array<float>",
    )
    m = build_corpus_increment(
        spark,
        inc,
        str(tmp_path / "delta"),
        store,
        corpus,
        doc_embeddings=inc_emb,
        embedding_store_dir=emb_store,
        min_chars=10,
    )
    st = m["stages"]
    assert st["i03_store"]["rows"] == 2       # MinHash gate blind to both
    assert st["i03b_embedding"]["rows"] == 1  # 4001 caught at cosine 1.0
    assert m["admitted"] == 1
    assert m["admitted_embeddings"] == 1
    reprobe = spark.createDataFrame(
        [(9002, [0.5] * 8)], "doc_id long, embedding array<float>"
    )
    hits = embedding_dedup_against_store(
        spark, reprobe, emb_store, id_col="doc_id"
    ).collect()
    assert any(r["dup_of"] == 4002 and r["cosine"] == 1.0 for r in hits)


def test_line_hygiene_stage_removes_boilerplate_before_dedup(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import build_corpus

    footer = "Copyright Example Site Inc all rights reserved worldwide."
    body = [
        "This article discusses an entirely original topic in depth. " * 4,
        "A second piece of writing about something else substantive. " * 4,
        "Third distinct document body text with plenty of substance. " * 4,
    ]
    docs = spark.createDataFrame(
        [
            # three docs, same footer, one also repeats a line internally
            Row(doc_id=1, text=f"{body[0]}\n{footer}", lang="en",
                source="web", n_chars=0),
            Row(doc_id=2, text=f"{body[1]}\n{footer}", lang="en",
                source="web", n_chars=0),
            Row(doc_id=3,
                text=f"{body[2]}\n{body[2]}\n{footer}", lang="en",
                source="web", n_chars=0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text"))

    manifest = build_corpus(
        spark,
        docs,
        str(tmp_path / "corpus"),
        line_dedup=True,
        line_boilerplate_min_docs=3,
        min_chars=50,
        chunk_tokens=30,
        chunk_stride=30,
        pack_budget=100,
    )
    assert "00b_lines" in manifest["stages"]
    assert manifest["stages"]["00b_lines"]["rows"] == 3
    staged = spark.read.parquet(manifest["stages"]["00b_lines"]["path"])
    texts = {r["doc_id"]: r["text"] for r in staged.collect()}
    for i in (1, 2, 3):
        assert footer not in texts[i]  # cross-doc boilerplate removed
    assert texts[3] == body[2]  # internal repeat deduped
    # n_chars recomputed from cleaned text
    assert all(
        r["n_chars"] == len(texts[r["doc_id"]]) for r in staged.collect()
    )


def test_host_cap_stage(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import build_corpus

    def mk(i):
        return (
            f"distinct document body number {i} with enough words to pass "
            "gates and filters easily. " * 3 + f"unique tail {i}"
        )

    rows = [
        Row(doc_id=i, text=mk(i), lang="en", source="hot.example.com", n_chars=0)
        for i in range(8)
    ] + [
        Row(doc_id=100, text=mk(100), lang="en", source="cold.org", n_chars=0),
        Row(doc_id=200, text=mk(200), lang="en", source="blocked.net", n_chars=0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).withColumn("n_chars", F.length("text"))

    manifest = build_corpus(
        spark,
        docs,
        str(tmp_path / "corpus"),
        host_col="source",
        max_docs_per_host=3,
        host_blocklist=["blocked.net"],
        min_chars=50,
        near_dup_threshold=0.9,
        chunk_tokens=30,
        chunk_stride=30,
        pack_budget=100,
    )
    assert manifest["stages"]["01b_hostcap"]["rows"] == 4  # 3 hot + 1 cold
    staged = spark.read.parquet(manifest["stages"]["01b_hostcap"]["path"])
    by_host = {
        r["source"]: r["n"]
        for r in staged.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_host == {"hot.example.com": 3, "cold.org": 1}


def test_host_cap_requires_host_col(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import build_corpus

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="x " * 60, lang="en", source="a", n_chars=120)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(ValueError, match="host_col"):
        build_corpus(
            spark, docs, str(tmp_path / "c"), max_docs_per_host=2
        )


def test_url_dedup_stage_collapses_refetched_spellings(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import build_corpus

    body = "a perfectly ordinary document body with plenty of words here. " * 3
    docs = spark.createDataFrame(
        [
            (1, body + "one", "HTTPS://Site.com/p?utm_x=1&a=1"),
            (2, body + "one", "https://www.site.com/p/?a=1#f"),  # same page
            (3, body + "two", "https://site.com/q?a=1"),          # different page
        ],
        "doc_id long, text string, url string",
    ).withColumn("n_chars", F.length("text")).withColumn("source", F.lit("web"))

    manifest = build_corpus(
        spark,
        docs,
        str(tmp_path / "corpus"),
        url_dedup_col="url",
        min_chars=50,
        chunk_tokens=30,
        chunk_stride=30,
        pack_budget=100,
    )
    assert manifest["stages"]["00c_urldedup"]["rows"] == 2
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(
            manifest["stages"]["00c_urldedup"]["path"]
        ).collect()
    }
    assert kept == {1, 3}


def test_paragraph_chunk_mode(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import build_corpus

    paras = [
        "first paragraph with exactly six words.",
        "second paragraph also has six words.",
        "third one is short.",
    ]
    docs = spark.createDataFrame(
        [(1, "\n\n".join(paras), "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text"))

    manifest = build_corpus(
        spark,
        docs,
        str(tmp_path / "corpus"),
        min_chars=50,
        chunk_mode="paragraph",
        chunk_tokens=10,
        pack_budget=100,
    )
    chunks = (
        spark.read.parquet(manifest["stages"]["05_chunks"]["path"])
        .orderBy("chunk_idx")
        .collect()
    )
    # greedy packing at budget 10: para1 (6) alone (6+6>10), para2+para3
    # (6+4=10) together — boundaries respected, nothing torn
    assert [r["chunk_tokens"] for r in chunks] == [6, 10]
    # chunk arrays use the SAME token rule as window mode (Tx.tokens:
    # lowercased alnum) so 05_chunks has one vocabulary across modes
    def toks(t):
        import re
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
    assert chunks[0]["chunk"] == toks(paras[0])
    assert chunks[1]["chunk"] == toks(paras[1] + " " + paras[2])

    with pytest.raises(ValueError, match="chunk_mode"):
        build_corpus(
            spark, docs, str(tmp_path / "c2"), min_chars=50, chunk_mode="bogus"
        )


def test_incremental_hygiene_and_blocklist_gates(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.pipelines import build_dedup_store
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import (
        build_corpus_increment,
    )

    import random

    def doc(i, extra=""):
        rng = random.Random(i)
        words = " ".join(
            rng.choice(
                ["apple", "river", "stone", "cloud", "maple", "ember",
                 "harbor", "copper", "violet", "meadow", "falcon", "cinder"]
            )
            + str(rng.randint(0, 999))
            for _ in range(30)
        )
        return f"document {i}: {words}." + extra

    corpus = spark.createDataFrame(
        [(i, doc(i), "seed.org") for i in range(3)],
        "doc_id long, text string, host string",
    )
    store = str(tmp_path / "store")
    build_dedup_store(spark, corpus.select("doc_id", "text"), store)

    inc = spark.createDataFrame(
        [
            # duplicated internal line -> line_dedup trims it
            (100, doc(100, "\nnav line\nnav line"), "fine.com",
             "https://fine.com/a?utm_x=1"),
            # same canonical URL as 100 -> URL dedup keeps min id... use
            # distinct id 101 with the SAME canonical url
            (101, doc(101), "fine.com", "https://www.fine.com/a/"),
            (102, doc(102), "blocked.net", "https://blocked.net/p"),
            (103, doc(103), "fine.com", "https://fine.com/b"),
        ],
        "doc_id long, text string, host string, url string",
    ).withColumn("n_chars", F.length("text"))
    m = build_corpus_increment(
        spark,
        inc,
        str(tmp_path / "inc"),
        store,
        str(tmp_path / "corpus"),
        min_chars=50,
        line_dedup=True,
        url_dedup_col="url",
        host_blocklist=["blocked.net"],
        host_col="host",
    )
    st = m["stages"]
    assert st["i00b_lines"]["rows"] == 4
    lines_text = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(st["i00b_lines"]["path"]).collect()
    }
    assert lines_text[100].count("nav line") == 1
    assert st["i00c_urldedup"]["rows"] == 3  # 101 lost to 100's canonical URL
    assert st["i01b_hostblock"]["rows"] == 2  # 102 blocked
    final_ids = {
        r["doc_id"]
        for r in spark.read.parquet(st["i05_admitted"]["path"]).collect()
    } if "i05_admitted" in st else None
    # survivors present in the committed snapshot
    from bp_datawarehouse_ordersfact_spark.sources.versioned import read_snapshot

    snap = read_snapshot(spark, str(tmp_path / "corpus"))
    assert {r["doc_id"] for r in snap.collect()} == {100, 103}

    with pytest.raises(ValueError, match="host_col"):
        build_corpus_increment(
            spark, inc, str(tmp_path / "inc2"), store,
            str(tmp_path / "corpus2"), host_blocklist=["x.com"],
        )


def test_dedup_keep_score_col_keeps_best_cluster_member(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import build_corpus

    base = (
        "shared near duplicate content with many overlapping words "
        "repeated across the whole cluster of documents here. " * 3
    )
    docs = spark.createDataFrame(
        [
            # one near-dup cluster: 1, 2, 3 (3 has the best score)
            (1, base + "tail one", "web", 0.2),
            (2, base + "tail two", "web", 0.5),
            (3, base + "tail three", "web", 0.9),
            # a standalone doc
            (4, "a completely different standalone document about other "
                "topics entirely with its own vocabulary and phrasing. " * 3,
             "web", 0.1),
        ],
        "doc_id long, text string, source string, score double",
    ).withColumn("n_chars", F.length("text")).withColumn("lang", F.lit("en"))

    m = build_corpus(
        spark,
        docs,
        str(tmp_path / "corpus"),
        min_chars=50,
        dedup_keep_score_col="score",
        chunk_tokens=30,
        chunk_stride=30,
        pack_budget=100,
    )
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(m["stages"]["02_deduped"]["path"]).collect()
    }
    assert kept == {3, 4}  # best-scoring cluster member, not min id

    # default stays min-id
    m2 = build_corpus(
        spark,
        docs,
        str(tmp_path / "corpus2"),
        min_chars=50,
        chunk_tokens=30,
        chunk_stride=30,
        pack_budget=100,
    )
    kept2 = {
        r["doc_id"]
        for r in spark.read.parquet(m2["stages"]["02_deduped"]["path"]).collect()
    }
    assert kept2 == {1, 4}


def test_html_extraction_stage(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import build_corpus

    body = (
        "<html><head><title>T</title><script>var hidden = 1;</script></head>"
        "<body><p>A real paragraph of visible words that clears the length "
        "gate comfortably with room to spare.</p><p>Second &amp; final "
        "paragraph of equally visible words for the corpus build.</p></body>"
        "</html>"
    )
    docs = spark.createDataFrame(
        [(1, body, "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text"))

    m = build_corpus(
        spark,
        docs,
        str(tmp_path / "corpus"),
        extract_html=True,
        min_chars=50,
        chunk_tokens=30,
        chunk_stride=30,
        pack_budget=100,
    )
    staged = spark.read.parquet(m["stages"]["00a_html"]["path"]).first()
    assert "<p>" not in staged["text"] and "hidden" not in staged["text"]
    assert "Second & final" in staged["text"]
    assert staged["n_chars"] == len(staged["text"])

    with pytest.raises(ValueError, match="extract_html"):
        build_corpus(
            spark, docs, str(tmp_path / "c2"), extract_html="bogus", min_chars=50
        )


def test_cluster_keepers_string_ids(spark):
    """Review finding: the score tie-break negated the id, which threw
    CAST_INVALID_INPUT for string doc ids under ANSI."""
    from pyspark.sql import Row

    from bp_datawarehouse_ordersfact_spark.pipelines.corpus_build import (
        _cluster_keepers,
    )

    comps = spark.createDataFrame(
        [Row(id="docB", component="c1"), Row(id="docA", component="c1"),
         Row(id="docC", component="c2")],
    )
    docs = spark.createDataFrame(
        [Row(doc_id="docA", score=0.5), Row(doc_id="docB", score=0.5),
         Row(doc_id="docC", score=0.1)],
    )
    kept = sorted(
        r["doc_id"] for r in _cluster_keepers(comps, docs, "score").collect()
    )
    assert kept == ["docA", "docC"]  # tie in c1 -> smallest id
