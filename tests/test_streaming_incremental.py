"""foreachBatch incremental-merge test: a stale archive plus a streamed
increment must converge to exactly the increment's truth on overlapping
keys (the reference's delete-insert reconciliation, run as a stream)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.streaming.jobs import run_incremental_merge_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("stream-merge")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_stream_merge_replaces_stale_archive_rows(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.core.io import load_table

    events = load_table(spark, SF_DIR, "events")
    archive_dir = str(tmp_path / "archive")

    # stale archive: every value off by +1000 (the increment must win),
    # plus an extra key range the increment doesn't touch (must survive)
    stale = events.withColumn("value", F.col("value") + 1000.0)
    stale.write.parquet(archive_dir)

    run_incremental_merge_stream(
        spark, f"{SF_DIR}/events.parquet", archive_dir, keys=["event_id"]
    )

    merged = spark.read.parquet(archive_dir)
    assert merged.count() == events.count()
    # all stale values replaced: no value retains the +1000 offset
    truth = {r.event_id: r.value for r in events.collect()}
    for r in merged.collect():
        assert r.value == pytest.approx(truth[r.event_id])


def test_transform_with_state_histogram_matches_batch(spark):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) per-user
    event-type histogram equals the batch groupBy on a bounded source.
    Skips where google.protobuf is absent (the state-server protocol
    dependency) — the job body is still the production shape."""
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_type_histogram_transform_with_state,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf not installed in this environment")

    events = "/root/testdata/sf0.001/events.parquet"
    got = run_type_histogram_transform_with_state(spark, events)
    expected = (
        spark.read.parquet(events)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_availablenow_checkpoint_processes_only_new_files(spark, tmp_path):
    """The property that makes availableNow runs INCREMENTAL: a second
    run against the same checkpoint dir processes only files that
    appeared since the first run — the streaming replacement for the
    reference's re-pull-everything window."""
    src_dir, out_dir, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.range(0, 10).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(out_dir).count() == 10

    # second batch of files lands; same checkpoint → only the delta flows
    spark.range(100, 105).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    run_once()
    out = spark.read.parquet(out_dir)
    assert out.count() == 15  # 10 original + exactly the 5 new, no re-processing
    assert out.filter("id >= 100").count() == 5


def test_normalize_ntz_preserves_utc_instants(spark):
    """TIMESTAMP_NTZ columns become session-TZ TIMESTAMP with the naive
    wall-clock reinterpreted as UTC (sessions pin UTC) — the exact
    instants DuckDB assumes for naive parquet timestamps, which is what
    keeps oracle parity across the driver generator's type drift."""
    from bp_datawarehouse_ordersfact_spark.core.io import normalize_ntz

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        df = spark.sql(
            "SELECT TIMESTAMP_NTZ '2024-03-01 12:30:45.123456' AS ts, 1 AS k"
        )
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        out = normalize_ntz(df)
        assert dict(out.dtypes) == {"ts": "timestamp", "k": "int"}
        micros = out.selectExpr("unix_micros(ts) AS m").first().m
        # 2024-03-01T12:30:45.123456Z as epoch micros
        import datetime as dt

        expected = int(
            dt.datetime(
                2024, 3, 1, 12, 30, 45, 123456, tzinfo=dt.timezone.utc
            ).timestamp()
            * 1_000_000
        )
        assert micros == expected
        # no NTZ columns → identity (same plan object, no rewrite)
        plain = df.select("k")
        assert normalize_ntz(plain) is plain
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_chunked_ewma_state_carry_matches_whole_series(spark, tmp_path):
    """Three time-ordered chunk files stream as three micro-batches; the
    per-user EWMA state carried between them must make the concatenated
    output bit-identical to pandas ewm over each user's WHOLE series —
    the bounded-memory contract documented in queries/llmops.py."""
    import pandas as pd

    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_chunked_ewma_availablenow,
    )

    rng = __import__("random").Random(7)
    rows = [
        (u, 100 * i + u, float(1000 + i), rng.uniform(-5, 5))
        for u in range(3)
        for i in range(30)
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts_i", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts_i"], unit="s")
    pdf = pdf.drop(columns=["ts_i"])

    events_dir = tmp_path / "chunks"
    events_dir.mkdir()
    # three chunk files, time-ordered: events 0-9, 10-19, 20-29 per user
    for c in range(3):
        chunk = pdf[(pdf["event_id"] // 100 >= 10 * c) & (pdf["event_id"] // 100 < 10 * (c + 1))]
        sdf = spark.createDataFrame(chunk[["user_id", "event_id", "ts", "value"]])
        sdf.coalesce(1).write.parquet(str(events_dir / f"chunk_{c}"))
    # flatten: the file stream wants files in one dir
    import glob
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    for c in range(3):
        for i, f in enumerate(sorted(glob.glob(str(events_dir / f"chunk_{c}" / "*.parquet")))):
            shutil.copy(f, flat / f"{c:02d}_{i}.parquet")

    out = run_chunked_ewma_availablenow(spark, str(flat), alpha=0.3)
    got = {(r.user_id, r.event_id): r.ewma for r in out.collect()}
    assert len(got) == 90

    for u in range(3):
        series = pdf[pdf["user_id"] == u].sort_values(["ts", "event_id"])
        expect = series["value"].ewm(alpha=0.3, adjust=False).mean().to_numpy()
        for (_, eid), e in zip(series[["user_id", "event_id"]].itertuples(index=False), expect):
            assert got[(u, eid)] == pytest.approx(e, rel=0, abs=0.0), (u, eid)


def test_cdc_scd2_stream_equals_sequential_batch_applies(spark, tmp_path):
    """Three time-ordered CDC chunk files streamed through
    run_cdc_scd2_stream must leave the Parquet dimension exactly equal to
    applying scd2_apply sequentially in batch — version history included,
    with latest-wins inside each chunk via the order column."""
    import datetime

    from bp_datawarehouse_ordersfact_spark.operators.scd import scd2_apply
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import run_cdc_scd2_stream

    d = datetime.date
    dim0 = spark.createDataFrame(
        [
            (1, "A", d(2020, 1, 1), None, 1),
            (2, "B", d(2020, 1, 1), None, 1),
        ],
        "k long, seg string, valid_from date, valid_to date, is_current int",
    )
    dim_dir = str(tmp_path / "dim")
    dim0.write.parquet(dim_dir)

    # chunk 1: k=1 changes twice (ver 2 wins), k=3 is new  @ 2021-01-01
    # chunk 2: k=2 changes                                  @ 2022-01-01
    # chunk 3: k=1 changes again                            @ 2023-01-01
    chunks = [
        [(1, "A1", d(2021, 1, 1), 1), (1, "A2", d(2021, 1, 1), 2),
         (3, "C", d(2021, 1, 1), 1)],
        [(2, "B2", d(2022, 1, 1), 1)],
        [(1, "A3", d(2023, 1, 1), 1)],
    ]
    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    import glob
    import shutil

    for i, rows in enumerate(chunks):
        cdf = spark.createDataFrame(rows, "k long, seg string, eff date, ver int")
        stage = tmp_path / f"c{i}"
        cdf.coalesce(1).write.parquet(str(stage))
        for j, f in enumerate(sorted(glob.glob(str(stage / "*.parquet")))):
            shutil.copy(f, changes_dir / f"{i:02d}_{j}.parquet")

    run_cdc_scd2_stream(
        spark, str(changes_dir), dim_dir, "k", ["seg"],
        eff_date_col="eff", order_col="ver",
    )
    got = {
        (r.k, r.seg, r.is_current, r.valid_from, r.valid_to)
        for r in spark.read.parquet(dim_dir).collect()
    }

    expect_dim = dim0
    for rows in chunks:
        cdf = spark.createDataFrame(rows, "k long, seg string, eff date, ver int")
        eff = max(r[2] for r in rows)
        expect_dim = scd2_apply(
            expect_dim, cdf.drop("eff"), "k", ["seg"], eff, order_col="ver"
        )
    expect = {
        (r.k, r.seg, r.is_current, r.valid_from, r.valid_to)
        for r in expect_dim.collect()
    }
    assert got == expect
    # sanity: k=1 carries its full version chain A -> A2 -> A3
    k1 = sorted((s, c) for (k, s, c, _, _) in got if k == 1)
    assert k1 == [("A", 0), ("A2", 0), ("A3", 1)]

    # restart idempotence: rerunning against the SAME checkpoint sees no
    # new files, applies nothing, and leaves the dimension byte-stable —
    # the crash-recovery contract of the availableNow + checkpoint pair
    run_cdc_scd2_stream(
        spark, str(changes_dir), dim_dir, "k", ["seg"],
        eff_date_col="eff", order_col="ver",
    )
    again = {
        (r.k, r.seg, r.is_current, r.valid_from, r.valid_to)
        for r in spark.read.parquet(dim_dir).collect()
    }
    assert again == expect


def test_watermark_drops_late_event_in_append_mode(spark, tmp_path):
    """Append-mode windowed aggregation with a 1-hour watermark: batch 1
    advances event time to 14:00; the watermark (13:00) takes effect at
    the END of that batch, so the 10:00 window finalizes and emits during
    batch 2 — and a late 10:15 event arriving in batch 3 must be DROPPED,
    leaving no second/updated row for the finalized window. (The one-batch
    propagation lag is real Spark semantics: a late row landing in the
    batch immediately after its window's data, before finalization, still
    merges — so the contract to pin is "dropped once finalized", driven
    here with real late data instead of asserted from the plan.)"""
    import glob
    import shutil
    import uuid

    import pandas as pd

    chunks_dir = tmp_path / "wm_chunks"
    chunks_dir.mkdir()

    def write_chunk(i, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        sdf = spark.createDataFrame(pdf)
        stage = tmp_path / f"wm_{i}"
        sdf.coalesce(1).write.parquet(str(stage))
        for j, f in enumerate(sorted(glob.glob(str(stage / "*.parquet")))):
            shutil.copy(f, chunks_dir / f"{i:02d}_{j}.parquet")

    write_chunk(0, [
        ("2024-01-01 10:05:00", "a", 1.0),
        ("2024-01-01 10:20:00", "a", 2.0),
        ("2024-01-01 14:00:00", "a", 5.0),   # advances watermark to 13:00
    ])
    write_chunk(1, [
        ("2024-01-01 14:30:00", "a", 7.0),    # watermark now in effect;
    ])                                        # 10:00 window finalizes here
    write_chunk(2, [
        ("2024-01-01 10:15:00", "a", 100.0),  # LATE: window already final
        ("2024-01-01 15:00:00", "a", 9.0),    # on time
    ])

    schema = spark.read.parquet(str(chunks_dir)).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(chunks_dir))
    )
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .select(F.col("w.start").alias("ws"), "k", "n", "total")
    )
    sink = f"wm_sink_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(sink).collect()
    by_window = {}
    for r in rows:
        by_window.setdefault(str(r.ws), []).append((r.n, r.total))

    # the 10:00 window emitted exactly once, from batch-1 data only —
    # the late 10:15/v=100 event left no trace
    assert by_window["2024-01-01 10:00:00"] == [(2, 3.0)]


def test_incremental_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """Two micro-batches: batch 2 contains a copy of a CORPUS doc and a
    copy of a BATCH-1 survivor — both must be dropped (survivors are
    admitted before the next batch), fresh docs must land in the sink,
    and the store must grow by exactly the survivor count."""
    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.pipelines import build_dedup_store
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_incremental_dedup_stream,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    store = str(tmp_path / "store")
    build_dedup_store(spark, corpus, store)

    feed = str(tmp_path / "feed")
    # file 1: one fresh doc (id 20300) + one copy of corpus doc 5
    b1 = docs.filter(F.col("doc_id") == 300).select(
        F.lit(20300).alias("doc_id"), "text"
    ).unionByName(
        docs.filter(F.col("doc_id") == 5).select(
            F.lit(20005).alias("doc_id"), "text"
        )
    )
    b1.coalesce(1).write.mode("append").parquet(feed)
    # file 2: a copy of batch-1's SURVIVOR (20300's text) + a fresh doc
    b2 = docs.filter(F.col("doc_id") == 300).select(
        F.lit(30300).alias("doc_id"), "text"
    ).unionByName(
        docs.filter(F.col("doc_id") == 301).select(
            F.lit(20301).alias("doc_id"), "text"
        )
    )
    b2.coalesce(1).write.mode("append").parquet(feed)

    sink = str(tmp_path / "clean")
    run_incremental_dedup_stream(spark, feed, store, sink, files_per_trigger=1)

    landed = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    # the corpus copy never lands; the genuinely fresh doc always does;
    # of the two copies of doc 300's text, EXACTLY ONE survives —
    # whichever micro-batch ran first (file pickup order is not
    # guaranteed), the other is caught as a cross-batch duplicate
    # because survivors are admitted before the next batch
    assert 20005 not in landed
    assert 20301 in landed
    assert len(landed & {20300, 30300}) == 1
    # store grew by exactly the survivors
    n_store = spark.read.parquet(store + "/shingles").count()
    assert n_store == corpus.count() + len(landed)


def test_incremental_dedup_stream_replay_is_idempotent(spark, tmp_path):
    """r6 ADVICE: foreachBatch is at-least-once — simulate the worst
    replay (checkpoint lost AND ledger rows lost, so every batch re-runs
    against a store that already absorbed its survivors) and pin that
    the sink contents and the store are unchanged: partition overwrite
    absorbs the re-write, own-batch matches are not re-classified as
    duplicates, and the shingle-gated admit adds nothing."""
    import shutil

    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.pipelines import build_dedup_store
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_incremental_dedup_stream,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    store = str(tmp_path / "store")
    build_dedup_store(spark, corpus, store)

    feed = str(tmp_path / "feed")
    b1 = docs.filter(F.col("doc_id") == 300).select(
        F.lit(20300).alias("doc_id"), "text"
    ).unionByName(
        docs.filter(F.col("doc_id") == 5).select(F.lit(20005).alias("doc_id"), "text")
    )
    b1.coalesce(1).write.mode("append").parquet(feed)
    b2 = docs.filter(F.col("doc_id") == 301).select(
        F.lit(20301).alias("doc_id"), "text"
    )
    b2.coalesce(1).write.mode("append").parquet(feed)

    sink = str(tmp_path / "clean")
    run_incremental_dedup_stream(spark, feed, store, sink, files_per_trigger=1)
    landed1 = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    n_store1 = spark.read.parquet(store + "/shingles").count()
    assert sorted(landed1) == [20300, 20301]

    # worst-case replay: checkpoint AND ledger gone — every batch re-runs
    shutil.rmtree(sink.rstrip("/") + "_checkpoint")
    shutil.rmtree(store + "/_processed_batches")
    run_incremental_dedup_stream(spark, feed, store, sink, files_per_trigger=1)
    landed2 = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    n_store2 = spark.read.parquet(store + "/shingles").count()
    assert landed2 == landed1          # no duplicate output rows
    assert n_store2 == n_store1        # no duplicate store admits

    # ledger-respecting replay (checkpoint lost, ledger intact): every
    # batch short-circuits — still identical
    shutil.rmtree(sink.rstrip("/") + "_checkpoint")
    run_incremental_dedup_stream(spark, feed, store, sink, files_per_trigger=1)
    assert sorted(r["doc_id"] for r in spark.read.parquet(sink).collect()) == landed1
    assert spark.read.parquet(store + "/shingles").count() == n_store1


def test_incremental_ann_ingest_stream_appends_gates_and_replays(spark, tmp_path):
    """Streaming embedding ingest into a persisted ANN index: every
    micro-batch's NEW vectors are appended with the frozen quantizers
    and become searchable; a worst-case replay (checkpoint + ledger
    lost) adds no duplicate rows; the periodic gated maintenance pass
    compacts through the commit ledger."""
    import glob
    import shutil

    from bp_datawarehouse_ordersfact_spark.core.io import load_table
    from bp_datawarehouse_ordersfact_spark.pipelines import (
        build_ann_index,
        load_ann_index,
        search_ann_index,
    )
    from bp_datawarehouse_ordersfact_spark.pipelines.artifact import (
        current_artifact_dir,
    )
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_incremental_ann_ingest_stream,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.filter(F.col("vec_id") < 300)
    index_dir = str(tmp_path / "ann")
    build_ann_index(spark, corpus, index_dir, n_cells=4, m=8, ksub=8, n_iter=2)

    feed = str(tmp_path / "emb_feed")
    emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350)).coalesce(
        1
    ).write.mode("append").parquet(feed)
    emb.filter((F.col("vec_id") >= 350) & (F.col("vec_id") < 400)).coalesce(
        1
    ).write.mode("append").parquet(feed)

    run_incremental_ann_ingest_stream(
        spark, feed, index_dir, files_per_trigger=1,
        maintain_every=2, min_recall=0.0, corpus_for_gate=emb.filter(F.col("vec_id") < 400),
    )
    _, _, index = load_ann_index(spark, index_dir)
    assert index.count() == 400
    assert {r["vec_id"] for r in index.select("vec_id").collect()} == set(range(400))
    # an appended vector is immediately searchable (self-hit at top)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 375).collect()[0]["embedding"]]
    top = search_ann_index(spark, index_dir, q, k=1, n_probe=4).collect()[0]
    assert top["vec_id"] == 375
    # the periodic maintenance promoted a compacted version via the ledger
    assert current_artifact_dir(spark, index_dir, "index").endswith(".v1")

    # worst-case replay: checkpoint AND ledger lost — every batch
    # re-runs; the index-id anti-join must admit nothing twice
    shutil.rmtree(index_dir + "/_ingest_checkpoint")
    shutil.rmtree(index_dir + "/_processed_batches")
    run_incremental_ann_ingest_stream(
        spark, feed, index_dir, files_per_trigger=1
    )
    _, _, again = load_ann_index(spark, index_dir)
    assert again.count() == 400
    assert glob.glob(index_dir + "/index.v2*") == []  # no stray versions


def test_host_cap_ingest_stream_enforces_lifetime_cap(spark, tmp_path):
    """Two micro-batches from the same hot host: batch 1 uses up most of
    the host's lifetime quota, batch 2 may only admit the remainder —
    the cap binds across batches, not per batch. A cold host passes
    untouched and the picks are the deterministic smallest-hash rule."""
    import hashlib

    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_host_cap_ingest_stream,
    )

    feed = str(tmp_path / "feed")
    b1 = spark.createDataFrame(
        [(i, "hot.example.com", f"doc {i}") for i in range(6)]
        + [(100, "cold.org", "cold doc")],
        "doc_id long, host string, text string",
    )
    b1.coalesce(1).write.mode("append").parquet(feed)
    b2 = spark.createDataFrame(
        [(10 + i, "hot.example.com", f"doc {10 + i}") for i in range(6)],
        "doc_id long, host string, text string",
    )
    b2.coalesce(1).write.mode("append").parquet(feed)

    sink = str(tmp_path / "sink")
    run_host_cap_ingest_stream(
        spark, feed, sink, host_col="host", max_docs_per_host=8,
        files_per_trigger=1,
    )
    landed = spark.read.parquet(sink)
    by_host = {
        r["host"]: r["n"]
        for r in landed.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert by_host == {"hot.example.com": 8, "cold.org": 1}

    # batch-local picks follow the smallest-h32 rule: whichever batch
    # ran second admitted exactly (8 - first_batch_admits) docs, chosen
    # by hash rank within that batch
    def h(i):
        return int(hashlib.md5(f"0:{i}".encode()).hexdigest()[:8], 16)

    # batches are identified by their content-derived ingest_key now
    # (order unspecified): the batch that ran FIRST is the one admitted
    # whole; the other was truncated to the remaining quota
    groups: dict = {}
    for r in landed.collect():
        groups.setdefault(r["ingest_key"], set()).add(r["doc_id"])
    assert len(groups) == 2
    batch_a = set(range(6))
    batch_b = set(range(10, 16))
    full = next(s for s in groups.values() if s - {100} in (batch_a, batch_b))
    part = next(s for s in groups.values() if s is not full)
    truncated_src = batch_b if full - {100} == batch_a else batch_a
    expect_second = set(sorted(truncated_src, key=lambda i: (h(i), i))[:2])
    assert part - {100} == expect_second


def test_host_cap_ingest_stream_replay_is_idempotent(spark, tmp_path):
    """Worst-case replay (checkpoint AND batch ledger lost): every batch
    re-runs against a counts ledger that already holds its delta. The
    own-batch exclusion + partition overwrites must leave the sink and
    the counts byte-identical."""
    import shutil

    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_host_cap_ingest_stream,
    )

    feed = str(tmp_path / "feed")
    for b in range(2):
        spark.createDataFrame(
            [(b * 10 + i, "hot.example.com", f"d{b * 10 + i}") for i in range(5)],
            "doc_id long, host string, text string",
        ).coalesce(1).write.mode("append").parquet(feed)

    sink = str(tmp_path / "sink")
    kwargs = dict(host_col="host", max_docs_per_host=7, files_per_trigger=1)
    run_host_cap_ingest_stream(spark, feed, sink, **kwargs)
    before = sorted(
        (r["doc_id"], r["ingest_key"])
        for r in spark.read.parquet(sink).collect()
    )
    counts_before = sorted(
        (r["__host"], r["admitted"], r["ingest_key"])
        for r in spark.read.parquet(sink + "_host_counts").collect()
    )
    assert sum(c for _, c, _ in counts_before) == 7

    # lose the checkpoint and the processed-batches ledger -> full replay
    shutil.rmtree(sink + "_checkpoint")
    shutil.rmtree(sink + "_processed_batches")
    run_host_cap_ingest_stream(spark, feed, sink, **kwargs)
    after = sorted(
        (r["doc_id"], r["ingest_key"])
        for r in spark.read.parquet(sink).collect()
    )
    counts_after = sorted(
        (r["__host"], r["admitted"], r["ingest_key"])
        for r in spark.read.parquet(sink + "_host_counts").collect()
    )
    assert after == before
    assert counts_after == counts_before


def test_sft_ingest_stream_three_way_routes_and_replays(spark, tmp_path):
    """r9 ADVICE: the streaming SFT ingest `split_jsonl_lines`' split
    was factored out FOR. Two JSONL micro-batches containing a valid
    conversation, a structurally-invalid one (stray system turn), and
    an unparseable line: valid rows land training-ready, invalid rows
    keep their reason, raw garbage is quarantined — and a worst-case
    replay (checkpoint lost) leaves all three sinks identical, because
    every write is an own-partition overwrite."""
    import json
    import shutil

    from pyspark.sql import types as T

    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_sft_ingest_stream,
    )

    schema = T.StructType(
        [
            T.StructField("conv_id", T.LongType()),
            T.StructField(
                "conversation",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("role", T.StringType()),
                            T.StructField("content", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )

    def rec(cid, turns):
        return json.dumps(
            {"conv_id": cid,
             "conversation": [{"role": r, "content": c} for r, c in turns]}
        )

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "b1.jsonl").write_text(
        rec(1, [("user", "hi"), ("assistant", "hello")]) + "\n"
        + rec(2, [("user", "q"), ("system", "late system prompt")]) + "\n"
        + "{this is not json\n",
        encoding="utf-8",
    )
    (feed / "b2.jsonl").write_text(
        rec(3, [("system", "be terse"), ("user", "a"), ("assistant", "b")])
        + "\n",
        encoding="utf-8",
    )

    sink = str(tmp_path / "sink")
    run_sft_ingest_stream(
        spark, str(feed), sink, schema, files_per_trigger=1
    )

    def snap():
        valid = {
            r["conv_id"]
            for r in spark.read.parquet(sink).select("conv_id").collect()
        }
        inv = {
            (r["conv_id"], r["conv_invalid_reason"])
            for r in spark.read.parquet(sink + "_invalid")
            .select("conv_id", "conv_invalid_reason")
            .collect()
        }
        quar = {
            r["_corrupt_record"]
            for r in spark.read.parquet(sink + "_parse_quarantine").collect()
        }
        return valid, inv, quar

    valid, inv, quar = snap()
    assert valid == {1, 3}
    assert inv == {(2, "system_not_leading")}
    assert quar == {"{this is not json"}
    # training-ready rows carry exactly the schema's columns (no flags);
    # the sink partitions on the content-derived ingest_key (r11 #6)
    assert set(spark.read.parquet(sink).columns) == {
        "conv_id", "conversation", "ingest_key",
    }
    assert all(
        not str(r["ingest_key"]).startswith("batch-")
        for r in spark.read.parquet(sink).select("ingest_key").collect()
    )

    # worst-case replay: checkpoint gone, every batch re-runs
    shutil.rmtree(sink + "_checkpoint")
    run_sft_ingest_stream(
        spark, str(feed), sink, schema, files_per_trigger=1
    )
    assert snap() == (valid, inv, quar)

    # checkpoint loss + NEW file, NO sink clear (r11 VERDICT #6): the
    # content-derived key rewrites the old files' partitions in place
    # and adds one for the new file — nothing stale, nothing doubled
    shutil.rmtree(sink + "_checkpoint")
    (feed / "b3.jsonl").write_text(
        rec(4, [("user", "new"), ("assistant", "file")]) + "\n",
        encoding="utf-8",
    )
    run_sft_ingest_stream(
        spark, str(feed), sink, schema, files_per_trigger=1
    )
    valid2, inv2, quar2 = snap()
    assert valid2 == {1, 3, 4} and inv2 == inv and quar2 == quar
    # conv_ids unique — a stale partition would duplicate one
    rows = spark.read.parquet(sink).select("conv_id").collect()
    assert len(rows) == len({r["conv_id"] for r in rows})

    # schema without the conversation column is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="conversation"):
        run_sft_ingest_stream(
            spark, str(feed), str(tmp_path / "x"),
            T.StructType([T.StructField("conv_id", T.LongType())]),
        )


def test_mixture_drift_monitor_stream_alerts_and_replays(spark, tmp_path):
    """The streaming drift monitor: a micro-batch whose mixture matches
    the baseline drifts zero; a batch with a shifted mixture (including
    a NEW source — the finite-penalty JS case) drifts positive and
    trips the alert; replaying the exhausted stream rewrites identical
    rows (at-least-once idempotence by partition overwrite)."""
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_mixture_drift_monitor_stream,
    )

    docs_dir = str(tmp_path / "docs")
    baseline_dir = str(tmp_path / "baseline")
    out_dir = str(tmp_path / "drift")

    steady = spark.createDataFrame(
        [(1, "srcA", 300), (2, "srcA", 300), (3, "srcB", 200)],
        "doc_id long, source string, n_chars long",
    )
    drifted = spark.createDataFrame(
        [(4, "srcA", 100), (5, "srcC", 500)],  # srcB gone, srcC new
        "doc_id long, source string, n_chars long",
    )
    steady.coalesce(1).write.parquet(baseline_dir)
    # two files -> two availableNow micro-batches (order unspecified)
    steady.coalesce(1).write.mode("append").parquet(docs_dir)
    drifted.coalesce(1).write.mode("append").parquet(docs_dir)

    run_mixture_drift_monitor_stream(
        spark, docs_dir, baseline_dir, out_dir, alert_js=0.05
    )

    out = spark.read.parquet(out_dir)
    by_batch = {
        b: {r["key"]: r for r in rows}
        for b, rows in (
            (b, out.filter(F.col("ingest_key") == b).collect())
            for b in [
                r["ingest_key"]
                for r in out.select("ingest_key").distinct().collect()
            ]
        )
    }
    assert len(by_batch) == 2
    # content-derived keys: sha256 prefixes, never the batch-id fallback
    assert all(not str(b).startswith("batch-") for b in by_batch)
    # the numeric batch id still rides along as a column for triage
    assert out.select("batch_id").distinct().count() == 2
    totals = sorted(
        (next(iter(rows.values()))["total_js"], b) for b, rows in by_batch.items()
    )
    # one batch matches the baseline exactly -> zero drift, no alert
    zero_js, zero_b = totals[0]
    assert zero_js == 0.0
    assert not any(r["alerted"] for r in by_batch[zero_b].values())
    # the other shifted hard -> positive drift, alert fires, and the
    # vanished + new sources both carry finite one-sided penalties
    hot_js, hot_b = totals[1]
    assert hot_js > 0.05
    hot = by_batch[hot_b]
    assert all(r["alerted"] for r in hot.values())
    assert set(hot) == {"srcA", "srcB", "srcC"}
    assert hot["srcB"]["q_share"] == 0.0 and hot["srcB"]["js_contrib"] > 0
    assert hot["srcC"]["p_share"] == 0.0 and hot["srcC"]["js_contrib"] > 0

    # TRUE replay: checkpoint LOST, same files — every batch re-runs
    # through the overwrite path (an intact checkpoint would run zero
    # batches and pass vacuously — review finding). Batch NUMBERING may
    # renumber, but the content-derived ingest_key must NOT: the replay
    # rewrites the same two partitions, so the sink reads clean with no
    # manual clear.
    import shutil

    def content(df):
        return sorted(map(tuple, df.drop("batch_id").collect()))

    before = content(out)
    before_keys = {r["ingest_key"] for r in out.select("ingest_key").collect()}
    shutil.rmtree(out_dir.rstrip("/") + "_checkpoint")
    run_mixture_drift_monitor_stream(
        spark, docs_dir, baseline_dir, out_dir, alert_js=0.05
    )
    replayed = spark.read.parquet(out_dir)
    assert content(replayed) == before
    after_keys = {
        r["ingest_key"] for r in replayed.select("ingest_key").collect()
    }
    assert after_keys == before_keys


def test_mixture_drift_monitor_survives_checkpoint_loss_with_new_files(
    spark, tmp_path
):
    """r11 VERDICT #6: the content-derived sink key must make checkpoint
    loss + NEW FILES safe WITHOUT clearing the sink — the batch-id-keyed
    form left stale partitions from the old numbering beside the
    re-written ones (double-counting on read). Sequence: run over one
    file, lose the checkpoint, add a second file, rerun — the sink must
    hold exactly the two per-file reports (the first overwritten
    identically in place, the second new), nothing stale."""
    import shutil

    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_mixture_drift_monitor_stream,
    )

    docs_dir = str(tmp_path / "docs")
    baseline_dir = str(tmp_path / "baseline")
    out_dir = str(tmp_path / "drift")

    base_rows = spark.createDataFrame(
        [(1, "srcA", 300), (2, "srcB", 300)],
        "doc_id long, source string, n_chars long",
    )
    base_rows.coalesce(1).write.parquet(baseline_dir)
    base_rows.coalesce(1).write.parquet(docs_dir)

    run_mixture_drift_monitor_stream(
        spark, docs_dir, baseline_dir, out_dir, alert_js=0.05
    )
    first = spark.read.parquet(out_dir)
    first_keys = {r["ingest_key"] for r in first.select("ingest_key").collect()}
    assert len(first_keys) == 1
    first_content = sorted(map(tuple, first.drop("batch_id").collect()))

    # checkpoint lost; a new file lands; restart WITHOUT clearing out_dir
    shutil.rmtree(out_dir.rstrip("/") + "_checkpoint")
    spark.createDataFrame(
        [(3, "srcC", 600)], "doc_id long, source string, n_chars long"
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    run_mixture_drift_monitor_stream(
        spark, docs_dir, baseline_dir, out_dir, alert_js=0.05
    )
    after = spark.read.parquet(out_dir)
    after_keys = {r["ingest_key"] for r in after.select("ingest_key").collect()}
    # exactly one new partition; the old one survives under its old key
    assert first_keys < after_keys and len(after_keys) == 2
    # the old file's report was rewritten IDENTICALLY in place (batch
    # renumbering must not leak into content)
    old = after.filter(F.col("ingest_key").isin(list(first_keys)))
    assert sorted(map(tuple, old.drop("batch_id").collect())) == first_content
    # the new file's report: srcC appears, alarm fires (mixture shifted)
    new = after.filter(~F.col("ingest_key").isin(list(first_keys)))
    new_rows = {r["key"]: r for r in new.collect()}
    assert "srcC" in new_rows and all(r["alerted"] for r in new_rows.values())


def test_score_drift_monitor_stream_alerts_and_survives_checkpoint_loss(
    spark, tmp_path
):
    """The continuous-drift monitor (PSI + KS per micro-batch vs the
    baseline): a batch drawn from the baseline's distribution stays
    quiet; a shifted batch trips the alert on both metrics; checkpoint
    loss + a new file needs NO sink clear (content-keyed sink)."""
    import shutil

    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_score_drift_monitor_stream,
    )

    docs_dir = str(tmp_path / "docs")
    baseline_dir = str(tmp_path / "baseline")
    out_dir = str(tmp_path / "drift")

    base_vals = [(i, float((i * 37) % 101)) for i in range(300)]
    spark.createDataFrame(base_vals, "doc_id long, n_chars double").coalesce(
        1
    ).write.parquet(baseline_dir)
    # batch 1: same generator -> same distribution (quiet)
    spark.createDataFrame(
        base_vals[:150], "doc_id long, n_chars double"
    ).coalesce(1).write.parquet(docs_dir)
    run_score_drift_monitor_stream(
        spark, docs_dir, baseline_dir, out_dir, value_col="n_chars"
    )
    quiet = spark.read.parquet(out_dir)
    assert quiet.select("ingest_key").distinct().count() == 1
    assert not any(r["alerted"] for r in quiet.collect())

    # checkpoint lost; a hard-shifted file lands; NO sink clear
    shutil.rmtree(out_dir.rstrip("/") + "_checkpoint")
    spark.createDataFrame(
        [(1000 + i, 500.0 + float(i % 7)) for i in range(100)],
        "doc_id long, n_chars double",
    ).coalesce(1).write.mode("append").parquet(docs_dir)
    run_score_drift_monitor_stream(
        spark, docs_dir, baseline_dir, out_dir, value_col="n_chars"
    )
    after = spark.read.parquet(out_dir)
    keys = {r["ingest_key"] for r in after.select("ingest_key").collect()}
    assert len(keys) == 2  # old partition rewritten in place + one new
    hot = after.filter(F.col("alerted"))
    hot_keys = {r["ingest_key"] for r in hot.select("ingest_key").collect()}
    assert len(hot_keys) == 1  # only the shifted batch alarms
    r = hot.collect()[0]
    assert r["psi"] > 0.25 and r["d_stat"] > 0.1
    # per-batch PSI table shape: 10 bins each
    assert after.groupBy("ingest_key").count().collect()[0]["count"] == 10

def test_score_drift_monitor_binned_ks_mode(spark, tmp_path):
    """r12 VERDICT #4: ks_mode='binned' computes D over the baseline's
    precomputed edge CDF — same alert decisions as exact on a planted
    quiet/shifted pair, without re-aggregating the baseline multiset
    per batch."""
    import pytest

    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_score_drift_monitor_stream,
    )

    docs_dir = str(tmp_path / "docs")
    baseline_dir = str(tmp_path / "baseline")
    out_dir = str(tmp_path / "drift_binned")

    base_vals = [(i, float((i * 37) % 101)) for i in range(300)]
    spark.createDataFrame(base_vals, "doc_id long, n_chars double").coalesce(
        1
    ).write.parquet(baseline_dir)
    # quiet file (baseline generator) + hard-shifted file; with
    # files_per_trigger=1 each part file is its own micro-batch
    spark.createDataFrame(
        base_vals[:150], "doc_id long, n_chars double"
    ).coalesce(1).write.parquet(docs_dir)
    spark.createDataFrame(
        [(1000 + i, 500.0 + float(i % 7)) for i in range(100)],
        "doc_id long, n_chars double",
    ).coalesce(1).write.mode("append").parquet(docs_dir)

    run_score_drift_monitor_stream(
        spark,
        docs_dir,
        baseline_dir,
        out_dir,
        value_col="n_chars",
        ks_mode="binned",
    )
    out = spark.read.parquet(out_dir)
    keys = {r["ingest_key"] for r in out.select("ingest_key").collect()}
    assert len(keys) == 2
    hot = out.filter(F.col("alerted"))
    hot_keys = {r["ingest_key"] for r in hot.select("ingest_key").collect()}
    assert len(hot_keys) == 1  # only the shifted batch alarms
    r = hot.collect()[0]
    # the shift moves ALL current mass past the baseline max: even the
    # binned D sees the full gap
    assert r["d_stat"] > 0.9 and r["psi"] > 0.25
    quiet = out.filter(~F.col("alerted"))
    assert all(row["d_stat"] < 0.2 for row in quiet.collect())

    with pytest.raises(ValueError):
        run_score_drift_monitor_stream(
            spark, docs_dir, baseline_dir, out_dir, ks_mode="nope"
        )
    with pytest.raises(ValueError):
        run_score_drift_monitor_stream(
            spark, docs_dir, baseline_dir, out_dir,
            ks_mode="binned", ks_bins=1,
        )

def test_score_drift_monitor_by_group_matches_batch_operator(spark, tmp_path):
    """Round-13 per-source monitor: each micro-batch's sink rows equal
    psi_drift_by_group(baseline, batch) restricted to the batch's
    groups (same edges/binning/eps — the shared helpers make divergence
    structurally impossible, this pins it); a brand-new source alerts
    via its NULL-bin anchor row; a planted per-source shift alerts on
    PSI while the untouched source stays quiet."""
    from bp_datawarehouse_ordersfact_spark.operators.evaluation import (
        psi_drift_by_group,
    )
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_score_drift_monitor_by_group_stream,
    )

    docs_dir = str(tmp_path / "docs")
    baseline_dir = str(tmp_path / "baseline")
    out_dir = str(tmp_path / "drift_grp")

    base_rows = (
        [("srcA", 1000 + (i * 37) % 101) for i in range(120)]
        + [("srcB", 2000 + (i * 53) % 97) for i in range(100)]
    )
    spark.createDataFrame(
        base_rows, "source string, n_chars long"
    ).coalesce(1).write.parquet(baseline_dir)

    # one batch file: srcA quiet (same generator), srcB hard-shifted,
    # srcNEW appears from nowhere
    batch_rows = (
        [("srcA", 1000 + (i * 29) % 101) for i in range(60)]
        + [("srcB", 9000 + i % 5) for i in range(40)]
        + [("srcNEW", 42), ("srcNEW", 43)]
    )
    spark.createDataFrame(
        batch_rows, "source string, n_chars long"
    ).coalesce(1).write.parquet(docs_dir)

    run_score_drift_monitor_by_group_stream(
        spark, docs_dir, baseline_dir, out_dir,
        value_col="n_chars", group_col="source",
    )
    out = spark.read.parquet(out_dir)
    got = {}
    for r in out.collect():
        got.setdefault(r["source"], []).append(r)
    assert set(got) == {"srcA", "srcB", "srcNEW"}

    # equivalence with the batch operator, restricted to batch groups
    bdf = spark.createDataFrame(base_rows, "source string, n_chars long")
    cdf = spark.createDataFrame(batch_rows, "source string, n_chars long")
    want = {}
    for r in psi_drift_by_group(bdf, cdf, "n_chars", ["source"]).collect():
        want.setdefault(r["source"], []).append(r)
    for grp in ("srcA", "srcB", "srcNEW"):
        have = sorted(
            (r["bin"], r["n_base"], r["n_cur"], r["p_share"], r["q_share"],
             r["psi_contrib"], r["psi"])
            for r in got[grp]
        )
        expect = sorted(
            (r["bin"], r["n_base"], r["n_cur"], r["p_share"], r["q_share"],
             r["psi_contrib"], r["psi"])
            for r in want[grp]
        )
        assert have == expect, grp

    # alert semantics: shifted source + new source alert; quiet one not
    assert all(r["alerted"] for r in got["srcB"])
    assert len(got["srcNEW"]) == 1 and got["srcNEW"][0]["alerted"]
    assert got["srcNEW"][0]["bin"] is None and got["srcNEW"][0]["n_cur"] == 2
    assert not any(r["alerted"] for r in got["srcA"])

    # replay idempotence: checkpoint loss + rerun rewrites the same
    # content-keyed partition, no sink clear needed
    import shutil

    before = sorted(map(tuple, out.drop("batch_id").collect()))
    shutil.rmtree(out_dir.rstrip("/") + "_checkpoint")
    run_score_drift_monitor_by_group_stream(
        spark, docs_dir, baseline_dir, out_dir,
        value_col="n_chars", group_col="source",
    )
    after = spark.read.parquet(out_dir)
    assert sorted(map(tuple, after.drop("batch_id").collect())) == before
    assert after.select("ingest_key").distinct().count() == 1

    # binned-KS companion column: the hard shift saturates D at the
    # structural cap 1 - 1/n_bins = 0.9 (all current mass lands past
    # the last base decile, so the largest evaluable edge gap is
    # F_base(edge_9) = 0.9 — exactly the documented bin-mass bound),
    # the quiet source stays small, the anchor row carries NULL (no
    # CDF for an unmeasurable group)
    assert all(abs(r["d_binned"] - 0.9) < 1e-9 for r in got["srcB"])
    assert all(r["d_binned"] < 0.3 for r in got["srcA"])
    assert got["srcNEW"][0]["d_binned"] is None

    # alert_ks adds the KS rule: a tiny alert_psi=inf-like threshold
    # with alert_ks=0.5 must alert srcB via KS alone
    out2 = str(tmp_path / "drift_grp_ks")
    run_score_drift_monitor_by_group_stream(
        spark, docs_dir, baseline_dir, out2,
        value_col="n_chars", group_col="source",
        alert_psi=1e9, alert_ks=0.5,
    )
    ks_rows = {}
    for r in spark.read.parquet(out2).collect():
        ks_rows.setdefault(r["source"], []).append(r)
    assert all(r["alerted"] for r in ks_rows["srcB"])  # KS rule fired
    assert not any(r["alerted"] for r in ks_rows["srcA"])
    assert ks_rows["srcNEW"][0]["alerted"]  # anchor still alerts

def test_by_group_monitor_all_null_batch_values_alert_not_null(spark, tmp_path):
    """r13 review #2: a measurable source whose batch values are ALL
    NULL has no batch CDF (NULL d_binned) — with alert_ks set the
    alerted flag must still be a real boolean (false OR NULL was
    writing NULL, a row neither WHERE alerted nor WHERE NOT alerted
    returns). alert_psi is parked high to isolate the KS rule."""
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_score_drift_monitor_by_group_stream,
    )

    baseline_dir = str(tmp_path / "baseline")
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(
        [("srcA", float(i)) for i in range(50)], "source string, v double"
    ).coalesce(1).write.parquet(baseline_dir)
    spark.createDataFrame(
        [("srcA", None)] * 5, "source string, v double"
    ).coalesce(1).write.parquet(docs_dir)
    run_score_drift_monitor_by_group_stream(
        spark, docs_dir, baseline_dir, out_dir,
        value_col="v", group_col="source",
        alert_psi=1e9, alert_ks=0.1,
    )
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 10  # measurable group: full bin table
    for r in rows:
        assert r["alerted"] is False  # boolean false, never NULL
        assert r["d_binned"] is None and r["n_cur"] == 0


def test_canary_scan_monitor_stream_matches_batch_and_replays(spark, tmp_path):
    """Per-batch canary scanning at the ingest door: a clean batch
    reports every canary at zero hits (audit posture), a contaminated
    batch alerts with the exact batch-operator rows, the alerted flag
    is never NULL, and checkpoint loss + a new file needs no sink
    clear (content-keyed sink)."""
    import shutil

    from bp_datawarehouse_ordersfact_spark.operators.curation import canary_scan
    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_canary_scan_monitor_stream,
    )

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "canary")
    marker_a = "qq1zz-stream-canary-a"
    marker_b = "qq2zz-stream-canary-b"

    clean = [(i, f"ordinary document {i}") for i in range(20)]
    spark.createDataFrame(clean, "doc_id long, text string").coalesce(
        1
    ).write.parquet(docs_dir)
    run_canary_scan_monitor_stream(
        spark, docs_dir, out_dir, [marker_a, marker_b]
    )
    quiet = spark.read.parquet(out_dir)
    rows = quiet.collect()
    assert len(rows) == 2  # every canary reports, zero hits included
    assert all(r["n_docs"] == 0 for r in rows)
    assert all(r["alerted"] is False for r in rows)  # never NULL

    # checkpoint lost; a contaminated file lands; NO sink clear
    shutil.rmtree(out_dir.rstrip("/") + "_checkpoint")
    dirty = [(100, f"leaked text {marker_a} inline"), (101, marker_a),
             (102, "still clean")]
    spark.createDataFrame(dirty, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(docs_dir)
    run_canary_scan_monitor_stream(
        spark, docs_dir, out_dir, [marker_a, marker_b]
    )
    after = spark.read.parquet(out_dir)
    keys = {r["ingest_key"] for r in after.select("ingest_key").collect()}
    assert len(keys) == 2  # old partition rewritten in place + one new
    hot = {r["canary"]: r for r in after.filter(F.col("alerted")).collect()}
    assert set(hot) == {marker_a}
    assert hot[marker_a]["n_docs"] == 2
    assert hot[marker_a]["example_doc_ids"] == "100,101"

    # per-batch rows pinned EQUAL to the batch operator on the same docs
    cans = spark.createDataFrame([(marker_a,), (marker_b,)], "canary string")
    batch_rows = {
        r["canary"]: r
        for r in canary_scan(
            spark.createDataFrame(dirty, "doc_id long, text string"),
            cans,
        ).collect()
    }
    hot_key = [
        r["ingest_key"]
        for r in after.filter(F.col("alerted")).select("ingest_key").collect()
    ][0]
    stream_rows = {
        r["canary"]: r
        for r in after.filter(F.col("ingest_key") == hot_key).collect()
    }
    for c in (marker_a, marker_b):
        assert stream_rows[c]["n_docs"] == batch_rows[c]["n_docs"], c
        assert (
            stream_rows[c]["example_doc_ids"] == batch_rows[c]["example_doc_ids"]
        ), c


def test_canary_scan_monitor_rejects_empty_markers(spark, tmp_path):
    import pytest as _pt

    from bp_datawarehouse_ordersfact_spark.streaming.jobs import (
        run_canary_scan_monitor_stream,
    )

    with _pt.raises(ValueError):
        run_canary_scan_monitor_stream(
            spark, str(tmp_path / "x"), str(tmp_path / "y"), []
        )
    with _pt.raises(ValueError):
        run_canary_scan_monitor_stream(
            spark, str(tmp_path / "x"), str(tmp_path / "y"), ["ok", ""]
        )
