"""Source connector tests: pagination/windowing with an injected fake
transport (no network in the container — the transport is the only fake;
schema, parallelization, and parsing are the real paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bp_datawarehouse_ordersfact_spark.sources import files, rest


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = (
        SparkSession.builder.master("local[4]")
        .appName("sources")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("total", T.StringType()),
    ]
)


def make_fake_fetcher():
    # a closure (not a module-level function) so cloudpickle serializes it
    # BY VALUE into the executors — the test module isn't importable there
    def fake_fetcher(page: int, per_page: int, ws, we) -> list[dict]:
        # deterministic 3-page API, 'total' as API-typical money string
        if page > 3:
            return []
        return [
            {"id": (page - 1) * per_page + i, "page": page, "total": f"{i}.00"}
            for i in range(per_page)
        ]

    return fake_fetcher


def test_driver_and_distributed_fetch_agree(spark):
    drv = rest.fetch_pages_driver(spark, make_fake_fetcher(), SCHEMA, n_pages=3, per_page=10)
    dist = rest.fetch_pages_distributed(
        spark, make_fake_fetcher(), SCHEMA, n_pages=3, per_page=10, parallelism=4
    )
    assert drv.count() == dist.count() == 30
    assert sorted(r.id for r in drv.collect()) == sorted(r.id for r in dist.collect())
    assert drv.schema == dist.schema


def test_distributed_fetch_is_partitioned(spark):
    dist = rest.fetch_pages_distributed(
        spark, make_fake_fetcher(), SCHEMA, n_pages=3, per_page=10, parallelism=4
    )
    assert dist.rdd.getNumPartitions() >= 2  # pages spread across workers


def test_csv_roundtrip_with_schema_and_nulls(spark, tmp_path):
    path = str(tmp_path / "csv_out")
    (tmp_path / "in").mkdir()
    src = tmp_path / "in" / "data.csv"
    src.write_text("id,name,amount\n1,alpha,3.50\n2,,\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    df = files.read_csv(spark, str(src), schema)
    rows = {r.id: r for r in df.collect()}
    assert rows[1].amount == 3.5
    assert rows[2].name is None and rows[2].amount is None  # '' → null at the scan
    files.write_table(df, path)
    assert spark.read.parquet(path).count() == 2


def test_kafka_wire_roundtrip_and_quarantine(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from bp_datawarehouse_ordersfact_spark.sources.kafka_shaped import (
        KAFKA_WIRE_SCHEMA,
        parse_kafka_wire,
        to_kafka_wire,
    )

    df = spark.createDataFrame(
        [Row(k=1, seq=10, txt="a", x=1.5), Row(k=2, seq=20, txt="b", x=-2.25)]
    )
    wire = to_kafka_wire(df, key_col="k", ts_col="seq", topic="t", offset_col="seq")
    assert [f.name for f in wire.schema.fields] == [
        f.name for f in KAFKA_WIRE_SCHEMA.fields
    ]
    # inject one corrupt payload alongside the real records
    corrupt = wire.limit(1).withColumn(
        "value", F.lit(b"{not json").cast("binary")
    ).withColumn("offset", F.lit(999).cast("long"))
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("txt", T.StringType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    out = parse_kafka_wire(wire.unionByName(corrupt), schema)
    rows = {r.k: r for r in out.collect()}
    # corrupt record quarantined, typed values round-tripped exactly
    assert set(rows) == {1, 2} and len(rows) == 2
    assert rows[1].x == 1.5 and rows[2].x == -2.25
    assert rows[1].offset == 10 and rows[2].txt == "b"


def test_read_xml_builtin_source(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.sources.files import read_xml

    p = tmp_path / "orders.xml"
    p.write_text(
        "<orders>"
        "<order><id>1</id><status>open</status><total>10.5</total></order>"
        "<order><id>2</id><status>done</status><total>3.25</total></order>"
        "</orders>"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    rows = {r.id: r for r in read_xml(spark, str(tmp_path), "order", schema).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].status == "open" and rows[2].total == 3.25


def test_read_binary_dir_globs_and_loads_bytes(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.sources.files import read_binary_dir

    (tmp_path / "a.bin").write_bytes(b"\x00\x01\x02")
    (tmp_path / "b.bin").write_bytes(b"payload")
    (tmp_path / "skip.txt").write_text("not binary payload")
    df = read_binary_dir(spark, str(tmp_path), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert rows == {"a.bin": b"\x00\x01\x02", "b.bin": b"payload"}
    assert df.schema["length"].dataType.typeName() == "long"


def test_orc_and_partitioned_parquet_roundtrip(spark, tmp_path):
    """The format-pluggable sink writes ORC (built-in columnar alternate
    to Parquet) and partitioned Parquet; partition columns prune at the
    read side (directory-level pruning shows as a PartitionFilter)."""
    df = spark.createDataFrame(
        [(1, "a", 2024), (2, "b", 2024), (3, "c", 2025)], "id long, v string, yr int"
    )
    orc_path = str(tmp_path / "orc_out")
    files.write_table(df, orc_path, fmt="orc")
    back = spark.read.orc(orc_path)
    assert {(r.id, r.v, r.yr) for r in back.collect()} == {
        (1, "a", 2024), (2, "b", 2024), (3, "c", 2025)
    }

    part_path = str(tmp_path / "part_out")
    files.write_table(df, part_path, partition_by=["yr"])
    pruned = spark.read.parquet(part_path).filter("yr = 2025")
    assert pruned.count() == 1
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr" in plan


def test_jsonl_read_with_explicit_schema(spark, tmp_path):
    """JSON Lines (one object per line — the training-corpus interchange
    format) reads through read_json with an explicit schema; nested
    arrays survive to be exploded downstream, and corrupt lines yield
    null fields instead of failing the scan (PERMISSIVE)."""
    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "alpha", "tags": ["x", "y"]}\n'
        '{"doc_id": 2, "text": "beta", "tags": []}\n'
        "not json at all\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    df = files.read_json(spark, str(src), schema)
    rows = sorted(df.collect(), key=lambda r: (r.doc_id is None, r.doc_id))
    assert (rows[0].doc_id, rows[0].tags) == (1, ["x", "y"])
    assert rows[1].tags == []
    assert rows[2].doc_id is None  # corrupt line quarantined as nulls


def test_compact_write_bounds_file_count(spark, tmp_path):
    """6,400 rows scattered across 64 input partitions must land in
    ceil(6400/2000)=4 files, each within the per-file record cap, with
    the data intact."""
    import glob

    df = spark.range(6400, numPartitions=64).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "compacted")
    k = files.compact_write(df, out, target_rows_per_file=2000)
    assert k == 4
    parts = glob.glob(out + "/part-*.parquet")
    assert len(parts) == 4
    back = spark.read.parquet(out)
    assert back.count() == 6400
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * 6400 * 6399 // 2


def test_write_sorted_by_range_produces_skippable_files(spark, tmp_path):
    """Range-sorted output files must carry near-disjoint narrow min/max
    key ranges in their Parquet footers — the property that lets a
    filtered 100 TB scan skip whole files. An unsorted write of the same
    shuffled data has every file spanning ~the full key range."""
    import glob

    import pyarrow.parquet as pq

    df = (
        spark.range(10_000)
        .withColumn("k", (F.col("id") * 7919) % 10_000)  # shuffled key
        .withColumn("v", F.col("id") * 2)
        .repartition(8)
    )

    def file_ranges(path):
        out = []
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index("k")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return sorted(out)

    sorted_path = str(tmp_path / "sorted")
    files.write_sorted_by_range(df, sorted_path, ["k"], n_files=4)
    plain_path = str(tmp_path / "plain")
    df.write.parquet(plain_path)

    ranges = file_ranges(sorted_path)
    assert len(ranges) == 4
    # near-disjoint: each range covers ~1/4 of the domain, and
    # consecutive files do not overlap (range partitioner boundaries)
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
        assert hi1 - lo1 < 5000  # narrow vs the 10k domain
    # the unsorted layout is unskippable: every file spans ~everything
    for lo, hi in file_ranges(plain_path):
        assert hi - lo > 8000

    back = spark.read.parquet(sorted_path)
    assert back.count() == 10_000


def test_bigquery_gate_raises_actionable_error_without_connector(spark):
    """S5/S6: without the connector jar the functions must fail with the
    actionable ConnectorUnavailable (classpath + auth instructions), not
    raw Py4J noise — and argument validation still runs first where it
    can. (On a cluster WITH spark-bigquery-with-dependencies these same
    calls execute; this mirrors the Delta gate in test_merge_delta.py.)"""
    from bp_datawarehouse_ordersfact_spark.sources import bigquery as bq

    has_connector = True
    try:
        spark._jvm.java.lang.Class.forName(
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
        )
    except Exception:
        has_connector = False
    if has_connector:
        pytest.skip("connector present — gate not exercised")

    with pytest.raises(bq.ConnectorUnavailable, match="spark-bigquery"):
        bq.read_bigquery(spark, "proj.ds.table", columns=["a"])
    df = spark.range(3)
    with pytest.raises(bq.ConnectorUnavailable):
        bq.write_bigquery_truncate(df, "proj.ds.table")
    with pytest.raises(ValueError, match="temporary_gcs_bucket"):
        # validation errors must surface even before the classpath probe
        bq.write_bigquery_truncate(df, "proj.ds.table", write_method="indirect")


def test_with_retries_backoff_classification_and_distributed(spark):
    from bp_datawarehouse_ordersfact_spark.sources.rest import (
        fetch_pages_distributed,
        with_retries,
    )

    calls = {"n": 0}
    delays: list[float] = []

    class Throttled(Exception):
        retry_after_s = 45.0  # deliberately ABOVE max_delay_s

    def flaky(page, per_page, ws, we):
        calls["n"] += 1
        if calls["n"] == 1:
            raise Throttled()          # honors the Retry-After hint
        if calls["n"] == 2:
            raise TimeoutError("net")  # plain exponential backoff
        return [{"id": page * 10 + i} for i in range(2)]

    f = with_retries(flaky, max_attempts=4, base_delay_s=0.5, sleep=delays.append)
    assert f(1, 2, None, None) == [{"id": 10}, {"id": 11}]
    # the Retry-After hint is honored UNCAPPED (45 > max_delay_s=30);
    # only computed exponential backoff is capped
    assert delays == [45.0, 1.0]

    # non-retryable classification fails fast
    def auth_fail(page, per_page, ws, we):
        raise PermissionError("401")

    g = with_retries(
        auth_fail, max_attempts=5, sleep=delays.append,
        retryable=lambda e: not isinstance(e, PermissionError),
    )
    with pytest.raises(PermissionError):
        g(1, 2, None, None)

    # exhaustion re-raises the last error
    def always(page, per_page, ws, we):
        raise TimeoutError("down")

    h = with_retries(always, max_attempts=2, sleep=lambda _: None)
    with pytest.raises(TimeoutError):
        h(1, 2, None, None)

    # composes through the distributed shape (wrapper ships in the
    # mapInPandas closure; per-page flakiness is retried on executors)
    import random as _random

    state_schema = T.StructType([T.StructField("id", T.LongType())])

    def per_page_flaky(page, per_page, ws, we):
        # fail deterministically on first call per page via a sentinel
        # file-less trick: raise for odd pages' first attempt using a
        # per-process set (each executor worker retries locally)
        seen = per_page_flaky.__dict__.setdefault("seen", set())
        if page % 2 == 1 and page not in seen:
            seen.add(page)
            raise TimeoutError("transient")
        return [{"id": page}]

    df = fetch_pages_distributed(
        spark,
        with_retries(per_page_flaky, max_attempts=3, sleep=lambda _: None),
        state_schema,
        n_pages=6,
        parallelism=2,
    )
    assert sorted(r.id for r in df.collect()) == [1, 2, 3, 4, 5, 6]


def test_zorder_write_tightens_both_columns_footer_ranges(spark, tmp_path):
    """Range-sorting on the Morton key should quadrant the data: with 4
    output files, each file's footer range covers ~half the domain in
    BOTH columns — where a lexicographic sort on `a` leaves `b` spanning
    the full domain in every file."""
    import glob

    import pyarrow.parquet as pq

    from bp_datawarehouse_ordersfact_spark.functions.zorder import interleave_bits

    df = (
        spark.range(10_000)
        .withColumn("a", (F.col("id") * 7919) % 1024)
        .withColumn("b", (F.col("id") * 104729) % 1024)
        .withColumn("z", interleave_bits(F.col("a"), F.col("b")))
        .repartition(8)
    )

    def ranges(path, col):
        out = []
        for fn in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(fn).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            st = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
            out.append(max(s.max for s in st) - min(s.min for s in st))
        return out

    zpath = str(tmp_path / "zorder")
    files.write_sorted_by_range(df, zpath, ["z"], n_files=4)
    apath = str(tmp_path / "a_only")
    files.write_sorted_by_range(df, apath, ["a"], n_files=4)

    # z-order: both dimensions tighten ON AVERAGE. Per-file thresholds
    # are not stable — RangePartitioner's reservoir sample depends on
    # session RDD-id state, so boundary placement (and which single file
    # straddles a z-curve quadrant) varies with test selection order.
    # Worst case for 4 contiguous curve chunks is two quadrant
    # straddlers: mean width (2*512 + 2*1024)/4 = 768; assert under 870
    # to leave sampling slack while staying far below the ~1020
    # unsorted/full-domain mean.
    for col in ("a", "b"):
        ws = ranges(zpath, col)
        assert sum(ws) / len(ws) <= 870, (col, ws)
    # single-key sort: the secondary column is unskippable everywhere
    assert all(w >= 900 for w in ranges(apath, "b")), ranges(apath, "b")


def test_compact_write_partitioned_and_default_nfiles_range_sort(spark, tmp_path):
    """The partition_by branch of compact_write and the n_files=None
    branch of write_sorted_by_range (partitioner picks the count) both
    produce correct, readable layouts."""
    import glob

    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(1000)], "id long, yr int, v double"
    )
    cpath = str(tmp_path / "compact_part")
    k = files.compact_write(df, cpath, target_rows_per_file=600, partition_by=["yr"])
    assert k == 2
    back = spark.read.parquet(cpath)
    assert back.count() == 1000
    assert back.filter("yr = 1").count() == 500
    assert glob.glob(cpath + "/yr=*")  # partition directories exist

    spath = str(tmp_path / "sorted_auto")
    files.write_sorted_by_range(df, spath, ["id"])  # n_files=None
    back2 = spark.read.parquet(spath)
    assert back2.count() == 1000


def test_write_tar_shards_webdataset_layout(spark, tmp_path):
    import tarfile

    from bp_datawarehouse_ordersfact_spark.sources.files import write_tar_shards

    rows = [
        (f"doc{i:03d}", f"text body {i}", bytes([i, i + 1, i + 2]))
        for i in range(10)
    ]
    df = (
        spark.createDataFrame(rows, "key string, body string, img binary")
        .repartition(1)
        .sortWithinPartitions("key")
    )
    out = str(tmp_path / "shards")
    manifest = write_tar_shards(
        df, out, "key", {"txt": "body", "png": "img"}, shard_rows=4
    ).collect()
    # 10 samples at 4/shard in one partition -> 3 shards (4,4,2)
    assert sorted(r["rows"] for r in manifest) == [2, 4, 4]
    members = {}
    for r in manifest:
        with tarfile.open(r["shard"]) as t:
            names = t.getnames()
            # members grouped per sample, sample order preserved
            assert names == sorted(names, key=lambda n: n.split(".")[0])
            for m in t.getmembers():
                assert m.mtime == 0 and m.uid == 0 and m.gid == 0
                members[m.name] = t.extractfile(m).read()
    assert len(members) == 20
    for key, body, img in rows:
        assert members[f"{key}.txt"] == body.encode()
        assert members[f"{key}.png"] == img
    # deterministic: identical input → byte-identical shards
    out2 = str(tmp_path / "shards2")
    write_tar_shards(
        df, out2, "key", {"txt": "body", "png": "img"}, shard_rows=4
    ).collect()
    import pathlib

    a = sorted(pathlib.Path(out).iterdir())
    b = sorted(pathlib.Path(out2).iterdir())
    assert [p.name for p in a] == [p.name for p in b]
    for pa, pb in zip(a, b):
        assert pa.read_bytes() == pb.read_bytes()


def test_write_tar_shards_null_payload_and_validation(spark, tmp_path):
    import tarfile

    from bp_datawarehouse_ordersfact_spark.sources.files import write_tar_shards

    df = spark.createDataFrame(
        [("a", "x"), ("b", None)], "key string, body string"
    ).coalesce(1)
    out = str(tmp_path / "s")
    m = write_tar_shards(df, out, "key", {"txt": "body"}).collect()
    assert m[0]["rows"] == 2  # null-payload sample still counts a row
    with tarfile.open(m[0]["shard"]) as t:
        assert t.getnames() == ["a.txt"]  # but contributes no member
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_tar_shards(df, out, "key", {})
    with _pytest.raises(ValueError):
        write_tar_shards(df, out, "key", {"txt": "body"}, shard_rows=0)


def test_tar_shard_roundtrip(spark, tmp_path):
    from bp_datawarehouse_ordersfact_spark.sources.files import (
        read_tar_shards,
        write_tar_shards,
    )

    rows = [(f"k{i}", f"body-{i}", bytes([i])) for i in range(7)]
    df = (
        spark.createDataFrame(rows, "key string, body string, img binary")
        .repartition(2, "key")
        .sortWithinPartitions("key")
    )
    out = str(tmp_path / "rt")
    write_tar_shards(df, out, "key", {"txt": "body", "png": "img"}, shard_rows=3).collect()
    back = read_tar_shards(spark, out)
    got = {
        (r["key"], r["ext"]): bytes(r["payload"]) for r in back.collect()
    }
    assert len(got) == 14
    for key, body, img in rows:
        assert got[(key, "txt")] == body.encode()
        assert got[(key, "png")] == img


def test_write_with_bloom_sizes_and_identical_results(spark, tmp_path):
    """Bloom filters add footer bytes on exactly the enabled column and
    never change results (pyarrow 16 does not expose bloom offsets, so
    the size delta plus the behavioral equality is the pin)."""
    import glob
    import os

    from bp_datawarehouse_ordersfact_spark.sources.files import write_with_bloom

    df = (
        spark.range(50_000)
        .selectExpr("id", "md5(cast(id as string)) as doc_hash", "id % 7 as grp")
        .coalesce(1)
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloom")
    df.write.parquet(plain)
    write_with_bloom(df, bloomed, ["doc_hash"], expected_ndv=50_000)

    size = lambda d: sum(  # noqa: E731
        os.path.getsize(f) for f in glob.glob(os.path.join(d, "*.parquet"))
    )
    # ndv=50k @ fpp 1% ≈ 60 KB of bloom bytes — well above noise
    assert size(bloomed) > size(plain) + 30_000

    probe = df.limit(5).collect()
    for r in probe:
        got = (
            spark.read.parquet(bloomed)
            .filter(F.col("doc_hash") == r["doc_hash"])
            .collect()
        )
        assert [(x["id"], x["doc_hash"]) for x in got] == [
            (r["id"], r["doc_hash"])
        ]
    assert spark.read.parquet(bloomed).count() == 50_000


def test_versioned_snapshots_time_travel_and_diff(spark, tmp_path):
    import os

    from bp_datawarehouse_ordersfact_spark.sources.versioned import (
        diff_snapshots,
        list_snapshots,
        read_snapshot,
        vacuum_uncommitted,
        write_snapshot,
    )

    base = str(tmp_path / "dim")
    v0_df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    assert write_snapshot(v0_df, base, label="init") == 0
    # v1: update k=2, delete k=3, insert k=4
    v1_df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    assert write_snapshot(v1_df, base) == 1

    assert {r["version"] for r in list_snapshots(spark, base).collect()} == {0, 1}
    assert read_snapshot(spark, base).count() == 3  # latest = v1
    old = {r["k"]: r["v"] for r in read_snapshot(spark, base, 0).collect()}
    assert old == {1: 10.0, 2: 20.0, 3: 30.0}  # time travel

    d = {
        (r["change"], r["k"])
        for r in diff_snapshots(spark, base, 0, 1, ["k"]).collect()
    }
    assert d == {("update", 2), ("delete", 3), ("insert", 4)}

    # crash simulation: an orphan v=9 directory is INVISIBLE to readers
    # and removed by vacuum
    v1_df.write.parquet(os.path.join(base, "v=9"))
    assert read_snapshot(spark, base).count() == 3
    with pytest.raises(ValueError, match="not committed"):
        read_snapshot(spark, base, 9)
    assert vacuum_uncommitted(spark, base) == [9]
    assert not os.path.exists(os.path.join(base, "v=9"))
    with pytest.raises(ValueError, match="no committed"):
        read_snapshot(spark, str(tmp_path / "empty"))


def test_expire_snapshots_retention(spark, tmp_path):
    """r6 VERDICT #4: retention must make expired versions unreadable
    and reclaim their data, keep latest/diff correct, never reuse a
    version number, and leave vacuum safe — all through an append-only
    tombstone commit (no manifest rewrite window)."""
    import os

    from bp_datawarehouse_ordersfact_spark.sources.versioned import (
        diff_snapshots,
        expire_snapshots,
        list_snapshots,
        read_snapshot,
        vacuum_uncommitted,
        write_snapshot,
    )

    base = str(tmp_path / "dim")
    for i in range(5):  # versions 0..4
        df = spark.createDataFrame(
            [(k, float(10 * i + k)) for k in range(1, 4 + i)], "k int, v double"
        )
        assert write_snapshot(df, base, label=f"run{i}") == i

    with pytest.raises(ValueError, match="keep_last"):
        expire_snapshots(spark, base, 0)
    assert expire_snapshots(spark, base, keep_last=2) == [0, 1, 2]

    # expired: unreadable + data reclaimed; survivors: fully readable
    for v in (0, 1, 2):
        with pytest.raises(ValueError, match="not committed"):
            read_snapshot(spark, base, v)
        assert not os.path.exists(os.path.join(base, f"v={v}"))
    assert {r["version"] for r in list_snapshots(spark, base).collect()} == {3, 4}
    assert read_snapshot(spark, base).count() == 7  # latest = v4, rows 1..7
    d = {
        (r["change"], r["k"])
        for r in diff_snapshots(spark, base, 3, 4, ["k"]).collect()
    }
    assert d == {("insert", 7)} | {("update", k) for k in range(1, 7)}

    # version numbers are never reused after expiry
    nxt = spark.createDataFrame([(1, 99.0)], "k int, v double")
    assert write_snapshot(nxt, base) == 5

    # vacuum is still safe: removes only true orphans, not survivors
    nxt.write.parquet(os.path.join(base, "v=42"))
    assert vacuum_uncommitted(spark, base) == [42]
    assert read_snapshot(spark, base, 3).count() == 6

    # idempotent / no-op when history is already within budget
    assert expire_snapshots(spark, base, keep_last=10) == []


def test_tar_shard_manifest_sha256_and_verifier(spark, tmp_path):
    import hashlib

    from bp_datawarehouse_ordersfact_spark.sources.files import (
        verify_tar_shards,
        write_tar_shards,
    )

    df = spark.createDataFrame(
        [(f"k{i}", f"body {i}") for i in range(7)], "key string, body string"
    ).repartition(2)
    out = str(tmp_path / "shards")
    manifest = write_tar_shards(
        df, out, "key", {"txt": "body"}, shard_rows=3
    ).localCheckpoint(eager=True)
    rows = manifest.collect()
    # manifest digests match hashlib over the files
    for r in rows:
        with open(r["shard"], "rb") as f:
            assert r["sha256"] == hashlib.sha256(f.read()).hexdigest()
    # intact delivery -> empty report
    assert verify_tar_shards(spark, manifest).count() == 0

    # corrupt one shard, delete another, plant an unexpected file
    victim, missing = rows[0]["shard"], rows[1]["shard"]
    with open(victim, "r+b") as f:
        f.seek(10)
        f.write(b"X")
    import os as _os

    _os.remove(missing)
    with open(str(tmp_path / "shards" / "rogue-00000-0000.tar"), "wb") as f:
        f.write(b"not really a tar")
    report = {r["shard"]: r["status"] for r in verify_tar_shards(spark, manifest).collect()}
    assert report[victim] == "hash_mismatch"
    assert report[missing] == "missing"
    assert any(s == "unexpected" for s in report.values())
    assert len(report) == 3


def test_read_jsonl_quarantined(spark, tmp_path):
    from pyspark.sql import types as T

    from bp_datawarehouse_ordersfact_spark.sources.files import (
        read_jsonl_quarantined,
    )

    p = tmp_path / "crawl.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "clean one"}',
                '{"doc_id": 2, "text": "clean two"}',
                '{"doc_id": 3, "text": "truncated',       # corrupt
                "not json at all",                          # corrupt
                '{"doc_id": 4, "text": null}',             # legit null
            ]
        )
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    good, bad = read_jsonl_quarantined(spark, str(p), schema)
    rows = {r["doc_id"]: r["text"] for r in good.collect()}
    # clean rows parse; the legit-null row is GOOD (null != corrupt)
    assert rows == {1: "clean one", 2: "clean two", 4: None}
    bad_lines = sorted(r["_corrupt_record"] for r in bad.collect())
    assert bad_lines == ["not json at all", '{"doc_id": 3, "text": "truncated']
    assert good.columns == ["doc_id", "text"]
    assert bad.columns == ["_corrupt_record"]
    # the natural triage ops must not hit Spark's
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction (review finding)
    assert good.count() == 3
    assert bad.count() == 2


def test_verify_tar_shards_accepts_lazy_manifest(spark, tmp_path):
    """Review finding: a lazy write_tar_shards manifest used to re-run
    the exporter inside the verification join, rewriting shards
    mid-hash. The verifier must materialize the manifest once."""
    from bp_datawarehouse_ordersfact_spark.sources.files import (
        verify_tar_shards,
        write_tar_shards,
    )

    df = spark.createDataFrame(
        [(f"k{i}", f"body {i}") for i in range(5)], "key string, body string"
    ).coalesce(1)
    lazy_manifest = write_tar_shards(
        df, str(tmp_path / "shards"), "key", {"txt": "body"}, shard_rows=2
    )
    # pass the LAZY frame straight in — must report clean, not mismatches
    assert verify_tar_shards(spark, lazy_manifest).count() == 0


# ---------------------------------------------------------------------------
# S7: secret provider chain (sources/secrets.py) — round 12
# ---------------------------------------------------------------------------


def test_secret_provider_chain_env_file_gate(tmp_path, monkeypatch):
    """Resolution order env > file > gated GCP; memoized per process;
    the no-provider case raises the full chain diagnosis, never a bare
    ImportError/KeyError (the BigQuery gate contract)."""
    from bp_datawarehouse_ordersfact_spark.sources.secrets import (
        SecretUnavailable,
        clear_secret_cache,
        get_secret,
    )

    clear_secret_cache()
    monkeypatch.delenv("SPARK_GRAFT_SECRETS_DIR", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_SECRET_WC_API_KEY", "k-from-env")
    assert get_secret("proj", "wc-api-key") == "k-from-env"

    # file provider: used when no env override exists
    sdir = tmp_path / "secrets"
    sdir.mkdir()
    (sdir / "db-password").write_text("p-from-file\n", encoding="utf-8")
    monkeypatch.setenv("SPARK_GRAFT_SECRETS_DIR", str(sdir))
    assert get_secret("proj", "db-password") == "p-from-file"  # newline stripped

    # env wins over file for the same name
    (sdir / "wc-api-key").write_text("p-shadowed", encoding="utf-8")
    clear_secret_cache()
    assert get_secret("proj", "wc-api-key") == "k-from-env"

    # memo: a rotated env var is NOT re-read until the cache clears
    monkeypatch.setenv("SPARK_GRAFT_SECRET_WC_API_KEY", "k-rotated")
    assert get_secret("proj", "wc-api-key") == "k-from-env"
    clear_secret_cache()
    assert get_secret("proj", "wc-api-key") == "k-rotated"

    # nothing resolves -> SecretUnavailable naming every tried provider
    clear_secret_cache()
    with pytest.raises(SecretUnavailable) as ex:
        get_secret("proj", "missing-secret")
    msg = str(ex.value)
    assert "SPARK_GRAFT_SECRET_MISSING_SECRET" in msg
    assert "missing-secret" in msg and "not installed" in msg


# ---------------------------------------------------------------------------
# S8: run log + shipping (core/runlog.py) — round 12
# ---------------------------------------------------------------------------


def test_runlog_appends_jsonl_and_ships_via_hadoop_fs(spark, tmp_path):
    """One JSON line per step (crash keeps completed steps — append
    semantics), non-serializable fields degrade to repr instead of
    killing the run, the shipped copy is byte-identical, re-shipping
    overwrites idempotently, and the log is readable back by Spark."""
    import json

    from bp_datawarehouse_ordersfact_spark.core.runlog import RunLog, ship_logs

    log = RunLog("run-0001", str(tmp_path / "logs"))
    log.step("ingest", rows=120)
    log.step("match", rows=40, detail={"threshold": 0.7})
    log.step("weird", obj=object())  # non-JSON field -> repr fallback
    log.step("fact_build", status="failed", error="boom")

    lines = [json.loads(x) for x in open(log.path, encoding="utf-8")]
    assert [x["step"] for x in lines] == ["ingest", "match", "weird", "fact_build"]
    assert lines[0]["rows"] == 120 and lines[0]["status"] == "ok"
    assert lines[1]["detail"] == {"threshold": 0.7}
    assert lines[2]["obj"].startswith("<object object")
    assert lines[3]["status"] == "failed"
    assert all(x["run_id"] == "run-0001" and x["elapsed_s"] >= 0 for x in lines)

    dest = str(tmp_path / "bucket" / "etl_logs")
    shipped = ship_logs(spark, log.path, dest)
    import os as _os

    local_dest = shipped.replace("file:", "")
    assert open(local_dest, "rb").read() == open(log.path, "rb").read()
    # re-ship after another step: overwrite, not duplicate/append
    log.step("post")
    ship_logs(spark, log.path, dest)
    assert open(local_dest, "rb").read() == open(log.path, "rb").read()
    # one visible log file (Hadoop's local FS adds a .crc sidecar)
    visible = [
        f
        for f in _os.listdir(_os.path.dirname(local_dest))
        if not f.startswith(".")
    ]
    assert visible == [_os.path.basename(local_dest)]
    # machine-readable by the engine that wrote it
    back = spark.read.json(local_dest)
    assert back.count() == 5 and "elapsed_s" in back.columns


def test_make_wc_fetcher_resolves_secrets_and_shapes_requests(
    spark, monkeypatch
):
    """S7-consumed-by-S1/S2: the production fetcher resolves its auth
    pair through the secret chain ONCE, shapes the reference's exact
    page/window params, and composes with the distributed pull."""
    from bp_datawarehouse_ordersfact_spark.sources.rest import (
        fetch_pages_distributed,
        make_wc_fetcher,
    )
    from bp_datawarehouse_ordersfact_spark.sources.secrets import (
        clear_secret_cache,
    )
    from pyspark.sql import types as T

    clear_secret_cache()
    monkeypatch.setenv("SPARK_GRAFT_SECRET_WC_CONSUMER_KEY", "ck_test")
    monkeypatch.setenv("SPARK_GRAFT_SECRET_WC_CONSUMER_SECRET", "cs_test")

    calls = []

    class FakeResp:
        def __init__(self, page):
            self._page = page

        def raise_for_status(self):
            pass

        def json(self):
            return [{"id": self._page * 10 + i} for i in range(2)]

    class FakeTransport:
        def get(self, url, params=None, auth=None, timeout=None):
            calls.append((url, dict(params), auth, timeout))
            return FakeResp(params["page"])

    fetcher = make_wc_fetcher(
        "https://shop.example/wp-json/wc/v3",
        "orders",
        transport=FakeTransport(),
    )
    out = fetcher(3, 100, "2024-01-01T00:00:00", "2024-03-01T00:00:00")
    assert [r["id"] for r in out] == [30, 31]
    url, params, auth, timeout = calls[0]
    assert url == "https://shop.example/wp-json/wc/v3/orders"
    assert params == {
        "page": 3, "per_page": 100,
        "after": "2024-01-01T00:00:00", "before": "2024-03-01T00:00:00",
    }
    assert auth == ("ck_test", "cs_test") and timeout == 30.0

    # composes with the scale-shape pull (driver-side transport objects
    # aren't needed on executors here because the fake is picklable;
    # production requests-based fetchers are too — module-level import)
    schema = T.StructType([T.StructField("id", T.LongType())])
    df = fetch_pages_distributed(spark, fetcher, schema, n_pages=4, per_page=2)
    assert sorted(r["id"] for r in df.collect()) == sorted(
        p * 10 + i for p in range(1, 5) for i in range(2)
    )
    clear_secret_cache()


def test_secret_memo_repr_never_prints_payloads(monkeypatch):
    """r12 review: the memo holds opaque holders — dumping module state
    must show <secret>, never the credential text."""
    from bp_datawarehouse_ordersfact_spark.sources import secrets as S

    S.clear_secret_cache()
    monkeypatch.setenv("SPARK_GRAFT_SECRET_OPAQUE_CHECK", "super-sensitive")
    assert S.get_secret("p", "opaque-check") == "super-sensitive"
    dumped = repr(S._MEMO)
    assert "super-sensitive" not in dumped and "<secret>" in dumped
    S.clear_secret_cache()


def test_runlog_never_kills_the_run_on_write_failure(tmp_path):
    """r12 review pass 3: the never-kill contract is enforced in
    step() itself — a log path that stops being writable degrades to a
    one-time stderr warning, not an exception into the observed run."""
    from bp_datawarehouse_ordersfact_spark.core.runlog import RunLog

    d = tmp_path / "logs"
    log = RunLog("fragile", str(d))
    log.step("first")
    good_path = log.path
    # break the path structurally (a FILE as parent dir -> OSError on
    # open; chmod-based revocation is a no-op for root, which this
    # container runs as)
    log.path = str(tmp_path / "logs" / "fragile.jsonl" / "nested.jsonl")
    log.step("second")  # must NOT raise
    log.step("third")
    lines = open(good_path, encoding="utf-8").read().splitlines()
    assert len(lines) == 1  # only the pre-failure step landed

def test_secret_override_providers_warn_on_pinned_version(monkeypatch):
    """r12 ADVICE #3: env/file providers are name-keyed — a pinned
    non-latest version served from them warns loudly instead of
    silently collapsing to the injected payload."""
    import warnings as W

    from bp_datawarehouse_ordersfact_spark.sources import secrets as S

    S.clear_secret_cache()
    monkeypatch.setenv("SPARK_GRAFT_SECRET_PINNED_CHECK", "payload")
    with W.catch_warnings(record=True) as got:
        W.simplefilter("always")
        assert S.get_secret("projA", "pinned-check", version="7") == "payload"
    assert any("version '7'" in str(w.message) for w in got)
    # latest from an override is the designed path: no warning
    with W.catch_warnings(record=True) as got:
        W.simplefilter("always")
        assert S.get_secret("projA", "pinned-check") == "payload"
    assert not got
    S.clear_secret_cache()


def test_make_wc_fetcher_query_auth_mode_matches_reference_wire_shape(
    monkeypatch,
):
    """r12 ADVICE #5: auth_mode='query' restores the reference's exact
    credential transport (consumer_key/consumer_secret as query params,
    dw2_wc_increment.py:145-150) for Authorization-stripping hosts;
    anything else raises."""
    import pytest

    from bp_datawarehouse_ordersfact_spark.sources.rest import make_wc_fetcher
    from bp_datawarehouse_ordersfact_spark.sources.secrets import (
        clear_secret_cache,
    )

    clear_secret_cache()
    monkeypatch.setenv("SPARK_GRAFT_SECRET_WC_CONSUMER_KEY", "ck_q")
    monkeypatch.setenv("SPARK_GRAFT_SECRET_WC_CONSUMER_SECRET", "cs_q")

    calls = []

    class FakeResp:
        @staticmethod
        def raise_for_status():
            pass

        @staticmethod
        def json():
            return []

    class FakeTransport:
        def get(self, url, params=None, auth=None, timeout=None):
            calls.append((dict(params), auth))
            return FakeResp()

    fetcher = make_wc_fetcher(
        "https://shop.example/wp-json/wc/v3",
        "orders",
        transport=FakeTransport(),
        auth_mode="query",
    )
    fetcher(1, 50, None, None)
    params, auth = calls[0]
    assert auth is None  # never doubled into the header
    assert params["consumer_key"] == "ck_q"
    assert params["consumer_secret"] == "cs_q"
    with pytest.raises(ValueError):
        make_wc_fetcher(
            "https://x", "orders", transport=FakeTransport(),
            auth_mode="header",
        )
    clear_secret_cache()
