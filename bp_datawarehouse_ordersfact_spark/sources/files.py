"""Schema'd file sources/sinks (reference S3/S4: GCS CSV read with dtype
dicts ``gcp_getbucket.py:7-18``, single-blob CSV overwrite
``gcp_postbucket.py:7-25``; S5/S6: BigQuery SELECT */truncate-load).

The rebuild stages everything as Parquet (``core.io``); CSV/JSON remain
as ingest/export formats with EXPLICIT StructType schemas — never
inferSchema, which costs a full extra pass over the data and guesses
types the reference pins by hand.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    null_value: str = "",
) -> DataFrame:
    """S3: schema'd CSV read. ``nullValue=''`` reproduces the reference's
    empty-string→null handling at the scan instead of per-column
    coercions (``dw2_wc_increment.py:426-443``)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("nullValue", null_value)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, multiline: bool = False
) -> DataFrame:
    """Nested JSON ingest with an explicit schema (the J1 flatten becomes
    unnecessary — arrays/structs survive to be posexploded downstream)."""
    return (
        spark.read.schema(schema).option("multiLine", multiline).json(path)
    )


def read_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Crawl-grade JSONL ingest: schema'd line-delimited JSON where
    malformed lines are QUARANTINED, not silently nulled or fatally
    raised — a web dump always has a few truncated/garbage lines, and at
    100 TB "FAILFAST on line 40 billion" and "PERMISSIVE all-null rows
    poisoning downstream filters" are both wrong.

    Returns ``(good, bad)``: `good` carries `schema`'s columns for rows
    that parsed clean; `bad` carries the RAW offending line
    (``_corrupt_record``) for triage.

    Implementation reads the file as TEXT and decodes with `from_json`
    (the `sources/kafka_shaped.parse_kafka_wire` contract: PERMISSIVE +
    ``columnNameOfCorruptRecord``, corrupt exactly when that field is
    non-null) rather than `spark.read.json` with a corrupt column — the
    raw-JSON-source form forbids any query whose pruned column set is
    only the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which
    breaks the most natural triage op, ``bad.count()``. Decoding a text
    column has no such restriction.

    Scale: one scan shape; the split is two lazy filters over the same
    source (Catalyst reuses the scan per action; for a one-pass split,
    persist the parsed frame first). Blank lines are skipped like the
    native JSON reader skips them.
    """
    return split_jsonl_lines(spark.read.text(path), schema)


_CORRUPT_COL = "_corrupt_record"


def parse_jsonl_lines(text_df: DataFrame, schema: T.StructType) -> DataFrame:
    """The raw parse stage of `split_jsonl_lines`: one ``from_json``
    pass over an already-read text frame (column ``value``), returning
    (``__rec`` struct, ``value``) rows with corrupt-exactly-when the
    struct's ``_corrupt_record`` field is non-null. Exposed separately
    so a caller that routes BOTH sides (the streaming SFT ingest,
    `streaming.jobs.run_sft_ingest_stream`) can persist THIS frame and
    pay the JSON parse once instead of once per sink."""
    full = T.StructType(
        list(schema.fields)
        + [T.StructField(_CORRUPT_COL, T.StringType(), True)]
    )
    return text_df.filter(F.trim(F.col("value")) != "").select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT_COL},
        ).alias("__rec"),
        F.col("value"),
    )


def split_parsed_jsonl(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a `parse_jsonl_lines` frame into (good, bad) — good carries
    the schema's columns, bad the raw offending line."""
    is_bad = F.col(f"__rec.{_CORRUPT_COL}").isNotNull() | F.col("__rec").isNull()
    good = parsed.filter(~is_bad).select("__rec.*").drop(_CORRUPT_COL)
    bad = parsed.filter(is_bad).select(F.col("value").alias(_CORRUPT_COL))
    return good, bad


def split_jsonl_lines(
    text_df: DataFrame, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """The `read_jsonl_quarantined` parse/split over an ALREADY-READ
    text frame (column ``value``) — `parse_jsonl_lines` +
    `split_parsed_jsonl` in one call; the streaming SFT ingest
    (`streaming.jobs.run_sft_ingest_stream`) uses the two stages
    directly so it can persist the parsed frame between its sinks."""
    return split_parsed_jsonl(parse_jsonl_lines(text_df, schema))


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S4/S6 sink: partitioned, format-pluggable overwrite (the
    reference's WRITE_TRUNCATE semantics). Partitioning gives downstream
    reads partition pruning — the reference's single CSV blob has no
    equivalent."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)


def export_single_csv(df: DataFrame, path: str) -> None:
    """The reference's one-blob CSV export shape (``gcp_postbucket.py``):
    coalesce(1) is correct ONLY for export-sized results — never for
    staging (it serializes the whole write through one task)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML ingest via Spark 4's built-in XML source (no external package
    since 4.0). ``rowTag`` selects the repeating element; pass an
    explicit schema for the same no-inference discipline as
    ``read_csv`` (schema inference costs a full extra pass). Distributed
    like any file scan — one task per split, nested elements arrive as
    structs/arrays for downstream posexplode."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Raw-media ingest via the ``binaryFile`` source: each file becomes
    one row of (path, modificationTime, length, content binary) — the
    scan-side half of the multimodal pipeline (decode/feature-extract
    then run as Arrow ``mapInPandas`` over ``content``, see
    queries.llmops multimodal ops). Spark parallelizes by file, so at
    100 TB the unit of work is a media object, not a byte range —
    partition counts follow file counts and small-file explosions are
    the scaling hazard to manage upstream (object-store compaction)."""
    r = spark.read.format("binaryFile")
    if glob is not None:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def compact_write(
    df: DataFrame,
    path: str,
    target_rows_per_file: int = 1_000_000,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    n_rows: int | None = None,
) -> int:
    """Small-files-aware Parquet write: repartition to
    ``ceil(rows / target_rows_per_file)`` output tasks and cap each file
    with ``maxRecordsPerFile``. Returns the task count.

    The small-file explosion is the classic downstream killer of
    streaming/incremental sinks (every micro-batch or task leaves a
    shard; a later 100 TB scan then pays per-file open/footer costs and
    loses row-group statistics locality). This is the explicit
    compaction pass run as table maintenance — the pre-count is an
    extra scan by design, acceptable for a maintenance job and exact
    where AQE's estimates are not. On Delta/Iceberg this job is
    ``OPTIMIZE`` / ``rewrite_data_files``. Pass ``n_rows`` when the
    caller already knows the count (e.g. from an observed metric on the
    producing write) to skip the pre-count scan entirely."""
    import math

    n = df.count() if n_rows is None else n_rows
    k = max(1, math.ceil(n / target_rows_per_file))
    w = (
        df.repartition(k)
        .write.mode(mode)
        .option("maxRecordsPerFile", target_rows_per_file)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return k


def write_sorted_by_range(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Data-skipping layout: range-partition by ``sort_cols`` and sort
    within each output task before writing Parquet.

    Each file then covers a NARROW, near-disjoint range of the sort key,
    so its row-group min/max statistics become selective: a later
    filtered scan skips whole files/row-groups instead of reading
    everything and filtering rows (the plain-Parquet half of what
    Delta's OPTIMIZE ZORDER does; verified against footer metadata in
    tests/test_sources.py). Use for the staged tables big scans filter
    on — e.g. fact tables by date, documents by source.

    ``repartitionByRange`` samples the key distribution, so output files
    are balanced even under skew — unlike hash partitioning on a skewed
    key."""
    parts = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    parts.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_tar_shards(
    df,
    out_dir: str,
    name_col: str,
    payload_cols: dict[str, str],
    shard_rows: int = 10_000,
    prefix: str = "shard",
):
    """Export samples as WebDataset-style tar shards — the delivery
    format sequential training loaders stream (tar members grouped per
    sample: ``{key}.{ext}`` for each entry of ``payload_cols``, ext →
    column; string columns utf-8-encoded, binary written as-is).

    Runs as an Arrow-batched ``mapInPandas`` side-effect writer: each
    partition rolls tar files of ``shard_rows`` samples named
    ``{prefix}-{partition:05d}-{seq:04d}.tar`` (stdlib tarfile, pinned
    zero mtime/uid/gid so identical inputs produce byte-identical
    shards). Returns a lazy manifest frame (shard, rows, bytes, sha256)
    — the caller's action triggers the export, and the manifest is both
    the restartability record and the integrity record
    (``verify_tar_shards`` recomputes the digests distributed and
    reports any shard whose bytes drifted after delivery). Shard membership follows the physical
    partitioning: repartition/sort upstream for reproducible shard
    contents. ``out_dir`` must be a filesystem every executor can reach
    (local/NFS/FUSE mount; for object stores, upload the closed shard
    in place of the local rename — the standard WebDataset recipe).
    """
    if shard_rows < 1:
        raise ValueError(f"shard_rows must be >= 1, got {shard_rows}")
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    os.makedirs(out_dir, exist_ok=True)
    cols = [name_col] + list(payload_cols.values())
    exts = list(payload_cols.keys())

    def gen(batches):
        import hashlib
        import io
        import tarfile

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        tar = None
        path = None
        n_in_shard = 0
        out_rows = []

        def close_current():
            nonlocal tar, n_in_shard, seq, path
            if tar is not None:
                tar.close()
                # digest the just-closed shard (still in page cache) so
                # the manifest doubles as the integrity record
                h = hashlib.sha256()
                with open(path, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
                out_rows.append(
                    (path, n_in_shard, os.path.getsize(path), h.hexdigest())
                )
                tar, path, n_in_shard = None, None, 0
                seq += 1

        for pdf in batches:
            for row in pdf[cols].itertuples(index=False):
                if tar is None:
                    path = os.path.join(
                        out_dir, f"{prefix}-{pid:05d}-{seq:04d}.tar"
                    )
                    tar = tarfile.open(path, "w")
                key = str(row[0])
                for j, ext in enumerate(exts):
                    val = row[j + 1]
                    if val is None:
                        continue
                    data = (
                        val.encode("utf-8") if isinstance(val, str) else bytes(val)
                    )
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    tar.addfile(info, io.BytesIO(data))
                n_in_shard += 1
                if n_in_shard >= shard_rows:
                    close_current()
        close_current()
        yield pd.DataFrame(
            out_rows, columns=["shard", "rows", "bytes", "sha256"]
        )

    return df.select(cols).mapInPandas(
        gen, schema="shard string, rows long, bytes long, sha256 string"
    )


def verify_tar_shards(spark, manifest_df):
    """Distributed integrity check of exported tar shards against their
    manifest: re-hash every shard and report one row per PROBLEM shard
    with a ``status`` of ``missing`` (file gone), ``hash_mismatch``
    (bytes drifted), or ``unexpected`` (a shard on disk the manifest
    doesn't know). Empty result = delivery intact. The shape every
    loader-side checksum pass runs before a training job trusts a shard
    directory.

    Hashing is a CHUNKED stream (4 MiB reads into hashlib, which
    releases the GIL and runs at C speed) inside one Arrow pass keyed
    on the shard paths — NOT a ``binaryFile`` content read: binaryFile
    materializes each file as a single byte-array cell capped at
    Int.MaxValue (~2 GiB), which large ``shard_rows × sample`` exports
    exceed exactly where a loader-side check matters most (r8 ADVICE).
    The binaryFile source is still used for DISCOVERY (path column
    only — content is never selected, so nothing is read), which is
    what finds the ``unexpected`` shards a manifest-only pass can't.

    Scale: one list of the shard dirs + one task per shard hashing at
    stream speed with constant memory, + a broadcast-sized manifest
    join. Shard files larger than 2 GiB verify fine.

    FILESYSTEM REQUIREMENT (r9 ADVICE): the hash loop reads shards with
    Python ``open()`` on EXECUTORS, so the manifest's paths must
    resolve on every executor — a shared filesystem (NFS, FUSE-mounted
    object store) or single-node/local mode. This matches
    ``write_tar_shards``' own local-write posture (tarfile writes the
    same way); on a multi-node cluster with non-shared local disks
    every shard reports ``missing``. For shards on remote storage
    (s3a:// etc.) without a mount, port the loop to the Hadoop
    FileSystem API (``_swap_dir`` in streaming/jobs.py shows the
    incantation) — deliberately not done until a real deployment needs
    it, so the common local path stays dependency-free.
    """
    from pyspark.sql import functions as F

    # write_tar_shards returns a LAZY manifest whose action IS the
    # export; this function uses the manifest twice (dirs pull + join),
    # so materialize it once — otherwise a lazy manifest would re-run
    # the exporter concurrently with the verification scan, rewriting
    # shards mid-hash and reporting spurious mismatches
    manifest_df = manifest_df.localCheckpoint(eager=True)
    expected = manifest_df.select(
        F.col("shard"), F.col("sha256").alias("expected_sha256")
    )
    dirs = sorted({os.path.dirname(r["shard"]) for r in expected.collect()})
    on_disk = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(dirs)
        .select(
            # binaryFile paths carry a file: scheme; manifest paths are
            # plain local paths — strip the scheme for the join. ONLY
            # the path column: selecting content here would re-impose
            # the 2 GiB cell cap this function exists to avoid.
            F.regexp_replace(F.col("path"), "^file:", "").alias("shard")
        )
    )
    to_hash = (
        expected.select("shard")
        .unionByName(on_disk)
        .distinct()
        # one shard per task: the path list is tiny, the hashing isn't
        .repartition(spark.sparkContext.defaultParallelism, "shard")
    )

    def gen(batches):
        import hashlib
        import os as _os

        import pandas as pd

        for pdf in batches:
            shards, hashes = [], []
            for p in pdf["shard"]:
                if not _os.path.exists(p):
                    continue  # no actual row -> full_outer join says missing
                h = hashlib.sha256()
                with open(p, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 22), b""):
                        h.update(chunk)
                shards.append(p)
                hashes.append(h.hexdigest())
            yield pd.DataFrame({"shard": shards, "actual_sha256": hashes})

    actual = to_hash.mapInPandas(gen, "shard string, actual_sha256 string")
    joined = expected.join(actual, "shard", "full_outer")
    return joined.select(
        "shard",
        F.when(F.col("actual_sha256").isNull(), F.lit("missing"))
        .when(F.col("expected_sha256").isNull(), F.lit("unexpected"))
        .when(
            F.col("actual_sha256") != F.col("expected_sha256"),
            F.lit("hash_mismatch"),
        )
        .alias("status"),
        "expected_sha256",
        "actual_sha256",
    ).filter(F.col("status").isNotNull()).orderBy("shard")


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Inverse of ``write_tar_shards``: (key, ext, payload binary, shard)
    rows from a directory of tar shards. One task per shard via the
    ``binaryFile`` source (a shard is the atomic unit of parallelism in
    the WebDataset model — loaders stream shards, not samples), untarred
    in-memory with stdlib tarfile. Reassemble per-sample records with
    ``groupBy(key).pivot(ext)`` or a map_from_entries aggregation."""

    def gen(batches):
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            keys, exts, payloads, shards = [], [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as t:
                    for m in t.getmembers():
                        if not m.isfile():
                            continue
                        key, _, ext = m.name.rpartition(".")
                        keys.append(key)
                        exts.append(ext)
                        payloads.append(t.extractfile(m).read())
                        shards.append(p)
            yield pd.DataFrame(
                {"key": keys, "ext": exts, "payload": payloads, "shard": shards}
            )

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
        .mapInPandas(gen, schema="key string, ext string, payload binary, shard string")
    )


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    expected_ndv: int = 100_000,
    fpp: float = 0.01,
    mode: str = "overwrite",
) -> None:
    """Parquet write with split-block BLOOM FILTERS on ``bloom_cols`` —
    the data-skipping tier for point lookups on HIGH-CARDINALITY,
    UNSORTED columns, where min/max ranges (write_sorted_by_range) and
    z-order keys cannot help: every row group's range covers the whole
    domain, but the bloom filter answers "definitely not in this row
    group" in one membership probe. At 100 TB this turns a needle
    lookup (order id, document hash) from a full-column scan into a
    handful of row groups, complementing the sorted/z-order layouts
    that serve RANGE predicates.

    ``expected_ndv`` sizes the filter per column per row group (bits ≈
    -ndv·ln(fpp)/ln(2)²); oversizing wastes footer bytes, undersizing
    inflates the false-positive rate — set it near the per-row-group
    distinct count, not the table-wide one. Readers need no opt-in
    (Spark's parquet reader consumes bloom filters automatically);
    results are byte-identical with or without the filters (pinned)."""
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = (
            w.option(f"parquet.bloom.filter.enabled#{c}", "true")
            .option(f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv))
            .option(f"parquet.bloom.filter.fpp#{c}", str(fpp))
        )
    w.parquet(path)
