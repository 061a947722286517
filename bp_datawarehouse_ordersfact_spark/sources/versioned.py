"""Versioned Parquet snapshots: time travel + diff on a plain filesystem.

The reference's north star names Delta/Iceberg for table history
(BASELINE.json), but delta-spark is not in this container — and a
surprising amount of the value (reproducible reads, rollback, audit
diffs) needs only a COMMIT PROTOCOL, not a new file format. This module
is that protocol over plain Parquet:

- every snapshot's data lands under ``base_dir/v=N/`` (a full copy —
  snapshots, not deltas: read cost is one directory scan, no log
  replay);
- the ``_manifest`` table is the source of truth: a version EXISTS only
  once its manifest row is appended, and the row is appended only after
  the data directory is fully written. A crash mid-write leaves an
  orphan directory that no reader ever sees (``vacuum_uncommitted``
  removes them);
- readers resolve "latest" through the manifest, never by listing data
  directories — so concurrent readers see a consistent version while a
  writer is mid-snapshot;
- retention (``expire_snapshots``) is ALSO append-only: expiring a
  version appends a TOMBSTONE row (n_rows = -1) rather than rewriting
  the manifest, so a reader sees either the pre-expiry manifest (all
  versions alive) or the post-expiry one (expired versions gone) —
  never a half-expired state — and version numbers are never reused.

Single-writer contract: version allocation reads the manifest, so two
concurrent writers could both claim N+1 — the same caveat as Delta on a
filesystem without atomic-rename or a lock service. Run snapshots from
one scheduler slot (the repo's orchestrator convention).

At 100 TB, full-copy snapshots are the right default for DIMENSION and
curated-corpus tables (the things one rolls back); for fact-scale data
the incremental path is `operators/scd.py` / `cdc_apply` — history IN
the table, not copies OF the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

_MANIFEST_SCHEMA = "version int, label string, n_rows long"


def _manifest_path(base_dir: str) -> str:
    return os.path.join(base_dir, "_manifest")


def _read_manifest(spark: SparkSession, base_dir: str) -> DataFrame:
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(_manifest_path(base_dir))
    except AnalysisException:  # no snapshots yet
        return spark.createDataFrame([], _MANIFEST_SCHEMA)


def _alive_manifest(spark: SparkSession, base_dir: str) -> DataFrame:
    """Commit rows of versions that are committed and NOT tombstoned —
    what every reader resolves against. A tombstone is an appended row
    with n_rows < 0 (``expire_snapshots``)."""
    mf = _read_manifest(spark, base_dir)
    tomb = mf.filter(F.col("n_rows") < 0).select("version")
    return mf.filter(F.col("n_rows") >= 0).join(tomb, "version", "left_anti")


def write_snapshot(
    df: DataFrame, base_dir: str, label: str | None = None
) -> int:
    """Commit ``df`` as the next snapshot version; returns the version.
    Data is fully written BEFORE the manifest row lands — the manifest
    append is the commit point."""
    spark = df.sparkSession
    # allocate over the RAW manifest (tombstoned rows included): an
    # expired version's number is never reused, so time-travel reads,
    # diffs, and audit logs stay unambiguous forever
    prev = _read_manifest(spark, base_dir).agg(F.max("version")).collect()[0][0]
    version = (prev if prev is not None else -1) + 1
    obs = Observation(f"snapshot_v{version}")
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "errorifexists"
    ).parquet(os.path.join(base_dir, f"v={version}"))
    n_rows = int(obs.get["rows"])
    spark.createDataFrame(
        [(version, label, n_rows)], _MANIFEST_SCHEMA
    ).write.mode("append").parquet(_manifest_path(base_dir))
    return version


def list_snapshots(spark: SparkSession, base_dir: str) -> DataFrame:
    """(version, label, n_rows), ascending — committed, unexpired
    versions only."""
    return _alive_manifest(spark, base_dir).orderBy("version")


def read_snapshot(
    spark: SparkSession, base_dir: str, version: int | None = None
) -> DataFrame:
    """The table AS OF ``version`` (default: latest committed). Reading
    an uncommitted, EXPIRED, or unknown version raises — an orphan data
    directory from a crashed writer is not a version, and an expired
    version's data may already be deleted."""
    mf = _alive_manifest(spark, base_dir)
    if version is None:
        row = mf.agg(F.max("version").alias("v")).collect()[0]
        if row["v"] is None:
            raise ValueError(f"no committed snapshots under {base_dir}")
        version = row["v"]
    elif mf.filter(F.col("version") == version).count() == 0:
        raise ValueError(f"version {version} is not committed under {base_dir}")
    return spark.read.parquet(os.path.join(base_dir, f"v={version}"))


def diff_snapshots(
    spark: SparkSession,
    base_dir: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
) -> DataFrame:
    """Audit diff between two committed versions, keyed by ``key_cols``:
    (change, *key_cols) with change ∈ insert/delete/update. One
    full-outer join on the keys; non-key columns compare via an md5 of
    their canonical JSON so any width of payload costs one hash column
    per side."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    old = read_snapshot(spark, base_dir, v_old)
    new = read_snapshot(spark, base_dir, v_new)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema drift between v{v_old} and v{v_new}: "
            f"{sorted(set(old.columns) ^ set(new.columns))}"
        )
    payload = [c for c in new.columns if c not in key_cols]

    def fp(df: DataFrame, name: str) -> DataFrame:
        h = (
            F.md5(F.to_json(F.struct(*[F.col(c) for c in sorted(payload)])))
            if payload
            else F.lit("")
        )
        return df.select(*key_cols, h.alias(name))

    joined = fp(old, "h_old").join(fp(new, "h_new"), key_cols, "full_outer")
    return joined.select(
        F.when(F.col("h_old").isNull(), F.lit("insert"))
        .when(F.col("h_new").isNull(), F.lit("delete"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("update"))
        .alias("change"),
        *key_cols,
    ).filter(F.col("change").isNotNull())


def vacuum_uncommitted(spark: SparkSession, base_dir: str) -> list[int]:
    """Remove orphan ``v=N`` directories with no LIVE manifest row —
    crashed writers, and expired versions whose data deletion was
    interrupted mid-``expire_snapshots``. Returns the removed version
    numbers. Uses the Hadoop FileSystem API, so it works on any
    filesystem spark.read does."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(base_dir).getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(Path(base_dir)):
        return []
    committed = {
        r["version"]
        for r in _alive_manifest(spark, base_dir).select("version").collect()
    }
    removed = []
    for status in fs.listStatus(Path(base_dir)):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith("v="):
            v = int(name[2:])
            if v not in committed:
                fs.delete(status.getPath(), True)
                removed.append(v)
    return sorted(removed)


def expire_snapshots(
    spark: SparkSession, base_dir: str, keep_last: int
) -> list[int]:
    """Retention: expire all but the newest ``keep_last`` committed
    versions; returns the expired version numbers. Full-copy snapshot
    history otherwise grows without bound — for per-run dimension
    snapshots that is one full table copy per orchestrator run
    (r6 VERDICT #4).

    The commit point is ONE manifest append of tombstone rows
    (n_rows = -1): a reader resolves either the pre-expiry manifest or
    the post-expiry one, never a half-expired mix — no manifest rewrite,
    no delete/rename window, same append-only discipline as
    ``write_snapshot``. The expired data directories are deleted after
    the tombstones land; a crash in between leaves orphans that
    ``vacuum_uncommitted`` removes (they are already invisible to every
    reader). Single-writer contract (module docstring) applies."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    alive = sorted(
        r["version"]
        for r in _alive_manifest(spark, base_dir).select("version").collect()
    )
    expired = alive[:-keep_last]
    if not expired:
        return []
    spark.createDataFrame(
        [(v, "__expired__", -1) for v in expired], _MANIFEST_SCHEMA
    ).write.mode("append").parquet(_manifest_path(base_dir))
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(base_dir).getFileSystem(spark._jsc.hadoopConfiguration())
    for v in expired:
        p = Path(os.path.join(base_dir, f"v={v}"))
        if fs.exists(p):
            fs.delete(p, True)
    return expired
