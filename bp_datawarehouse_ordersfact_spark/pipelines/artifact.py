"""Commit-pointer protocol for mutable directory artifacts.

Maintenance passes (``compact_ann_index``, ``compact_dedup_store``)
previously rewrote an artifact with ``fs.delete(live)`` +
``fs.rename(staging, live)`` — between the two calls there is NO live
directory (a concurrent reader gets PATH_NOT_FOUND, not "old or new"),
a driver crash between them strands the data in the staging dir, and on
S3A the rename itself is non-atomic (r6 ADVICE). This module replaces
the swap with the manifest/commit-pointer indirection
``sources/versioned.py`` already uses for table snapshots:

- each rewrite lands in a fresh ``base_dir/{name}.v{N}`` directory — an
  uncommitted directory no reader ever resolves;
- ``base_dir/_commits/{name}`` is an append-only parquet ledger of
  committed versions; appending the row IS the commit point (one file
  create — no delete/rename pair with a dead window);
- readers resolve the live directory through the ledger
  (``current_artifact_dir``); while a rewrite is in flight they keep
  resolving the previous version, and a crash before the commit row
  leaves the previous version live with only an orphan ``v`` directory
  to garbage-collect (absorbed by the next rewrite's ``overwrite``).

Legacy layout: an artifact with no ledger resolves to the plain
``base_dir/{name}`` directory builders write, so existing stores keep
working and migrate to versioned directories on their first compaction.

After a commit, older version directories are dropped eagerly — a
reader that resolved the OLD version before the commit and is still
mid-scan can fail loudly (retry resolves the new version); this is the
standard vacuum trade-off, and the single-writer maintenance contract
(one compactor at a time, the ``sources/versioned.py`` caveat) still
applies to version allocation itself.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_COMMITS_SCHEMA = "version long"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _ledger_path(base_dir: str, name: str) -> str:
    return os.path.join(base_dir, "_commits", name)


def _committed_max(spark: SparkSession, base_dir: str, name: str):
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return (
            spark.read.parquet(_ledger_path(base_dir, name))
            .agg(F.max("version"))
            .collect()[0][0]
        )
    except AnalysisException:  # no ledger yet → legacy layout
        return None


def current_artifact_dir(spark: SparkSession, base_dir: str, name: str) -> str:
    """The live directory for ``name``: the highest committed version's
    ``{name}.v{N}``, or the legacy plain ``{name}`` directory when the
    artifact has never been rewritten under the ledger."""
    v = _committed_max(spark, base_dir, name)
    if v is None:
        return os.path.join(base_dir, name)
    return os.path.join(base_dir, f"{name}.v{v}")


def next_artifact_dir(
    spark: SparkSession, base_dir: str, name: str
) -> tuple[int, str]:
    """(version, directory) for the NEXT rewrite. The directory is
    uncommitted — invisible to every reader — until
    ``commit_artifact_version`` appends its ledger row; write it with
    mode("overwrite") so an orphan from a crashed previous attempt is
    absorbed instead of colliding."""
    v = _committed_max(spark, base_dir, name)
    nxt = 1 if v is None else int(v) + 1
    return nxt, os.path.join(base_dir, f"{name}.v{nxt}")


def commit_artifact_version(
    spark: SparkSession, base_dir: str, name: str, version: int
) -> None:
    """COMMIT ``version`` (its directory must be fully written) by
    appending the ledger row, then drop every superseded directory —
    the legacy plain dir and all lower versions."""
    spark.createDataFrame([(version,)], _COMMITS_SCHEMA).write.mode(
        "append"
    ).parquet(_ledger_path(base_dir, name))
    fs, jvm = _fs(spark, base_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    legacy = Path(os.path.join(base_dir, name))
    if fs.exists(legacy):
        fs.delete(legacy, True)
    for old in range(1, version):
        p = Path(os.path.join(base_dir, f"{name}.v{old}"))
        if fs.exists(p):
            fs.delete(p, True)


def reset_artifact(spark: SparkSession, base_dir: str, name: str) -> None:
    """Drop the ledger and every versioned directory for ``name`` — a
    full REBUILD is about to write the legacy plain directory, which
    must become the resolved artifact again (a stale ledger would keep
    readers pinned to a pre-rebuild version)."""
    fs, jvm = _fs(spark, base_dir)
    Path = jvm.org.apache.hadoop.fs.Path
    base = Path(base_dir)
    if not fs.exists(base):
        return
    ledger = Path(_ledger_path(base_dir, name))
    if fs.exists(ledger):
        fs.delete(ledger, True)
    prefix = f"{name}.v"
    for status in fs.listStatus(base):
        n = status.getPath().getName()
        if status.isDirectory() and n.startswith(prefix) and n[len(prefix):].isdigit():
            fs.delete(status.getPath(), True)
