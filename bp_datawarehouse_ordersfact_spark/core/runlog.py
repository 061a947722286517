"""Run logging + log shipping (reference S8: ``bp_etl.sh:16-29`` —
run → ``tee`` a text log → ``gsutil cp`` to a bucket).

The reference's observability is a shell transcript copied to GCS after
the fact. The engine-appropriate shape is (a) Spark's own event log for
task-level forensics (a session conf, not code) and (b) a STRUCTURED
run log for pipeline-level telemetry — one JSON line per step with
status, row counts, and wall seconds, machine-readable by the same
engine that wrote it (``spark.read.json``). ``ship_logs`` replaces the
``gsutil cp``: a Hadoop-FileSystem copy that works unchanged for
``file://``, ``gs://``, ``s3a://`` — whatever filesystems the session's
Hadoop conf knows (same API as ``streaming.jobs._swap_dir``), no cloud
CLI dependency.

Failure posture: logging must never kill the run it observes — ``step``
serializes defensively (non-JSON field values fall back to ``repr``),
and the writer appends line-at-a-time so a crashed run keeps every step
it completed (the ``tee`` property).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession


class RunLog:
    """Append-only JSONL step log for one pipeline run."""

    def __init__(self, run_id: str, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.run_id = run_id
        self.path = os.path.join(log_dir, f"{run_id}.jsonl")
        self._t0 = time.monotonic()
        self._broken = False

    def step(self, name: str, status: str = "ok", **fields) -> None:
        rec = {
            "run_id": self.run_id,
            "step": name,
            "status": status,
            "ts": round(time.time(), 3),
            "elapsed_s": round(time.monotonic() - self._t0, 3),
        }
        for k, v in fields.items():
            try:
                json.dumps(v)
                rec[k] = v
            except (TypeError, ValueError):
                rec[k] = repr(v)
        try:
            with open(self.path, "a", encoding="utf-8") as fh:
                fh.write(json.dumps(rec, sort_keys=True) + "\n")
        except OSError as ex:  # the never-kill contract: a full disk or
            # revoked permission on the LOG path must not abort the run
            # being observed (r12 review pass 3). One stderr warning,
            # then further writes are skipped (they would fail too).
            if not self._broken:
                import sys

                print(
                    f"runlog: disabling after write failure on "
                    f"{self.path}: {ex}",
                    file=sys.stderr,
                )
            self._broken = True


def ship_logs(spark: SparkSession, local_path: str, dest_dir: str) -> str:
    """Copy a finished run log to ``dest_dir`` on ANY Hadoop filesystem
    (``file://``, ``gs://``, ``s3a://`` …) — the ``gsutil cp`` of
    ``bp_etl.sh:28`` without the CLI. Returns the destination path.
    Overwrites an existing same-named log (re-shipping a re-run is
    idempotent, like every sink here)."""
    jvm = spark._jvm
    Path = jvm.org.apache.hadoop.fs.Path
    conf = spark._jsc.hadoopConfiguration()
    src = Path("file://" + os.path.abspath(local_path))
    dst_dir = Path(dest_dir)
    fs = dst_dir.getFileSystem(conf)
    fs.mkdirs(dst_dir)
    dst = Path(dest_dir.rstrip("/") + "/" + os.path.basename(local_path))
    jvm.org.apache.hadoop.fs.FileUtil.copy(
        src.getFileSystem(conf), src, fs, dst, False, True, conf
    )
    return dst.toString()
