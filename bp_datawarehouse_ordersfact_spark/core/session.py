"""SparkSession factory.

One place to set scale-aware defaults. The reference pipeline has no
execution engine at all (4 sequential single-threaded pandas scripts,
``main_orchestrator.py:37-49`` in the reference); here Catalyst + Tungsten
+ AQE are the engine, and this module is where cluster-posture knobs live.

Local test posture is ``local[N]``; on a real cluster only
``master``/memory change — the AQE + shuffle settings below are the ones
that matter at 100 TB (runtime partition coalescing, skew-join splitting,
broadcast thresholds).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bp_datawarehouse_ordersfact_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32 to match
    the driver environment).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime re-planning — coalesce small shuffle partitions,
        # split skewed ones, convert to broadcast join when a side turns
        # out small. Essential at scale, harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Static shuffle width sized to local cores; AQE coalesces down.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas<->Spark crossing (Pandas UDFs, createDataFrame).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Dims here are tiny; give broadcast some headroom over the 10MB default.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
