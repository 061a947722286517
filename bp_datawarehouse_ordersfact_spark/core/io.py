"""Table IO for the driver testdata and engine staging.

The reference's IR between stages is schemaless CSV on GCS re-parsed with
hand-maintained dtype dicts (reference ``dw3_merge_inc.py:33-83``,
``gcp_getbucket.py:7-18``). Here staging is Parquet (schema-carrying,
columnar, splittable) and readers are one-liners; explicit StructType
schemas exist only for schemaless formats (CSV/JSON ingest — see
``core.schemas``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to session-TZ TIMESTAMP.

    Parquet files written without ``isAdjustedToUTC`` read back as
    TIMESTAMP_NTZ under Spark 4, a type many chrono functions
    (``unix_micros``, watermarks on some builds) reject. Engine sessions
    pin ``spark.sql.session.timeZone=UTC`` (core.session), so this cast
    reinterprets the naive values as the same UTC instants DuckDB assumes
    when it runs ``epoch()`` on a naive TIMESTAMP — oracle parity holds.
    """
    from pyspark.sql import functions as F

    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    if not ntz:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet → columnar scan with predicate
    pushdown and column pruning for free.

    Timestamp physical-type drift across generator versions is absorbed
    here so queries always see TIMESTAMP (UTC session):
    - TIMESTAMP(NANOS) (rejected by Spark's reader) → int64 nanos via the
      legacy conf, truncated to micros — the same truncation DuckDB
      applies;
    - naive TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) → cast, see
      ``normalize_ntz``.
    """
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return normalize_ntz(df)
    return normalize_ntz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register testdata tables as temp views so operators can be written
    in either DataFrame or SQL form against the same names DuckDB uses."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Staging writer (reference S4 ``gcp_postbucket.py:7-25`` equivalent).

    Partitioned Parquet so downstream reads get partition pruning — the
    reference's single-CSV overwrite has no equivalent capability.
    """
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def export_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV kept only as an export-shaped sink (BI handoff), never staging."""
    w = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    w.option("header", True).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed staging table: co-locates rows by join key at WRITE time
    so repeated joins/aggregations on ``bucket_cols`` skip the exchange
    entirely (the biggest single lever for a fact table joined on the
    same key every run — e.g. lineitem ⋈ orders on orderkey at 100 TB).

    Requires a metastore-backed ``saveAsTable`` (local Derby in tests;
    Hive/Glue/Unity in production)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)
