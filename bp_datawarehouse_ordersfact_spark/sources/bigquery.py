"""BigQuery source/sink (reference S5/S6: ``gcp_getbigquery.py:7-22``
``SELECT *`` read, ``gcp_savebigquery.py:6-38`` WRITE_TRUNCATE load).

Built on the public ``spark-bigquery-connector`` DataSource
(``format("bigquery")``). The connector jar and GCP credentials are not
present in this container, so availability is probed at call time and a
clear ``ConnectorUnavailable`` is raised instead of Py4J noise; the
option surface and semantics below are the real ones, so on a cluster
with ``spark-bigquery-with-dependencies`` on the classpath these
functions run as-is. The gating contract (probe + actionable error) is
tested in tests/test_sources.py; it mirrors the Delta gate in
tests/test_merge_delta.py.

Scale notes (why the options are what they are):
- reads use the BigQuery Storage Read API — each Spark task pulls one
  Arrow stream, so parallelism comes from the connector, not from
  JDBC-style range splits; ``filter`` and selected columns push down
  server-side (the reference's ``SELECT *`` read forfeits both);
- ``writeMethod=direct`` uses the Storage Write API (no staging bucket);
  ``indirect`` stages Parquet in GCS (``temporaryGcsBucket``) and runs a
  BigQuery load job — the exact shape of the reference's
  ``load_table_from_dataframe`` + WRITE_TRUNCATE;
- ``mode("overwrite")`` IS WRITE_TRUNCATE; the reference's autodetect
  schema behavior corresponds to the connector deriving the BigQuery
  schema from the DataFrame schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    """The spark-bigquery connector is not on the session's classpath."""


def _probe(spark: SparkSession) -> None:
    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName(
            "com.google.cloud.spark.bigquery.BigQueryRelationProvider"
        )
    except Exception as ex:
        raise ConnectorUnavailable(
            "spark-bigquery-connector is not on the classpath; start the "
            "session with --packages com.google.cloud.spark:"
            "spark-bigquery-with-dependencies_2.13:<version> (or add the "
            "jar to spark.jars) and authenticate via "
            "GOOGLE_APPLICATION_CREDENTIALS"
        ) from ex


def read_bigquery(
    spark: SparkSession,
    table: str,
    columns: list[str] | None = None,
    row_filter: str | None = None,
) -> DataFrame:
    """S5: read a BigQuery table (``project.dataset.table``).

    Unlike the reference's ``SELECT *`` (``gcp_getbigquery.py:18``),
    ``columns``/``row_filter`` push down into the Storage Read API so
    only the referenced data leaves BigQuery — at warehouse scale the
    difference between a metadata-priced scan and a full-table egress."""
    _probe(spark)
    r = spark.read.format("bigquery")
    if row_filter is not None:
        r = r.option("filter", row_filter)
    df = r.load(table)
    return df.select(*columns) if columns else df


def write_bigquery_truncate(
    df: DataFrame,
    table: str,
    write_method: str = "direct",
    temporary_gcs_bucket: str | None = None,
) -> None:
    """S6: WRITE_TRUNCATE load (``gcp_savebigquery.py:24-33``):
    overwrite the target table, schema derived from the DataFrame.

    ``direct`` streams via the Storage Write API; ``indirect`` stages
    Parquet in ``temporary_gcs_bucket`` then issues a load job — the
    reference's exact pipeline, useful where Storage Write quotas bind."""
    if write_method not in ("direct", "indirect"):
        raise ValueError(f"write_method must be direct|indirect, got {write_method!r}")
    if write_method == "indirect" and not temporary_gcs_bucket:
        raise ValueError("indirect writes require temporary_gcs_bucket")
    _probe(df.sparkSession)
    w = df.write.format("bigquery").mode("overwrite").option(
        "writeMethod", write_method
    )
    if temporary_gcs_bucket:
        w = w.option("temporaryGcsBucket", temporary_gcs_bucket)
    w.save(table)
