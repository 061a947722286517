"""D-family date/time expressions (reference §2.9)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_month_name_key(year: Column, month_name: Column) -> Column:
    """D3 (``dw5_order_royalty_fact.py:733``): ``2024`` + ``March`` →
    timestamp 2024-03-01. Spark pattern ``yyyyMMMM``."""
    return F.to_timestamp(F.concat(year.cast("string"), month_name), "yyyyMMMM")


def shift_months(ts: Column, n: int) -> Column:
    """D4 (``dw5_order_royalty_fact.py:741``): SCB payment lag = +3 months."""
    return F.add_months(ts, n)


def month_key(d: Column) -> Column:
    """MKEY convention: ``MonthName`` ‖ ``Year`` (``dw3_merge_inc.py:110-112``)."""
    return F.concat(F.date_format(d, "MMMM"), F.year(d).cast("string"))


def build_date_dim(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Generate a Date_Dim the reference only ever reads
    (``dw5_order_royalty_fact.py:116-117``): one row per day with the
    calendar attributes the facts join on. `sequence`+`explode` keeps it
    fully JVM-side."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
            ).alias("d")
        )
        .select(
            F.col("d").alias("date"),
            F.year("d").alias("year"),
            F.month("d").alias("month"),
            F.date_format("d", "MMMM").alias("monthname"),
            month_key(F.col("d")).alias("monthyear"),
            F.quarter("d").alias("quarter"),
            F.concat(F.year("d"), F.lit("Q"), F.quarter("d")).alias("quarter_key"),
        )
    )
