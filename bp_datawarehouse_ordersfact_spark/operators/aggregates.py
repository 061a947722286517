"""Aggregation operators (reference §2.5 A1–A12).

Spark's hash aggregate already does map-side partial aggregation
(`partial_sum` → shuffle → `sum`), which is the distributed version of
what the reference can't do at all. The helpers here keep the rollup
shapes declarative."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_sum(df: DataFrame, keys: list[str], measures: dict[str, Column]) -> DataFrame:
    """A4–A10 shape: N-key group-by with named summed measures."""
    return df.groupBy(*keys).agg(
        *[F.sum(expr).alias(name) for name, expr in measures.items()]
    )


def null_audit(df: DataFrame) -> DataFrame:
    """A12 (``dw5_order_royalty_fact.py:723``): per-column null counts,
    as a single-row frame (one pass, map-side combinable)."""
    return df.select(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    )


def group_sizes(df: DataFrame, keys: list[str]) -> DataFrame:
    """A2/A3/A11: group cardinality probe."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
