"""Window operators (reference §2.6 W1–W4).

The reference emulates every per-group broadcast with groupby + join-back
(A1+JN4, ``dw2_wc_increment.py:457-479``) and the bundle-parent lookup
with a dedup + self-join (JN14, ``dw5_order_royalty_fact.py:377-389``).
Windows express both with a single shuffle and no join."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_group_totals(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """W1: attach partition-wide aggregates to every row (one shuffle on
    ``keys``, replacing the reference's groupBy + join-back)."""
    w = Window.partitionBy(*keys)
    out = df
    for name, expr in aggs.items():
        out = out.withColumn(name, expr.over(w))
    return out


def parent_value_on_components(
    df: DataFrame,
    partition_keys: list[str],
    is_parent: Column,
    value: Column,
    out_col: str,
) -> Column | DataFrame:
    """W3 (replaces self-join JN14): broadcast the parent row's value to
    all rows of its partition via ``max(when(parent, value))``."""
    w = Window.partitionBy(*partition_keys)
    return df.withColumn(out_col, F.max(F.when(is_parent, value)).over(w))
