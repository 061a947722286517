"""N-family null handling (reference §2.13)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fill_sentinels(df: DataFrame, fill_map: dict[str, object]) -> DataFrame:
    """N1 (the 34-entry fill dict ``dw5_order_royalty_fact.py:431-479``)."""
    return df.na.fill(fill_map)


def coalesce_derived(col: Column, prefix: str, fallback: Column) -> Column:
    """N2 (``'Missing - ' + Title`` style, ``dw5_order_royalty_fact.py:164-165``)."""
    return F.coalesce(col, F.concat(F.lit(prefix), fallback))


def empty_to_null(col: Column) -> Column:
    """N3 (``replace('', np.nan)`` ``dw2_wc_increment.py:291-295``)."""
    return F.when(F.trim(col) == "", None).otherwise(col)
