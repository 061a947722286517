"""Nested-data normalization (reference §2.2 J1–J6).

The reference flattens JSON to ``line_items_0_name``-style wide columns
then loop-unpivots them (``dw2_wc_increment.py:195-287``,
``wc_block2_helpers.py:5-50``). In Spark nested arrays are first-class:
keep ``ArrayType(StructType)`` and ``posexplode`` — array length is data,
not schema, so there is no index-discovery step at all."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_line_items(
    orders: DataFrame,
    array_col: str,
    order_cols: list[str],
    seq_col: str = "ItemOrderSeq",
    keep_empty: bool = False,
) -> DataFrame:
    """J3: one row per array element; ``seq_col`` is the 1-based position
    (the reference's ``ItemOrderSeq``, ``dw2_wc_increment.py:210,255``).

    ``posexplode_outer`` (``keep_empty=True``) preserves parent rows with
    empty arrays (J4/J5 coupon/refund semantics drop them → default False
    mirrors the reference's notna filter ``dw2_wc_increment.py:287``).
    """
    fn = F.posexplode_outer if keep_empty else F.posexplode
    item = fn(F.col(array_col)).alias("pos", "item")
    out = orders.select(*order_cols, item)
    return out.select(
        *order_cols, (F.col("pos") + 1).alias(seq_col), F.col("item.*")
    )


def meta_lookup(meta_col, key: str):
    """J6 by-key (robust) variant of the reference's positional
    ``meta_data[n]`` access (``dw2_wc_increment.py:214-223``)."""
    matches = F.filter(meta_col, lambda m: m["key"] == key)
    return F.when(F.size(matches) > 0, matches[0]["value"])
