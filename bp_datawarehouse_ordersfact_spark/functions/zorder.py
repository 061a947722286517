"""Z-order (Morton) keys for multi-column data skipping.

``sources.files.write_sorted_by_range`` gives file-level skipping on ONE
sort key (lexicographic on several). When scans filter on TWO
independent columns (date AND customer, lat AND lon), lexicographic
order makes the second column unskippable; interleaving the columns'
bits gives both dimensions locality — the plain-Parquet version of what
Delta's ``OPTIMIZE ZORDER BY`` computes. Sort/range-partition by
``interleave_bits(a, b)`` before writing and both columns' footer
min/max ranges become selective.

Pure codegen column arithmetic (shift/and/or dilation — no UDF): the
key computes at scan speed on any width of data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _dilate(c: Column) -> Column:
    """Spread a 31-bit value's bits to even positions of a 64-bit long
    (the standard magic-mask dilation)."""
    x = c.cast("long").bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def interleave_bits(a: Column, b: Column) -> Column:
    """Morton key of two NON-NEGATIVE ints < 2^31: a's bits at even
    positions, b's at odd. Values are masked to 31 bits so the result
    stays positive in a signed long — the sort order a range partitioner
    needs. (Negative or >= 2^31 inputs must be normalized first, e.g.
    rank- or epoch-day-encoded — the standard z-order preprocessing.)"""
    return _dilate(a).bitwiseOR(F.shiftleft(_dilate(b), 1))
