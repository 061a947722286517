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
    positions, b's at odd; always positive in a signed long — the sort
    order a range partitioner needs.

    Out-of-domain inputs (negative or >= 2^31 — e.g. sentinels or
    unnormalized epoch deltas; normalize via rank/epoch-day encoding
    first) yield NULL rather than a silently-wrong key: a masked -1
    would otherwise sort as the LARGEST key and scatter exactly the rows
    the layout should cluster, with nothing surfacing the misuse. Null
    keys sort together (nulls-first), so misuse shows up as one visible
    clump, not destroyed locality."""
    lim = F.lit(2**31)
    in_domain = (a >= 0) & (a < lim) & (b >= 0) & (b < lim)
    return F.when(in_domain, _dilate(a).bitwiseOR(F.shiftleft(_dilate(b), 1)))
