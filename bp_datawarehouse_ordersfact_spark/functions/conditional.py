"""C-family CASE/WHEN builders (reference §2.7).

The reference's ~25 ``np.select``/``np.where`` blocks all become chained
``F.when``. These helpers keep the shapes reusable."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def case_chain(branches: list[tuple[Column, Column]], default: Column) -> Column:
    """``np.select(conds, vals, default)`` equivalent — first match wins."""
    out = None
    for cond, val in branches:
        out = F.when(cond, val) if out is None else out.when(cond, val)
    return default if out is None else out.otherwise(default)


def categorize(col: Column, contains_map: list[tuple[str, str]], default: str) -> Column:
    """C1-shape (``dw2_wc_increment.py:88-109``): name-contains →
    category, first match wins, with a default bucket."""
    lc = F.lower(col)
    return case_chain(
        [(lc.contains(s.lower()), F.lit(cat)) for s, cat in contains_map],
        F.lit(default),
    )


def flag_if(cond: Column, yes: str = "Yes") -> Column:
    """C2/C3-shape boolean → 'Yes'/NULL flags."""
    return F.when(cond, F.lit(yes))


def allocate_by_share(
    category: Column,
    parent_total: Column,
    share_map: dict[str, Column],
    zero_categories: list[str],
) -> Column:
    """C14 bundle revenue allocation (``dw5_order_royalty_fact.py:393-410``):
    parent rows get 0, components get share × parent total."""
    branches: list[tuple[Column, Column]] = [
        (category.isin(zero_categories), F.lit(0.0))
    ]
    branches += [
        (category == cat, share * parent_total) for cat, share in share_map.items()
    ]
    return case_chain(branches, F.lit(0.0))


def carve_out(cond: Column, value: Column) -> Column:
    """C15 wholesale carve-out (``dw5_order_royalty_fact.py:412-428``):
    value when condition else 0."""
    return F.when(cond, value).otherwise(F.lit(0.0))
