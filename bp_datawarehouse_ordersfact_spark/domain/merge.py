"""Stage 2 (reference dw3): incremental delete-insert merge + title staging.

The reference re-pulls a 61-day window and reconciles it against the
archive by whole-key replacement: archive rows whose key appears in the
increment are dropped, then the increment is appended
(``dw3_merge_inc.py:114-116,123-125``). That is an anti-join + union —
or, on Delta/Iceberg staging, a ``MERGE INTO`` keyed the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import anti_join_merge


def merge_wc_increment(archive: DataFrame, increment: DataFrame) -> DataFrame:
    """Whole-order replacement keyed on OrderNumber (JN5/U2)."""
    return anti_join_merge(archive, increment, ["OrderNumber"])


def merge_scb_increment(archive: DataFrame, increment: DataFrame) -> DataFrame:
    """Whole-month replacement keyed on MonthYear (``dw3_merge_inc.py:123``)."""
    return anti_join_merge(archive, increment, ["MonthYear"])


def wc_book_titles(wc: DataFrame) -> DataFrame:
    """Unique (title, category) staging ahead of the expensive similarity
    match — the reference's one deliberate optimization worth keeping
    (aggregate pushdown below the cross join, ``dw3_merge_inc.py:137-140``;
    SURVEY §4.1). Splits 'Title - TypeString' (T5 ``dw3_merge_inc.py:143``)
    and derives BookType from the suffix (C9 ``dw3_merge_inc.py:149-157``)."""
    base = (
        wc.filter(F.col("category") == "Book")
        .select("ProductName")
        .distinct()
        .select(
            F.col("ProductName"),
            # F.get → NULL (not an ANSI error) when there is no ' - ' suffix
            F.get(F.split(F.col("ProductName"), " - ", 2), 0).alias("Title"),
            F.get(F.split(F.col("ProductName"), " - ", 2), 1).alias("TypeString"),
        )
    )
    ts = F.lower(F.coalesce(F.col("TypeString"), F.lit("")))
    return base.select(
        "ProductName",
        "Title",
        F.when(ts.contains("hardcover"), "Hardcover")
        .when(ts.contains("audiobook"), "Audiobook")
        .when(ts.rlike("e-?book"), "E-Book")
        .otherwise("Print")
        .alias("BookType"),
    )


def scb_book_titles(scb: DataFrame) -> DataFrame:
    """Unique SCB titles; the leading-'e' convention marks E-Books
    (C9-SCB ``dw3_merge_inc.py:193-197``) and is stripped from the title."""
    t = (
        scb.select("Title", "ISBN")
        .distinct()
        .select(
            F.col("Title").alias("RawTitle"),
            F.col("ISBN"),
            F.col("Title").startswith("e").alias("is_ebook"),
        )
    )
    return t.select(
        "RawTitle",
        "ISBN",
        F.when(F.col("is_ebook"), F.expr("substring(RawTitle, 2)"))
        .otherwise(F.col("RawTitle"))
        .alias("Title"),
        F.when(F.col("is_ebook"), "E-Book").otherwise("Print").alias("BookType"),
    )
