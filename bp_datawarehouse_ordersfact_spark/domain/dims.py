"""Stage 3 (reference dw4): Book/Bundle/Merch dimensions via similarity
matching against master data.

Book_Dim: TF-IDF cosine ≥ 0.7 between cleaned master and source titles
(``dw4_book_dim.py:166-192``) — here via the sparse token-join scorer
(never a cross join; SURVEY §2.12 F1). Bundle_Dim: levenshtein ratio ≥ 95
(``dw4_book_dim.py:291-293``). Rates arrive as strings ('15%', '25',
'0.15') and are normalized to fractions (C11 ``dw4_book_dim.py:248-264``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import clean_for_match, percent_to_fraction
from ..operators.similarity import fuzzy_ratio_join, tfidf_cosine_match


def book_dim(
    books_master: DataFrame, titles: DataFrame, threshold: float = 0.7
) -> DataFrame:
    """Master books × staged source titles via TF-IDF cosine match, then
    per-BookType ISBN/rate selection (C10 ``dw4_book_dim.py:194-204,
    233-242``) with placeholder + default fills (N1/N2
    ``dw4_book_dim.py:66-73,244-245``)."""
    # the titles themselves are the match ids — deterministic across plan
    # re-evaluation (unlike monotonically_increasing_id) and unique after
    # the staging dedup (merge.wc_book_titles / scb_book_titles)
    m = books_master.select("*", clean_for_match(F.col("Book_Title")).alias("_clean_master"))
    t = titles.select("*", clean_for_match(F.col("Title")).alias("_clean_title"))

    matches = tfidf_cosine_match(
        m.select("Book_Title", "_clean_master"),
        "Book_Title",
        "_clean_master",
        t.select("Title", "_clean_title"),
        "Title",
        "_clean_title",
        threshold=threshold,
    )

    joined = (
        matches.join(m, matches.m_id == m.Book_Title)
        .join(t, matches.c_id == t.Title)
        .drop("_clean_master", "_clean_title", "m_id", "c_id")
    )

    # N2: ISBN placeholders from shorthand (dw4_book_dim.py:69-72)
    with_isbn = joined.withColumns(
        {
            "Print_ISBN": F.coalesce(
                F.col("Print_ISBN"), F.concat(F.lit("NA-Print-"), F.col("Short_Hand_Title"))
            ),
            "eBook_ISBN": F.coalesce(
                F.col("eBook_ISBN"), F.concat(F.lit("NA-Ebook-"), F.col("Short_Hand_Title"))
            ),
            "Audiobook_ISBN": F.coalesce(
                F.col("Audiobook_ISBN"),
                F.concat(F.lit("NA-Audio-"), F.col("Short_Hand_Title")),
            ),
            "Hardcover_ISBN": F.coalesce(
                F.col("Hardcover_ISBN"),
                F.concat(F.lit("NA-Hardcover-"), F.col("Short_Hand_Title")),
            ),
            # N1: rate defaults as STRINGS, faithful to the master's string
            # typing (dw4_book_dim.py:66-68)
            "Print_Royalty_Rate": F.coalesce(F.col("Print_Royalty_Rate"), F.lit("0.15")),
            "eBook_Royalty_Rate": F.coalesce(F.col("eBook_Royalty_Rate"), F.lit("0.25")),
            "Audiobook_Royalty_Rate": F.coalesce(
                F.col("Audiobook_Royalty_Rate"), F.lit("0.25")
            ),
            "Royalty_Author_Name": F.coalesce(
                F.col("Royalty_Author_Name"), F.lit("No Record")
            ),
        }
    )

    bt = F.col("BookType")
    # C10: per-type ISBN, Hardcover falling back to Print when the
    # hardcover ISBN is an NA- placeholder (dw4_book_dim.py:194-204)
    isbn_all = (
        F.when(bt == "E-Book", F.col("eBook_ISBN"))
        .when(bt == "Audiobook", F.col("Audiobook_ISBN"))
        .when(
            bt == "Hardcover",
            F.when(
                F.col("Hardcover_ISBN").contains("NA"), F.col("Print_ISBN")
            ).otherwise(F.col("Hardcover_ISBN")),
        )
        .when(bt == "Print", F.col("Print_ISBN"))
        .otherwise(F.lit("Missing"))
    )
    # C10-rates + C11 normalization ('15%'/'25'/'0.15' → 0.15/0.25/0.15)
    rate_all = percent_to_fraction(
        F.when(bt == "E-Book", F.col("eBook_Royalty_Rate"))
        .when(bt == "Audiobook", F.col("Audiobook_Royalty_Rate"))
        .otherwise(F.col("Print_Royalty_Rate"))
    )
    return with_isbn.select(
        F.col("Title").alias("Source_Title"),
        F.col("Book_Title").alias("True_Title"),
        "Author",
        "Royalty_Author_Name",
        "BookType",
        F.col("cosine").alias("TfidfSimilarity"),
        isbn_all.alias("ISBN_All"),
        rate_all.alias("Royalty_Rate_All"),
    )


def bundle_dim(
    bundle_master: DataFrame, wc: DataFrame, threshold: float = 95.0
) -> DataFrame:
    """Source bundle names (deduped by Bundle ID — the reference's
    fan-out guard ``dw5_order_royalty_fact.py:385``/``dw4_book_dim.py:284``)
    matched to master by levenshtein ratio ≥ 95 (F2), with revenue shares
    normalized from percent forms (C11 ``dw4_book_dim.py:319-323``)."""
    src = (
        wc.filter(F.col("BundleID").isNotNull())
        .select(F.col("BundleID").alias("Bundle_ID"), F.col("ProductName"))
        .dropDuplicates(["Bundle_ID"])
    )
    matched = fuzzy_ratio_join(
        bundle_master, "Product", src, "ProductName", threshold=threshold
    )
    # a near-95 master sibling can double-match one source bundle — keep
    # the best ratio per Bundle_ID with a deterministic tie-break
    # (the P10 keep-first discipline; reference dedups by Bundle ID at
    # dw4_book_dim.py:284)
    from ..operators.joins import dedup_keep_first

    matched = dedup_keep_first(
        matched, ["Bundle_ID"], [F.desc("match_ratio"), F.asc("Product")]
    )
    return matched.select(
        "Bundle_ID",
        F.col("ProductName").alias("Bundle_Name"),
        F.col("Product").alias("Master_Product"),
        "match_ratio",
        percent_to_fraction(F.col("Revenue_Per_Book")).alias("Revenue_Share_Book"),
        percent_to_fraction(F.col("Revenue_to_Non_Books")).alias(
            "Revenue_Share_NonBook"
        ),
    )


def merch_dim(wc: DataFrame) -> DataFrame:
    """Merch rows pass through on name (``dw4_book_dim.py:268-271``)."""
    return (
        wc.filter(F.col("category") == "Merch")
        .select(F.col("ProductName").alias("Product_Name"))
        .distinct()
    )
