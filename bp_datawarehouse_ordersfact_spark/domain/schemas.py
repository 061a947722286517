"""Canonical schemas for the domain pipeline (FIXTURES.md).

The reference's only schema system is two hand-maintained dtype dicts
duplicated across scripts (``dw3_merge_inc.py:33-83`` ≡
``dw5_order_royalty_fact.py:50-100``); here each schema exists once.
Nested order schema per the WooCommerce API shape consumed at
``dw2_wc_increment.py:179-189`` (field inventory from the J3–J6
extractions ``dw2_wc_increment.py:229-274,372-379,404-410``).

Monetary API fields are STRINGS (hence the reference's
``replace('',0).astype(float)`` coercions ``dw2_wc_increment.py:426-443``)
— kept as strings here and coerced once in ``ingest``.
"""

from __future__ import annotations

from pyspark.sql import types as T


META_ENTRY = T.StructType(
    [T.StructField("key", T.StringType()), T.StructField("value", T.StringType())]
)

LINE_ITEM = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("sku", T.StringType()),
        T.StructField("product_id", T.LongType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("subtotal", T.StringType()),
        T.StructField("total", T.StringType()),
        T.StructField("meta_data", T.ArrayType(META_ENTRY)),
        T.StructField("composite_parent", T.StringType()),
        T.StructField("bundled_by", T.StringType()),
    ]
)

COUPON_LINE = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("code", T.StringType()),
        T.StructField("discount", T.StringType()),
    ]
)

REFUND = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("reason", T.StringType()),
        T.StructField("total", T.StringType()),
    ]
)

WC_ORDER_RAW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("number", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("date_created", T.TimestampType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField(
            "billing", T.StructType([T.StructField("email", T.StringType())])
        ),
        T.StructField(
            "shipping",
            T.StructType(
                [
                    T.StructField("city", T.StringType()),
                    T.StructField("state", T.StringType()),
                    T.StructField("postcode", T.StringType()),
                    T.StructField("country", T.StringType()),
                ]
            ),
        ),
        T.StructField("shipping_total", T.StringType()),
        T.StructField("total", T.StringType()),
        T.StructField("line_items", T.ArrayType(LINE_ITEM)),
        T.StructField("coupon_lines", T.ArrayType(COUPON_LINE)),
        T.StructField("refunds", T.ArrayType(REFUND)),
    ]
)

SCB_MONTHLY = T.StructType(
    [
        T.StructField("Month", T.StringType()),
        T.StructField("Year", T.IntegerType()),
        T.StructField("Title", T.StringType()),
        T.StructField("ISBN", T.StringType()),
        T.StructField("Quantity_Shipped", T.IntegerType()),
        T.StructField("Publisher_Payment", T.DoubleType()),
        T.StructField("Quantity_Returned", T.IntegerType()),
        T.StructField("Publisher_Credits", T.DoubleType()),
        T.StructField("MonthYear", T.StringType()),
    ]
)

BOOKS_MASTER = T.StructType(
    [
        T.StructField("Book_Title", T.StringType()),
        T.StructField("Author", T.StringType()),
        T.StructField("Royalty_Author_Name", T.StringType()),
        T.StructField("Short_Hand_Title", T.StringType()),
        T.StructField("Print_ISBN", T.StringType()),
        T.StructField("eBook_ISBN", T.StringType()),
        T.StructField("Audiobook_ISBN", T.StringType()),
        T.StructField("Hardcover_ISBN", T.StringType()),
        T.StructField("Print_Royalty_Rate", T.StringType()),
        T.StructField("eBook_Royalty_Rate", T.StringType()),
        T.StructField("Audiobook_Royalty_Rate", T.StringType()),
    ]
)

BUNDLE_MASTER = T.StructType(
    [
        T.StructField("Product", T.StringType()),
        T.StructField("Standard_Sale_Price", T.DoubleType()),
        T.StructField("Books", T.IntegerType()),
        T.StructField("Non_books", T.IntegerType()),
        T.StructField("Revenue_Per_Book", T.StringType()),
        T.StructField("Revenue_to_Non_Books", T.StringType()),
    ]
)
