"""Stage 4 (reference dw5): FACT_Royalty, FACT_Order, reports, split
royalties.

The reference's 1293-line script reduces to: two source branches (WC
retail, SCB sales+returns) aligned to one schema, a SHARED derived-measure
block (written once here; the reference duplicates it verbatim —
``dw5_order_royalty_fact.py:657-744`` vs ``:1167-1241``), and reporting
rollups. Bundle revenue allocation (C14), wholesale carve-outs (C15), and
the qualified-revenue royalty gates (C16–C19) are the business core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GIFT_WRAP_FEE = 3.0  # dw5_order_royalty_fact.py:364


def enrich_wc_lines(
    wc: DataFrame, book_dim: DataFrame, bundle_dim: DataFrame, merch_dim: DataFrame
) -> DataFrame:
    """The reference's `wc5` frame (SURVEY §3.3 step 3): dim joins, merge
    category, per-item allocations, bundle-parent totals, wholesale
    carve-outs."""
    # T10/N3 artifact parity: BundledBy null → 'Not Bundled'
    # (dw5_order_royalty_fact.py:287-288)
    wc = wc.withColumn("BundledBy", F.coalesce(F.col("BundledBy"), F.lit("Not Bundled")))

    # JN11/JN12/JN13: broadcast dim joins
    wc = (
        wc.join(
            F.broadcast(
                book_dim.select(
                    F.col("Source_Title"),
                    "True_Title",
                    "Royalty_Author_Name",
                    "BookType",
                    "ISBN_All",
                    "Royalty_Rate_All",
                ).dropDuplicates(["Source_Title"])
            ),
            wc.ProductName == F.col("Source_Title"),
            "left",
        )
        .join(
            F.broadcast(
                bundle_dim.select("Bundle_ID", "Revenue_Share_Book", "Revenue_Share_NonBook")
            ),
            wc.BundledBy == F.col("Bundle_ID"),
            "left",
        )
        .join(
            F.broadcast(merch_dim.withColumn("IsMerch", F.lit(True))),
            wc.ProductName == merch_dim.Product_Name,
            "left",
        )
    )

    # C12: bundled book reclassification (dw5_order_royalty_fact.py:346-350)
    wc = wc.withColumn(
        "Category_Merge",
        F.when(
            (F.col("BundledBy") != "Not Bundled") & (F.col("category") == "Book"),
            "Bundled Book",
        ).otherwise(F.col("category")),
    )
    # C13: True_Title_2 falls back to the raw name (dw5:367-371)
    wc = wc.withColumn(
        "True_Title_2",
        F.when(
            F.col("Category_Merge").isin("Book", "Bundled Book"),
            F.coalesce(F.col("True_Title"), F.concat(F.lit("Missing - "), F.col("ProductName"))),
        ).otherwise(F.col("ProductName")),
    )

    # W2: per-item shipping allocation; gift wrap fee (dw5:364-365)
    wc = wc.withColumn(
        "Shipping_Per_Item", F.col("OrderShippingAmount") / F.col("TotalItems")
    ).withColumn(
        "GiftWrap_Revenue",
        F.when(F.col("GiftWrap") == "Yes", F.lit(GIFT_WRAP_FEE)).otherwise(0.0),
    )

    # W3 (replaces JN14's dedup + self-join): parent bundle's line total
    # broadcast onto its component rows via conditional window max over
    # (order, bundle id)
    wp = Window.partitionBy("OrderNumber", F.coalesce("BundleID", "BundledBy"))
    parent_total = F.max(
        F.when(F.col("Category_Merge") == "Bundles", F.col("OrderLineTotal"))
    ).over(wp)
    parent_subtotal = F.max(
        F.when(F.col("Category_Merge") == "Bundles", F.col("OrderLineSubtotal"))
    ).over(wp)
    wc = wc.withColumn("Bundle_Parent_Total", parent_total).withColumn(
        "Bundle_Parent_Subtotal", parent_subtotal
    )

    # C14: bundle revenue allocation (dw5:393-410) — parents zeroed,
    # components get their share of the parent's money
    share = (
        F.when(F.col("Category_Merge") == "Bundled Book", F.col("Revenue_Share_Book"))
        .when(F.col("Category_Merge") == "Merch", F.col("Revenue_Share_NonBook"))
        .otherwise(F.lit(None))
    )
    alloc = lambda parent: (  # noqa: E731
        F.when(F.col("Category_Merge") == "Bundles", 0.0).otherwise(
            F.coalesce(share * parent, F.lit(0.0))
        )
    )
    wc = wc.withColumn(
        "Bundle_Allocated_Total", alloc(F.col("Bundle_Parent_Total"))
    ).withColumn("Bundle_Allocated_Subtotal", alloc(F.col("Bundle_Parent_Subtotal")))

    # C15: wholesale carve-outs (dw5:412-428)
    is_ws = F.col("CustomerRole") == "Wholesale Customer"
    return (
        wc.withColumn(
            "Wholesale_Revenue", F.when(is_ws, F.col("OrderLineTotal")).otherwise(0.0)
        )
        .withColumn(
            "Wholesale_Quantity", F.when(is_ws, F.col("Quantity")).otherwise(F.lit(0))
        )
        .drop("Source_Title", "Bundle_ID", "Product_Name")
    )


FACT_KEYS = ["Fact_Year", "Fact_Month", "True_Title_2", "Royalty_Author_Name",
             "Category_Merge", "ISBN_All", "Royalty_Rate_All", "Data_Source"]

MEASURES = [
    "Quantity_Shipped", "Quantity_Wholesale", "Quantity_Returned",
    "Revenue_Product_Net", "Revenue_Wholesale", "Revenue_Returns",
    "Revenue_GiftWrap", "Revenue_Shipping", "Revenue_Bundle_Allocated",
]


def wc_royalty_grain(wc5: DataFrame) -> DataFrame:
    """A6: the WC royalty-grain rollup (dw5:497-530)."""
    return (
        wc5.groupBy(
            F.year("OrderDate").alias("Fact_Year"),
            F.month("OrderDate").alias("Fact_Month"),
            "True_Title_2",
            F.coalesce("Royalty_Author_Name", F.lit("No Record")).alias(
                "Royalty_Author_Name"
            ),
            "Category_Merge",
            F.coalesce("ISBN_All", F.col("Category_Merge")).alias("ISBN_All"),
            F.coalesce("Royalty_Rate_All", F.lit(0.0)).alias("Royalty_Rate_All"),
        )
        .agg(
            F.sum("Quantity").alias("Quantity_Shipped"),
            F.sum("Wholesale_Quantity").alias("Quantity_Wholesale"),
            F.sum(F.lit(0)).alias("Quantity_Returned"),
            F.sum("OrderLineTotal").alias("Revenue_Product_Net"),
            F.sum("Wholesale_Revenue").alias("Revenue_Wholesale"),
            F.sum(F.lit(0.0)).alias("Revenue_Returns"),
            F.sum("GiftWrap_Revenue").alias("Revenue_GiftWrap"),
            F.sum("Shipping_Per_Item").alias("Revenue_Shipping"),
            F.sum("Bundle_Allocated_Total").alias("Revenue_Bundle_Allocated"),
        )
        .withColumn("Data_Source", F.lit("WC"))
    )


def scb_grains(scb: DataFrame, book_dim: DataFrame) -> DataFrame:
    """A4+A5: SCB sales and returns rollups, one pass each, aligned to the
    shared schema (dw5:119-276). The +3-month payment lag (D4/C21
    dw5:736-743) shifts the attribution month on the SALES branch."""
    b = F.broadcast(
        book_dim.select(
            F.upper(F.col("Source_Title")).alias("_match_title"),
            "True_Title",
            "Royalty_Author_Name",
            "ISBN_All",
            "Royalty_Rate_All",
        ).dropDuplicates(["_match_title"])
    )
    # D3: MonthName+Year → date (dw5:733); locale-pinned pattern
    mkey_date = F.to_date(
        F.concat(F.col("Year").cast("string"), F.col("Month")), "yyyyMMMM"
    )
    # leading-'e' E-Book convention stripped before the title join
    # (dw3_merge_inc.py:193-197)
    join_title = F.upper(
        F.when(F.col("Title").startswith("e"), F.expr("substring(Title, 2)")).otherwise(
            F.col("Title")
        )
    )
    base = (
        scb.join(b, join_title == F.col("_match_title"), "left")
        .withColumn("MKEY_Date", mkey_date)
        .withColumn("MKEY_Date_Fwd", F.add_months(mkey_date, 3))
        .withColumn(
            "True_Title_2",
            F.coalesce(F.col("True_Title"), F.concat(F.lit("Missing - "), F.col("Title"))),
        )
        .withColumn(
            "Royalty_Author_Name",
            F.coalesce(F.col("Royalty_Author_Name"), F.lit("No Record")),
        )
        .withColumn("Royalty_Rate_All", F.coalesce(F.col("Royalty_Rate_All"), F.lit(0.0)))
        .withColumn("ISBN_All", F.coalesce(F.col("ISBN_All"), F.lit("Missing")))
    )

    def rollup(df: DataFrame, date_col: str, qty_col: str, rev_col: str, source: str, returns: bool) -> DataFrame:
        return (
            df.groupBy(
                F.year(date_col).alias("Fact_Year"),
                F.month(date_col).alias("Fact_Month"),
                "True_Title_2",
                "Royalty_Author_Name",
                F.lit("Book").alias("Category_Merge"),
                "ISBN_All",
                "Royalty_Rate_All",
            )
            .agg(
                F.sum(qty_col if not returns else F.lit(0)).alias("Quantity_Shipped"),
                F.sum(F.lit(0)).alias("Quantity_Wholesale"),
                F.sum(qty_col if returns else F.lit(0)).alias("Quantity_Returned"),
                F.sum(rev_col if not returns else F.lit(0.0)).alias("Revenue_Product_Net"),
                F.sum(F.lit(0.0)).alias("Revenue_Wholesale"),
                F.sum(F.abs(rev_col) if returns else F.lit(0.0)).alias("Revenue_Returns"),
                F.sum(F.lit(0.0)).alias("Revenue_GiftWrap"),
                F.sum(F.lit(0.0)).alias("Revenue_Shipping"),
                F.sum(F.lit(0.0)).alias("Revenue_Bundle_Allocated"),
            )
            .withColumn("Data_Source", F.lit(source))
        )

    sales = rollup(base, "MKEY_Date_Fwd", F.col("Quantity_Shipped"),
                   F.col("Publisher_Payment"), "SCB Sales", returns=False)
    rets = rollup(base.filter(F.col("Quantity_Returned") > 0), "MKEY_Date",
                  F.col("Quantity_Returned"), F.col("Publisher_Credits"),
                  "SCB Returns", returns=True)
    return sales.unionByName(rets)


def derived_measures(fact: DataFrame) -> DataFrame:
    """THE shared measure block (C16–C22) — written once, applied to both
    FACT_Royalty and FACT_Order grains (the reference duplicates it:
    dw5:657-744 ≡ dw5:1167-1241)."""
    rate = F.col("Royalty_Rate_All")
    retail_qty = F.col("Quantity_Shipped") - F.col("Quantity_Wholesale")
    retail_rev = F.col("Revenue_Product_Net") - F.col("Revenue_Wholesale")
    qualified_qty = retail_qty - F.col("Quantity_Returned")
    qualified_rev = retail_rev + F.col("Revenue_Bundle_Allocated") - F.col("Revenue_Returns")
    return (
        fact.withColumn("Quantity_Retail", retail_qty)
        .withColumn("Revenue_Retail", retail_rev)
        # C18: royalty-qualified gates — rate 0 ⇒ nothing qualifies
        .withColumn(
            "Royalty_Qualified_Quantity",
            F.when(rate > 0, qualified_qty).otherwise(F.lit(0)),
        )
        .withColumn(
            "Royalty_Qualified_Revenue",
            F.when(rate > 0, qualified_rev).otherwise(F.lit(0.0)),
        )
        # C19: Royalty_Paid = qualified revenue × rate (dw5:718)
        .withColumn("Royalty_Paid", F.col("Royalty_Qualified_Revenue") * rate)
        # C22: all-in revenue (dw5:701)
        .withColumn(
            "Revenue_Total_All",
            F.col("Revenue_Product_Net")
            + F.col("Revenue_GiftWrap")
            + F.col("Revenue_Shipping")
            - F.col("Revenue_Returns"),
        )
        # C20: per-source combined quarter label (dw5:725-731)
        .withColumn(
            "Combined_Quarter",
            F.concat(
                F.col("Fact_Year").cast("string"),
                F.lit("Q"),
                F.ceil(F.col("Fact_Month") / 3).cast("string"),
            ),
        )
    )


def fact_royalty(wc5: DataFrame, scb: DataFrame, book_dim: DataFrame) -> DataFrame:
    """U1 union of the grains + the shared measure block (dw5:653-744)."""
    return derived_measures(
        wc_royalty_grain(wc5).unionByName(scb_grains(scb, book_dim))
    )


def fact_order(wc5: DataFrame, scb: DataFrame, book_dim: DataFrame) -> DataFrame:
    """FACT_Order (dw5:890-1294): the ORDER-grain twin of FACT_Royalty —
    keeps order/customer/shipping keys the royalty grain rolls away (A9's
    24-key rollup), reuses the SAME scb grains and the SAME shared
    measure block, then drops the royalty-internal columns (P2's 21-column
    drop, dw5:1247-1268)."""
    wc_grain = (
        wc5.groupBy(
            F.year("OrderDate").alias("Fact_Year"),
            F.month("OrderDate").alias("Fact_Month"),
            "OrderNumber",
            "ItemOrderSeq",
            "CustomerRole",
            "ShippingCity",
            "ShippingState",
            "True_Title_2",
            F.coalesce("Royalty_Author_Name", F.lit("No Record")).alias(
                "Royalty_Author_Name"
            ),
            "Category_Merge",
            F.coalesce("ISBN_All", F.col("Category_Merge")).alias("ISBN_All"),
            F.coalesce("Royalty_Rate_All", F.lit(0.0)).alias("Royalty_Rate_All"),
        )
        .agg(
            F.sum("Quantity").alias("Quantity_Shipped"),
            F.sum("Wholesale_Quantity").alias("Quantity_Wholesale"),
            F.sum(F.lit(0)).alias("Quantity_Returned"),
            F.sum("OrderLineTotal").alias("Revenue_Product_Net"),
            F.sum("Wholesale_Revenue").alias("Revenue_Wholesale"),
            F.sum(F.lit(0.0)).alias("Revenue_Returns"),
            F.sum("GiftWrap_Revenue").alias("Revenue_GiftWrap"),
            F.sum("Shipping_Per_Item").alias("Revenue_Shipping"),
            F.sum("Bundle_Allocated_Total").alias("Revenue_Bundle_Allocated"),
        )
        .withColumn("Data_Source", F.lit("WC"))
    )
    scb_grain = scb_grains(scb, book_dim).withColumns(
        {
            "OrderNumber": F.lit("SCB"),
            "ItemOrderSeq": F.lit(0),
            "CustomerRole": F.lit("Distributor"),
            "ShippingCity": F.lit(None).cast("string"),
            "ShippingState": F.lit(None).cast("string"),
        }
    )
    fo = derived_measures(wc_grain.unionByName(scb_grain))
    # P2: the order fact publishes operational revenue, not royalty internals
    return fo.drop(
        "Royalty_Qualified_Quantity", "Royalty_Qualified_Revenue", "Royalty_Paid"
    )


def printable_report(fr: DataFrame) -> DataFrame:
    """A8 (dw5:777-794): the per-title printable rollup under each
    author, ordered for rendering (O1 presentation sort, dw5:794)."""
    return (
        fr.groupBy(
            "Combined_Quarter",
            "Royalty_Author_Name",
            "True_Title_2",
            "Category_Merge",
            "Royalty_Rate_All",
        )
        .agg(
            F.sum("Quantity_Shipped").alias("Quantity_Shipped"),
            F.sum("Quantity_Returned").alias("Quantity_Returned"),
            F.sum("Revenue_Retail").alias("Revenue_Retail"),
            F.sum("Royalty_Qualified_Revenue").alias("Royalty_Qualified_Revenue"),
            F.sum("Royalty_Paid").alias("Royalty_Paid"),
        )
        .orderBy("Royalty_Author_Name", "Combined_Quarter", "True_Title_2")
    )


def royalty_summary_report(fr: DataFrame) -> DataFrame:
    """A7 (dw5:750-760): per (quarter, author) rollup."""
    return fr.groupBy("Combined_Quarter", "Royalty_Author_Name").agg(
        F.sum("Quantity_Shipped").alias("Quantity_Shipped"),
        F.sum("Quantity_Returned").alias("Quantity_Returned"),
        F.sum("Royalty_Qualified_Revenue").alias("Royalty_Qualified_Revenue"),
        F.sum("Royalty_Paid").alias("Royalty_Paid"),
    )


def split_royalties(report: DataFrame) -> DataFrame:
    """P7+U1 split-royalty expansion (dw5:817-838): '&'-joined co-author
    rows split into one half-royalty row per author; solo rows pass
    through. Generalized from the reference's two hardcoded pairs to any
    'A & B' Royalty_Author_Name."""
    is_split = F.col("Royalty_Author_Name").contains(" & ")
    solo = report.filter(~is_split)
    split = report.filter(is_split)

    def half(which: int) -> DataFrame:
        name = F.trim(F.split(F.col("Royalty_Author_Name"), " & ").getItem(which))
        return split.withColumn("Royalty_Author_Name", name).withColumn(
            "Royalty_Paid", F.col("Royalty_Paid") / 2
        )

    return solo.unionByName(half(0)).unionByName(half(1))
