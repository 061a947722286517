"""Stage 1 (reference dw2): nested WooCommerce order JSON → normalized
line-item table.

The reference flattens whole JSON records to wide indexed columns, then
loop-unpivots over discovered indices (``dw2_wc_increment.py:67,182,
195-287``, ``wc_block2_helpers.py:5-50``). Here the nested arrays stay
nested until ONE ``posexplode_outer`` per array family, meta keys are
looked up by key (not position — the robust form of J6), per-order totals
are window aggregates (W1 — replacing groupby+join-back
``dw2_wc_increment.py:457-479``), and the whole stage is a single lazy
plan whose only shuffle is the per-order window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WHOLESALE_COUPONS = {"WHOLESALE60", "WHOLESALE40", "WHOLESALE50"}
KEPT_STATUSES = ("completed", "pre-ordered", "processing")


def _money(col) -> F.Column:
    """API money strings: '' → 0.0 (reference ``dw2_wc_increment.py:426-443``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when((c == "") | c.isNull(), 0.0).otherwise(c.cast("double"))


def meta_value(item, key: str):
    """Value of a meta_data entry by KEY (reference reads positions
    ``meta_data[0..2]`` — ``dw2_wc_increment.py:214-223``; by-key lookup is
    the robust Spark form: ``filter(meta, m -> m.key == k)[0].value``)."""
    hits = F.filter(item["meta_data"], lambda m: m["key"] == key)
    return F.try_element_at(hits, F.lit(1))["value"]


def build_product_dim(products: DataFrame) -> DataFrame:
    """C1 product categorizer (the reference's 13-branch ``np.select``
    over ``categories_0_name``/``shipping_class``/name-contains,
    ``dw2_wc_increment.py:88-109``): first-match-wins chained ``when``
    with the 'Check' triage default. Input columns:
    (product_id, product_name, category_name, shipping_class).

    In Spark the nested categories array would arrive as
    ``ArrayType(Struct)`` — ``categories_0_name`` is
    ``element_at(categories, 1).name``; this takes the already-projected
    column to stay source-agnostic.
    """
    cat, ship = F.col("category_name"), F.col("shipping_class")
    name = F.trim(F.col("product_name"))
    product_category = (
        # Books
        F.when(cat == "Books", "Book")
        .when(cat == "Forthcoming Books", "Book")
        .when(cat == "Out of Print", "Book")
        .when(cat == "Audiobooks", "Book")
        .when(cat == "E-Books", "Book")
        .when(ship == "books", "Book")
        # Bundles
        .when(cat == "Bundles", "Bundles")
        .when(name.contains("Bundle"), "Bundles")
        .when(ship == "bundles", "Bundles")
        # Merch
        .when(cat == "Merch", "Merch")
        .when(cat == "Featured", "Merch")
        .when(ship == "clothing", "Merch")
        # Other
        .when(cat == "Workshop", "Workshop")
        .otherwise("Check")  # triage bucket for unclassified products
    )
    return products.select(
        F.col("product_id"),
        name.alias("product_name"),
        product_category.alias("category"),
    )


def normalize_orders(raw: DataFrame, product_dim: DataFrame) -> DataFrame:
    """Nested orders → one row per line item with coupon/refund columns,
    category, flags, and per-order totals. Mirrors the dw2 dataflow
    (SURVEY.md §3.2) end-to-end."""
    # J3: line-item unpivot; position → 1-based ItemOrderSeq
    # (dw2_wc_increment.py:210,255). Orders with no items drop out, as the
    # reference's null-ItemID filter does (dw2_wc_increment.py:287).
    items = raw.select(
        F.col("id").alias("OrderID"),
        F.col("number").alias("OrderNumber"),
        F.col("status").alias("OrderStatus"),
        F.col("date_created").alias("OrderDate"),
        F.col("billing.email").alias("CustomerEmail"),
        F.concat_ws(
            ", ",
            F.col("shipping.city"),
            F.concat_ws(" ", F.col("shipping.state"), F.col("shipping.postcode")),
        ).alias("ShippingAddress"),  # T8 concat (dw2_wc_increment.py:467)
        F.col("shipping.city").alias("ShippingCity"),
        F.col("shipping.state").alias("ShippingState"),
        F.col("shipping.postcode").alias("ShippingZip"),
        _money("shipping_total").alias("OrderShippingAmount"),
        _money("total").alias("OrderTotalAmount"),
        F.posexplode("line_items").alias("idx", "item"),
        F.col("coupon_lines"),
        F.col("refunds"),
    )

    item = F.col("item")
    enriched = items.select(
        "OrderID",
        "OrderNumber",
        "OrderStatus",
        "OrderDate",
        "CustomerEmail",
        "ShippingAddress",
        "ShippingCity",
        "ShippingState",
        "ShippingZip",
        "OrderShippingAmount",
        "OrderTotalAmount",
        (F.col("idx") + 1).alias("ItemOrderSeq"),
        item["id"].cast("string").alias("ItemID"),
        item["name"].alias("ProductName"),
        item["product_id"].alias("ItemProductID"),
        item["quantity"].alias("Quantity"),
        _money(item["subtotal"]).alias("OrderLineSubtotal"),
        _money(item["total"]).alias("OrderLineTotal"),
        # C2: gift wrap via either meta key (dw2_wc_increment.py:301)
        F.when(
            meta_value(item, "Gift Wrapped").isNotNull()
            | meta_value(item, "_gift_wrap").isNotNull(),
            "Yes",
        ).alias("GiftWrap"),
        # C3: wholesale role meta (dw2_wc_increment.py:303)
        F.when(
            meta_value(item, "_wwp_wholesale_role").isNotNull()
            | meta_value(item, "_wwp_wholesale_prices").isNotNull(),
            "Yes",
        ).alias("WholesaleMeta"),
        # C4: a row is a bundle parent if its name says so or bundle
        # structure fields point at it (dw2_wc_increment.py:306-312)
        F.when(
            F.lower(item["name"]).rlike("bundle|combo")
            & item["bundled_by"].isNull()
            & item["composite_parent"].isNull(),
            item["id"].cast("string"),
        ).alias("BundleID"),
        # C5: BundledBy precedence = coalesce(composite_parent, bundled_by)
        # (dw2_wc_increment.py:320-328)
        F.coalesce(item["composite_parent"], item["bundled_by"]).alias("BundledBy"),
        "coupon_lines",
        "refunds",
    )

    # J4/J5: coupon + refund unpivot, joined back on the composite key
    # (OrderID, ItemOrderSeq)-equivalent — the reference joins coupon rows
    # positionally (JN2/JN3 dw2_wc_increment.py:453-454); order-level works
    # identically for the single-coupon/refund shapes it handles, via the
    # first entry (element_at) instead of an explode+join round-trip.
    first_coupon = F.try_element_at("coupon_lines", F.lit(1))
    first_refund = F.try_element_at("refunds", F.lit(1))
    flat = enriched.select(
        "*",
        first_coupon["code"].alias("CouponCode"),
        _money(first_coupon["discount"]).alias("DiscountAmount"),
        # RefundAmount sourced from the REASON field — faithful to the
        # reference's (odd) choice (dw2_wc_increment.py:408)
        _money(first_refund["reason"]).alias("RefundAmount"),
    ).drop("coupon_lines", "refunds", "item")

    # JN1: broadcast product-dim join for the category
    flat = flat.join(
        F.broadcast(product_dim.select(F.col("product_id"), F.col("category"))),
        flat.ItemProductID == F.col("product_id"),
        "left",
    ).drop("product_id")

    # W1/W2: per-order totals as window aggregates (no groupby+join-back)
    w = Window.partitionBy("OrderNumber")
    flat = flat.select(
        "*",
        F.sum("Quantity").over(w).alias("TotalItems"),
        F.size(F.collect_set("ItemProductID").over(w)).alias("TotalProducts"),
        F.sum("OrderLineSubtotal").over(w).alias("OrderSubtotalAmount"),
    )

    # C6/C7: wholesale via coupon code set, then role; admin email override
    # (dw2_wc_increment.py:469-471,538)
    wholesale = (
        F.upper(F.coalesce(F.col("CouponCode"), F.lit(""))).isin(*WHOLESALE_COUPONS)
        | F.col("WholesaleMeta").isNotNull()
    )
    flat = flat.withColumn(
        "CustomerRole",
        F.when(F.col("CustomerEmail").contains("@buttonpoetry"), "Administrator")
        .when(wholesale, "Wholesale Customer")
        .otherwise("Customer"),
    )

    # P4: status membership filter (dw2_wc_increment.py:481)
    return flat.filter(F.col("OrderStatus").isin(*KEPT_STATUSES)).dropDuplicates()
