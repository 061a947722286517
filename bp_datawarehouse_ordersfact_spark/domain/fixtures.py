"""Synthetic fixtures exercising every CASE arm of the domain pipeline
(value-domain checklist in FIXTURES.md).

Coverage: orders with 0/1/3 line items; bundle parent + components
(book + merch); gift-wrap and wholesale meta keys; wholesale coupon
codes; empty-string money; an @buttonpoetry admin email; SCB sales and
returns incl. an unmatched title; master books with %-form and >1 rates,
null ISBNs, a split-royalty author pair; a 95-boundary bundle name.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from . import schemas as S


def _meta(*pairs):
    return [{"key": k, "value": v} for k, v in pairs]


def wc_orders_raw(spark: SparkSession) -> DataFrame:
    ts = dt.datetime(2025, 3, 10, 12, 0, 0)
    rows = [
        # 3-line order: bundle parent + book component + merch component,
        # gift wrap on the book, one coupon, no refunds
        {
            "id": 101,
            "number": "101",
            "status": "completed",
            "date_created": ts,
            "customer_id": 9,
            "billing": {"email": "reader@example.com"},
            "shipping": {"city": "St Paul", "state": "MN", "postcode": "05501", "country": "US"},
            "shipping_total": "6.00",
            "total": "45.00",
            "line_items": [
                {
                    "id": 1001, "name": "Night Sky Bundle", "sku": "B-1",
                    "product_id": 501, "quantity": 1, "price": 39.0,
                    "subtotal": "39.00", "total": "35.00",
                    "meta_data": _meta(("_bundle", "yes")),
                    "composite_parent": None, "bundled_by": None,
                },
                {
                    "id": 1002, "name": "Night Sky Poems", "sku": "BK-1",
                    "product_id": 502, "quantity": 1, "price": 16.0,
                    "subtotal": "0.00", "total": "0.00",
                    "meta_data": _meta(("Gift Wrapped", "Yes")),
                    "composite_parent": None, "bundled_by": "1001",
                },
                {
                    "id": 1003, "name": "Night Sky Tote", "sku": "M-1",
                    "product_id": 503, "quantity": 1, "price": 12.0,
                    "subtotal": "0.00", "total": "0.00",
                    "meta_data": [],
                    "composite_parent": "1001", "bundled_by": None,
                },
            ],
            "coupon_lines": [{"id": 71, "code": "SPRING10", "discount": "4.00"}],
            "refunds": [],
        },
        # 1-line wholesale order (role meta + wholesale coupon), empty-string money
        {
            "id": 102,
            "number": "102",
            "status": "processing",
            "date_created": ts + dt.timedelta(days=1),
            "customer_id": 10,
            "billing": {"email": "shop@store.com"},
            "shipping": {"city": "Mpls", "state": "MN", "postcode": "55401", "country": "US"},
            "shipping_total": "",
            "total": "96.00",
            "line_items": [
                {
                    "id": 1004, "name": "Night Sky Poems", "sku": "BK-1",
                    "product_id": 502, "quantity": 10, "price": 16.0,
                    "subtotal": "160.00", "total": "96.00",
                    "meta_data": _meta(("_wwp_wholesale_role", "wholesale_customer")),
                    "composite_parent": None, "bundled_by": None,
                }
            ],
            "coupon_lines": [{"id": 72, "code": "WHOLESALE40", "discount": "64.00"}],
            "refunds": [],
        },
        # admin order with a refund; status filtered IN (pre-ordered)
        {
            "id": 103,
            "number": "103",
            "status": "pre-ordered",
            "date_created": ts + dt.timedelta(days=2),
            "customer_id": 2,
            "billing": {"email": "staff@buttonpoetry.com"},
            "shipping": {"city": "Duluth", "state": "MN", "postcode": "55802", "country": "US"},
            "shipping_total": "4.00",
            "total": "20.00",
            "line_items": [
                {
                    "id": 1005, "name": "River Songs", "sku": "BK-2",
                    "product_id": 504, "quantity": 2, "price": 12.0,
                    "subtotal": "24.00", "total": "20.00",
                    "meta_data": [],
                    "composite_parent": None, "bundled_by": None,
                }
            ],
            "coupon_lines": [],
            "refunds": [{"id": 81, "reason": "-8.00", "total": "-8.00"}],
        },
        # cancelled order — must be filtered OUT (dw2_wc_increment.py:481)
        {
            "id": 104,
            "number": "104",
            "status": "cancelled",
            "date_created": ts + dt.timedelta(days=3),
            "customer_id": 11,
            "billing": {"email": "x@example.com"},
            "shipping": {"city": "Ely", "state": "MN", "postcode": "55731", "country": "US"},
            "shipping_total": "0.00",
            "total": "16.00",
            "line_items": [
                {
                    "id": 1006, "name": "River Songs", "sku": "BK-2",
                    "product_id": 504, "quantity": 1, "price": 16.0,
                    "subtotal": "16.00", "total": "16.00",
                    "meta_data": [],
                    "composite_parent": None, "bundled_by": None,
                }
            ],
            "coupon_lines": [],
            "refunds": [],
        },
        # 0-line order (edge: posexplode_outer must keep nothing, not crash)
        {
            "id": 105,
            "number": "105",
            "status": "completed",
            "date_created": ts + dt.timedelta(days=4),
            "customer_id": 12,
            "billing": {"email": "y@example.com"},
            "shipping": {"city": "Hibbing", "state": "MN", "postcode": "55746", "country": "US"},
            "shipping_total": "0.00",
            "total": "0.00",
            "line_items": [],
            "coupon_lines": [],
            "refunds": [],
        },
    ]
    return spark.createDataFrame(rows, S.WC_ORDER_RAW)


def product_dim(spark: SparkSession) -> DataFrame:
    """Product catalog slice (dw2 builds this from /products; C1 categories)."""
    rows = [
        (501, "Night Sky Bundle", "Bundles"),
        (502, "Night Sky Poems", "Book"),
        (503, "Night Sky Tote", "Merch"),
        (504, "River Songs", "Book"),
    ]
    return spark.createDataFrame(rows, "product_id long, product_name string, category string")


def scb_monthly(spark: SparkSession) -> DataFrame:
    rows = [
        ("March", 2025, "NIGHT SKY POEMS", "978-1", 120, 960.0, 5, -40.0, "March2025"),
        ("March", 2025, "eNIGHT SKY POEMS", "978-1e", 40, 200.0, 0, 0.0, "March2025"),
        ("April", 2025, "RIVER SONGS", "978-2", 60, 420.0, 2, -14.0, "April2025"),
        # unmatched title → 'Missing - ' fallback (dw5_order_royalty_fact.py:164-165)
        ("April", 2025, "UNKNOWN CHAPBOOK", "978-9", 3, 21.0, 0, 0.0, "April2025"),
    ]
    return spark.createDataFrame(rows, S.SCB_MONTHLY)


def books_master(spark: SparkSession) -> DataFrame:
    rows = [
        # %-form and >1 rates exercise C11 normalization (dw4_book_dim.py:248-264)
        ("Night Sky Poems", "A. Poet", "Poet, A.", "NightSky",
         "978-1", "978-1e", None, None, "15%", "25", "0.25"),
        # split-royalty co-author pair (dw5_order_royalty_fact.py:817-838)
        ("River Songs", "B. Bard & C. Cole", "Bard, B. & Cole, C.", "RiverSongs",
         "978-2", None, None, "978-2h", "0.15", "0.25", None),
        # near-miss master title: must NOT match 'Night Sky Poems' at 0.7
        ("Midnight Sea Stories", "D. Dour", None, "MidSea",
         None, None, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, S.BOOKS_MASTER)


def bundle_master(spark: SparkSession) -> DataFrame:
    rows = [
        ("Night Sky Bundle", 39.0, 1, 1, "60", "40"),      # % form shares (>1 → /100)
        ("Night Sky Bundles", 49.0, 2, 0, "0.5", "0.5"),   # 95-boundary near-dup name
        ("Totally Different Pack", 29.0, 2, 1, "0.7", "0.3"),
    ]
    return spark.createDataFrame(rows, S.BUNDLE_MASTER)
