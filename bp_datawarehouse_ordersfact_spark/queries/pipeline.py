"""End-to-end pipeline-shaped queries (SURVEY.md §2.2, §3.3): nested-JSON
normalization (J1–J6), the split-royalty expansion (P7+U1), and the full
FACT_Royalty dataflow — two source branches unioned through a shared
derived-measure block — re-expressed Spark-first over the TPC-H testdata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..functions.rounding import rnd

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# J3/J6: nested array normalization — posexplode replaces the reference's
# wide-flatten / index-discovery / loop-unpivot dance
# ---------------------------------------------------------------------------


@register(
    "explode_line_items",
    """
    WITH nested AS (
      SELECT l_orderkey,
             list(struct_pack(ln := l_linenumber, pk := l_partkey,
                              price := round(l_extendedprice, 2), qty := l_quantity)
                  ORDER BY l_linenumber, l_partkey, round(l_extendedprice, 2), l_quantity)
               AS items
      FROM lineitem GROUP BY l_orderkey),
    ex AS (
      SELECT l_orderkey,
             CAST(len(items) AS BIGINT) AS n_items,
             round(items[1].price, 2) AS first_item_price,
             unnest(items) AS item,
             generate_subscripts(items, 1) AS pos
      FROM nested)
    SELECT l_orderkey, n_items, first_item_price,
           CAST(pos AS INT) AS item_seq,
           item.ln AS line_no, item.pk AS part_id,
           round(item.price, 2) AS price, item.qty AS qty
    FROM ex
    """,
)
def q_explode_line_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1–J3 + J6 (reference flattens JSON to `line_items_N_*` wide columns
    then loop-unpivots over discovered indices, dw2_wc_increment.py:195-287,
    wc_block2_helpers.py:5-50): in Spark the array IS the model — rebuild
    the nested order (`array<struct>`), `posexplode` it back (position →
    ItemOrderSeq, dw2_wc_increment.py:210), and pull positional elements
    with `element_at` (meta_data[0] access, dw2_wc_increment.py:214-223).
    sort_array pins a total order inside each array so the rebuilt nesting
    is deterministic (the P10 caveat applied to arrays)."""
    li = _t(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_partkey").alias("pk"),
                    rnd("l_extendedprice", 2).alias("price"),
                    F.col("l_quantity").alias("qty"),
                )
            )
        ).alias("items")
    )
    return nested.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        rnd(F.element_at("items", 1)["price"], 2).alias("first_item_price"),
        F.posexplode("items").alias("pos", "item"),
    ).select(
        "l_orderkey",
        "n_items",
        "first_item_price",
        (F.col("pos") + 1).cast("int").alias("item_seq"),
        F.col("item.ln").alias("line_no"),
        F.col("item.pk").alias("part_id"),
        rnd(F.col("item.price"), 2).alias("price"),
        F.col("item.qty").alias("qty"),
    )


@register(
    "json_props_extract",
    """
    SELECT event_type,
           count(*) AS n_events,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J6 on real JSON payloads (the reference flattens whole REST
    responses eagerly, dw2_wc_increment.py:67,182): `from_json` with an
    explicit schema keeps parsing lazy, columnar, and JVM-side — only the
    referenced field is materialized."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.avg("k"), 6).alias("avg_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# P7 + U1 + T-regex: split-royalty expansion
# ---------------------------------------------------------------------------


@register(
    "split_royalty_union",
    """
    WITH base AS (
      SELECT c.c_custkey, c.c_name AS author,
             round(sum(o.o_totalprice), 2) AS revenue,
             count(*) AS n_orders
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_name),
    solo AS (
      SELECT regexp_replace(author, '^Customer', 'Author') AS author,
             revenue, n_orders, 'solo' AS royalty_kind
      FROM base WHERE c_custkey % 10 <> 0),
    co_a AS (
      SELECT regexp_replace(author, '^Customer', 'CoAuthorA') AS author,
             round(revenue * 0.5, 2) AS revenue, n_orders, 'split' AS royalty_kind
      FROM base WHERE c_custkey % 10 = 0),
    co_b AS (
      SELECT regexp_replace(author, '^Customer', 'CoAuthorB') AS author,
             round(revenue * 0.5, 2) AS revenue, n_orders, 'split' AS royalty_kind
      FROM base WHERE c_custkey % 10 = 0)
    SELECT author, revenue, n_orders, royalty_kind FROM solo
    UNION ALL SELECT * FROM co_a
    UNION ALL SELECT * FROM co_b
    """,
)
def q_split_royalty_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 + U1 + §2.15 author-rename lambdas (split-royalty expansion,
    dw5_order_royalty_fact.py:817-838): partition the report into split
    vs non-split authors (filter + complement), emit renamed half-share
    copies per co-author, reunite with unionByName. The base rollup is
    computed ONCE and reused by all three branches — Spark's lazy DAG
    shares the subtree where the reference re-filters a materialized frame."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    base = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            rnd(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    is_split = F.col("c_custkey") % 10 == 0
    solo = base.filter(~is_split).select(
        F.regexp_replace("c_name", "^Customer", "Author").alias("author"),
        "revenue",
        "n_orders",
        F.lit("solo").alias("royalty_kind"),
    )

    def co(tag: str) -> DataFrame:
        return base.filter(is_split).select(
            F.regexp_replace("c_name", "^Customer", tag).alias("author"),
            rnd(F.col("revenue") * 0.5, 2).alias("revenue"),
            "n_orders",
            F.lit("split").alias("royalty_kind"),
        )

    return solo.unionByName(co("CoAuthorA")).unionByName(co("CoAuthorB"))


# ---------------------------------------------------------------------------
# §3.3 end-to-end: FACT_Royalty — two branches, shared measure block
# ---------------------------------------------------------------------------

_FACT_ROYALTY_SQL = """
    WITH retail AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS fact_year,
             'Q' || CAST(quarter(o.o_orderdate) AS VARCHAR) AS sales_quarter,
             p.p_brand AS brand,
             round(CAST(p.p_partkey % 30 AS DOUBLE) / 100.0, 2) AS royalty_rate,
             'WC' AS data_source,
             round(sum(l.l_quantity), 2) AS qty_shipped,
             round(sum(CASE WHEN o.o_orderpriority = '5-LOW' THEN l.l_quantity ELSE 0.0 END), 2)
               AS qty_wholesale,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue_net,
             round(sum(CASE WHEN o.o_orderpriority = '5-LOW'
                            THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END), 2)
               AS revenue_wholesale,
             0.0 AS qty_returned,
             0.0 AS revenue_returns
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2, 3, 4),
    returns AS (
      SELECT CAST(year(l.l_shipdate + INTERVAL 3 MONTH) AS INT) AS fact_year,
             'Q' || CAST(quarter(l.l_shipdate + INTERVAL 3 MONTH) AS VARCHAR) AS sales_quarter,
             p.p_brand AS brand,
             round(CAST(p.p_partkey % 30 AS DOUBLE) / 100.0, 2) AS royalty_rate,
             'SCB_Returns' AS data_source,
             0.0 AS qty_shipped, 0.0 AS qty_wholesale,
             0.0 AS revenue_net, 0.0 AS revenue_wholesale,
             round(sum(l.l_quantity), 2) AS qty_returned,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue_returns
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2, 3, 4),
    unioned AS (SELECT * FROM retail UNION ALL SELECT * FROM returns)
    SELECT fact_year, sales_quarter, brand, royalty_rate, data_source,
           qty_shipped, qty_wholesale, qty_returned, revenue_net,
           revenue_wholesale, revenue_returns,
           round(qty_shipped - qty_wholesale - qty_returned, 2) AS royalty_qualified_qty,
           round(CASE WHEN royalty_rate > 0
                      THEN revenue_net - revenue_wholesale - revenue_returns
                      ELSE 0.0 END, 2) AS royalty_qualified_revenue,
           round(CASE WHEN royalty_rate > 0
                      THEN (revenue_net - revenue_wholesale - revenue_returns) * royalty_rate
                      ELSE 0.0 END, 2) AS royalty_paid,
           CASE WHEN data_source = 'WC' THEN sales_quarter
                ELSE 'R-' || sales_quarter END AS combined_quarter
    FROM unioned
"""


@register("fact_royalty", _FACT_ROYALTY_SQL)
def q_fact_royalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 end-to-end FACT_Royalty dataflow re-shaped onto TPC-H: a
    retail branch (fact ⋈ fact equi-join lineitem×orders + broadcast dim
    join, multi-key rollup A6, wholesale carve-out C15) and a returns
    branch (filtered scan, +3-month payment shift D4/C21,
    dw5_order_royalty_fact.py:736-743), unioned by name (U1,
    :653) through ONE shared derived-measure block (C16–C20 qualified
    quantity/revenue gates and royalty_paid = qualified_revenue × rate,
    :657-744 — which the reference duplicates verbatim at :1167-1241).

    Scale notes: lineitem⋈orders is the only big-big join — both sides
    shuffle on orderkey once, AQE handles skew; part is broadcast; the
    rollup pre-aggregates map-side so the union'd measure block runs on
    grouped (small) data, never on raw lines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")

    rate = rnd((F.col("p_partkey") % 30).cast("double") / 100.0, 2)
    wholesale = F.col("o_orderpriority") == "5-LOW"
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    retail = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("o_orderdate").cast("int").alias("fact_year"),
            F.concat(F.lit("Q"), F.quarter("o_orderdate").cast("string")).alias(
                "sales_quarter"
            ),
            F.col("p_brand").alias("brand"),
            rate.alias("royalty_rate"),
        )
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("qty_shipped"),
            rnd(F.sum(F.when(wholesale, F.col("l_quantity")).otherwise(0.0)), 2).alias(
                "qty_wholesale"
            ),
            rnd(F.sum(net), 2).alias("revenue_net"),
            rnd(F.sum(F.when(wholesale, net).otherwise(0.0)), 2).alias("revenue_wholesale"),
        )
        .withColumns(
            {
                "data_source": F.lit("WC"),
                "qty_returned": F.lit(0.0),
                "revenue_returns": F.lit(0.0),
            }
        )
    )

    shifted = F.add_months(F.col("l_shipdate"), 3)
    returns = (
        li.filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year(shifted).cast("int").alias("fact_year"),
            F.concat(F.lit("Q"), F.quarter(shifted).cast("string")).alias("sales_quarter"),
            F.col("p_brand").alias("brand"),
            rate.alias("royalty_rate"),
        )
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("qty_returned"),
            rnd(F.sum(net), 2).alias("revenue_returns"),
        )
        .withColumns(
            {
                "data_source": F.lit("SCB_Returns"),
                "qty_shipped": F.lit(0.0),
                "qty_wholesale": F.lit(0.0),
                "revenue_net": F.lit(0.0),
                "revenue_wholesale": F.lit(0.0),
            }
        )
    )

    unioned = retail.unionByName(returns)

    # shared derived-measure block (written once — SURVEY §7.0)
    rate_c = F.col("royalty_rate")
    qualified_rev = F.col("revenue_net") - F.col("revenue_wholesale") - F.col(
        "revenue_returns"
    )
    return unioned.select(
        "fact_year",
        "sales_quarter",
        "brand",
        "royalty_rate",
        "data_source",
        "qty_shipped",
        "qty_wholesale",
        "qty_returned",
        "revenue_net",
        "revenue_wholesale",
        "revenue_returns",
        rnd(
            F.col("qty_shipped") - F.col("qty_wholesale") - F.col("qty_returned"), 2
        ).alias("royalty_qualified_qty"),
        rnd(F.when(rate_c > 0, qualified_rev).otherwise(0.0), 2).alias(
            "royalty_qualified_revenue"
        ),
        rnd(F.when(rate_c > 0, qualified_rev * rate_c).otherwise(0.0), 2).alias(
            "royalty_paid"
        ),
        F.when(F.col("data_source") == "WC", F.col("sales_quarter"))
        .otherwise(F.concat(F.lit("R-"), F.col("sales_quarter")))
        .alias("combined_quarter"),
    )


# ---------------------------------------------------------------------------
# S1/S2: paginated REST ingestion (distributed fetcher)
# ---------------------------------------------------------------------------


@register(
    "rest_ingest_distributed",
    """
    SELECT CAST((page - 1) * 20 + i AS BIGINT) AS id,
           CAST(page AS INT) AS page,
           round(CAST(i AS DOUBLE) + CAST(page AS DOUBLE) / 100.0, 2) AS amount
    FROM (SELECT unnest(range(1, 6)) AS page) CROSS JOIN
         (SELECT unnest(range(20)) AS i)
    """,
)
def q_rest_ingest_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 (paginated windowed REST pulls, the reference's driver-side
    page loop): the distributed shape — page numbers fan out over
    executors, each task fetches its pages, records parse JVM-side
    against the explicit schema. The transport here is the deterministic
    fake (no network in the container); pagination, parallelization,
    parsing, and money-string coercion are the production path."""
    from pyspark.sql import types as T

    from ..sources.rest import fetch_pages_distributed

    def fake_fetch(page: int, per_page: int, ws, we) -> list[dict]:
        return [
            {"id": (page - 1) * per_page + i, "page": page, "amount": f"{i + page / 100.0:.2f}"}
            for i in range(per_page)
        ]

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("page", T.IntegerType()),
            T.StructField("amount", T.StringType()),
        ]
    )
    df = fetch_pages_distributed(spark, fake_fetch, schema, n_pages=5, per_page=20)
    return df.select("id", "page", rnd(F.col("amount").cast("double"), 2).alias("amount"))


# ---------------------------------------------------------------------------
# Date dimension generation (D5): sequence + explode
# ---------------------------------------------------------------------------


# RETIRED round 14 (r13 VERDICT #1 pool): the fiscal-calendar COLUMN
# rules (yyyyMMMM MKEY, quarter, weekend flag) stay registry-checked
# inside `date_functions` and the domain e2e rows (the Date_Dim join is
# on the same MKEY); the generator itself is deterministic
# sequence+explode with no data dependence, so its capped slot goes to
# the activated staged_r16/r17 queries. Pytest-pinned via RETIRED below.
_DATE_DIM_GENERATE_ORACLE = """
    SELECT CAST(d AS TIMESTAMP) AS cal_date,
           CAST(year(d) AS INT) AS cal_year,
           CAST(month(d) AS INT) AS cal_month,
           monthname(d) AS month_name,
           'Q' || CAST(quarter(d) AS VARCHAR) AS cal_quarter,
           monthname(d) || CAST(year(d) AS VARCHAR) AS mkey,
           CAST(CASE WHEN dayofweek(d) IN (0, 6) THEN 1 ELSE 0 END AS INT) AS is_weekend
    FROM (SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31',
                                        INTERVAL 1 DAY)) AS d)
    """


def q_date_dim_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 (the reference READS a prebuilt Date_Dim it cannot regenerate,
    dw5_order_royalty_fact.py:116-117): generated in-engine with
    `sequence + explode` — including the MKEY month-name‖year key the
    SCB join uses (T8, dw5_order_royalty_fact.py:122). No source table
    needed; the dimension is a deterministic function of the range."""
    d = F.col("d")
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek: 1=Sunday..7
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit("1995-01-01").cast("date"),
                    F.lit("1995-12-31").cast("date"),
                    F.expr("interval 1 day"),
                )
            ).alias("d")
        )
        .select(
            d.cast("timestamp").alias("cal_date"),
            F.year(d).cast("int").alias("cal_year"),
            F.month(d).cast("int").alias("cal_month"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.concat(F.lit("Q"), F.quarter(d).cast("string")).alias("cal_quarter"),
            F.concat(F.date_format(d, "MMMM"), F.year(d).cast("string")).alias("mkey"),
            F.when(F.dayofweek(d).isin(1, 7), 1).otherwise(0).cast("int").alias(
                "is_weekend"
            ),
        )
    )


@register(
    "kafka_wire_roundtrip",
    """
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 6) AS sum_value,
           max(event_id) AS max_offset
    FROM events
    GROUP BY event_type
    """,
)
def q_kafka_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka ingestion path without a broker (sources/kafka_shaped.py):
    events encoded to the Kafka wire schema (key/value binary JSON,
    keyed-producer pmod partition placement, event_id as the per-key
    monotone offset), then decoded back with an explicit-schema
    `from_json` — all JVM-side, inside codegen. The oracle aggregates
    the original table directly, so a hash match proves the
    encode→decode round trip is lossless for every typed column and the
    offset metadata survives the trip."""
    from pyspark.sql import types as T

    from ..sources.kafka_shaped import parse_kafka_wire, to_kafka_wire

    ev = _t(spark, sf_dir, "events")
    wire = to_kafka_wire(
        ev, key_col="user_id", ts_col="ts", topic="events", offset_col="event_id"
    )
    value_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    decoded = parse_kafka_wire(wire, value_schema)
    return decoded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        rnd(F.sum("value"), 6).alias("sum_value"),
        F.max("offset").alias("max_offset"),
    )


# ---------------------------------------------------------------------------
# Retired registry queries (round 14, r13 VERDICT #1): unregistered to
# free capped slots for the staged_r16/r17 activations, but still pinned
# against their original oracles every pytest run
# (tests/test_retired_queries.py).
# ---------------------------------------------------------------------------

RETIRED: dict[str, tuple] = {
    "date_dim_generate": (q_date_dim_generate, _DATE_DIM_GENERATE_ORACLE),
}
