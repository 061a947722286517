"""Relational operator queries (SURVEY.md §2.3–§2.13) over the TPC-H-ish
testdata, each with a DuckDB oracle.

Each query exercises one operator family from the reference's inventory,
re-expressed Spark-first; docstrings cite the reference sites the shape
derives from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core.io import load_table
from ..functions.rounding import rnd
from ..functions.cleaning import normalize_title, percent_to_fraction
from ..functions.conditional import case_chain
from ..operators.aggregates import null_audit
from ..operators.joins import anti_join_merge, broadcast_left_join, dedup_keep_first
from ..operators.temporal import asof_join
from ..operators.similarity import fuzzy_ratio_join, tfidf_cosine_match

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
# Flagship: pricing/royalty summary (A6 rollup + C16–C19 measure gating,
# dw5_order_royalty_fact.py:497-530,657-744 re-shaped onto lineitem)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship rollup: the A6-shaped multi-measure aggregation with
    derived measures (net price, charge) computed inline — Catalyst does
    map-side partial aggregation; the scan reads only the 7 referenced
    columns and pushes the date filter into the Parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            rnd(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P-family: projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "select_rename",
    """
    SELECT o_orderkey AS order_id,
           o_orderstatus AS status,
           round(o_totalprice, 2) AS total_amount,
           round(o_totalprice * 0.9, 2) AS discounted_total
    FROM orders
    """,
)
def q_select_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (dict-driven select+rename, dw2_wc_increment.py:484-536) →
    `select` with aliases; column pruning reaches the scan."""
    return _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderstatus").alias("status"),
        rnd(F.col("o_totalprice"), 2).alias("total_amount"),
        rnd(F.col("o_totalprice") * 0.9, 2).alias("discounted_total"),
    )


@register(
    "membership_filter",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F') AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def q_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (`OrderStatus ∈ {...}` dw2_wc_increment.py:481) → `isin`,
    pushed to the Parquet scan as an IN filter."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


# RETIRED round 11 (r10 VERDICT #1) — the P3-P6 filter family keeps
# `membership_filter`'s registry row; pytest-pinned via RETIRED below.
def q_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 (score-threshold filters dw4_book_dim.py:191-192)."""
    return (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_retailprice") >= 910.0) & (F.col("p_size") < 20))
        .select("p_partkey", "p_name", rnd("p_retailprice", 2).alias("retail_price"))
    )


@register(
    "distinct_rows",
    "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 (`drop_duplicates()` dw3_merge_inc.py:86-126) → `distinct`;
    partial (map-side) dedup before the shuffle."""
    return _t(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "dedup_keep_first",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, round(l_extendedprice,2) AS price
    FROM lineitem
    QUALIFY row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey, price) = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10/W4: pandas keep-first is order-dependent; the rebuild pins an
    explicit row_number tie-break — and the tie-break must be a TOTAL
    order ((orderkey, linenumber) is not unique in this data), or the
    kept row is nondeterministic across engines/runs."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", rnd("l_extendedprice", 2).alias("price")
    )
    return dedup_keep_first(
        li, ["l_orderkey"], [F.asc("l_linenumber"), F.asc("l_partkey"), F.asc("price")]
    )


@register(
    "percent_rate_normalization",
    """
    SELECT p_partkey,
           round(CASE WHEN CAST(replace(rate_str, '%', '') AS DOUBLE) > 1.0
                      THEN CAST(replace(rate_str, '%', '') AS DOUBLE) / 100.0
                      ELSE CAST(replace(rate_str, '%', '') AS DOUBLE) END, 6) AS rate
    FROM (SELECT p_partkey,
                 CASE WHEN p_partkey % 3 = 0 THEN CAST(p_size AS VARCHAR) || '%'
                      WHEN p_partkey % 3 = 1 THEN CAST(p_size AS VARCHAR)
                      ELSE CAST(p_size / 100.0 AS VARCHAR) END AS rate_str
          FROM part)
    """,
)
def q_percent_rate_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8+T11+C11 (dw4_book_dim.py:248-264): royalty-rate strings arrive
    as '15%', '15', or '0.15' — strip %, cast, normalize >1 to fraction."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_partkey") % 3 == 0, F.concat(F.col("p_size").cast("string"), F.lit("%")))
        .when(F.col("p_partkey") % 3 == 1, F.col("p_size").cast("string"))
        .otherwise((F.col("p_size") / 100.0).cast("string"))
        .alias("rate_str"),
    )
    return p.select("p_partkey", rnd(percent_to_fraction(F.col("rate_str")), 6).alias("rate"))


# ---------------------------------------------------------------------------
# JN-family: joins
# ---------------------------------------------------------------------------


@register(
    "broadcast_dim_join",
    """
    SELECT p.p_brand, s.s_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    LEFT JOIN part p ON l.l_partkey = p.p_partkey
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY p.p_brand, s.s_name
    """,
)
def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JN1/JN8–13: fact × small dims with explicit broadcast hints — the
    fact side never shuffles for the joins (only for the final rollup)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    j = broadcast_left_join(li, p, li.l_partkey == p.p_partkey)
    j = broadcast_left_join(j, s, j.l_suppkey == s.s_suppkey)
    return j.groupBy("p_brand", "s_name").agg(
        rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "composite_key_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, round(l.l_extendedprice, 2) AS price,
           round(coalesce(d.coupon_value, 0.0), 2) AS coupon_value
    FROM lineitem l
    LEFT JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice * l_discount AS coupon_value
               FROM lineitem WHERE l_discount > 0.05) d
      ON l.l_orderkey = d.l_orderkey AND l.l_linenumber = d.l_linenumber
    """,
)
def q_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JN2/JN3 (composite (OrderID, ItemOrderSeq) joins,
    dw2_wc_increment.py:453-454): multi-column equi-join keys."""
    li = _t(spark, sf_dir, "lineitem")
    disc = li.filter(F.col("l_discount") > 0.05).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * F.col("l_discount")).alias("coupon_value"),
    )
    return (
        li.join(disc, ["l_orderkey", "l_linenumber"], "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            rnd("l_extendedprice", 2).alias("price"),
            rnd(F.coalesce("coupon_value", F.lit(0.0)), 2).alias("coupon_value"),
        )
    )


@register(
    "incremental_merge",
    """
    WITH archive AS (SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-06-01'),
         increment AS (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
         merged AS (
           SELECT * FROM archive WHERE o_orderkey NOT IN (SELECT o_orderkey FROM increment)
           UNION ALL SELECT * FROM increment)
    SELECT o_orderstatus, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
    FROM merged GROUP BY o_orderstatus
    """,
)
def q_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JN5/U2 (dw3_merge_inc.py:114-125): delete-insert incremental merge
    as broadcast anti-join + unionByName; at scale this is a Delta/Iceberg
    MERGE keyed the same way."""
    o = _t(spark, sf_dir, "orders")
    archive = o.filter(F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp"))
    increment = o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
    merged = anti_join_merge(archive, increment, ["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        rnd(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "semi_anti_join",
    """
    SELECT c.c_mktsegment,
           count(*) AS n_customers_no_urgent
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: anti-join (the reference only has `~isin`,
    dw3_merge_inc.py:114) expressed as a real left_anti join."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_no_urgent"))
    )


# ---------------------------------------------------------------------------
# W-family: window computations
# ---------------------------------------------------------------------------


@register(
    "window_order_totals",
    """
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_orderkey), 2) AS order_total_qty,
           round(sum(l_extendedprice) OVER (PARTITION BY l_orderkey), 2) AS order_subtotal,
           round(l_extendedprice / sum(l_extendedprice) OVER (PARTITION BY l_orderkey), 6)
             AS line_share
    FROM lineitem
    """,
)
def q_window_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 (A1+JN4 groupby-then-join-back, dw2_wc_increment.py:457-479;
    shipping allocation dw5_order_royalty_fact.py:365): one window shuffle
    replaces aggregate + join."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.sum("l_quantity").over(w), 2).alias("order_total_qty"),
        rnd(F.sum("l_extendedprice").over(w), 2).alias("order_subtotal"),
        rnd(F.col("l_extendedprice") / F.sum("l_extendedprice").over(w), 6).alias(
            "line_share"
        ),
    )


@register(
    "parent_allocation",
    """
    SELECT l_orderkey, l_linenumber,
           round(parent_price, 2) AS parent_price,
           round(CASE WHEN l_linenumber = 1 THEN 0.0 ELSE 0.3 * parent_price END, 2)
             AS allocated_revenue
    FROM (SELECT l_orderkey, l_linenumber,
                 max(CASE WHEN l_linenumber = 1 THEN l_extendedprice END)
                   OVER (PARTITION BY l_orderkey) AS parent_price
          FROM lineitem)
    """,
)
def q_parent_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JN14→W3 + C14 (bundle-parent self-join dw5_order_royalty_fact.py:377-389
    and share allocation :393-410): the parent row's value is broadcast to
    component rows with a conditional window max — no dedup + self-join."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    parent = F.max(F.when(F.col("l_linenumber") == 1, F.col("l_extendedprice"))).over(w)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(parent, 2).alias("parent_price"),
        rnd(
            F.when(F.col("l_linenumber") == 1, F.lit(0.0)).otherwise(0.3 * parent), 2
        ).alias("allocated_revenue"),
    )


@register(
    "sessionize_events",
    """
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             -- CAST: DuckDB's windowed sum over INT is HUGEINT (int128),
             -- which round-trips through Arrow as a wider type and breaks
             -- the driver's type-aware value hash even when values match.
             -- BIGINT matches Spark's sum() output (registry convention).
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, count(*) AS n_events, round(sum(value), 2) AS session_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gaps-and-islands (lag + running sum) — the
    batch dual of streaming session windows; no reference equivalent
    (§2.14: the reference has no streaming/session semantics at all)."""
    e = _t(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w_order)))
            <= 1800 * 1_000_000,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.sum("value"), 2).alias("session_value"),
    )


# ---------------------------------------------------------------------------
# C-family: CASE/WHEN expressions
# ---------------------------------------------------------------------------


@register(
    "case_categorize",
    """
    SELECT CASE WHEN contains(lower(p_type), 'brass')  THEN 'Brass'
                WHEN contains(lower(p_type), 'copper') THEN 'Copper'
                WHEN contains(lower(p_type), 'steel')  THEN 'Steel'
                WHEN contains(lower(p_type), 'tin')    THEN 'Tin'
                ELSE 'Check' END AS category,
           count(*) AS n_parts,
           round(sum(p_retailprice), 2) AS total_price
    FROM part GROUP BY 1
    """,
)
def q_case_categorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 (13-branch product categorizer with 'Check' default bucket,
    dw2_wc_increment.py:88-109): first-match-wins chained `when`."""
    p = _t(spark, sf_dir, "part")
    lc = F.lower(F.col("p_type"))
    cat = case_chain(
        [
            (lc.contains("brass"), F.lit("Brass")),
            (lc.contains("copper"), F.lit("Copper")),
            (lc.contains("steel"), F.lit("Steel")),
            (lc.contains("tin"), F.lit("Tin")),
        ],
        F.lit("Check"),
    )
    return p.groupBy(cat.alias("category")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        rnd(F.sum("p_retailprice"), 2).alias("total_price"),
    )


@register(
    "conditional_measures",
    """
    SELECT o.o_orderpriority,
           round(sum(CASE WHEN l.l_returnflag = 'R' THEN l.l_extendedprice ELSE 0.0 END), 2)
             AS returned_revenue,
           round(sum(CASE WHEN l.l_returnflag <> 'R'
                          THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END), 2)
             AS qualified_revenue,
           round(sum(CASE WHEN l.l_returnflag <> 'R'
                          THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END) * 0.15, 2)
             AS royalty_paid
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_conditional_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15–C19 (wholesale carve-outs, qualified-revenue gates, royalty =
    qualified × rate; dw5_order_royalty_fact.py:412-428,691-718)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
    returned = F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(0.0)
    qualified = F.when(
        F.col("l_returnflag") != "R",
        F.col("l_extendedprice") * (1 - F.col("l_discount")),
    ).otherwise(0.0)
    return j.groupBy("o_orderpriority").agg(
        rnd(F.sum(returned), 2).alias("returned_revenue"),
        rnd(F.sum(qualified), 2).alias("qualified_revenue"),
        rnd(F.sum(qualified) * 0.15, 2).alias("royalty_paid"),
    )


# ---------------------------------------------------------------------------
# T-family: string functions
# ---------------------------------------------------------------------------


@register(
    "string_cleanup",
    """
    SELECT p_partkey,
           trim(regexp_replace(regexp_replace(regexp_replace(lower(p_name),
                '[^a-z0-9\\s]', '', 'g'),
                '\\s+\\b(the|and)\\b\\s+', ' ', 'g'),
                '\\s+', ' ', 'g')) AS clean_name,
           split_part(p_type, ' ', 1) AS type_first_word,
           p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size_key
    FROM part
    """,
)
def q_string_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1–T8 (title canonicalization dw4_book_dim.py:104-163; split
    dw3_merge_inc.py:143; concat keys dw3_merge_inc.py:110-112) — all
    native expressions, zero Python row functions."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        normalize_title(F.col("p_name")).alias("clean_name"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size_key"
        ),
    )


@register(
    "date_functions",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           monthname(o_orderdate) || CAST(year(o_orderdate) AS VARCHAR) AS mkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS payment_date,
           CAST(strptime(CAST(year(o_orderdate) AS VARCHAR) || monthname(o_orderdate),
                         '%Y%B') AS DATE) AS mkey_parsed
    FROM orders
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1–D5 (timestamp parse/truncate, MKEY month-name keys
    dw3_merge_inc.py:110-112, +3-month SCB payment lag
    dw5_order_royalty_fact.py:741, month-name round-trip :733)."""
    o = _t(spark, sf_dir, "orders")
    year_s = F.year("o_orderdate").cast("string")
    mname = F.date_format("o_orderdate", "MMMM")
    return o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.concat(mname, year_s).alias("mkey"),
        F.add_months(F.col("o_orderdate"), 3).alias("payment_date"),
        F.to_date(F.to_timestamp(F.concat(year_s, mname), "yyyyMMMM")).alias("mkey_parsed"),
    )


# ---------------------------------------------------------------------------
# U-family + A-family: set ops and aggregations
# ---------------------------------------------------------------------------


@register(
    "union_by_name",
    """
    WITH hi AS (SELECT o_orderkey, 'high' AS tier, o_totalprice FROM orders
                WHERE o_totalprice >= 200000),
         lo AS (SELECT 'low' AS tier, o_totalprice, o_orderkey FROM orders
                WHERE o_totalprice < 50000)
    SELECT tier, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM (SELECT o_orderkey, tier, o_totalprice FROM hi
          UNION ALL SELECT o_orderkey, tier, o_totalprice FROM lo)
    GROUP BY tier
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (the reference aligns concat inputs via identical select-lists,
    dw5_order_royalty_fact.py:548-649; `unionByName` makes alignment
    structural — different column orders union correctly)."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") >= 200000).select(
        "o_orderkey", F.lit("high").alias("tier"), "o_totalprice"
    )
    lo = o.filter(F.col("o_totalprice") < 50000).select(
        F.lit("low").alias("tier"), "o_totalprice", "o_orderkey"
    )
    return (
        hi.unionByName(lo)
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"), rnd(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "multikey_rollup",
    """
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(quarter(o.o_orderdate) AS INT) AS order_quarter,
           l.l_returnflag, l.l_linestatus, p.p_brand, o.o_orderpriority,
           round(sum(l.l_quantity), 2) AS sum_qty,
           round(sum(l.l_extendedprice), 2) AS sum_price,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS sum_net,
           round(sum(l.l_extendedprice * l.l_discount), 2) AS sum_discount,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2, 3, 4, 5, 6
    """,
)
def q_multikey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4–A6 (12/13-key multi-measure rollups,
    dw5_order_royalty_fact.py:170-186,497-530)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey).join(
        F.broadcast(p), li.l_partkey == p.p_partkey
    )
    return j.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        "l_returnflag",
        "l_linestatus",
        "p_brand",
        "o_orderpriority",
    ).agg(
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        rnd(F.sum("l_extendedprice"), 2).alias("sum_price"),
        rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_net"),
        rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("sum_discount"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "count_distinct_per_group",
    """
    SELECT l_orderkey,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_count_distinct_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (`nunique` per order, dw2_wc_increment.py:457-465).

    Distinct counts via size(collect_set) instead of countDistinct
    (r15): two countDistincts over the same group key plan as a 3x
    Expand + two exchanges of the tripled rows; the set form is one
    exchange with map-side partial sets (measured 1.9s -> 1.1s at
    sf0.1). Safe HERE because the group is the order key and TPC-H
    bounds lines-per-order at 7, so a set buffer never exceeds 7
    entries — for unbounded groups keep countDistinct's Expand plan,
    which never buffers a group's distinct values in one aggregation
    buffer."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.size(F.collect_set("l_partkey")).cast("long").alias("n_parts"),
            F.size(F.collect_set("l_suppkey")).cast("long").alias("n_suppliers"),
            rnd(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@register(
    "null_audit",
    """
    SELECT count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS o_orderkey,
           count(CASE WHEN status IS NULL THEN 1 END) AS status,
           count(CASE WHEN priority IS NULL THEN 1 END) AS priority
    FROM (SELECT o_orderkey,
                 nullif(o_orderstatus, 'O') AS status,
                 nullif(o_orderpriority, '1-URGENT') AS priority
          FROM orders)
    """,
)
def q_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 (null-count audit dw5_order_royalty_fact.py:723,1225) — one
    map-combinable pass over all columns."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status"),
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("priority"),
    )
    return null_audit(o)


# RETIRED from the registry in round 9 (r8 VERDICT #1): the capped slot
# went to the round-8 curation/SFT layer (queries/curation_r9.py). The
# query stays pytest-pinned against its oracle via RETIRED below
# (tests/test_retired_queries.py) — same contract as the registered era.
def q_rolling_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frames (absent from the reference — §2.6 notes
    no frame specs exist there): per-user trailing 1-hour average. The
    frame is event-time range-based, not row-count-based, so it is
    batching-independent — the same frame a streaming job would maintain
    as state."""
    ev = _t(spark, sf_dir, "events")
    # MICROSECOND range key: flooring ts to seconds would shift frame
    # membership at sub-second boundaries vs the oracle's exact interval
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        rnd(F.avg("value").over(w), 6).alias("rolling_avg_1h"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


# RETIRED round 9 (r8 VERDICT #1) — pytest-pinned via RETIRED below.
def q_event_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag offsets (absent from the reference): per-user event
    inter-arrival gap and value delta, with a (ts, event_id) total order
    so the previous-row choice is deterministic. The gap is the MICROS
    difference floor-divided to seconds — flooring each timestamp first
    (`cast long`) disagrees with the true difference on sub-second
    fractions."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros_gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return ev.select(
        "user_id",
        "event_id",
        F.floor(micros_gap / 1_000_000).alias("gap_seconds"),
        rnd(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


@register(
    "quantile_stats",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (absent from the reference;
    table stakes for an analytics engine). `percentile` is the exact
    linear-interpolation form both engines define identically — at 100 TB
    the one-pass sketch (`percentile_approx`) replaces it, trading the
    per-group sort for bounded error; the exact form here is what the
    oracle can verify."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        rnd(F.percentile("value", 0.5), 6).alias("p50"),
        rnd(F.percentile("value", 0.9), 6).alias("p90"),
        rnd(F.percentile("value", 0.99), 6).alias("p99"),
    )


@register(
    "grouping_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets — absent from the reference (§2.5: 'no grouping
    sets/cube/rollup') but part of a complete aggregation surface."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(rnd(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


# RETIRED round 9 (r8 VERDICT #1) — pytest-pinned via RETIRED below.
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — absent from the reference; expressed as conditional
    aggregation so the oracle is plain ANSI SQL."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        rnd(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)), 2).alias("qty_O"),
        rnd(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)), 2).alias("qty_F"),
    )


# RETIRED round 13 (r12 VERDICT #1 pool) — `top_k_per_group` keeps the
# O1/O2 family's registry row; its capped slot goes to the activated
# staged_r14/r15 queries. Pytest-pinned via RETIRED below.
def q_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 (multi-key sort; the reference has no limit — §2.10). The
    tie-break on o_orderkey makes top-k deterministic; Spark plans this
    as TakeOrderedAndProject (no global sort materialization)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", rnd("o_totalprice", 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# N-family: null handling
# ---------------------------------------------------------------------------


@register(
    "null_fill_sentinels",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'Missing - ' || c_name) AS segment_filled,
           coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END, 0.0)
             AS acctbal_filled,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 'Error - Missing'
                ELSE 'OK' END AS audit_flag
    FROM customer
    """,
)
def q_null_fill_sentinels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1/N2 (sentinel fills and derived fallbacks like
    'Missing - '+Title, dw5_order_royalty_fact.py:431-483,164-165)."""
    c = _t(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(rnd("c_acctbal", 2))
    return c.select(
        "c_custkey",
        F.coalesce(seg, F.concat(F.lit("Missing - "), F.col("c_name"))).alias("segment_filled"),
        F.coalesce(bal, F.lit(0.0)).alias("acctbal_filled"),
        F.when(seg.isNull(), F.lit("Error - Missing")).otherwise(F.lit("OK")).alias("audit_flag"),
    )


# ---------------------------------------------------------------------------
# F-family: fuzzy similarity
# ---------------------------------------------------------------------------


@register(
    "levenshtein_ratio_join",
    """
    SELECT type_a, type_b, match_ratio FROM (
      SELECT a.p_type AS type_a, b.p_type AS type_b,
             round(100.0 * (length(a.p_type) + length(b.p_type)
                            - levenshtein(lower(a.p_type), lower(b.p_type)))
                   / (length(a.p_type) + length(b.p_type)), 6) AS match_ratio
      FROM (SELECT DISTINCT p_type FROM part) a
      JOIN (SELECT DISTINCT p_type FROM part) b ON a.p_type < b.p_type)
    WHERE match_ratio >= 50.0
    """,
)
def q_levenshtein_ratio_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/JN7 (fuzz.ratio ≥ threshold over a cross join,
    dw4_book_dim.py:278-293) as native levenshtein arithmetic — the
    rowwise Python `fuzz.ratio` apply becomes a codegen'd expression."""
    types = _t(spark, sf_dir, "part").select("p_type").distinct()
    a = types.withColumnRenamed("p_type", "type_a")
    b = types.withColumnRenamed("p_type", "type_b")
    j = fuzzy_ratio_join(a, "type_a", b, "type_b", threshold=50.0)
    return j.filter(F.col("type_a") < F.col("type_b")).select("type_a", "type_b", "match_ratio")


@register(
    "tfidf_title_match",
    """
    WITH m AS (SELECT DISTINCT p_type AS txt FROM part),
         c AS (SELECT DISTINCT p_name AS txt FROM part),
         docs AS (SELECT txt AS uid, txt FROM m
                  UNION ALL SELECT 'c_' || txt, txt FROM c),
         toks AS (SELECT uid, unnest(list_filter(string_split_regex(lower(txt), '[^a-z0-9]+'),
                                                 t -> t <> '')) AS token
                  FROM docs),
         tf AS (SELECT uid, token, CAST(count(*) AS DOUBLE) AS tf FROM toks GROUP BY 1, 2),
         nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM docs),
         dfreq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         idf AS (SELECT token, ln((1 + (SELECT n FROM nd)) / (1 + df)) + 1 AS idf FROM dfreq),
         w AS (SELECT uid, tf.token, tf * idf AS w FROM tf JOIN idf USING (token)),
         nrm AS (SELECT uid, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
         wn AS (SELECT w.uid, token, w / nrm AS weight FROM w JOIN nrm USING (uid))
    SELECT a.uid AS m_id, substr(b.uid, 3) AS c_id,
           round(sum(a.weight * b.weight), 6) AS cosine
    FROM wn a JOIN wn b USING (token)
    WHERE NOT starts_with(a.uid, 'c_') AND starts_with(b.uid, 'c_')
    GROUP BY 1, 2
    HAVING round(sum(a.weight * b.weight), 6) >= 0.5
    """,
)
def q_tfidf_title_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/JN6 (TF-IDF cosine title match ≥ threshold,
    dw4_book_dim.py:166-192) with the sklearn IDF formula
    (ln((1+n)/(1+df))+1, L2-normalized). Scored via a sparse token-key
    join — no all-pairs cross join, unlike the reference."""
    p = _t(spark, sf_dir, "part")
    master = p.select(F.col("p_type").alias("m_text")).distinct().withColumn(
        "m_id", F.col("m_text")
    )
    cand = p.select(F.col("p_name").alias("c_text")).distinct().withColumn(
        "c_id", F.col("c_text")
    )
    return tfidf_cosine_match(master, "m_id", "m_text", cand, "c_id", "c_text", threshold=0.5)


# ---------------------------------------------------------------------------
# Temporal joins (beyond the reference — §2.4 notes no theta/range/as-of
# joins exist there; a training-data/event pipeline needs both)
# ---------------------------------------------------------------------------


@register(
    "asof_join",
    """
    WITH p AS (
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'purchase'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view')
    SELECT v.user_id, v.event_id,
           p.event_id AS purchase_event_id,
           round(p.value, 6) AS purchase_value,
           (epoch_us(v.ts) - epoch_us(p.ts)) // 1000000 AS staleness_seconds
    FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left as-of join: each 'view' event picks up the user's most recent
    prior-or-simultaneous 'purchase' (operators/temporal.asof_join).
    Implemented as tagged-union + carry-forward window — ONE shuffle on
    user_id, no join operator, no quadratic pair space — the plan that
    survives 100 TB. Several purchases at the same (user_id, ts) resolve
    to the max event_id via the carry-window tie-break (last row wins),
    matching the oracle's QUALIFY keep — no separate dedup pass, no
    second shuffle."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    out = asof_join(
        v, p, by=["user_id"], left_ts="ts", right_ts="ts",
        payload_cols=["event_id", "value"], payload_prefix="p_",
        right_tiebreak=["event_id"],
    )
    gap_micros = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("p_ts"))
    return out.select(
        "user_id",
        "event_id",
        F.col("p_event_id").alias("purchase_event_id"),
        rnd(F.col("p_value"), 6).alias("purchase_value"),
        F.floor(gap_micros / 1_000_000).alias("staleness_seconds"),
    )


@register(
    "range_join_attribution",
    """
    SELECT o.o_orderkey,
           count(e.event_id) AS n_events,
           round(coalesce(sum(e.value), 0.0), 6) AS sum_value
    FROM orders o LEFT JOIN events e
      ON e.user_id = o.o_custkey
     AND e.ts >= o.o_orderdate
     AND e.ts < o.o_orderdate + INTERVAL 7 DAY
    GROUP BY o.o_orderkey
    """,
)
def q_range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: per-order count/sum of the customer's
    events inside the 7 days after the order date. The equi key
    (user = custkey) stays in the join condition so Spark plans a
    hash/sort-merge join partitioned on the key and applies the time
    range as a residual filter — the scalable shape; only a pure range
    predicate with no equi key would need bucketized time binning."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    cond = (
        (e["user_id"] == o["o_custkey"])
        & (e["ts"] >= o["o_orderdate"])
        & (e["ts"] < o["o_orderdate"] + F.expr("INTERVAL 7 DAYS"))
    )
    return (
        o.join(e, cond, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("event_id").alias("n_events"),
            rnd(F.coalesce(F.sum("value"), F.lit(0.0)), 6).alias("sum_value"),
        )
    )


@register(
    "sketch_approx_stats",
    """
    SELECT event_type,
           count(DISTINCT user_id)            AS n_users_exact,
           round(quantile_cont(value, 0.5), 6) AS p50_exact,
           TRUE                                AS distinct_within_rsd,
           TRUE                                AS p50_within_err
    FROM events
    GROUP BY event_type
    """,
)
def q_sketch_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates, self-validated (pattern: ``ann_recall_at_k``):
    per event_type, HyperLogLog++ distinct users and a one-pass
    approximate median are computed NEXT TO their exact counterparts, and
    the output carries the exact values plus booleans asserting the
    sketch error stayed inside the configured bounds (5×rsd for HLL++;
    2% relative for percentile_approx at accuracy 10000, which returns a
    real data value while the exact median interpolates, so the gap is
    one adjacent-order-statistic step near the median). The sketch
    internals are
    engine-specific and can't hash-match DuckDB, but the booleans CAN:
    the oracle computes the exact side and asserts TRUE, so a sketch
    drifting out of bound flips the value hash red. At 100 TB the
    sketches are the only viable plan — they fold map-side into
    fixed-size state with no per-group sort or distinct shuffle.

    The distinct-count pair and the percentile pair aggregate
    SEPARATELY and join on the (tiny) group key: one mixed aggregate
    forces RewriteDistinctAggregates' Expand plan, which routes every
    buffer-based aggregate (HLL++, both percentiles) through the
    expanded (group, user_id, gid) first-stage grouping — measured 2.7s
    vs 0.7s for the split at sf0.1 (~4x). Split, each side is its own
    minimal plan: a two-phase distinct count next to a map-side-folding
    HLL, and the percentile pair over a narrower value-only scan."""
    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
    )
    vals = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50_exact_raw"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
    )
    agg = users.join(vals, "event_type")
    distinct_rel_err = F.abs(
        F.col("n_users_approx") - F.col("n_users_exact")
    ) / F.col("n_users_exact")
    p50_rel_err = F.abs(F.col("p50_approx") - F.col("p50_exact_raw")) / F.abs(
        F.col("p50_exact_raw")
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        rnd(F.col("p50_exact_raw"), 6).alias("p50_exact"),
        (distinct_rel_err <= F.lit(0.10)).alias("distinct_within_rsd"),
        (p50_rel_err <= F.lit(0.02)).alias("p50_within_err"),
    )


# ---------------------------------------------------------------------------
# Multi-join analytics (TPC-H Q3/Q5 shapes — beyond the reference, which
# never joins more than one fact to broadcast-sized dims at a time)
# ---------------------------------------------------------------------------


@register(
    "shipping_priority",
    """
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ date-filtered orders
    ⋈ lineitem, revenue top-10. Both filters push into their scans;
    customer and the filtered orders side broadcast; the only shuffle is
    the final rollup. The ORDER BY ... LIMIT is a TakeOrderedAndProject —
    no global sort materializes."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])),
            li["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", F.col("o_orderdate").alias("order_date"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "regional_supplier_volume",
    """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact ⋈ supplier ⋈ nation ⋈ region with a region
    filter, revenue per nation. The three dim joins chain as broadcast
    hash joins — the fact side never shuffles; the region filter prunes
    through the snowflake before the fact join (Catalyst pushes it into
    the broadcast build sides)."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = su.join(
        F.broadcast(na.join(F.broadcast(re), na["n_regionkey"] == re["r_regionkey"])),
        su["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(dims), li["l_suppkey"] == dims["s_suppkey"])
        .groupBy("n_name")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(F.col("n_name").alias("nation"), "revenue", "n_lines")
    )


@register(
    "skew_salted_join",
    """
    WITH skewed AS (
      SELECT l_orderkey % 3 AS hot_key, l_quantity, l_extendedprice
      FROM lineitem),
    dim AS (SELECT DISTINCT o_orderkey % 3 AS hot_key,
                   CASE o_orderkey % 3 WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
                        ELSE 'gamma' END AS bucket_name
            FROM orders)
    SELECT d.bucket_name,
           count(*) AS n_lines,
           round(sum(s.l_quantity), 2) AS sum_qty,
           round(sum(s.l_extendedprice), 2) AS sum_price
    FROM skewed s JOIN dim d ON s.hot_key = d.hot_key
    GROUP BY d.bucket_name
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pathological skew (600k fact rows over THREE join keys — the case
    AQE's skew split can't always save, e.g. when a single key dwarfs
    the rest) handled by explicit salting (operators/joins.salted_join):
    the fact side spreads each hot key over 16 salted sub-keys, the dim
    side replicates ×16, so the join parallelizes across 48 tasks
    instead of 3 stragglers. Result is identical to the plain join —
    which is exactly what the oracle checks."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 3).alias("hot_key"), "l_quantity", "l_extendedprice"
    )
    dim = (
        _t(spark, sf_dir, "orders")
        .select((F.col("o_orderkey") % 3).alias("hot_key"))
        .distinct()
        .select(
            "hot_key",
            F.when(F.col("hot_key") == 0, "alpha")
            .when(F.col("hot_key") == 1, "beta")
            .otherwise("gamma")
            .alias("bucket_name"),
        )
    )
    from ..operators.joins import salted_join

    joined = salted_join(li, dim, "hot_key", salt_n=16)
    return joined.groupBy("bucket_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        rnd(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "top_k_per_group",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def q_top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (each customer's 3 largest orders): rank window +
    filter. Spark pushes the rank limit into the sort per partition
    (WindowGroupLimit) — no group ever materializes fully sorted, which
    is what makes per-group top-k viable when one group holds millions
    of rows."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            rnd("o_totalprice", 2).alias("total"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# RETIRED round 11 (r10 VERDICT #1) — beyond-reference rank tour; the
# window family keeps `top_k_per_group` + `dedup_keep_first`'s rows.
# Pytest-pinned via RETIRED below.
def q_window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function family (absent from the reference — §2.6
    notes no ranking exists there): rank, dense_rank, ntile, percent_rank
    and cume_dist over one shared window spec — one shuffle + one sort
    serves all five."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 6).alias("cdist"),
    )


# RETIRED round 14 (r13 VERDICT #1 pool): U1/U2 keep `union_by_name` +
# `semi_anti_join` registry rows (the reference's only set ops — §2.11);
# INTERSECT/EXCEPT were engine-added and their capped slot goes to the
# activated staged_r16/r17 queries. Pytest-pinned via RETIRED below.
_SET_INTERSECT_EXCEPT_ORACLE = """
    WITH o_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
    f_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT o_custkey, 'both' AS membership FROM (
      SELECT o_custkey FROM o_cust INTERSECT SELECT o_custkey FROM f_cust)
    UNION ALL
    SELECT o_custkey, 'open_only' AS membership FROM (
      SELECT o_custkey FROM o_cust EXCEPT SELECT o_custkey FROM f_cust)
    """


def q_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 (the reference has union and anti only — §2.11): INTERSECT and
    EXCEPT as first-class set ops. Both plan as aggregate+join on the
    deduped key sets — no full-row comparison, and the distincts combine
    map-side."""
    o = _t(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    done_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    both = open_c.intersect(done_c).select(
        "o_custkey", F.lit("both").alias("membership")
    )
    only_open = open_c.exceptAll(done_c).select(
        "o_custkey", F.lit("open_only").alias("membership")
    )
    return both.unionByName(only_open)


# RETIRED round 13 (r12 VERDICT #1 pool) — the gaps-and-islands family
# keeps `interval_coalesce` + `sessionize_events` registry rows; its
# capped slot goes to the activated staged_r14/r15 queries.
# Pytest-pinned via RETIRED below (plan budget stays pinned in
# tests/test_plans.py through the RETIRED dict).
_EVENTS_GAP_FILL_ORACLE = """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             round(sum(value), 2) AS day_value, count(*) AS n_events
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ), grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM spans
    )
    SELECT g.user_id, g.day,
           coalesce(d.n_events, 0) AS n_events,
           CASE WHEN d.day_value IS NULL THEN 0 ELSE 1 END AS is_observed,
           last_value(d.day_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """


def q_events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: regularize each user's event
    stream onto a daily grid (their own min..max span) and carry the last
    observed daily total across gap days — the resample/ffill step every
    metrics backfill and feature-store pipeline needs and the reference's
    batch model never had.

    Scale shape: the grid is GENERATED per key with ``sequence``+``explode``
    (rows appear already partitioned by the groupBy key — no crossJoin
    against a calendar table), the daily rollup is one shuffle, the grid
    join is key-aligned, and the forward fill is a single running
    ``last(ignorenulls)`` window per key. Grid size is bounded by
    keys × span-days, independent of event volume."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    daily = ev.groupBy("user_id", "day").agg(
        rnd(F.sum("value"), 2).alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.when(F.col("day_value").isNull(), 0).otherwise(1).alias("is_observed"),
        F.last("day_value", ignorenulls=True).over(w_fill).alias("filled_value"),
    )


@register(
    "data_quality_audit",
    """
    SELECT 'orders_dup_orderkey' AS check_name,
           count(*) - count(DISTINCT o_orderkey) AS violations,
           count(*) AS checked_rows
    FROM orders
    UNION ALL
    SELECT 'orders_null_orderdate', count(*) FILTER (WHERE o_orderdate IS NULL),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_totalprice', count(*) FILTER (WHERE o_totalprice <= 0),
           count(*)
    FROM orders
    UNION ALL
    SELECT 'lineitem_qty_out_of_range',
           count(*) FILTER (WHERE l_quantity <= 0 OR l_quantity > 50), count(*)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1), count(*)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)),
           count(*)
    FROM lineitem
    ORDER BY check_name
    """,
)
def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (Deequ-shaped; extends the
    reference's ad-hoc null probe, dw5_order_royalty_fact.py A12 family):
    uniqueness, completeness, range, and referential-integrity checks as
    one result table of (check_name, violations, checked_rows).

    Scale shape: all per-table checks for a table collapse into ONE
    conditional-aggregation pass (count FILTER semantics via
    count(when(...))) — adding a check adds a column to an existing scan,
    not a job. The referential check is a broadcast-friendly left-anti
    aggregate, the only join in the audit."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def cnt(cond):
        return F.count(F.when(cond, 1)).cast("bigint")

    n_o = F.count(F.lit(1)).cast("bigint")
    o_checks = o.agg(
        (n_o - F.countDistinct("o_orderkey")).cast("bigint").alias("orders_dup_orderkey"),
        cnt(F.col("o_orderdate").isNull()).alias("orders_null_orderdate"),
        cnt(F.col("o_totalprice") <= 0).alias("orders_nonpositive_totalprice"),
        n_o.alias("__checked"),
    )
    li_checks = li.agg(
        cnt((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)).alias(
            "lineitem_qty_out_of_range"
        ),
        cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "lineitem_discount_out_of_range"
        ),
        F.count(F.lit(1)).cast("bigint").alias("__checked"),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .select(
            F.lit("lineitem_orphan_orderkey").alias("check_name"),
            "violations",
        )
    )

    def unpivot(df, checks):
        return df.unpivot(
            ["__checked"], checks, "check_name", "violations"
        ).select("check_name", "violations", F.col("__checked").alias("checked_rows"))

    li_total = li.agg(F.count(F.lit(1)).cast("bigint").alias("checked_rows"))
    return (
        unpivot(o_checks, ["orders_dup_orderkey", "orders_null_orderdate",
                           "orders_nonpositive_totalprice"])
        .unionByName(
            unpivot(li_checks, ["lineitem_qty_out_of_range",
                                "lineitem_discount_out_of_range"])
        )
        .unionByName(orphans.crossJoin(li_total))
        .orderBy("check_name")
    )


@register(
    "scd2_dim_update",
    """
    WITH dim AS (
      SELECT c_custkey AS cust_key, c_mktsegment AS segment,
             round(c_acctbal, 2) AS acctbal,
             DATE '1994-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
             1 AS is_current
      FROM customer
    ), chg AS (
      SELECT c_custkey AS cust_key,
             CASE WHEN c_custkey % 9 = 0 THEN 'MOVED' ELSE c_mktsegment END AS segment,
             round(c_acctbal * 1.1, 2) AS acctbal
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment, round(c_acctbal, 2)
      FROM customer WHERE c_custkey % 5 = 0 AND c_custkey % 3 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEWSEG', 100.00
      FROM customer WHERE c_custkey % 7 = 0
    ), j AS (
      SELECT d.cust_key AS d_key, d.segment AS d_seg, d.acctbal AS d_bal, d.valid_from,
             c.cust_key AS c_key, c.segment AS c_seg, c.acctbal AS c_bal
      FROM dim d FULL OUTER JOIN chg c ON d.cust_key = c.cust_key
    )
    SELECT d_key AS cust_key, d_seg AS segment, d_bal AS acctbal, valid_from,
           DATE '1996-06-01' AS valid_to, 0 AS is_current
    FROM j WHERE d_key IS NOT NULL AND c_key IS NOT NULL
             AND (d_seg IS DISTINCT FROM c_seg OR d_bal IS DISTINCT FROM c_bal)
    UNION ALL
    SELECT coalesce(d_key, c_key), c_seg, c_bal, DATE '1996-06-01',
           CAST(NULL AS DATE), 1
    FROM j WHERE c_key IS NOT NULL AND (d_key IS NULL
             OR d_seg IS DISTINCT FROM c_seg OR d_bal IS DISTINCT FROM c_bal)
    UNION ALL
    SELECT d_key, d_seg, d_bal, valid_from, CAST(NULL AS DATE), 1
    FROM j WHERE d_key IS NOT NULL AND (c_key IS NULL
             OR (d_seg IS NOT DISTINCT FROM c_seg AND d_bal IS NOT DISTINCT FROM c_bal))
    """,
)
def q_scd2_dim_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension maintenance (the capability the reference's
    truncate-load SCD1 destroys — ``gcp_savebigquery.py:6-38`` overwrites
    history every run): apply an effective-dated change set to a
    versioned customer dimension via ``operators.scd.scd2_apply``.

    The change set is derived deterministically from the customer table
    itself so every merge case is exercised: attribute updates
    (``%3 == 0``, with a segment move at ``%9 == 0``), no-op redeliveries
    (``%5``), and brand-new keys (``%7`` shifted). The operator is one
    full-outer join + one explode of per-row version arrays — the
    dimension is scanned once no matter how many change cases apply."""
    from ..operators.scd import scd2_apply

    cust = _t(spark, sf_dir, "customer")
    dim = cust.select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_mktsegment").alias("segment"),
        rnd(F.col("c_acctbal"), 2).alias("acctbal"),
        F.lit("1994-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    updates = cust.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("cust_key"),
        F.when(F.col("c_custkey") % 9 == 0, "MOVED")
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        rnd(F.col("c_acctbal") * 1.1, 2).alias("acctbal"),
    )
    noops = cust.filter(
        (F.col("c_custkey") % 5 == 0) & (F.col("c_custkey") % 3 != 0)
    ).select(
        F.col("c_custkey").alias("cust_key"),
        F.col("c_mktsegment").alias("segment"),
        rnd(F.col("c_acctbal"), 2).alias("acctbal"),
    )
    inserts = cust.filter(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + 1000000).alias("cust_key"),
        F.lit("NEWSEG").alias("segment"),
        F.lit(100.00).alias("acctbal"),
    )
    changes = updates.unionByName(noops).unionByName(inserts)
    return scd2_apply(dim, changes, "cust_key", ["segment", "acctbal"], "1996-06-01")


@register(
    "cdc_apply",
    """
    WITH changes AS (
      SELECT o_orderkey AS order_key, 1 AS seq, 'I' AS op,
             round(o_totalprice, 2) AS total_price
      FROM orders WHERE o_orderkey % 4 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'U', round(o_totalprice * 1.05, 2)
      FROM orders WHERE o_orderkey % 8 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', CAST(NULL AS DOUBLE)
      FROM orders WHERE o_orderkey % 16 = 0
    ), latest AS (
      SELECT order_key, seq, op, total_price,
             row_number() OVER (PARTITION BY order_key ORDER BY seq DESC) AS rn
      FROM changes
    )
    SELECT order_key, CAST(seq AS INT) AS last_seq, total_price
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log application (Debezium-shaped): collapse an
    insert/update/delete change stream to current state — latest change
    per key wins, keys whose latest op is a delete disappear. Extends the
    upsert-only ``incremental_merge`` (reference ``dw3_merge_inc.py``
    delete-insert has no tombstone concept) to the full op vocabulary a
    CDC source emits.

    Scale shape: ONE shuffle on the key for the latest-wins window
    (Spark plans rn=1 as WindowGroupLimit — a per-partition top-1, not a
    full sort+filter); the change branches union before the shuffle so
    the log is read once per branch with the key filters pushed to the
    scans. On Delta/Iceberg the same collapse feeds ``MERGE WHEN MATCHED
    [AND op='D'] THEN DELETE``.

    The change set is derived deterministically from ``orders`` (%4
    inserts, %8 updates, %16 deletes) so all three ops and the
    override/tombstone orderings are exercised."""
    o = _t(spark, sf_dir, "orders")
    ins = o.filter(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").alias("order_key"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        rnd(F.col("o_totalprice"), 2).alias("total_price"),
    )
    upd = o.filter(F.col("o_orderkey") % 8 == 0).select(
        F.col("o_orderkey").alias("order_key"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        rnd(F.col("o_totalprice") * 1.05, 2).alias("total_price"),
    )
    dele = o.filter(F.col("o_orderkey") % 16 == 0).select(
        F.col("o_orderkey").alias("order_key"),
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("total_price"),
    )
    changes = ins.unionByName(upd).unionByName(dele)
    w = Window.partitionBy("order_key").orderBy(F.col("seq").desc())
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "order_key",
            F.col("seq").cast("int").alias("last_seq"),
            "total_price",
        )
    )


# RETIRED round 12 (r11 VERDICT #1) — beyond-reference CUBE tour; the
# grouping-set family keeps `grouping_rollup` (GROUPING SETS) +
# `multikey_rollup` + `rollup_incremental_refresh`. Pytest-pinned via
# RETIRED below.
def q_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with an explicit grouping id —
    all four grouping sets in one Expand+aggregate pass (no reference
    equivalent; completes the §2.5 rollup/cube surface next to
    ``grouping_rollup``). The Expand multiplies rows 4× BEFORE the
    shuffle but the partial aggregate collapses them map-side, so the
    exchange still carries only group keys."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("int")
        .alias("gid"),
        rnd(F.sum("l_extendedprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "sketch_hll_merge",
    """
    SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
           TRUE AS within_err
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__ALL__', count(DISTINCT user_id), TRUE FROM events
    """,
)
def q_sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL via
    ``hll_sketch_agg``): one sketch per event type, then the global
    distinct-user estimate comes from ``hll_union_agg`` over those
    per-type sketch OBJECTS — the events are never rescanned. That
    mergeability is the property that matters at 100 TB: per-partition /
    per-day sketches persist as bytes and roll up to any grouping later,
    which ``approx_count_distinct`` (estimate-only output,
    ``sketch_approx_stats``) cannot do. Self-validated like
    sketch_approx_stats: exact counts hash-check against the oracle and
    booleans pin the estimate error inside 5%."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
    )
    per_rows = per.select(
        "event_type",
        "exact_distinct",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        ).alias("within_err"),
    )
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).crossJoin(ev.agg(F.countDistinct("user_id").alias("exact_distinct")))
    all_row = merged.select(
        F.lit("__ALL__").alias("event_type"),
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct")) / F.col("exact_distinct")
            <= 0.05
        ).alias("within_err"),
    )
    return per_rows.unionByName(all_row)


@register(
    "funnel_analysis",
    """
    WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT 'view' AS stage, count(*) AS n_users FROM v
    UNION ALL SELECT 'view>click', count(*) FROM c
    UNION ALL SELECT 'view>click>purchase', count(*) FROM p
    """,
)
def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users who viewed, then clicked AFTER the
    first view, then purchased AFTER that click — order-sensitive
    conversion, not mere event co-occurrence (no reference equivalent;
    the canonical events-table workload next to sessionization).

    Scale shape: each stage is a pre-aggregated (user_id, min_ts) frame —
    shrinking to ≤1 row per user BEFORE its join, so the event table is
    scanned once per stage with the event_type filter pushed down, and
    the stage joins carry only user-level rows (broadcast-able once the
    funnel narrows)."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )

    def stage(df, name):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(v, "view")
        .unionByName(stage(c, "view>click"))
        .unionByName(stage(p, "view>click>purchase"))
    )


# RETIRED round 12 (r11 VERDICT #4 endgame pool) — event-analytics
# pair; `funnel_analysis` keeps the family's registry row.
# Pytest-pinned via RETIRED below.
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted on each
    subsequent active day (offset 0-7) — the D1/D7 retention matrix every
    events product computes (no reference equivalent).

    Scale shape: both sides pre-aggregate to user-day grain before the
    join (first_day is one row per user, activity is distinct user-days),
    the join shuffles on user_id only, and the final rollup carries just
    (cohort_day, offset) keys. The events table is scanned twice but
    never joined at event grain."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    first_day = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = ev.distinct()
    offset = F.datediff(F.col("d"), F.col("cohort_day"))
    return (
        activity.join(first_day, "user_id")
        .filter((offset >= 0) & (offset <= 7))
        .groupBy("cohort_day", offset.cast("int").alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


@register(
    "rollup_incremental_refresh",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders,
           round(sum(o_totalprice) / count(*), 6) AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_rollup_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup refresh: the archive's partial
    aggregates MERGE with the increment's partial aggregates instead of
    recomputing from raw rows — the algebraic-aggregate property
    (sum/count compose; avg derives at read) that keeps a 100 TB rollup
    fresh for the cost of the day's delta. The oracle IS the full
    recompute over all rows, so the hash check proves merge ≡ recompute
    exactly. The reference rebuilds every rollup from scratch each run
    (truncate-load, SURVEY §3.3).

    Scale shape: each side shrinks to rollup grain before the union, the
    merge shuffles only grouped keys, and non-decomposable measures
    never appear in the stored state (avg is derived; distincts would
    store HLL sketches — see sketch_hll_merge)."""
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")

    def partial(df):
        return df.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            "o_orderpriority",
        ).agg(
            F.sum("o_totalprice").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )

    archive = partial(o.filter(F.col("o_orderdate") < cutoff))
    increment = partial(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        archive.unionByName(increment)
        .groupBy("order_year", "o_orderpriority")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    return merged.select(
        "order_year",
        "o_orderpriority",
        rnd(F.col("s"), 2).alias("revenue"),
        F.col("n").cast("bigint").alias("n_orders"),
        rnd(F.col("s") / F.col("n"), 6).alias("avg_price"),
    )


# RETIRED round 12 (r11 VERDICT #1) — VARIANT twin of
# `json_props_extract`, whose J1 row survives. Pytest-pinned via
# RETIRED below.
def q_variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type: ``parse_json``
    once into a binary-encoded variant, then ``variant_get`` path reads —
    the schema-on-read modernization of ``json_props_extract``'s
    ``from_json`` (no StructType to maintain; unknown fields survive; at
    100 TB the variant parses once per row instead of once per extracted
    path like string-based ``get_json_object``)."""
    ev = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.count(F.when(F.col("k") > 50, 1)).cast("bigint").alias("n_high"),
        )
    )


# RETIRED round 12 (r11 VERDICT #1) — beyond-reference ordered string
# agg; the A-family keeps `count_distinct_per_group`'s row.
# Pytest-pinned via RETIRED below.
def q_listagg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (``LISTAGG ... WITHIN GROUP``, new in
    Spark 4) — deterministic because of the explicit WITHIN GROUP order;
    an unordered collect would hash-differ run to run. Completes the
    aggregation surface next to the rollup/sketch entries."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "listagg(DISTINCT l_linestatus, ',') WITHIN GROUP (ORDER BY l_linestatus)"
        ).alias("statuses"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# ---------------------------------------------------------------------------
# Round 5: gaps-and-islands interval coalescing + correlated EXISTS rewrite
# ---------------------------------------------------------------------------


@register(
    "interval_coalesce",
    """
    WITH e AS (
      SELECT user_id, event_id, ts, ts + INTERVAL 30 MINUTE AS te
      FROM events),
    flagged AS (
      SELECT user_id, event_id, ts, te,
             CASE WHEN ts <= max(te) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS new_island
      FROM e),
    islands AS (
      SELECT user_id, ts, te,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged)
    SELECT user_id, CAST(island AS BIGINT) AS island_id,
           min(ts) AS interval_start, max(te) AS interval_end,
           count(*) AS n_events
    FROM islands
    GROUP BY user_id, island
    """,
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval coalescing: each event opens a 30-minute
    activity interval; overlapping/touching intervals per user merge into
    one. Distinct from ``sessionize_events`` (gap between CONSECUTIVE
    events) — here an early long interval can swallow later starts, so
    the island test compares against the running MAX of interval ends,
    not the previous row's end. The classic warehouse plan: one running-
    max window, one running-sum window, one rollup.

    Scale shape: ONE shuffle on user_id; both windows and the final
    (user_id, island) aggregation reuse that partitioning (island is a
    per-user refinement, so no second exchange); map-side partial aggs
    apply. Skewed users degrade only their own partition's sort.
    Tie-break (ts, event_id) makes the running max deterministic even
    with duplicate timestamps."""
    from ..operators.temporal import coalesce_intervals

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("te"),
    )
    return coalesce_intervals(
        ev, "user_id", "ts", "te", tiebreak_col="event_id"
    ).withColumnRenamed("n_intervals", "n_events")


# RETIRED round 11 (r10 VERDICT #1) — beyond-reference rewrite demo; the
# EXISTS semantics keep `semi_anti_join`'s registry row. Pytest-pinned
# via RETIRED below.
def q_correlated_exists_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS (TPC-H Q21 shape on the columns the
    testdata has): suppliers whose returned item was the ONLY return in a
    multi-supplier order. Spark-first rewrite: EXISTS -> left-semi join,
    NOT EXISTS -> left-anti join — the plans Catalyst itself would
    produce for the subqueries, stated explicitly so both joins share the
    l_orderkey shuffle key (co-partitioned back to back, no third
    exchange for the pair). The supplier dim joins broadcast; the rollup
    on s_name is a final small shuffle.

    The oracle keeps the declarative EXISTS form — proving the join
    rewrite IS the subquery semantics, per-row multiplicity included
    (semi/anti never duplicate l1 rows)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    others = li.select("l_orderkey", "l_suppkey").alias("l2")
    other_returns = l1.select("l_orderkey", "l_suppkey").alias("l3")
    sole = (
        l1.join(
            others,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .alias("l1")
        .join(
            other_returns,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_sole_returns"))
    )


# ---------------------------------------------------------------------------
# Retired registry queries (round 9, r8 VERDICT #1; round 11, r10
# VERDICT #1): unregistered to free capped slots for the curation/SFT
# layer (queries/curation_r9.py, queries/staged_r11.py), but still
# pinned against their original oracles every pytest run
# (tests/test_retired_queries.py) — retirement changes WHO checks them,
# not whether they are checked.
# ---------------------------------------------------------------------------

RETIRED: dict[str, tuple] = {
    "set_intersect_except": (q_set_intersect_except, _SET_INTERSECT_EXCEPT_ORACLE),
    "cube_summary": (
        q_cube_summary,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
               round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
    ),
    "variant_props_extract": (
        q_variant_props_extract,
        """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                 AS sum_k,
               count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INT)
                                  > 50) AS n_high
        FROM events
        GROUP BY event_type
        """,
    ),
    "listagg_per_group": (
        q_listagg_per_group,
        """
        SELECT l_returnflag,
               string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
                 AS statuses,
               count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        """,
    ),
    "retention_cohorts": (
        q_retention_cohorts,
        """
        WITH first_day AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
          FROM events GROUP BY user_id
        ), activity AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        )
        SELECT f.cohort_day, datediff('day', f.cohort_day, a.d) AS day_offset,
               count(*) AS n_users
        FROM first_day f JOIN activity a ON f.user_id = a.user_id
        WHERE datediff('day', f.cohort_day, a.d) BETWEEN 0 AND 7
        GROUP BY 1, 2
        """,
    ),
    "threshold_filter": (
        q_threshold_filter,
        """
        SELECT p_partkey, p_name, round(p_retailprice, 2) AS retail_price
        FROM part WHERE p_retailprice >= 910.0 AND p_size < 20
        """,
    ),
    "window_rank_functions": (
        q_window_rank_functions,
        """
        SELECT o_orderkey, o_orderpriority,
               CAST(rank() OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        """,
    ),
    "correlated_exists_rewrite": (
        q_correlated_exists_rewrite,
        """
        SELECT s.s_name,
               count(*) AS n_sole_returns
        FROM lineitem l1
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_name
        """,
    ),
    "rolling_window_avg": (
        q_rolling_window_avg,
        """
        SELECT user_id, event_id,
               round(avg(value) OVER (PARTITION BY user_id ORDER BY ts
                                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),
                     6) AS rolling_avg_1h,
               CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_in_window
        FROM events
        """,
    ),
    "event_interarrival": (
        q_event_interarrival,
        """
        SELECT user_id, event_id,
               (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id)))
                 // 1000000 AS gap_seconds,
               round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6)
                 AS value_delta
        FROM events
        """,
    ),
    "pivot_status": (
        q_pivot_status,
        """
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END), 2) AS qty_O,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END), 2) AS qty_F
        FROM lineitem GROUP BY l_returnflag
        """,
    ),
    # round 13 (r12 VERDICT #1 pool): slots freed for the staged_r14/r15
    # activations; families stay covered (`top_k_per_group` for O1/O2,
    # `interval_coalesce`+`sessionize_events` for gaps-and-islands)
    "top_k": (
        q_top_k,
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS total
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
    ),
    "events_gap_fill": (q_events_gap_fill, _EVENTS_GAP_FILL_ORACLE),
}
