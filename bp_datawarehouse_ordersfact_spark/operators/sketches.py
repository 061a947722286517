"""Mergeable sketch operators beyond HLL (SURVEY §2.5 sketch family).

``sketch_hll_merge`` covers mergeable distinct counts. These operators
cover the other two sketch algebras Spark 4 ships natively (Apache
DataSketches under the hood), both with the property that matters at
100 TB: per-partition / per-day sketch OBJECTS persist as bytes and
compose later without rescanning the events —

- **Theta sketches**: distinct-count SET ALGEBRA. ``theta_union`` /
  ``theta_intersection`` / ``theta_difference`` over sketch objects
  answer "users who did A but never B" style audience questions as
  byte-sized merges, where the exact form needs a distinct + anti-join
  over the full event log every time.
- **KLL sketches**: MERGEABLE quantiles. ``percentile_approx`` returns
  only the estimate, so yesterday's result cannot combine with today's;
  ``kll_sketch_merge_double`` composes per-group sketches into any
  rollup's quantiles.

Registered as driver queries in round 6 (the round-5 correctness window
is rotation-locked; see queries/__init__.py). Estimator error is pinned
by tests/test_operators.py against exact computations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def theta_audience_algebra(
    df: DataFrame,
    key_col: str,
    cond_a: Column,
    cond_b: Column,
    lg_k: int = 14,
) -> DataFrame:
    """Distinct-``key_col`` estimates for audiences A, B, A∩B and A∖B
    from TWO theta sketches built in one scan.

    Returns one row: (est_a, est_b, est_intersect, est_a_minus_b), all
    doubles. The exact twin needs ``count(DISTINCT ...)`` plus an
    anti-join; here the event log is scanned ONCE, the set algebra runs
    on kilobyte sketch objects — and those objects could equally come
    from per-day staged bytes, which is the 100 TB operating mode."""
    sketches = df.agg(
        F.theta_sketch_agg(F.when(cond_a, F.col(key_col)), F.lit(lg_k)).alias("sk_a"),
        F.theta_sketch_agg(F.when(cond_b, F.col(key_col)), F.lit(lg_k)).alias("sk_b"),
    )
    return sketches.select(
        F.theta_sketch_estimate(F.col("sk_a")).alias("est_a"),
        F.theta_sketch_estimate(F.col("sk_b")).alias("est_b"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
        ).alias("est_intersect"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_a"), F.col("sk_b"))
        ).alias("est_a_minus_b"),
    )


def kll_grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    k: int = 2048,
) -> tuple[DataFrame, DataFrame]:
    """Per-group KLL quantile sketches plus their MERGED global rollup.

    Returns ``(per_group, merged)``:
    - ``per_group``: (group, q_<p> for each p) from each group's sketch;
    - ``merged``: one row of global quantiles computed by merging the
      per-group sketch OBJECTS — the groups are never rescanned, which
      is what ``percentile_approx`` (estimate-only output) cannot do.

    At 100 TB the per-group frame is the staged artifact: write the
    sketch bytes once per partition/day, answer any later quantile
    question (any grouping, any probability) from the bytes alone."""
    per_sk = df.groupBy(group_col).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("sk")
    )
    qcols = [
        F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(p)).alias(
            f"q_{str(p).replace('.', '_')}"
        )
        for p in quantiles
    ]
    per_group = per_sk.select(F.col(group_col), *qcols)
    # kll_sketch_merge_double is a two-sketch scalar merge (no agg form);
    # fold the per-group sketch list — it is GROUP-cardinality (one
    # kilobyte blob per group), not row-cardinality, so the collect_list
    # is small by construction
    # empty-input guard: greatest(...,0) keeps slice legal and
    # try_element_at yields a NULL seed (→ one all-NULL quantile row)
    # instead of an ANSI out-of-bounds crash when no groups exist
    merged = per_sk.agg(F.collect_list("sk").alias("sks")).select(
        F.aggregate(
            F.expr("slice(sks, 2, greatest(size(sks) - 1, 0))"),
            F.try_element_at(F.col("sks"), F.lit(1)),
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ).alias("sk")
    ).select(*qcols)
    return per_group, merged


def frequent_items_mg(
    df: DataFrame,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Heavy hitters with deterministic error bounds via distributed
    Misra–Gries (Misra & Gries 1982 / the "space-saving" family — public
    literature; Spark's own ``df.stat.freqItems`` returns items only, no
    counts, no bounds).

    Returns (item, est_lo, est_hi) for every surviving candidate,
    ordered est_lo DESC: ``est_lo <= true count <= est_hi``, and EVERY
    item whose true count exceeds ``est_hi - est_lo`` (the total
    decrement) is guaranteed present. Tune ``k`` upward for tighter
    bounds: the undercount is at most n/(k+1) per partition.

    Scale shape: each partition keeps a capacity-``k`` counter summary
    (per Arrow batch: exact value_counts folded in, then one decrement
    step truncates back to k — memory O(k + batch distinct), never
    O(partition distinct)); the summaries are <= k rows per partition, so
    the final exact merge aggregates k·P rows — driver-trivial at any
    corpus size. Like any per-partition sketch, the SUMMARIES (and so
    the exact bound values) depend on the physical partitioning; the
    guarantees above hold under every partitioning, which is what the
    tests pin.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import pandas as pd

    def summarize(batches):
        counters: dict[str, int] = {}
        dec = 0
        for pdf in batches:
            vc = pdf["item"].dropna().value_counts()
            for item, c in vc.items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                d = sorted(counters.values(), reverse=True)[k]
                counters = {i: c - d for i, c in counters.items() if c - d > 0}
                dec += d
        rows = [(i, c, 0) for i, c in counters.items()]
        rows.append((None, 0, dec))
        yield pd.DataFrame(rows, columns=["item", "cnt", "dec"])

    summaries = df.select(F.col(item_col).cast("string").alias("item")).mapInPandas(
        summarize, "item string, cnt long, dec long"
    )
    # candidates (<= k per partition) merge EXACTLY; the one-row global
    # decrement total broadcasts back as the bound width
    merged = summaries.groupBy("item").agg(
        F.sum("cnt").cast("long").alias("est_lo"),
        F.sum("dec").cast("long").alias("d"),
    )
    total_dec = merged.agg(F.sum("d").cast("long").alias("total_dec"))
    return (
        merged.filter(F.col("item").isNotNull())
        .crossJoin(F.broadcast(total_dec))
        .select(
            "item",
            "est_lo",
            (F.col("est_lo") + F.col("total_dec")).alias("est_hi"),
        )
        .orderBy(F.desc("est_lo"), F.asc("item"))
    )


def frequent_items_mg_by_group(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group heavy hitters: ``frequent_items_mg`` keyed by
    ``group_col`` (e.g. top URLs per source). Same bounds per group
    (``est_lo <= true <= est_hi`` where the width is that GROUP's total
    decrement), same capture guarantee per group.

    Memory per partition is O(groups-in-partition × k) — still never
    O(distinct items) — and the final merge is exact over <= k·P rows
    per group. Unlike an applyInPandas grouped-map (whole group in one
    pandas frame — unbounded at 100 TB), this never materializes a
    group: summaries stay partition-local until the keyed aggregation.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import pandas as pd

    def summarize(batches):
        counters: dict[str, dict[str, int]] = {}
        decs: dict[str, int] = {}
        for pdf in batches:
            sub = pdf[["grp", "item"]].dropna()
            vc = sub.groupby(["grp", "item"]).size()
            for (g, item), c in vc.items():
                gc = counters.setdefault(g, {})
                gc[item] = gc.get(item, 0) + int(c)
            for g, gc in counters.items():
                if len(gc) > k:
                    d = sorted(gc.values(), reverse=True)[k]
                    counters[g] = {i: c - d for i, c in gc.items() if c - d > 0}
                    decs[g] = decs.get(g, 0) + d
        rows = [
            (g, i, c, 0) for g, gc in counters.items() for i, c in gc.items()
        ] + [(g, None, 0, d) for g, d in decs.items()]
        yield pd.DataFrame(rows, columns=["grp", "item", "cnt", "dec"])

    summaries = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(item_col).cast("string").alias("item"),
    ).mapInPandas(summarize, "grp string, item string, cnt long, dec long")
    merged = summaries.groupBy("grp", "item").agg(
        F.sum("cnt").cast("long").alias("est_lo"),
        F.sum("dec").cast("long").alias("d"),
    )
    group_dec = merged.groupBy("grp").agg(
        F.sum("d").cast("long").alias("total_dec")
    )
    return (
        merged.filter(F.col("item").isNotNull())
        .join(F.broadcast(group_dec), "grp")
        .select(
            F.col("grp").alias(group_col),
            "item",
            "est_lo",
            (F.col("est_lo") + F.col("total_dec")).alias("est_hi"),
        )
        .orderBy(group_col, F.desc("est_lo"), F.asc("item"))
    )


def cms_build(
    df: DataFrame,
    item_col: str,
    depth: int = 5,
    width: int = 1 << 12,
    seed: int = 42,
) -> DataFrame:
    """Count-Min sketch as a DATAFRAME — (d, w, cnt) counter rows
    (Cormode & Muthukrishnan 2005, public literature). Complements the
    sketch family: HLL/theta answer distinct-count questions,
    Misra–Gries returns the heavy-hitter CANDIDATES, CMS answers point
    frequency queries for ANY item, including items decided on after
    the scan.

    Why a frame and not ``df.stat.countMinSketch``: the built-in
    collects one JVM sketch object to the driver per call; the frame
    form persists as a (depth × width)-row Parquet table — per-day
    sketches merge later by summing counters (``cms_merge``) without
    rescanning events, the same persist-then-compose contract as the
    theta/KLL operators.

    Plan: d codegen hash columns per row (xxhash64, seeded per row of
    the matrix) exploded to (d, w) keys → ONE groupBy-count shuffle of
    at most depth·width surviving groups. Estimates (``cms_query``):
    est ≥ true always; est ≤ true + e·N/width with probability
    ≥ 1 − e^−depth (N = total items)."""
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}, {width}")
    item = F.col(item_col).cast("string")
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("d"),
                F.pmod(F.xxhash64(item, F.lit(seed + j)), F.lit(width)).alias("w"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.filter(item.isNotNull())
        .select(F.explode(probes).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.w").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS frames built with the SAME (depth, width, seed):
    counters add. Parameter agreement is the caller's contract (persist
    the parameters next to the sketch, the dedup-store meta pattern)."""
    if not sketches:
        raise ValueError("no sketches to merge")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "w").agg(F.sum("cnt").cast("long").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    items: list,
    depth: int = 5,
    width: int = 1 << 12,
    seed: int = 42,
) -> DataFrame:
    """(item, est) point-frequency estimates for ``items`` — min over
    the depth rows of each item's counters; a bucket no item ever hit
    reads as 0 (left join + coalesce). Parameters must match the build
    (same caller contract as ``cms_merge``)."""
    spark = sketch.sparkSession
    probe = spark.createDataFrame(
        [(str(x),) for x in items], "item string"
    ).select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("d"),
                        F.pmod(
                            F.xxhash64(F.col("item"), F.lit(seed + j)),
                            F.lit(width),
                        ).alias("w"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select("item", "p.d", "p.w")
    return (
        probe.join(sketch, ["d", "w"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
        .orderBy(F.desc("est"), F.asc("item"))
    )
