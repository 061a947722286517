"""Temporal join operators: as-of join and interval (range) join.

The reference has no time-ordered joins at all — its only temporal logic
is calendar attribute lookup via Date_Dim equi-joins
(dw5_order_royalty_fact.py:126,293) and the +3-month payment-lag shift
(dw5_order_royalty_fact.py:741). These operators are the "beyond the
reference" temporal capabilities a training-data / event pipeline needs.

Scale notes
-----------
`asof_join` uses the union-then-window formulation: tag both sides, union,
and carry the most recent right-side payload forward with
``last(..., ignorenulls=True)`` over a (key, time)-ordered window. That is
ONE shuffle on the join key — no join operator at all — and never
materializes the quadratic (left × right-history) pair space a naive
range-join formulation would. At 100 TB the window state per key is a
single row of carried payload, so it streams.

`interval_join_agg`-shaped queries (equi key + time-range residual) should
keep the equi key in the join condition so Spark plans a hash/sort-merge
join on the key and applies the range as a cheap residual filter; only a
pure range predicate (no equi key) needs bucketized binning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Right-side rows must sort BEFORE left-side rows at equal timestamps so
# the as-of match is inclusive (ts_right <= ts_left), matching DuckDB's
# `ASOF JOIN ... ON l.ts >= r.ts` semantics.
_RIGHT_TAG = 0
_LEFT_TAG = 1


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    payload_prefix: str = "r_",
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: for every left row, attach the payload of the
    most recent right row with ``right[right_ts] <= left[left_ts]`` and
    equal `by` keys; NULL payload when no such row exists.

    If the right side can hold several rows per (by, right_ts), pass
    `right_tiebreak` (right column names, ascending; the LAST row wins
    since the window carries ``last(...)``) so the match is deterministic
    — this replaces a separate keep-first dedup pass (P10 discipline,
    SURVEY §2.3) at zero extra shuffles: the tie-break folds into the
    carry-window's sort order.

    Returns all left columns plus ``{prefix}{ts}`` and
    ``{prefix}{payload}`` columns.
    """
    by = list(by)
    p_ts = f"{payload_prefix}{right_ts}"
    p_cols = {c: f"{payload_prefix}{c}" for c in payload_cols}

    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(_LEFT_TAG).alias("__tag"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(p_ts),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(a)
            for c, a in p_cols.items()
        ],
    )
    left_only = [c for c in left.columns if c not in by and c != left_ts]
    right_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias(left_ts),
        F.lit(_RIGHT_TAG).alias("__tag"),
        F.col(right_ts).alias(p_ts),
        *[F.col(c).alias(a) for c, a in p_cols.items()],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
    )

    tiebreak_aliases = []
    for c in right_tiebreak:
        if c in p_cols:
            tiebreak_aliases.append(p_cols[c])
        elif c == right_ts:
            tiebreak_aliases.append(p_ts)
        else:
            raise ValueError(
                f"right_tiebreak column {c!r} must be in payload_cols or be the ts"
            )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(left_ts), F.col("__tag"), *[F.col(a) for a in tiebreak_aliases])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = left_tagged.unionByName(right_tagged).select(
        *[F.col(c) for c in left.columns],
        F.col("__tag"),
        F.last(p_ts, ignorenulls=True).over(w).alias(p_ts),
        *[
            F.last(a, ignorenulls=True).over(w).alias(a)
            for a in p_cols.values()
        ],
    )
    return carried.filter(F.col("__tag") == _LEFT_TAG).drop("__tag")


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Gaps-and-islands interval coalescing: merge every overlapping or
    touching ``[start, end]`` interval per ``key_col`` into one island.

    An interval joins the current island when its start is <= the
    running MAX of all previous interval ends (not just the previous
    row's end — an early long interval can swallow several later
    starts). ``tiebreak_col`` makes the island numbering deterministic
    under duplicate starts.

    Returns (key, island_id, interval_start, interval_end, n_intervals).

    Scale shape: ONE shuffle on the key; the running-max window, the
    running-sum window, and the (key, island) rollup all reuse that
    partitioning (island refines the key), so the physical plan carries
    exactly one Exchange — pinned by tests/test_plans.py. Skewed keys
    degrade only their own partition's sort.
    """
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(start_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy(start_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.withColumn(
        "__new_island",
        F.when(
            F.col(start_col) <= F.max(end_col).over(w_prev), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = flagged.withColumn("__island", F.sum("__new_island").over(w_cum))
    return (
        islands.groupBy(
            F.col(key_col), F.col("__island").cast("bigint").alias("island_id")
        )
        .agg(
            F.min(start_col).alias("interval_start"),
            F.max(end_col).alias("interval_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


def grouped_ewma_partition_carry(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    id_col: str | None = None,
) -> DataFrame:
    """Per-key EWMA with BOUNDED memory in plain batch mode — the third
    execution strategy next to ``queries.llmops.q_grouped_ewma``'s
    grouped-map (whole group in one pandas frame) and
    ``streaming.jobs.run_chunked_ewma_availablenow``'s streaming state:

    repartition by key + sortWithinPartitions puts each key's rows in
    order inside one partition; ``mapInPandas`` then streams that
    partition as Arrow batches IN ORDER, and a per-key carry dict inside
    the generator closure seeds each batch's vectorized ``ewm`` with the
    previous batch's last value (the same prepend-seed identity the
    streaming job uses). A key larger than one Arrow batch costs one
    float of generator state, never a whole-group pandas frame — memory
    is O(distinct keys in flight), bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` per step.

    ``id_col`` (defaults to the last order col) is emitted alongside the
    key so results join back to source rows; the output schema is
    derived from the input types, so string keys / timestamp ids work.
    Null keys form their own group (same as the grouped-map and
    streaming strategies). Bit-identical to the grouped-map fold (pinned
    by tests/test_operators.py with tiny Arrow batches forcing mid-group
    splits)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_id = id_col or order_cols[-1]
    src = df.select(key_col, *order_cols, value_col).repartition(
        F.col(key_col)
    ).sortWithinPartitions(key_col, *order_cols)
    out_schema = T.StructType(
        [
            src.schema[key_col],
            src.schema[out_id],
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def gen(batches):
        carry: dict = {}
        for pdf in batches:
            ew = np.empty(len(pdf), dtype="float64")
            pos = 0
            # contiguous key runs within the sorted batch; dropna=False
            # keeps null-key rows as their own group (Arrow surfaces a
            # null long key as NaN — normalize so the carry dict keys it
            # stably: NaN != NaN would otherwise reset the carry per batch)
            for key, grp in pdf.groupby(key_col, sort=False, dropna=False):
                k = None if pd.isna(key) else key
                vals = grp[value_col].to_numpy(dtype="float64")
                prev = carry.get(k)
                if prev is None:
                    seg = pd.Series(vals).ewm(alpha=alpha, adjust=False).mean().to_numpy()
                else:
                    seeded = np.concatenate(([prev], vals))
                    seg = (
                        pd.Series(seeded)
                        .ewm(alpha=alpha, adjust=False)
                        .mean()
                        .to_numpy()[1:]
                    )
                carry[k] = float(seg[-1])
                ew[pos : pos + len(seg)] = seg
                pos += len(seg)
            out = pdf[[key_col, out_id]].copy()
            out["ewma"] = ew
            yield out

    return src.mapInPandas(gen, schema=out_schema)


def sessionize_skew(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    gap_seconds: int = 1800,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Skew-proof sessionization — the salt-then-merge twin of the plain
    gaps-and-islands form (``q_sessionize_events``), for the one hot key
    a `Window.partitionBy(key)` cannot survive: all of a key's events
    land in ONE task there, so a 10⁹-event user stalls or OOMs the stage
    regardless of cluster size.

    Two-level plan, with TIME as the salt (unlike the random salt of
    ``skew_salted_join``, a time salt preserves the ordering the
    semantics need):

    1. events sessionize within (key, time-bucket) partitions — per-task
       cardinality is bounded by one key's events per ``bucket_seconds``,
       a knob, not by the key's lifetime volume;
    2. the per-(key, bucket) LOCAL sessions collapse to summary rows
       (start, end, n, sum) — per key that is ≤ true sessions + active
       buckets, orders of magnitude below event cardinality and of the
       same order as the operator's OUTPUT — and a second
       gaps-and-islands pass over summaries per key heals the sessions
       the bucket boundaries artificially split (chains spanning many
       buckets merge through the running sum exactly like any island).

    Exactly equal to the plain form — same gap rule (diff ≤ gap stays in
    session), same (ts, tiebreak) ordering, same per-key session
    numbering — pinned by tests/test_operators.py. The same two-level
    decomposition skew-proofs ``coalesce_intervals``: clamp intervals to
    buckets, coalesce within (key, bucket), then island-merge the
    boundary summaries.

    Returns (key, session_id, n_events, session_value, session_start,
    session_end).
    """
    if gap_seconds < 1 or bucket_seconds < 1:
        raise ValueError("gap_seconds and bucket_seconds must be >= 1")
    gap_us = gap_seconds * 1_000_000
    bkt_us = bucket_seconds * 1_000_000
    key, ts, tb = F.col(key_col), F.col(ts_col), F.col(tiebreak_col)

    bucketed = df.select(
        key.alias("k"),
        ts.alias("t"),
        tb.alias("tb"),
        F.col(value_col).alias("v"),
        F.floor(F.unix_micros(ts) / F.lit(bkt_us)).alias("__bkt"),
    )
    w_local = Window.partitionBy("k", "__bkt").orderBy("t", "tb")
    flagged = bucketed.withColumn(
        "__new",
        F.when(
            F.unix_micros(F.col("t")) - F.unix_micros(F.lag("t").over(w_local))
            <= gap_us,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    local = flagged.withColumn(
        "__loc",
        F.sum("__new").over(w_local.rowsBetween(Window.unboundedPreceding, 0)),
    )
    summaries = local.groupBy("k", "__bkt", "__loc").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("val"),
        F.min("t").alias("s_start"),
        F.max("t").alias("s_end"),
        F.min("tb").alias("first_tb"),
    )
    # summaries are time-disjoint per key (sessions don't overlap), so
    # a per-key window over THEM is safe at any event volume
    w_sess = Window.partitionBy("k").orderBy("s_start", "first_tb")
    healed = summaries.withColumn(
        "__newg",
        F.when(
            F.unix_micros(F.col("s_start"))
            - F.unix_micros(F.lag("s_end").over(w_sess))
            <= gap_us,
            F.lit(0),
        ).otherwise(F.lit(1)),
    ).withColumn(
        "session_id",
        F.sum("__newg").over(w_sess.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return healed.groupBy(
        F.col("k").alias(key_col), F.col("session_id").cast("bigint").alias("session_id")
    ).agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("val").alias("session_value"),
        F.min("s_start").alias("session_start"),
        F.max("s_end").alias("session_end"),
    )


def coalesce_intervals_skew(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str,
    bucket_span: int,
) -> DataFrame:
    """Skew-proof twin of ``coalesce_intervals`` — the two-level
    decomposition ``sessionize_skew`` uses, applied to interval
    coalescing, for the hot key whose intervals would all land in one
    window task.

    1. every interval is SPLIT at bucket boundaries (``sequence`` over
       its covered buckets; an interval wholly inside a bucket emits one
       segment) — pick ``bucket_span`` so typical intervals cover O(1)
       buckets, since an interval spanning B buckets emits B segments;
    2. segments coalesce into islands within (key, bucket) partitions —
       per-task cardinality bounded by one key's segments per bucket;
    3. the per-(key, bucket) island summaries — ≤ true islands + active
       buckets per key, output-scale — run the SAME gaps-and-islands
       pass per key; split segments of one interval touch at the
       boundary, so the running-max merge heals every cut.

    ``start_col``/``end_col`` must be integral (cast timestamps via
    ``unix_micros`` first — bucketing uses exact integer floor division,
    never double division, so boundary values at timestamp magnitudes
    cannot misbucket). Original-interval counts are preserved by
    flagging each interval's FIRST segment and summing flags, so the
    output (key, island_id, interval_start, interval_end, n_intervals)
    is pinned EXACTLY equal to the plain form."""
    if bucket_span < 1:
        raise ValueError(f"bucket_span must be >= 1, got {bucket_span}")

    def fdiv(c):  # exact floor division for longs of any sign
        # (c - pmod) is an exact multiple of bucket_span; the quotient is
        # taken in decimal(38,0) because Spark's `/` on longs is DOUBLE
        # division — exact only below 2^53, so unix-nano magnitudes
        # (~1.7e18) would round the numerator to a multiple of 256 and
        # misbucket (r6 ADVICE). Decimal division is exact at any long.
        c = c.cast("long")
        exact = (c - F.pmod(c, F.lit(bucket_span))).cast("decimal(38,0)")
        return (exact / F.lit(bucket_span)).cast("long")

    s, e, tb = F.col(start_col), F.col(end_col), F.col(tiebreak_col)
    segs = df.select(
        F.col(key_col).alias("k"),
        s.alias("s"),
        e.alias("e"),
        tb.alias("tb"),
        F.explode(F.sequence(fdiv(s), fdiv(e))).alias("__bkt"),
    ).select(
        "k",
        "__bkt",
        F.greatest(F.col("s"), F.col("__bkt") * bucket_span).alias("ss"),
        F.least(F.col("e"), (F.col("__bkt") + 1) * bucket_span).alias("se"),
        "tb",
        (F.col("__bkt") == fdiv(F.col("s"))).cast("long").alias("first_seg"),
    )
    w_prev = (
        Window.partitionBy("k", "__bkt")
        .orderBy("ss", "tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("k", "__bkt")
        .orderBy("ss", "tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = segs.withColumn(
        "__new",
        F.when(F.col("ss") <= F.max("se").over(w_prev), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    local = flagged.withColumn("__loc", F.sum("__new").over(w_cum))
    summaries = local.groupBy("k", "__bkt", "__loc").agg(
        F.min("ss").alias("is_"),
        F.max("se").alias("ie"),
        F.sum("first_seg").alias("n"),
        F.min("tb").alias("first_tb"),
    )
    # pass 3: the plain algorithm over summary rows, per bare key
    w_prev2 = (
        Window.partitionBy("k")
        .orderBy("is_", "first_tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum2 = (
        Window.partitionBy("k")
        .orderBy("is_", "first_tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    healed = summaries.withColumn(
        "__newg",
        F.when(F.col("is_") <= F.max("ie").over(w_prev2), F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("__island", F.sum("__newg").over(w_cum2))
    return healed.groupBy(
        F.col("k").alias(key_col),
        F.col("__island").cast("bigint").alias("island_id"),
    ).agg(
        F.min("is_").alias("interval_start"),
        F.max("ie").alias("interval_end"),
        F.sum("n").cast("bigint").alias("n_intervals"),
    )
