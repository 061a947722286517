"""Join operators (reference §2.4 JN1–JN14).

Every dimension join in the reference is a pandas hash-merge against a
table of O(10²–10³) rows; here those become **broadcast hash joins**
(explicit ``F.broadcast`` hint — no shuffle of the fact side, which is
the property that survives a 100 TB fact table). The incremental-merge
anti-join (JN5) is the delete-insert upsert; at scale it becomes a
Delta/Iceberg ``MERGE`` but the anti-join form is storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_left_join(fact: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """JN1/JN8–JN13 shape: fact × small dim. The broadcast hint keeps the
    fact side shuffle-free regardless of AQE statistics."""
    return fact.join(F.broadcast(dim), on, how)


def anti_join_merge(archive: DataFrame, increment: DataFrame, keys: list[str]) -> DataFrame:
    """JN5 (``dw3_merge_inc.py:114-116``): delete-insert upsert.

    Archive rows whose key appears in the increment are dropped
    (`left_anti`), then the increment is appended. Column alignment is by
    name (`unionByName`), not position.

    Scale note: the anti-join shuffles both sides on ``keys`` unless the
    increment is small enough to broadcast — it usually is (a 61-day
    window vs an ever-growing archive), so we hint it.
    """
    survivors = archive.join(F.broadcast(increment.select(*keys).distinct()), keys, "left_anti")
    return survivors.unionByName(increment)


def dedup_keep_first(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """P10/W4: deterministic keep-first dedup.

    pandas ``drop_duplicates(subset=keys)`` keeps the first row in current
    order — order that Spark does not guarantee — so the rebuild always
    pins an explicit tie-break (``row_number`` over ``order_by``).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — not present in the reference (it only has anti via
    ``~isin``) but part of a complete relational surface."""
    return left.join(right, on, "left_semi")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: hot keys on the big side are spread over
    ``salt_n`` salted partitions; the other side is replicated ×salt_n so
    every salted row still finds its match.

    AQE's skew-join split handles most skew at runtime; explicit salting
    is for the pathological cases AQE can't split (one key ≫ everything,
    aggregates downstream of the join). The big side gets a random-free
    DETERMINISTIC salt (hash of a unique column set would do; here
    monotonic row bucketing via ``spark_partition_id`` is enough because
    any spread works and determinism keeps reruns identical).
    """
    salted = skewed.withColumn(
        "__salt", F.pmod(F.hash(F.spark_partition_id(), F.col(key)), F.lit(salt_n))
    )
    replicated = other.crossJoin(
        F.broadcast(
            other.sparkSession.range(salt_n).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = salted.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def diagnose_key_skew(
    df: DataFrame,
    key_col: str,
    top: int = 10,
    mg_k: int = 256,
    max_salt: int = 1024,
) -> dict:
    """Measure, don't guess: one sketch-sized answer to "will a shuffle
    on ``key_col`` skew, and what salt factor fixes it" — the diagnostic
    that decides between a plain join/window and the repo's mitigation
    family (``salted_join``, ``sessionize_skew``,
    ``coalesce_intervals_skew``, AQE skew-join).

    Cost: two map-side-combining passes over ``df`` and NOT ONE full
    shuffle of it — (1) a single aggregate for total rows + HLL approx
    distinct keys, (2) a Misra–Gries heavy-hitter pass
    (``operators.sketches.frequent_items_mg``) whose per-partition state
    is capacity-``mg_k`` and whose merge is ≤ mg_k·P rows. Works at any
    corpus size.

    Returns::

        {"total_rows", "approx_n_keys",
         "even_share",          # rows a perfectly even key would get
         "skew_factor",         # est_lo(hottest)/even_share
         "recommended_salt",    # ceil(skew_factor) clamped to [1, max_salt]
         "top_keys": [(key, est_lo, est_hi, share_hi), ...]}

    ``skew_factor`` deliberately uses the MG LOWER bound: ``est_lo <=
    true count``, so skew_factor ≫ 1 PROVES real skew — whereas the
    upper bound inflates by the global decrement, which on perfectly
    UNIFORM high-cardinality data is enormous (every key gets decremented
    constantly) and would recommend salting exactly where it only adds
    replication cost. The price is under-salting when MG undercounts a
    genuinely dominant key, bounded by n/(mg_k+1) per partition — raise
    ``mg_k`` for tighter counts. A skew_factor near 1 means a plain hash
    partition is already balanced."""
    import math

    from .sketches import frequent_items_mg

    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(key_col).alias("keys"),
    ).collect()[0]
    total, n_keys = int(row["n"]), max(1, int(row["keys"]))
    heavy = frequent_items_mg(df, key_col, k=mg_k).limit(top).collect()
    even = total / n_keys
    top_keys = [
        (
            r["item"],
            int(r["est_lo"]),
            int(r["est_hi"]),
            round(int(r["est_hi"]) / total, 6) if total else 0.0,
        )
        for r in heavy
    ]
    hottest_lo = top_keys[0][1] if top_keys else 0
    skew_factor = (hottest_lo / even) if even > 0 else 0.0
    recommended = max(1, min(max_salt, math.ceil(skew_factor)))
    return {
        "total_rows": total,
        "approx_n_keys": n_keys,
        "even_share": round(even, 3),
        "skew_factor": round(skew_factor, 3),
        "recommended_salt": recommended,
        "top_keys": top_keys,
    }


def bloom_bitmap(build: DataFrame, key_col: str, *, m_bits: int = 1 << 16, k: int = 5) -> list:
    """Bloom bitmap of the build side's non-NULL join keys, as a Python
    list of ``m_bits // 64`` longs (word ``w`` holds bits
    ``64*w .. 64*w+63``).

    Bit positions are ``pmod(xxhash64(key, j), m_bits)`` for
    ``j = 0..k-1`` — xxhash64 is a deterministic JVM-side codegen
    expression, so the bitmap is a pure function of the key set.

    Scale shape: the explode emits ``k`` position rows per key, but the
    groupBy on the word index partial-aggregates MAP-SIDE down to at most
    ``m_bits / 64`` rows per task before the shuffle, so the exchange and
    the driver collect are both bounded by the bitmap size (8 KiB of
    longs at the default 64 Ki bits) — never by the key count. That is
    the whole point: a build side too large to broadcast as a hash set
    still compresses to a constant-size filter.
    """
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    words = _bloom_words(build, key_col, m_bits=m_bits, k=k).collect()
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def _bloom_words(
    build: DataFrame, key_col: str, *, m_bits: int, k: int
) -> DataFrame:
    """Sparse (word-index, 64-bit word) rows of the Bloom bitmap —
    the shared builder behind both transports. The explode emits ``k``
    position rows per key, but the groupBy on the word index
    partial-aggregates MAP-SIDE down to at most ``m_bits / 64`` rows per
    task before the shuffle, so the exchange is bounded by the bitmap
    size — never by the key count."""
    key = F.col(key_col)
    positions = F.array(
        *[F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m_bits)) for j in range(k)]
    )
    return (
        build.filter(key.isNotNull())
        .select(F.explode(positions).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_bitmap_frame(
    build: DataFrame, key_col: str, *, m_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """ONE-ROW DataFrame ``{__bloom: array<bigint>}`` holding the dense
    Bloom bitmap of the build side's non-NULL keys — the bitmap as DATA,
    assembled entirely JVM-side (no driver ``collect``, no plan
    literals).

    This is the transport ``bloom_prefilter`` broadcasts: an r11 review
    found the original ``F.array(*[F.lit(w) ...])`` literal encoding
    planted ``m_bits/64`` expressions in the plan, which blows up
    analysis/codegen around m_bits ≈ 2^20 — exactly the sizing a
    too-big-to-broadcast build side needs. As broadcast data the bitmap
    costs 8 bytes/word on the wire (8 MiB at m_bits = 2^26) and nothing
    in the plan, so the practical ceiling moves from the optimizer to
    executor memory.

    The sparse (w, bits) rows densify by an outer join against
    ``range(n_words)`` (missing words become zero), then ONE
    ``array_sort(collect_list(struct(w, bits)))`` + field-extract pass
    inside a single global aggregate row — O(n_words · log n_words),
    never O(n_words · entries) (a first cut densified through
    ``map_from_entries`` + per-index ``element_at``, whose linear map
    scan made assembly quadratic: 16 s at m_bits = 2^20, hours at
    2^26). An empty build side yields the all-zero bitmap (only NULL
    probe keys pass, the exact join decides their fate)."""
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_words = m_bits // 64
    spark = build.sparkSession
    words = _bloom_words(build, key_col, m_bits=m_bits, k=k)
    dense = (
        spark.range(n_words)
        .select(F.col("id").cast("int").alias("w"))
        .join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("bigint")).alias("bits"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda s: s.getField("bits"),
        ).alias("__bloom")
    )


def bloom_prefilter(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """Runtime join pruning: probe rows whose key passes a Bloom filter
    built from the build side's keys.

    May pass FALSE POSITIVES (rate ≈ ``(1 - e^(-k·n/m))^k``) and NULL
    probe keys; it never drops a true match, so composing with the exact
    join afterwards preserves the join result EXACTLY — the driver row
    (``bloom_join_prune``) pins that invariance against a plain-join
    oracle.

    Why this exists at 100 TB: a shuffle join ships the ENTIRE probe side
    even when only 1% of it matches. When the build side's distinct keys
    are too many to broadcast as a hash set but the row filter fits in a
    few MiB, shipping the bitmap to every probe task turns the shuffle
    into (passing rows only) — the same trick Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` applies when its
    thresholds allow; this operator makes the reduction explicit,
    deterministic, and available to any plan shape.

    The bitmap travels as BROADCAST DATA (a one-row array<bigint> frame
    from ``bloom_bitmap_frame``, attached by a broadcast nested-loop
    join of exactly one row), NOT as plan literals — so sizing the
    filter up for large build sides (m_bits = 2^24-2^27 for 10^7-10^9
    keys at ~1% fp) costs wire bytes, not analysis/codegen time
    (tests/test_plans.py pins the plan-literal absence; the linearity
    audit covers m_bits = 2^24). The bit test itself is a pure codegen
    expression (xxhash64 + element_at + bitwiseAND) evaluated map-side:
    NO shuffle, NO Python. NULL probe keys pass through (the exact join
    decides their fate, keeping the operator usable ahead of outer
    joins).

    The probe and build key columns must have the SAME data type:
    xxhash64 hashes the binary representation, so e.g. the int 5 and
    the long 5 hash differently even though an equi-join would coerce
    and match them — a silent type mismatch would drop every true
    match. The operator refuses loudly instead; cast one side first.
    """
    def _dtype_of(df: DataFrame, name: str, side: str) -> str:
        # resolve like Spark's default case-INSENSITIVE analyzer would,
        # so the guard can't crash (bare KeyError) on a name F.col
        # happily resolves; unknown names get a real diagnosis
        types = dict(df.dtypes)
        if name in types:
            return types[name]
        folded = {c.lower(): t for c, t in df.dtypes}
        if name.lower() in folded:
            return folded[name.lower()]
        raise ValueError(f"{side} key column {name!r} not found in {df.columns}")

    probe_t = _dtype_of(probe, probe_key, "probe")
    build_t = _dtype_of(build, build_key, "build")
    if probe_t != build_t:
        raise ValueError(
            f"probe key {probe_key!r} ({probe_t}) and build key "
            f"{build_key!r} ({build_t}) must have the same type — "
            f"xxhash64 hashes representations, not join-coerced values; "
            f"cast one side before prefiltering"
        )
    key = F.col(probe_key)
    out = probe.crossJoin(
        F.broadcast(bloom_bitmap_frame(build, build_key, m_bits=m_bits, k=k))
    )
    # per-probe-hash positions land in internal temp columns so the bit
    # mask can use the SQL shiftleft (no Column-typed bits in the Python
    # API) without ever interpolating the user's column name into SQL
    pos_cols = []
    for j in range(k):
        c = f"__bloom_p{j}"
        pos_cols.append(c)
        out = out.withColumn(c, F.pmod(F.xxhash64(key, F.lit(j)), F.lit(m_bits)))
    cond = F.lit(True)
    for c in pos_cols:
        word = F.element_at(F.col("__bloom"), (F.col(c) / 64).cast("int") + F.lit(1))
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({c} % 64 AS INT))")
        cond = cond & (word.bitwiseAND(bit) != 0)
    return out.filter(key.isNull() | cond).drop("__bloom", *pos_cols)
