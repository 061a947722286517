"""Connected components over candidate-duplicate pair graphs.

Near-duplicate detection (operators/dedup.py) emits PAIRS; turning pairs
into dedup GROUPS ("keep one doc per cluster") is a connected-components
problem. The reference never needs this (its fuzzy matches are
master↔source lookups, dw4_book_dim.py:166-192, not clustering), but any
corpus-scale dedup pipeline does — MinHash/SimHash pairs must be closed
transitively before electing cluster representatives.

Algorithm: iterative minimum-label propagation (the standard Pregel-style
formulation, e.g. GraphFrames' connectedComponents). Each node starts
labeled with its own id; every iteration each node takes the min of its
label and its neighbors' labels; fixpoint = components keyed by their
minimum member id. Deterministic by construction.

Scale notes: each iteration is one shuffle (join on edge src + groupBy
node); iteration count is bounded by the graph diameter, which for
near-dup clusters is tiny (dup clusters are dense, diameter ~2-3).
`localCheckpoint` truncates the lineage each round so the plan does not
grow exponentially across iterations. Convergence is detected with a
single cheap aggregate: labels only ever decrease, so an unchanged
sum(label) means fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import rnd
from ..core.persist import (
    tracked_local_checkpoint,
    unpersist_rdd_ids,
)


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id_col, component) where component = min node id reachable
    from the node over the undirected edge set. Isolated nodes form their
    own singleton components.

    `edges` may be directed/one-sided (e.g. dedup pairs with id_a < id_b);
    it is symmetrized here.
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )

    sc = nodes.sparkSession.sparkContext
    # lazy checkpoint: the convergence aggregate below is the action that
    # materializes the blocks, so each iteration is ONE job (materialize
    # + sum fused), not a checkpoint job followed by an agg job
    labels, label_ids = tracked_local_checkpoint(
        nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("component")),
        eager=False,
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]

    for _ in range(max_iter):
        neighbor_msgs = sym.join(
            labels, sym["src"] == labels["id"], "inner"
        ).select(F.col("dst").alias("id"), F.col("component"))
        new_labels, new_ids = tracked_local_checkpoint(
            labels.select("id", "component")
            .unionByName(neighbor_msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component")),
            eager=False,
        )
        new_sum = new_labels.agg(F.sum("component")).collect()[0][0]
        # the previous iteration's blocks fed new_labels, which is now
        # materialized — free them instead of pinning one label set per
        # iteration for the session lifetime
        unpersist_rdd_ids(sc, label_ids)
        labels, label_ids = new_labels, new_ids
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    # the surviving label set is the RESULT; its blocks (registered by
    # tracked_local_checkpoint) are freed by core.persist.release_results
    # once the caller has consumed it
    return labels.select(F.col("id").alias(id_col), "component")


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    seeds: list | None = None,
    probe_delta_every: int = 1,
    validate_edges: bool = True,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list — the classic
    link-analysis quality prior a curation pipeline computes over
    citation/hyperlink graphs (public formulation, Page et al. 1999).
    Returns (id_col, rank), ranks summing to 1, rounded to 6dp on output.

    ``seeds`` switches to PERSONALIZED PageRank: teleportation (and
    dangling mass) flows uniformly to the seed set instead of all nodes,
    so ranks measure proximity to the seeds — the "expand this curated
    set" primitive (seed ids embed as a literal IN-list; seed sets are
    query-sized by nature).

    Per iteration (the standard distributed plan): out-degrees join the
    current ranks, contributions shuffle once on the destination key
    with map-side partial sums, dangling mass (nodes with no out-edges)
    redistributes over the teleport distribution. Driver round-trips are
    ONE fused 1-row aggregate per iteration — the L1 convergence delta
    and the NEXT iteration's dangling mass computed together on the
    action that materializes the per-iteration localCheckpoint (r5
    ADVICE: the previous two-probe form serialized the iteration at
    cluster scale). ``probe_delta_every=k`` drops the delta join from
    the off-iterations (the probe then computes dangling mass only), so
    convergence is checked every k-th iteration; the default 1 keeps the
    stopping behavior bit-identical to the pinned reference. Iterations
    cap at ``max_iter``.

    Edge endpoints MUST be drawn from ``nodes``: a dst outside the node
    set silently drops its inflow in the join back to nodes (ranks stop
    summing to 1) and a src outside it is ignored. ``validate_edges``
    (default True) enforces this with one anti-join count and raises;
    disable it only for pipelines that guarantee closure upstream (at
    100 TB the check is a full edge scan).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if seeds is not None and not seeds:
        raise ValueError("seeds must be None or a non-empty list")
    if probe_delta_every < 1:
        raise ValueError(f"probe_delta_every must be >= 1, got {probe_delta_every}")
    sc = nodes.sparkSession.sparkContext
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col(id_col).alias(id_col), F.lit(0.0).alias("rank")
        )
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if validate_edges:
        node_ids = nodes.select(F.col(id_col).alias("nid"))
        loose = (
            e.select(F.col("src").alias("nid"))
            .unionByName(e.select(F.col("dst").alias("nid")))
            .distinct()
            .join(node_ids, "nid", "left_anti")
            .count()
        )
        if loose:
            raise ValueError(
                f"{loose} edge endpoint(s) are not in the node set — ranks "
                "would silently stop summing to 1 (pass validate_edges=False "
                "only when closure is guaranteed upstream)"
            )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    # teleport distribution p: uniform, or uniform over the seed set.
    # Dedupe and VALIDATE seeds against the node set — a missing seed
    # would make p sum below 1 and silently break the ranks-sum-to-1
    # contract (all-zero ranks in the worst case)
    if seeds is None:
        p_of = lambda c: F.lit(1.0 / n)  # noqa: E731
    else:
        seed_set = sorted(set(seeds))
        matched = nodes.filter(F.col(id_col).isin(seed_set)).count()
        if matched != len(seed_set):
            raise ValueError(
                f"{len(seed_set) - matched} of {len(seed_set)} seeds are "
                "not in the node set"
            )
        p_of = lambda c: F.when(  # noqa: E731
            c.isin(seed_set), F.lit(1.0 / len(seed_set))
        ).otherwise(F.lit(0.0))

    ranks, ids = tracked_local_checkpoint(
        nodes.select(
            F.col(id_col).alias("nid"), p_of(F.col(id_col)).alias("r")
        ),
        eager=False,
    )

    # dangling-mass term of the fused probe: rank held by nodes with no
    # out-edges (deg NULL after the left join against out_deg)
    d_mass_agg = F.coalesce(
        F.sum(F.when(F.col("deg").isNull(), F.col("r"))), F.lit(0.0)
    ).alias("d_mass")

    # initial probe (also materializes the ranks_0 checkpoint): the
    # loop's fused probe computes iteration t+1's dangling mass, so only
    # iteration 0's is needed up front
    d_mass = (
        ranks.join(out_deg, ranks["nid"] == out_deg["src"], "left")
        .agg(d_mass_agg)
        .collect()[0]["d_mass"]
    )

    stale: set[int] = set()
    for it in range(max_iter):
        contribs = (
            e.join(ranks, e["src"] == ranks["nid"])
            .join(out_deg, "src")
            .select(F.col("dst").alias("nid"), (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("nid")
            .agg(F.sum("c").alias("inflow"))
        )
        # per-node floor: p_i * ((1-d) + d * dangling_mass) — reduces to
        # the classic uniform base when p is 1/n everywhere
        base_factor = (1.0 - damping) + damping * d_mass
        new_ranks, new_ids = tracked_local_checkpoint(
            nodes.select(F.col(id_col).alias("nid"), p_of(F.col(id_col)).alias("p"))
            .join(contribs, "nid", "left")
            .select(
                "nid",
                (
                    F.col("p") * F.lit(base_factor)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("r"),
            ),
            eager=False,
        )
        # ONE driver round-trip per iteration: next dangling mass and
        # (on probe iterations) the L1 delta, in the same 1-row aggregate
        # on the action that materializes new_ranks' checkpoint
        check_delta = (it + 1) % probe_delta_every == 0 or it == max_iter - 1
        probe = new_ranks.join(
            out_deg, new_ranks["nid"] == out_deg["src"], "left"
        ).select(new_ranks["nid"].alias("nid"), "r", "deg")
        if check_delta:
            probe = probe.join(
                ranks.select("nid", F.col("r").alias("r_old")), "nid"
            )
            row = probe.agg(
                d_mass_agg,
                F.sum(F.abs(F.col("r") - F.col("r_old"))).alias("delta"),
            ).collect()[0]
            delta = row["delta"]
        else:
            row = probe.agg(d_mass_agg).collect()[0]
            delta = None
        d_mass = row["d_mass"]
        unpersist_rdd_ids(sc, stale)
        stale = ids
        ranks, ids = new_ranks, new_ids
        if delta is not None and delta < tol:
            break

    out = ranks.select(
        F.col("nid").alias(id_col),
        rnd(F.col("r"), 6).alias("rank"),
    )
    unpersist_rdd_ids(sc, stale)
    return out
