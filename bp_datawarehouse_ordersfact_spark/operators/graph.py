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
