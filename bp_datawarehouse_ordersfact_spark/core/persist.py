"""Block-manager bookkeeping for localCheckpoint lifecycles.

``DataFrame.localCheckpoint`` pins its result blocks (MEMORY_AND_DISK)
in the block manager, and — unlike ``cache()`` — ``DataFrame.unpersist``
does NOT release them: the blocks belong to an internal RDD that the SQL
cache manager never sees. The only handle Spark exposes is
``SparkContext.getPersistentRDDs``. These helpers diff that map around a
checkpoint so the caller gets the concrete RDD ids to free later.

Freeing a localCheckpoint's blocks INVALIDATES the checkpointed frame
(the lineage was truncated — there is nothing left to recompute from),
so release must happen only after consumers are done with the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# RDD ids pinned by operator RESULTS (localCheckpoint-ed pair sets,
# component labels, ...) — the blocks DataFrame.unpersist cannot free.
_RESULT_RDD_IDS: set[int] = set()


def register_result_ids(ids: set[int]) -> None:
    _RESULT_RDD_IDS.update(ids)


def release_results(spark) -> int:
    """Free the pinned result blocks of every eager operator run so far
    in this session (dedup/pair ops, connected components). Call once the
    returned frames have been fully consumed (written out / collected):
    the checkpoint truncated their lineage, so after release they CANNOT
    be recomputed. Long-lived sessions that run many such operators
    (benchmark suites, services) should call this between operators — the
    per-result block sets are small, but they compound. Returns the
    number of RDDs freed."""
    freed = unpersist_rdd_ids(spark.sparkContext, _RESULT_RDD_IDS)
    _RESULT_RDD_IDS.clear()
    return freed


def persistent_rdd_ids(sc) -> set[int]:
    """Ids of every RDD currently pinned in the block manager."""
    it = sc._jsc.sc().getPersistentRDDs().toList().iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def tracked_local_checkpoint(
    df: DataFrame, eager: bool = True
) -> tuple[DataFrame, set[int]]:
    """``df.localCheckpoint()`` plus the ids of the RDDs it pinned.

    The ids are registered here, so a later ``release_results(spark)``
    frees the blocks even if the caller discards the returned set. With
    ``eager=False`` the blocks materialize on the frame's first action
    instead of here (one job instead of two when the caller's next step
    is itself an action) — note the id diff is taken at checkpoint TIME,
    which covers both modes (the RDD is pinned immediately; only the
    block fill is deferred).
    """
    sc = df.sparkSession.sparkContext
    before = persistent_rdd_ids(sc)
    ck = df.localCheckpoint(eager=eager)
    new_ids = persistent_rdd_ids(sc) - before
    register_result_ids(new_ids)
    return ck, new_ids


def unpersist_rdd_ids(sc, ids: set[int], blocking: bool = False) -> int:
    """Release the given pinned RDDs' blocks; returns how many were
    still present. Safe to call with stale ids (already-freed ids are
    skipped)."""
    freed = 0
    it = sc._jsc.sc().getPersistentRDDs().toList().iterator()
    while it.hasNext():
        t = it.next()
        if t._1() in ids:
            t._2().unpersist(blocking)
            freed += 1
    return freed
