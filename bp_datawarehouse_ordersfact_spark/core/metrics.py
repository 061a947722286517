"""Post-execution physical-plan metrics: measure, don't guess — at the
engine level.

``.explain`` shows the plan SHAPE; after an action runs, every physical
node also carries populated SQLMetrics (output rows, shuffle bytes
written, spill sizes, peak memory). This module walks the executed plan
through py4j and returns those numbers as plain Python — the hook a
perf investigation needs to distinguish "the shuffle grew" from "the
machine was busy" without scraping the (often disabled) web UI.

Works with AQE on: an ``AdaptiveSparkPlanExec`` root is unwrapped to
its final physical plan, so the metrics reflect what actually ran after
runtime re-planning, not the initial guess.

Driver-side introspection only — no listeners, no UI dependency, no
cluster assumptions; cost is a tree walk over plan NODES (dozens), not
data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _unwrap_adaptive(jplan):
    # AdaptiveSparkPlanExec.executedPlan gives the final (re-planned)
    # physical tree once the query has run
    if jplan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        return jplan.executedPlan()
    return jplan


def _walk(jplan):
    jplan = _unwrap_adaptive(jplan)
    yield jplan
    children = jplan.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))
    # AQE query-stage nodes (Result/Shuffle/Broadcast...) carry their
    # materialized subtree off .plan(), not children()
    name = jplan.getClass().getSimpleName()
    if name.endswith("QueryStageExec"):
        yield from _walk(jplan.plan())


def physical_plan_metrics(df: DataFrame) -> list[dict]:
    """Per-node metrics of ``df``'s EXECUTED plan, root-first:
    ``[{"node": str, "metrics": {name: int}}, ...]``.

    Call AFTER an action (count/collect/write) — before execution the
    metric values are zero, which is Spark's contract, not an error
    here. Metric names are Spark's own (``numOutputRows``,
    ``shuffleBytesWritten``, ``spillSize``, ...)."""
    out = []
    jqe = df._jdf.queryExecution()
    for node in _walk(jqe.executedPlan()):
        jm = node.metrics()
        keys = jm.keys().iterator()
        metrics = {}
        while keys.hasNext():
            k = keys.next()
            metrics[k] = int(jm.apply(k).value())
        out.append({"node": node.getClass().getSimpleName(), "metrics": metrics})
    return out


def shuffle_summary(df: DataFrame) -> dict:
    """The three numbers a scale audit reads first, summed over every
    exchange in the executed plan: records shuffled, bytes written, and
    bytes spilled (memory + disk). A plan whose shuffle records vastly
    exceed its input rows has a fan-out problem; nonzero spill means
    partitions no longer fit executor memory — the two regressions that
    matter at 100 TB and are invisible in wall-clock noise."""
    records = bytes_written = spilled = 0
    n_exchanges = 0
    for entry in physical_plan_metrics(df):
        if "ShuffleExchange" in entry["node"]:
            n_exchanges += 1
            m = entry["metrics"]
            records += m.get("shuffleRecordsWritten", 0)
            bytes_written += m.get("shuffleBytesWritten", 0)
            spilled += m.get("spillSize", 0) + m.get(
                "shuffleWriteSpillSize", 0
            )
    return {
        "n_shuffle_exchanges": n_exchanges,
        "shuffle_records": records,
        "shuffle_bytes_written": bytes_written,
        "spill_bytes": spilled,
    }
