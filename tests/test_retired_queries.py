"""Oracle pins for registry-RETIRED queries.

Round 9 (r8 VERDICT #1) retired `rolling_window_avg`,
`event_interarrival`, and `pivot_status` (relational.RETIRED); round 10
(r9 VERDICT #1) retired `sample_stratified`, `text_chunking`, and
`dedup_ngram_jaccard` (llmops.RETIRED); round 11 (r10 VERDICT #1)
retired `threshold_filter`, `window_rank_functions`, and
`correlated_exists_rewrite` (relational.RETIRED); round 12 (r11 VERDICT
#1/#4) retired `cube_summary`, `listagg_per_group`,
`variant_props_extract`, `retention_cohorts` (relational.RETIRED) and
`sketch_kll_quantile_merge` (sketches_r6.RETIRED); round 13 (r12
VERDICT #1) retired `top_k`, `events_gap_fill` (relational.RETIRED)
and `url_canonicalize` (curation_r9.RETIRED); round 14 (r13 VERDICT
#1) retired `text_token_count` (llmops.RETIRED),
`set_intersect_except` (relational.RETIRED), and `date_dim_generate`
(pipeline.RETIRED). Each freed a capped
registry slot for a curation/SFT-layer query. Retirement changes WHO checks
them, not whether they are checked: this runs the exact driver-style
comparison (tests/parity.py's fetchdf + dtype-sensitive frames_match,
central round() rewrite applied) against each retiree's original
oracle, every pytest run — the same contract they had while registered.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import (
    curation_r9,
    llmops,
    pipeline,
    relational,
    sketches_r6,
)
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"

RETIRED: dict[str, tuple] = {
    **relational.RETIRED,
    **llmops.RETIRED,
    **sketches_r6.RETIRED,
    **curation_r9.RETIRED,
    **pipeline.RETIRED,
}


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("retired-queries")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "lineitem", "documents", "part", "orders", "supplier"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_retiree_dicts_are_disjoint():
    mods = (
        relational.RETIRED,
        llmops.RETIRED,
        sketches_r6.RETIRED,
        curation_r9.RETIRED,
    )
    total = sum(len(m) for m in mods)
    merged = set().union(*(set(m) for m in mods))
    assert len(merged) == total, "query retired in two modules"


def test_retirees_are_not_registered():
    from bp_datawarehouse_ordersfact_spark import queries as Q

    registered = set(Q.all_queries())
    leaked = set(RETIRED) & registered
    assert not leaked, f"retired queries still registered: {leaked}"


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_query_still_passes_driver_comparison(spark, con, name):
    fn, oracle = RETIRED[name]
    sdf = fn(spark, SF_DIR).toPandas()
    ddf = con.execute(sql_rewrite_rounds(oracle)).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"
