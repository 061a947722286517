"""Driver-visible end-to-end domain pipeline run (rows-only check: the
four-stage pipeline is not a single SQL statement; its semantics are
pinned instead by tests/test_domain_pipeline.py's invariant suite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..domain import dims, facts, fixtures, ingest, merge

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def q_domain_fact_royalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ingest → merge-staging → dims → FACT_Royalty on the synthetic
    WC/SCB/master fixtures (FIXTURES.md). sf_dir is unused: the domain
    fixtures are self-contained and cover every CASE arm.

    ``wc`` feeds four consumers and ``bdim`` two — without
    materialization the ingest/dim subtrees (the two deepest plans in
    the repo) re-evaluate per consumer inside one DAG, which dominated
    the query's wall time. The dedup ``_CacheScope`` pattern fills each
    once and frees the caches when the (tiny) result checkpoints."""
    from ..operators.dedup import _CacheScope

    with _CacheScope() as scope:
        raw = fixtures.wc_orders_raw(spark)
        wc = scope.materialize(
            ingest.normalize_orders(raw, fixtures.product_dim(spark))
        )
        scb = fixtures.scb_monthly(spark)
        titles = (
            merge.wc_book_titles(wc)
            .select("Title", "BookType")
            .unionByName(merge.scb_book_titles(scb).select("Title", "BookType"))
            .dropDuplicates(["Title", "BookType"])
        )
        bdim = scope.materialize(dims.book_dim(fixtures.books_master(spark), titles))
        bundles = dims.bundle_dim(fixtures.bundle_master(spark), wc)
        wc5 = facts.enrich_wc_lines(wc, bdim, bundles, dims.merch_dim(wc))
        fr = facts.fact_royalty(wc5, scb, bdim)
        return scope.finish(
            fr.orderBy("Data_Source", "True_Title_2", "Fact_Year", "Fact_Month")
        )


def q_domain_split_royalty_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split-royalty summary report off the same pipeline run."""
    fr = q_domain_fact_royalty(spark, sf_dir)
    return facts.split_royalties(facts.royalty_summary_report(fr)).orderBy(
        "Combined_Quarter", "Royalty_Author_Name"
    )


QUERIES["domain_fact_royalty"] = q_domain_fact_royalty
QUERIES["domain_split_royalty_report"] = q_domain_split_royalty_report
