"""Production run of the whole domain warehouse — the reference's
``main_orchestrator.py:37-49`` re-expressed.

The reference chains four subprocesses with CSV-on-GCS handoffs; here
the same dataflow is ONE function whose stage boundaries are Parquet
materializations chosen for restartability (SURVEY.md §3.1): the ingest
normalization and the Book_Dim similarity match are the two expensive
subtrees consumed by several downstream sinks, so they stage; the fact
and report sinks each write once off the staged inputs. Every write
carries an observed row-count metric, so the run returns the manifest a
scheduler's run-log wants (per-artifact path + rows) with no extra
counting scans — same discipline as ``pipelines/corpus_build.py``.

A reference user's ``python main_orchestrator.py`` becomes::

    from bp_datawarehouse_ordersfact_spark.domain import orchestrator
    manifest = orchestrator.run_warehouse(spark, sources, out_dir)

where ``sources`` supplies the four inputs the reference pulls from
WooCommerce/GCS/BigQuery (any DataFrames — REST ingest, parquet stages,
or the built-in deterministic fixtures for smoke runs).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..pipelines.corpus_build import _stage
from . import dims, facts, fixtures, ingest, merge


@dataclass
class WarehouseSources:
    """The four external inputs (reference: WC REST pull, SCB monthly
    CSV, books/bundles master data from BigQuery)."""

    wc_orders_raw: DataFrame
    # None = derive the product dim from the built-in fixtures (smoke
    # runs); production passes the raw /products pull
    products_raw: DataFrame | None
    scb_monthly: DataFrame
    books_master: DataFrame
    bundle_master: DataFrame


def fixture_sources(spark: SparkSession) -> WarehouseSources:
    """The deterministic fixtures (FIXTURES.md) as a source bundle — the
    smoke-run configuration; production swaps in REST/BigQuery reads."""
    return WarehouseSources(
        wc_orders_raw=fixtures.wc_orders_raw(spark),
        products_raw=None,  # fixtures ship a prebuilt product dim
        scb_monthly=fixtures.scb_monthly(spark),
        books_master=fixtures.books_master(spark),
        bundle_master=fixtures.bundle_master(spark),
    )


def _write(
    df: DataFrame, out_dir: str, name: str, manifest: dict, run_log=None
) -> DataFrame:
    # one observe-write-reload idiom for the whole repo: reuse the
    # corpus pipeline's _stage instead of a second copy
    staged, rows = _stage(df, out_dir, name)
    manifest["artifacts"][name] = {"path": os.path.join(out_dir, name), "rows": rows}
    if run_log is not None:
        # logged AT the write (the tee property): a crash later in the
        # run keeps this step's line, and elapsed_s is this step's
        # actual position on the run clock (r12 review — a post-hoc
        # loop lost both)
        run_log.step(name, rows=rows)
    return staged


def run_warehouse(
    spark: SparkSession,
    sources: WarehouseSources,
    out_dir: str,
    snapshot_dims: bool = False,
    run_log: "RunLog | None" = None,
) -> dict:
    """dw2 → dw3 → dw4 → dw5 end to end, Parquet-staged, manifest out.

    ``snapshot_dims=True`` additionally commits Book_Dim to a versioned
    snapshot history under ``out_dir/history/book_dim``
    (``sources/versioned.py``) — the reference truncate-loads its dims
    and destroys history (SURVEY §2.1 S6); with snapshots every run's
    dimension state stays queryable (time travel) and diffable (keyed
    insert/update/delete audit between any two runs), which is how a
    royalty restatement gets explained months later. The manifest gains
    the committed version number.

    ``run_log`` (a ``core/runlog.RunLog``) records one structured JSONL
    line per staged artifact — the engine-appropriate form of the
    reference's tee'd shell transcript (S8, ``bp_etl.sh:16-29``); ship
    the finished log with ``core/runlog.ship_logs``. Logging rides the
    existing ``_write`` path, so a crashed run keeps every completed
    step's line."""
    manifest: dict = {"out_dir": out_dir, "artifacts": {}}
    if run_log is not None:
        manifest["run_log"] = run_log.path

    # dw2 — ingest + normalize (staged: feeds titles, dims, and facts)
    pd_dim = (
        fixtures.product_dim(spark)
        if sources.products_raw is None
        else ingest.build_product_dim(sources.products_raw)
    )
    wc = _write(
        ingest.normalize_orders(sources.wc_orders_raw, pd_dim),
        out_dir,
        "staging/wc_lines",
        manifest,
        run_log,
    )

    # dw3 — title staging for the dimension match
    titles = (
        merge.wc_book_titles(wc)
        .select("Title", "BookType")
        .unionByName(
            merge.scb_book_titles(sources.scb_monthly).select("Title", "BookType")
        )
        .dropDuplicates(["Title", "BookType"])
    )

    # dw4 — dimensions (Book_Dim staged: the TF-IDF match is the
    # expensive subtree consumed by both facts below)
    bdim = _write(
        dims.book_dim(sources.books_master, titles),
        out_dir,
        "dimension_tables/book_dim",
        manifest,
        run_log,
    )
    if snapshot_dims:
        from ..sources.versioned import write_snapshot

        manifest["book_dim_version"] = write_snapshot(
            bdim, os.path.join(out_dir, "history/book_dim"), label="run"
        )
    bundles = dims.bundle_dim(sources.bundle_master, wc)
    wc5 = facts.enrich_wc_lines(wc, bdim, bundles, dims.merch_dim(wc))

    # dw5 — facts + reports, each one sink off the staged inputs
    fr = _write(
        facts.fact_royalty(wc5, sources.scb_monthly, bdim),
        out_dir,
        "fact_tables/fact_royalty",
        manifest,
        run_log,
    )
    _write(
        facts.fact_order(wc5, sources.scb_monthly, bdim),
        out_dir,
        "fact_tables/fact_order",
        manifest,
        run_log,
    )
    summary = facts.royalty_summary_report(fr)
    _write(
        summary, out_dir, "reporting_tables/royalty_summary", manifest, run_log
    )
    _write(
        facts.split_royalties(summary),
        out_dir,
        "reporting_tables/split_royalty",
        manifest,
        run_log,
    )
    _write(
        facts.printable_report(fr),
        out_dir,
        "reporting_tables/printable",
        manifest,
        run_log,
    )
    if run_log is not None:
        run_log.step("run_warehouse", status="done")
    return manifest
