"""End-to-end domain pipeline test (SURVEY.md §5.2 item 2): synthetic
WC/SCB/master fixtures through ingest → merge → dims → facts, asserting
the FACT_Royalty business invariants the reference's logic encodes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.domain import dims, facts, fixtures, ingest, merge


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("domain")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pipe(spark):
    """Run the whole pipeline once; stages under test share the result."""
    raw = fixtures.wc_orders_raw(spark)
    pdim = fixtures.product_dim(spark)
    wc = ingest.normalize_orders(raw, pdim).cache()

    scb = fixtures.scb_monthly(spark)
    titles = merge.wc_book_titles(wc).select("Title", "BookType").unionByName(
        merge.scb_book_titles(scb).select("Title", "BookType")
    ).dropDuplicates(["Title", "BookType"])

    bdim = dims.book_dim(fixtures.books_master(spark), titles).cache()
    bundles = dims.bundle_dim(fixtures.bundle_master(spark), wc).cache()
    mdim = dims.merch_dim(wc)

    wc5 = facts.enrich_wc_lines(wc, bdim, bundles, mdim).cache()
    fr = facts.fact_royalty(wc5, scb, bdim).cache()
    return {"wc": wc, "book_dim": bdim, "bundle_dim": bundles, "wc5": wc5, "fr": fr,
            "scb": scb}


# --- ingest ----------------------------------------------------------------


def test_ingest_explodes_and_filters(pipe):
    wc = pipe["wc"]
    # cancelled order 104 filtered; empty order 105 has no items; 101×3 + 102 + 103
    assert wc.count() == 5
    seqs = {
        (r.OrderNumber, r.ItemOrderSeq) for r in wc.select("OrderNumber", "ItemOrderSeq").collect()
    }
    assert ("101", 1) in seqs and ("101", 3) in seqs


def test_ingest_flags_and_windows(pipe):
    rows = {(r.OrderNumber, r.ItemID): r for r in pipe["wc"].collect()}
    assert rows[("101", "1002")].GiftWrap == "Yes"
    assert rows[("102", "1004")].CustomerRole == "Wholesale Customer"
    assert rows[("103", "1005")].CustomerRole == "Administrator"
    # W1 window totals: order 101 has 3 items, 3 distinct products
    assert rows[("101", "1001")].TotalItems == 3
    assert rows[("101", "1001")].TotalProducts == 3
    # empty-string money coerced to 0 (order 102 shipping_total = '')
    assert rows[("102", "1004")].OrderShippingAmount == 0.0
    # C4/C5 bundle structure
    assert rows[("101", "1001")].BundleID == "1001"
    assert rows[("101", "1002")].BundledBy == "1001"
    assert rows[("101", "1003")].BundledBy == "1001"


def test_incremental_merge_replaces_whole_orders(spark, pipe):
    wc = pipe["wc"]
    archive = wc
    increment = wc.filter(F.col("OrderNumber") == "101").withColumn(
        "Quantity", F.col("Quantity") + 100
    )
    merged = merge.merge_wc_increment(archive, increment)
    assert merged.count() == wc.count()  # same keys, replaced rows
    q = merged.filter(F.col("OrderNumber") == "101").agg(F.min("Quantity")).collect()[0][0]
    assert q > 100  # increment rows won


def test_product_categorizer_c1(spark):
    products = spark.createDataFrame(
        [
            (1, "Night Sky Poems", "Books", None),
            (2, "Old Chapbook", "Out of Print", None),
            (3, "Heavy Tome", None, "books"),            # shipping-class fallback
            (4, "Night Sky Bundle", None, None),          # name-contains rule
            (5, "Tour Tee", "Featured", None),
            (6, "Writing Workshop", "Workshop", None),
            (7, "Mystery Item", None, None),              # → triage bucket
            (8, "Combo by Name", "Books", "bundles"),     # first match wins → Book
        ],
        "product_id long, product_name string, category_name string, shipping_class string",
    )
    out = {r.product_id: r.category for r in ingest.build_product_dim(products).collect()}
    assert out == {1: "Book", 2: "Book", 3: "Book", 4: "Bundles",
                   5: "Merch", 6: "Workshop", 7: "Check", 8: "Book"}


# --- dims ------------------------------------------------------------------


def test_book_dim_matches_and_normalizes_rates(pipe):
    bd = {r.Source_Title: r for r in pipe["book_dim"].collect()}
    assert bd["Night Sky Poems"].True_Title == "Night Sky Poems"
    # C11: '15%' (Print) → 0.15 for the Print row
    print_row = [r for r in pipe["book_dim"].collect()
                 if r.Source_Title == "Night Sky Poems" and r.BookType == "Print"]
    assert print_row and print_row[0].Royalty_Rate_All == pytest.approx(0.15)
    # near-miss master 'Midnight Sea Stories' never matches at 0.7
    assert all(r.True_Title != "Midnight Sea Stories" for r in pipe["book_dim"].collect())


def test_book_dim_isbn_placeholder(pipe):
    # River Songs has no eBook_ISBN; the SCB 'e' branch would get the
    # NA- placeholder. Print row carries the real ISBN.
    rows = [r for r in pipe["book_dim"].collect() if r.True_Title == "River Songs"]
    assert rows
    for r in rows:
        if r.BookType == "Print":
            assert r.ISBN_All == "978-2"


def test_bundle_dim_best_match_kept(pipe):
    rows = pipe["bundle_dim"].collect()
    assert len(rows) == 1  # one source bundle, despite the 96.77 near-sibling
    r = rows[0]
    assert r.Master_Product == "Night Sky Bundle"  # exact (100) beats 96.77
    # C11 shares: '60'/'40' → 0.6/0.4
    assert r.Revenue_Share_Book == pytest.approx(0.6)
    assert r.Revenue_Share_NonBook == pytest.approx(0.4)


# --- facts: the business invariants ---------------------------------------


def test_bundle_allocation_sums_to_parent(pipe):
    wc5 = pipe["wc5"]
    rows = {r.ItemID: r for r in wc5.filter(F.col("OrderNumber") == "101").collect()}
    parent_total = rows["1001"].OrderLineTotal
    # C14: parent allocates 0 to itself; components get share × parent
    assert rows["1001"].Bundle_Allocated_Total == 0.0
    assert rows["1002"].Bundle_Allocated_Total == pytest.approx(0.6 * parent_total)
    assert rows["1003"].Bundle_Allocated_Total == pytest.approx(0.4 * parent_total)
    alloc_sum = sum(
        r.Bundle_Allocated_Total for r in rows.values() if r.ItemID != "1001"
    )
    assert alloc_sum <= parent_total + 1e-9


def test_wholesale_contributes_zero_qualified_revenue(pipe):
    fr = pipe["fr"]
    # order 102 is entirely wholesale Night Sky Poems: its WC retail
    # revenue nets out (C15/C17)
    row = fr.filter(
        (F.col("Data_Source") == "WC") & (F.col("True_Title_2") == "Night Sky Poems")
    ).collect()
    assert row
    for r in row:
        assert r.Revenue_Retail == pytest.approx(
            r.Revenue_Product_Net - r.Revenue_Wholesale
        )
    ws = [r for r in row if r.Quantity_Wholesale > 0]
    assert ws and all(r.Revenue_Wholesale > 0 for r in ws)


def test_royalty_paid_identity(pipe):
    # C19: Royalty_Paid == Royalty_Qualified_Revenue × Royalty_Rate_All, everywhere
    bad = pipe["fr"].filter(
        F.abs(
            F.col("Royalty_Paid")
            - F.col("Royalty_Qualified_Revenue") * F.col("Royalty_Rate_All")
        )
        > 1e-9
    )
    assert bad.count() == 0


def test_zero_rate_qualifies_nothing(pipe):
    # C18 gate: rate 0 ⇒ qualified quantity and revenue are 0
    bad = pipe["fr"].filter(
        (F.col("Royalty_Rate_All") == 0)
        & ((F.col("Royalty_Qualified_Revenue") != 0) | (F.col("Royalty_Qualified_Quantity") != 0))
    )
    assert bad.count() == 0


def test_scb_branches_and_payment_shift(pipe):
    fr = pipe["fr"]
    sales = fr.filter(F.col("Data_Source") == "SCB Sales").collect()
    rets = fr.filter(F.col("Data_Source") == "SCB Returns").collect()
    assert sales and rets
    # D4/C21: March 2025 sales attributed to month 6 (+3); returns stay at 3
    ns = [r for r in sales if r.True_Title_2 == "Night Sky Poems"]
    assert ns and all(r.Fact_Month == 6 for r in ns)
    nr = [r for r in rets if r.True_Title_2 == "Night Sky Poems"]
    assert nr and all(r.Fact_Month == 3 for r in nr)
    # unmatched SCB title got the 'Missing - ' fallback (N2)
    assert any(r.True_Title_2 == "Missing - UNKNOWN CHAPBOOK" for r in sales)


def test_fact_order_grain_and_no_royalty_internals(pipe):
    fo = facts.fact_order(pipe["wc5"], pipe["scb"], pipe["book_dim"])
    cols = set(fo.columns)
    # P2: royalty internals dropped from the order fact
    assert not {"Royalty_Paid", "Royalty_Qualified_Revenue"} & cols
    # order grain preserved: each WC (order, line) appears exactly once
    wc_rows = fo.filter(F.col("Data_Source") == "WC")
    keys = wc_rows.select("OrderNumber", "ItemOrderSeq").collect()
    assert len(keys) == len(set((r[0], r[1]) for r in keys))
    assert len(keys) == pipe["wc5"].count()
    # revenue reconciles with the royalty grain per source
    fr_tot = (
        pipe["fr"].groupBy("Data_Source").agg(F.sum("Revenue_Product_Net").alias("r"))
    )
    fo_tot = fo.groupBy("Data_Source").agg(F.sum("Revenue_Product_Net").alias("r"))
    a = {r.Data_Source: r.r for r in fr_tot.collect()}
    b = {r.Data_Source: r.r for r in fo_tot.collect()}
    for k in a:
        assert a[k] == pytest.approx(b[k])


def test_printable_report_rolls_up_royalty(pipe):
    rep = facts.printable_report(pipe["fr"])
    # the per-title report must conserve total royalty paid
    total_rep = rep.agg(F.sum("Royalty_Paid")).collect()[0][0]
    total_fr = pipe["fr"].agg(F.sum("Royalty_Paid")).collect()[0][0]
    assert total_rep == pytest.approx(total_fr)


def test_split_royalties_double_rows_halve_money(pipe):
    report = facts.royalty_summary_report(pipe["fr"])
    out = facts.split_royalties(report)
    base = {(r.Combined_Quarter, r.Royalty_Author_Name): r for r in report.collect()}
    split_rows = [
        r for r in out.collect() if r.Royalty_Author_Name in ("Bard, B.", "Cole, C.")
    ]
    # River Songs is the co-author book: each quarter row doubled, halved
    assert split_rows
    by_q = {}
    for r in split_rows:
        by_q.setdefault(r.Combined_Quarter, []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 2
        orig = base[(q, "Bard, B. & Cole, C.")]
        for r in rows:
            assert r.Royalty_Paid == pytest.approx(orig.Royalty_Paid / 2)


def test_orchestrated_warehouse_run_matches_fused_pipeline(spark, tmp_path):
    """run_warehouse stages dw2→dw5 through real Parquet boundaries; its
    fact_royalty artifact must equal the fused single-plan registry run
    row for row, and the manifest must cover every warehouse artifact
    with consistent counts."""
    from bp_datawarehouse_ordersfact_spark.domain import orchestrator
    from bp_datawarehouse_ordersfact_spark.queries.domain_e2e import (
        q_domain_fact_royalty,
    )

    manifest = orchestrator.run_warehouse(
        spark, orchestrator.fixture_sources(spark), str(tmp_path / "wh")
    )
    arts = manifest["artifacts"]
    assert set(arts) == {
        "staging/wc_lines",
        "dimension_tables/book_dim",
        "fact_tables/fact_royalty",
        "fact_tables/fact_order",
        "reporting_tables/royalty_summary",
        "reporting_tables/split_royalty",
        "reporting_tables/printable",
    }
    for name, a in arts.items():
        assert a["rows"] > 0, name
        assert spark.read.parquet(a["path"]).count() == a["rows"], name

    staged_fr = spark.read.parquet(arts["fact_tables/fact_royalty"]["path"])
    fused_fr = q_domain_fact_royalty(spark, None)
    # identical rows (order-insensitive; measures rounded as the fused
    # query rounds its driver-facing output)
    key_cols = sorted(staged_fr.columns)

    def canon(df):
        # rnd, not F.round: both frames' doubles were produced via rnd()
        # upstream, and re-rounding with a DIFFERENT rule would reopen
        # the .5-boundary instability rnd() exists to close
        from pyspark.sql import functions as FF

        from bp_datawarehouse_ordersfact_spark.functions.rounding import rnd

        rounded = df.select(
            *[
                rnd(FF.col(c), 6).alias(c)
                if dict(df.dtypes)[c] == "double"
                else FF.col(c)
                for c in key_cols
            ]
        )
        return {tuple(str(v) for v in r) for r in rounded.collect()}

    assert canon(staged_fr) == canon(fused_fr)


def test_warehouse_dim_snapshots_time_travel_across_runs(spark, tmp_path):
    """Two warehouse runs with snapshot_dims: versions 0 and 1 commit,
    the latest Book_Dim snapshot equals the run's staged artifact, and
    the cross-run diff is empty for identical inputs (the audit answer
    'nothing changed between these runs')."""
    from bp_datawarehouse_ordersfact_spark.domain import orchestrator
    from bp_datawarehouse_ordersfact_spark.sources.versioned import (
        diff_snapshots,
        read_snapshot,
    )

    out = str(tmp_path / "wh_snap")
    m1 = orchestrator.run_warehouse(
        spark, orchestrator.fixture_sources(spark), out, snapshot_dims=True
    )
    assert m1["book_dim_version"] == 0
    import os

    # second run over the same out_dir: one history, many runs — the
    # production layout
    m2 = orchestrator.run_warehouse(
        spark, orchestrator.fixture_sources(spark), out, snapshot_dims=True
    )
    assert m2["book_dim_version"] == 1

    hist = os.path.join(out, "history/book_dim")
    latest = read_snapshot(spark, hist)
    staged = spark.read.parquet(m2["artifacts"]["dimension_tables/book_dim"]["path"])
    assert sorted(map(tuple, latest.collect())) == sorted(
        map(tuple, staged.collect())
    )
    d = diff_snapshots(spark, hist, 0, 1, ["Source_Title", "BookType"]).collect()
    assert d == []  # identical fixture inputs → no dimension drift


def test_run_warehouse_emits_structured_run_log(spark, tmp_path):
    """S8 integration: with a RunLog attached, the orchestrator records
    one JSONL line per staged artifact (with the manifest's row count)
    plus the terminal done line, and the manifest points at the log."""
    import json

    from bp_datawarehouse_ordersfact_spark.core.runlog import RunLog
    from bp_datawarehouse_ordersfact_spark.domain import orchestrator

    log = RunLog("wh-test", str(tmp_path / "logs"))
    manifest = orchestrator.run_warehouse(
        spark,
        orchestrator.fixture_sources(spark),
        str(tmp_path / "wh"),
        run_log=log,
    )
    assert manifest["run_log"] == log.path
    lines = [json.loads(x) for x in open(log.path, encoding="utf-8")]
    by_step = {x["step"]: x for x in lines}
    for name, a in manifest["artifacts"].items():
        assert by_step[name]["rows"] == a["rows"], name
    assert by_step["run_warehouse"]["status"] == "done"
    assert len(lines) == len(manifest["artifacts"]) + 1


def test_run_log_keeps_completed_steps_when_a_later_stage_crashes(
    spark, tmp_path, monkeypatch
):
    """r12 review: logging rides INSIDE _write (the tee property) — a
    crash in dw5 must keep the lines of every artifact that staged
    before it, with per-step elapsed positions, not an empty log."""
    import json

    from bp_datawarehouse_ordersfact_spark.core.runlog import RunLog
    from bp_datawarehouse_ordersfact_spark.domain import facts, orchestrator

    def boom(*a, **k):
        raise RuntimeError("injected dw5 failure")

    monkeypatch.setattr(facts, "fact_royalty", boom)
    log = RunLog("wh-crash", str(tmp_path / "logs"))
    with pytest.raises(RuntimeError, match="injected dw5 failure"):
        orchestrator.run_warehouse(
            spark,
            orchestrator.fixture_sources(spark),
            str(tmp_path / "wh"),
            run_log=log,
        )
    lines = [json.loads(x) for x in open(log.path, encoding="utf-8")]
    steps = [x["step"] for x in lines]
    assert steps == ["staging/wc_lines", "dimension_tables/book_dim"]
    assert all(x["status"] == "ok" and x["rows"] > 0 for x in lines)
    # per-step clock positions are monotone, not one repeated total
    assert lines[0]["elapsed_s"] <= lines[1]["elapsed_s"]
