"""The ``python -m bp_datawarehouse_ordersfact_spark`` wrapper — the
operational replacement for the reference's shell-driven step sequence
(bp_etl.sh): each subcommand runs in-process and returns a JSON-able
manifest."""

from __future__ import annotations

import pytest

from bp_datawarehouse_ordersfact_spark.__main__ import main


def test_cli_list_and_query_and_warehouse(tmp_path):
    out = main(["list"])
    names = {q["name"] for q in out["queries"]}
    assert len(names) == 100
    assert all(q["oracle"] for q in out["queries"])
    assert "dedup_embedding_lsh_banded" in names

    q = main(["query", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001"])
    assert q["rows"] == 6

    with pytest.raises(SystemExit, match="unknown query"):
        main(["query", "no_such_query"])

    # the invariant pinned here is "runs end to end and returns the
    # orchestrator's manifest" — the pipeline's CONTENT is pinned by
    # tests/test_domain_pipeline.py
    wh = main(["warehouse", "--out", str(tmp_path / "wh")])
    assert isinstance(wh, dict) and wh


def test_cli_corpus_build(tmp_path):
    """The corpus subcommand runs the staged build over a documents
    parquet and returns the per-stage manifest."""
    m = main(
        [
            "corpus",
            "--docs",
            "/root/testdata/sf0.001/documents.parquet",
            "--out",
            str(tmp_path / "corpus"),
        ]
    )
    stages = m["stages"]
    assert {"01_gated", "02_deduped", "03_decontam", "04_mixed", "05_chunks"} <= set(
        stages
    )
    assert all(s["rows"] > 0 for s in stages.values())


def test_cli_corpus_increment(tmp_path):
    """The corpus-increment subcommand gates a delta against the store
    and commits the next corpus snapshot."""
    from bp_datawarehouse_ordersfact_spark.core.session import get_spark
    from bp_datawarehouse_ordersfact_spark.pipelines import build_dedup_store
    from bp_datawarehouse_ordersfact_spark.sources.versioned import (
        write_snapshot,
    )

    spark = get_spark()
    base = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .limit(5)
    )
    store = str(tmp_path / "store")
    corpus = str(tmp_path / "corpus")
    build_dedup_store(spark, base, store)
    write_snapshot(base, corpus, label="day0")
    inc_path = str(tmp_path / "inc.parquet")
    import pyspark.sql.functions as F

    spark.createDataFrame(
        [(7001, "a fresh cli increment document never seen before " * 5)],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text")).write.parquet(inc_path)

    m = main(
        [
            "corpus-increment",
            "--docs", inc_path,
            "--out", str(tmp_path / "delta"),
            "--store", store,
            "--corpus", corpus,
            "--label", "day1",
            "--retain", "1",
        ]
    )
    assert m["snapshot_version"] == 1
    assert m["admitted"] == 1
    assert m["expired_snapshots"] == [0]


def test_cli_corpus_optional_stage_flags(tmp_path):
    m = main(
        [
            "corpus",
            "--docs",
            "/root/testdata/sf0.001/documents.parquet",
            "--out",
            str(tmp_path / "corpus"),
            "--line-dedup",
            "--host-col",
            "source",
            "--max-docs-per-host",
            "5",
        ]
    )
    stages = m["stages"]
    assert "00b_lines" in stages and "01b_hostcap" in stages
    assert stages["01b_hostcap"]["rows"] <= stages["01_gated"]["rows"]


def test_cli_host_stats(tmp_path):
    out = main(
        [
            "host-stats",
            "--docs",
            "/root/testdata/sf0.001/documents.parquet",
            "--host-col",
            "source",
            "--text-col",
            "text",
            "--top",
            "3",
        ]
    )
    hosts = out["hosts"]
    assert len(hosts) == 3
    assert hosts[0]["docs"] >= hosts[-1]["docs"]
    assert all("doc_share" in h and "cum_doc_share" in h and "chars" in h for h in hosts)
    import pytest as _pytest

    docs = "/root/testdata/sf0.001/documents.parquet"
    with _pytest.raises(SystemExit, match="exactly one of --url-col / --host-col"):
        main(["host-stats", "--docs", docs])
    # r8 ADVICE: BOTH flags is the same ambiguity the operator's
    # exactly-one contract rejects — not a silent url-col preference
    with _pytest.raises(SystemExit, match="exactly one of --url-col / --host-col"):
        main(["host-stats", "--docs", docs,
              "--url-col", "text", "--host-col", "source"])


def test_cli_contamination_report(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    leak = "the quick brown fox jumps over the lazy dog tonight"
    docs = tmp_path / "docs.parquet"
    hold = tmp_path / "hold.parquet"
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": [f"intro. {leak} outro.", "clean words only here"]}),
        docs,
    )
    pq.write_table(pa.table({"text": [leak]}), hold)
    out = main(
        ["contamination", "--docs", str(docs), "--holdout", str(hold), "--top", "5"]
    )
    items = out["items"]
    assert len(items) == 1  # id synthesized from text
    assert items[0]["contaminated_docs"] == 1
    assert items[0]["example_doc_ids"] == "1"
