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
