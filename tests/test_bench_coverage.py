"""bench.py coverage drift guard.

The bench HEADLINE list is maintained by hand; as the registry grows, a
new query silently missing from it reads as "benchmarked everything"
when it wasn't (the no-silent-caps rule). This pins the set equation:
HEADLINE == registry minus the documented exclusions, and every
exclusion has a recorded reason."""

from __future__ import annotations

import bench
from bp_datawarehouse_ordersfact_spark import queries as Q

# query -> reason it is excluded from the sf-scaling bench (mirrors the
# comment block above bench.HEADLINE)
EXCLUDED = {
    "ann_cosine_topk": "exact brute-force baseline (quadratic)",
    "ann_recall_at_k": "consumes the brute-force baseline",
    "dedup_cluster_cc": "consumes the quadratic pair verifier",
    "domain_fact_royalty": "fixed-size fixtures — ignores sf_dir",
    "domain_split_royalty_report": "fixed-size fixtures — ignores sf_dir",
    "host_authority": "fixture-bound planted link graph — ignores sf_dir",
    "sft_ingest_stream": "fixture-bound rendered JSONL feed — ignores sf_dir",
}


def test_headline_covers_registry_minus_documented_exclusions():
    registry = set(Q.all_queries())
    headline = set(bench.HEADLINE)
    unknown = headline - registry
    assert not unknown, f"bench names not in the registry: {sorted(unknown)}"
    missing = registry - headline - set(EXCLUDED)
    assert not missing, (
        f"registry queries silently absent from bench: {sorted(missing)} — "
        "add them to bench.HEADLINE or record an exclusion reason here"
    )
    stale = set(EXCLUDED) - registry
    assert not stale, f"exclusions for unregistered queries: {sorted(stale)}"
    overlap = set(EXCLUDED) & headline
    assert not overlap, f"excluded queries still benched: {sorted(overlap)}"
