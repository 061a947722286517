"""Registry queries staged for round 13 but ACTIVATED EARLY in round
12 (now in ``queries._MODULES``) under the r11 VERDICT #4 accelerated
schedule — staged in round 10 together with staged_r11/12.

These two close out the r9 VERDICT's driver-uncovered list's hard
cases — both needed groundwork landed this round:

- ``corpus_stats_exact`` — `operators.aggregates.corpus_stats_report`
  with the new ``exact=True`` verification tier (interpolated
  percentile + exact count_distinct instead of sketches), which is what
  makes a cross-engine oracle possible at all. The oracle is COMPUTED
  (a DuckDB rollup twin over the same real corpus), not typed VALUES —
  the query scales with sf and pays the full one-pass aggregate at
  bench scale.
- ``host_authority`` — `operators.curation.host_authority` over a
  PLANTED 5-host link graph (``tol=0.0`` so exactly ``max_iter`` power
  steps run — the new passthrough). Every node has in-degree <= 1, so
  each PageRank update is a single-term sum: bit-deterministic under
  any partitioning, which is what makes 6dp VALUES literals safe for a
  float fixpoint. Fixture-bound by necessity (ranks normalize over the
  OBSERVED host set, so unioning the real corpus would make planted
  values sf-dependent) — the `domain_e2e` class: at activation, add it
  to bench EXCLUDED ("fixture-bound — ignores sf_dir") exactly like
  `domain_fact_royalty`.

ACTIVATED ROUND 12 (one round early): in ``queries._MODULES``, the two
names hold the window slots freed by retiring `retention_cohorts`
(relational.RETIRED) and `sketch_kll_quantile_merge`
(sketches_r6.RETIRED) — both still oracle-pinned every pytest run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..operators.aggregates import corpus_stats_report
from ..operators.curation import host_authority

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# DuckDB twin of functions.text.tokens (the llmops.SQL_TOKS form,
# restated here so this staged module is import-light)
_SQL_TOKS = (
    "list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), x -> x <> '')"
)


@register(
    "corpus_stats_exact",
    f"""
    WITH sized AS (
      SELECT source, text, length(text) AS c,
             len({_SQL_TOKS.format(c='text')}) AS t
      FROM documents)
    SELECT coalesce(source, '<ALL>') AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(c) AS BIGINT) AS n_chars,
           CAST(sum(t) AS BIGINT) AS n_tokens,
           round(avg(c), 6) AS chars_mean,
           round(quantile_cont(CAST(c AS DOUBLE), 0.5), 6) AS chars_p50,
           round(quantile_cont(CAST(c AS DOUBLE), 0.95), 6) AS chars_p95,
           round(greatest(0.0,
                 1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*)),
                 6) AS approx_dup_rate
    FROM sized GROUP BY ROLLUP(source)
    """,
)
def q_corpus_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card stats over the REAL corpus, exact verification tier
    (`operators.aggregates.corpus_stats_report(exact=True)`): per-source
    strata plus the all-corpus rollup row, document/char/token totals,
    mean/p50/p95 char lengths, exact duplicate rate.

    Why a COMPUTED oracle works here (unlike the default sketch tier,
    whose HLL/percentile_approx values no other engine reproduces):
    exact=True swaps in interpolated `percentile` — same (n-1)*p
    definition as DuckDB `quantile_cont` — and exact `count_distinct`;
    sums/avgs over integer lengths are exact in double far past this
    scale, and both sides round through the shared epsilon-shifted
    floor form (`functions/rounding`). The rollup's total row is NULL
    on both engines; coalesced to '<ALL>' so the driver's sort
    canonicalization never sees a NULL group key. One corpus scan, one
    rollup exchange whose key cardinality is |sources| — the 100 TB
    dataset-card shape, paid for real at bench scale."""
    docs = load_table(spark, sf_dir, "documents")
    rep = corpus_stats_report(docs, source_col="source", exact=True)
    return rep.withColumn("source", F.coalesce("source", F.lit("<ALL>")))


# ---------------------------------------------------------------------------
# host_authority — planted 5-host graph: a fans out to b and c, b feeds
# d, d closes the loop to a; c and e are dangling (e is fully
# isolated). Pages carry one real absolute href per out-edge plus a
# relative link (must be skipped) and a self-link on a (must be
# dropped). Expected authorities from 20 exact power steps.
# ---------------------------------------------------------------------------

_HA_PLANTED = [
    (
        "https://www.a.example/index",
        '<p><a href="https://b.example/page">b</a>'
        '<a href="http://sub.c.example/deep/page?x=1">c</a>'
        '<a href="https://a.example/self">self</a>'
        '<a href="/relative/skipped">rel</a></p>',
    ),
    ("https://b.example/post", '<a href="https://d.example/">d</a>'),
    ("http://c.example/leaf", "<p>no links at all</p>"),
    ("https://d.example/home", '<a href="https://www.a.example/back">a</a>'),
    ("https://e.example/orphan", "plain text, not even markup"),
]


@register(
    "host_authority",
    """
    SELECT * FROM (VALUES
      ('a.example', CAST(0.284297 AS DOUBLE)),
      ('b.example', CAST(0.197387 AS DOUBLE)),
      ('c.example', CAST(0.197387 AS DOUBLE)),
      ('d.example', CAST(0.244356 AS DOUBLE)),
      ('e.example', CAST(0.076574 AS DOUBLE))
    ) AS t(host, authority)
    """,
)
def q_host_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph authority per registrable domain
    (`operators.curation.host_authority`: href extraction → host
    collapse → PageRank over the distinct host graph) on a planted
    5-host web: one hub fan-out, one chain back, two dangling hosts,
    plus a self-link (dropped) and a relative link (skipped) riding
    along.

    Why typed VALUES are safe for a FLOAT fixpoint: `tol=0.0` (the
    passthrough added with this staging) makes the operator run exactly
    20 power steps — no data-dependent early stop whose float L1 delta
    could flip the iteration count — and every node has in-degree <= 1,
    so each update is a single-term sum: no parallel-summation order
    exists to vary, and the 6dp literals sit >= 1e-8 scaled from their
    rounding boundaries. The staged test re-derives all five values
    from a pure-Python replay of the operator's exact update formula.
    Fixture-bound (ranks normalize over the observed host set, so a
    real-corpus union would make the values sf-dependent) — the
    `domain_e2e` class; exclude from bench HEADLINE at activation."""
    df = spark.createDataFrame(_HA_PLANTED, "url string, html string")
    return host_authority(
        df, url_col="url", html_col="html", max_iter=20, tol=0.0
    )
