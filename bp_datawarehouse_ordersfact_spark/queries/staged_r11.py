"""Round-11 registry queries — STAGED in round 10 (the
sketches_r6/staged_r10 discipline: query + oracle + driver-style test
written a full round before the driver sees it), ACTIVATED in round 11
(in ``queries._MODULES``; the three names hold the capped slots freed
by retiring `threshold_filter`, `window_rank_functions`, and
`correlated_exists_rewrite` into ``relational.RETIRED``).

Three more still-driver-uncovered operators get typed-VALUES driver
rows here (r9 VERDICT #2 named exactly these):

- ``html_extract`` — `functions.html.html_to_text` + `extract_title` +
  `extract_links` (the crawl-ingest markup strip; the extracted TEXT is
  pinned VERBATIM, so a wrong strip order, a surviving script body, or
  a mis-decoded entity produces a wrong string, not a wrong count)
- ``contamination_report`` — `operators.dedup.contamination_report`
  (per-benchmark-item n-gram leak audit: counts + the rank-limited
  example id list, zero-hit items keeping their row)
- ``host_disjoint_split`` — `operators.curation.host_disjoint_split`
  (leakage-safe train/val membership as a pure function of
  (seed, registrable domain) — hashlib-rederivable)

All three follow the planted-fixture recipe (ids >= 3.3x10^7, above
every testdata id range and the staged_r10 plants) with the REAL corpus
unioned into the input so the bench pays each operator's true scan
cost; the planted answers are pure functions of invented literals
(+ md5 for the split), re-derived from pure Python in
tests/test_staged_r11_queries.py. The contamination holdout uses
INVENTED 5-token phrases (digit-bearing nonsense tokens) so no real
document can ever share a gram with them — the planted counts are
unperturbable by the corpus.

"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..functions.html import extract_links, extract_title, html_to_text
from ..operators.curation import host_disjoint_split
from ..operators.dedup import contamination_report

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _real_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# html_extract — two planted pages: a full document (head/style/script
# blocks whose CONTENT must vanish, a comment, block tags that must
# become line structure, entities incl. the double-escape order pin,
# two links with one fragment to strip) and a tagless entity-only
# string (the mixed-crawl passthrough contract). Real docs union in as
# input, so the whole regex chain runs over every real document at
# bench scale; planted output is selected by the id range.
# ---------------------------------------------------------------------------

_HTML_PLANTED = [
    (
        35_000_000,
        '<html><head><title>Planted &amp; Pinned</title>'
        "<style>p{color:red}</style></head>"
        "<body><!-- hidden comment --><h1>Header One</h1>"
        "<p>First paragraph with <b>bold</b> text &amp; an entity.</p>"
        '<script>var x = "<p>not text</p>";</script>'
        "<ul><li>Item A</li><li>Item B</li></ul>"
        '<p>Link to <a href="https://example.com/page?a=1#frag">example</a>'
        " and <a href='http://other.org/x'>other</a>.</p></body></html>",
    ),
    (35_000_001, "no tags here &lt;just&gt; entities &amp;&amp; text"),
]


@register(
    "html_extract",
    """
    SELECT * FROM (VALUES
      (CAST(35000000 AS BIGINT), 'Planted & Pinned',
       'Header One' || chr(10) || chr(10)
       || 'First paragraph with bold text & an entity.'
       || chr(10) || chr(10) || 'Item A' || chr(10) || chr(10) || 'Item B'
       || chr(10) || chr(10) || 'Link to example and other .',
       CAST(2 AS INT)),
      (CAST(35000001 AS BIGINT), '',
       'no tags here <just> entities && text', CAST(0 AS INT))
    ) AS t(doc_id, title, text, n_links)
    """,
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (`functions.html`): title, visible text
    with line structure, link count — the step between raw crawl and
    every text-assuming operator downstream.

    Why a typed VALUES oracle is a deterministic twin: the codegen
    strip/decode chain is a pure function of the planted markup,
    re-derived token-for-token by a pure-Python regex twin in the
    staged test (same patterns, same order — the test proves the twin
    and the literals agree, so the literals are never the only place
    the answer lives). The pinned ``other .`` spacing is the tag->space
    artifact of the codegen strip tier (an inline ``</a>`` before
    punctuation leaves one space) — deliberate: it IS the documented
    regex-heuristic tradeoff, and pinning it verbatim means any future
    "cleanup" to the chain must consciously update this row. The real
    corpus unions into the input and rides the identical expression
    chain (map-only, zero shuffles), so the bench pays the full regex
    cost at corpus scale; planted rows are selected by the id range."""
    real = _real_docs(spark, sf_dir).select("doc_id", F.col("text").alias("html"))
    planted = spark.createDataFrame(_HTML_PLANTED, "doc_id long, html string")
    pool = real.unionByName(planted)
    out = pool.select(
        "doc_id",
        extract_title(F.col("html")).alias("title"),
        html_to_text(F.col("html")).alias("text"),
        F.size(extract_links(F.col("html"))).cast("int").alias("n_links"),
    )
    return out.filter(F.col("doc_id") >= 35_000_000)


# ---------------------------------------------------------------------------
# contamination_report — three planted holdout items made of INVENTED
# digit-bearing tokens (cannot collide with real text): item-a's two
# 5-grams leak through 2 planted docs, item-b's single gram through 7
# docs (exercising the max_example_ids=5 rank limit: counts stay 7,
# examples truncate to 5), item-c never leaks (the zero-hit row must
# still exist). The real corpus unions into the DOCS side, so the
# n-gram explode + broadcast-filter join run at corpus scale.
# ---------------------------------------------------------------------------

_CONTAM_HOLDOUT = [
    ("item-a", "zq1vw xj2pl qf3rn wk4bt yh5md cz6sg"),
    ("item-b", "pm7lv rd8kc tb9fn gx0jw nv1qh"),
    ("item-c", "uc2ps ez3tm ha4rk lo5wd bi6yn"),
]
_CONTAM_DOCS = (
    [
        (33_000_000,
         "prefix words then zq1vw xj2pl qf3rn wk4bt yh5md cz6sg and a tail"),
        (33_000_001, "zq1vw xj2pl qf3rn wk4bt yh5md cz6sg"),
    ]
    + [
        (33_000_010 + i, f"filler{i} pm7lv rd8kc tb9fn gx0jw nv1qh trailer{i}")
        for i in range(7)
    ]
)


@register(
    "contamination_report",
    """
    SELECT * FROM (VALUES
      ('item-a', CAST(2 AS BIGINT), CAST(2 AS BIGINT),
       '33000000,33000001'),
      ('item-b', CAST(7 AS BIGINT), CAST(1 AS BIGINT),
       '33000010,33000011,33000012,33000013,33000014'),
      ('item-c', CAST(0 AS BIGINT), CAST(0 AS BIGINT), '')
    ) AS t(holdout_id, contaminated_docs, shared_grams, example_doc_ids)
    """,
)
def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-benchmark-item contamination audit
    (`operators.dedup.contamination_report`): which holdout items leak,
    through how many docs / distinct grams, with a bounded example list
    — the QA follow-up to the decontam drop stage.

    Why a typed VALUES oracle is a deterministic twin: holdout grams
    are invented token sequences, so the matched set is exactly the
    planted docs — counts and the rank-limited example list are pure
    string arithmetic over the fixture, re-derived from a pure-Python
    n-gram twin in the staged test. The report's row count is the
    benchmark's size (zero-hit items keep rows), so the output is the
    3 planted rows regardless of sf. The real corpus unions into the
    docs side and pays the full tokenize + 5-gram explode +
    broadcast-filter join — the operator's true at-scale cost shape
    (only matched rows, rare by construction, ever reach a shuffle)."""
    real = _real_docs(spark, sf_dir).select("doc_id", "text")
    planted = spark.createDataFrame(_CONTAM_DOCS, "doc_id long, text string")
    docs = real.unionByName(planted)
    holdout = spark.createDataFrame(
        _CONTAM_HOLDOUT, "holdout_id string, text string"
    )
    return contamination_report(
        docs,
        holdout,
        holdout_id_col="holdout_id",
        doc_id_col="doc_id",
        text_col="text",
        n=5,
        max_example_ids=5,
    )


# ---------------------------------------------------------------------------
# host_disjoint_split — 12 planted docs over 6 distinct hosts;
# membership is h32('0:' || registrable_domain) % 1e6 < 200000 -> val
# (hashlib: hosts split-host-2/-3 land val, the rest train). Real docs
# join the pool with source as host, so the map-only hash rule runs
# over every real row at bench scale; planted hosts are distinct
# strings no real row carries.
# ---------------------------------------------------------------------------

_SPLIT_PLANTED = [
    (34_000_000 + i, f"split-host-{i % 6}.example") for i in range(12)
]


@register(
    "host_disjoint_split",
    """
    SELECT * FROM (VALUES
      (CAST(34000000 AS BIGINT), 'train'), (CAST(34000001 AS BIGINT), 'train'),
      (CAST(34000002 AS BIGINT), 'val'),   (CAST(34000003 AS BIGINT), 'val'),
      (CAST(34000004 AS BIGINT), 'train'), (CAST(34000005 AS BIGINT), 'train'),
      (CAST(34000006 AS BIGINT), 'train'), (CAST(34000007 AS BIGINT), 'train'),
      (CAST(34000008 AS BIGINT), 'val'),   (CAST(34000009 AS BIGINT), 'val'),
      (CAST(34000010 AS BIGINT), 'train'), (CAST(34000011 AS BIGINT), 'train')
    ) AS t(doc_id, split)
    """,
)
def q_host_disjoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split at the registrable-domain grain
    (`operators.curation.host_disjoint_split`): every host lands wholly
    on one side, so host-local near-dups (templates, boilerplate,
    syndication) can never straddle the eval boundary.

    Why a typed VALUES oracle is a deterministic twin: membership is
    the canonical ``h32(seed ':' domain) % 1e6 < val_ppm`` md5 rule —
    a pure function of the planted host literals, re-derived from
    hashlib in the staged test (two hosts of six land val at
    val_ppm=200000, and both of each host's docs inherit the SAME
    side — the disjointness contract itself is what the fixture pins).
    The real corpus unions in (host = `source`), so the map-only hash
    rule runs over every real row at bench scale; output is selected
    by the planted id range."""
    real = _real_docs(spark, sf_dir).select(
        "doc_id", F.col("source").alias("host")
    )
    planted = spark.createDataFrame(_SPLIT_PLANTED, "doc_id long, host string")
    pool = real.unionByName(planted)
    out = host_disjoint_split(pool, val_ppm=200_000, host_col="host")
    return out.filter(F.col("doc_id") >= 34_000_000).select("doc_id", "split")
