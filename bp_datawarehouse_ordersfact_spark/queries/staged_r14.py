"""STAGED registry query for the round-14 rotation (not yet in
``queries._MODULES`` — the sketches_r6/staged_r10 staging discipline:
write the query + oracle + driver-style test ahead of activation, so
the activation is a mechanical edit).

One query: ``registrable_domain_psl`` (r10 VERDICT #2 named exactly
this) — the EXACT public-suffix-list lookup (`functions/urls.py
registrable_domain_psl`) is the one shipped operator with real lookup
complexity (wildcard ``*.kobe.jp`` and exception ``!city.kobe.jp`` rule
forms, longest-match precedence) that had neither a driver row nor a
staged one; until now it was pytest-pinned only.

The fixture follows the planted recipe (ids in the 3.9x10^7 range —
disjoint from every testdata id range and every other staged module's
plants, which each own their own 10^6-wide floor): a rules frame in the
PUBLISHED list's raw text format (``//`` comments — one with dotted
URL text, the r9-ADVICE depth-probe hazard — section markers, a blank
line) handed to the lookup VERBATIM, proving the in-lookup line
filtering; ten planted hosts covering every rule form and passthrough
(plain, 2-label suffix, wildcard match, host==public-suffix,
exception-beats-wildcard at two depths, longest-match over a private
suffix, IPv4 literal, unlisted TLD, case+trailing-dot normalization).
The real corpus unions in (host = `source`), so the bench pays the
operator's true cost shape: the distinct-host aggregate, the suffix
explode, the broadcast rule join, and the host-keyed join back.

ROUND-14 ACTIVATION: add this module to ``queries._MODULES``, retire
one coverage-duplicated twin (keep it oracle-pinned via a RETIRED
dict), and put ``registrable_domain_psl`` in the round-14
``_WINDOW_FIRST``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..functions.urls import registrable_domain_psl

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Raw lines exactly as a published-format snapshot carries them —
# comments (one with a dotted URL, which unfiltered would read as a
# 5-label "rule" and perturb the depth probe), section markers, a blank
# line, and all three rule forms. The lookup's own line filtering (the
# r9 ADVICE closure, functions/urls.py) must see through all of it.
_PSL_RAW_LINES = [
    "// ===BEGIN ICANN DOMAINS===",
    "// see https://en.wikipedia.org/wiki/.com for details",
    "com",
    "co.uk",
    "jp",
    "*.kobe.jp",
    "!city.kobe.jp",
    "",
    "io",
    "// ===END ICANN DOMAINS===",
    "// ===BEGIN PRIVATE DOMAINS===",
    "github.io",
    "// ===END PRIVATE DOMAINS===",
]

# (doc_id, host) — each pins one documented semantics branch:
#   39000000 plain rule, one label kept over `com`
#   39000001 2-label suffix `co.uk` under extra subdomains
#   39000002 wildcard `*.kobe.jp`: x.kobe.jp is public -> keep y.x.kobe.jp
#   39000003 host IS a public suffix (x.kobe.jp) -> passthrough
#   39000004 exception beats wildcard: www.city.kobe.jp -> city.kobe.jp
#   39000005 exception at its own depth: city.kobe.jp -> city.kobe.jp
#   39000006 longest match wins: github.io (private) beats io (icann)
#   39000007 IPv4 literal passthrough
#   39000008 unlisted TLD -> passthrough (the exact form refuses to guess)
#   39000009 case + trailing dot normalize before the lookup
_PSL_PLANTED = [
    (39_000_000, "www.example.com"),
    (39_000_001, "a.b.example.co.uk"),
    (39_000_002, "deep.y.x.kobe.jp"),
    (39_000_003, "x.kobe.jp"),
    (39_000_004, "www.city.kobe.jp"),
    (39_000_005, "city.kobe.jp"),
    (39_000_006, "user.github.io"),
    (39_000_007, "192.168.0.1"),
    (39_000_008, "unlisted.example.zz"),
    (39_000_009, "EXAMPLE.COM."),
]


@register(
    "registrable_domain_psl",
    """
    SELECT * FROM (VALUES
      (CAST(39000000 AS BIGINT), 'example.com'),
      (CAST(39000001 AS BIGINT), 'example.co.uk'),
      (CAST(39000002 AS BIGINT), 'y.x.kobe.jp'),
      (CAST(39000003 AS BIGINT), 'x.kobe.jp'),
      (CAST(39000004 AS BIGINT), 'city.kobe.jp'),
      (CAST(39000005 AS BIGINT), 'city.kobe.jp'),
      (CAST(39000006 AS BIGINT), 'user.github.io'),
      (CAST(39000007 AS BIGINT), '192.168.0.1'),
      (CAST(39000008 AS BIGINT), 'unlisted.example.zz'),
      (CAST(39000009 AS BIGINT), 'example.com')
    ) AS t(doc_id, domain)
    """,
)
def q_registrable_domain_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT public-suffix-list registrable domain
    (`functions.urls.registrable_domain_psl`): the longest-match lookup
    with the published list's wildcard and exception rule forms — the
    host key every per-host curation operator groups on when the lite
    heuristic isn't enough.

    Why a typed VALUES oracle is a deterministic twin: the prevailing
    rule per host is a pure function of the planted (host, rules)
    literals under the spec's precedence (exception > longest match),
    re-derived from a pure-Python PSL twin in the staged test — the
    literals are never the only place the answer lives. The rules frame
    carries the published file's RAW line noise (comments with dots,
    markers, blanks) verbatim, so the row also pins the in-lookup line
    filtering that closed the r9 depth-probe hazard. The real corpus
    unions in (host = `source`) and pays the operator's at-scale cost:
    distinct-host aggregate -> bounded suffix explode -> broadcast rule
    join -> one host-keyed join back (the corpus itself never shuffles
    on anything but the host key); planted rows are selected by id."""
    real = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("source").alias("host")
    )
    planted = spark.createDataFrame(_PSL_PLANTED, "doc_id long, host string")
    pool = real.unionByName(planted)
    # VALUES literal, not createDataFrame: the Arrow path yields an
    # RDD-backed plan, while a VALUES list is a LocalRelation — the
    # operator's depth-probe collect folds to a jobless driver-side
    # read (ConvertToLocalRelation) and the broadcast rules build skips
    # the RDD scan. Same rows, same single string column.
    values = ", ".join("('%s')" % ln.replace("'", "''") for ln in _PSL_RAW_LINES)
    rules = spark.sql(f"SELECT suffix FROM (VALUES {values}) AS t(suffix)")
    out = registrable_domain_psl(pool, rules, host_col="host", out_col="domain")
    return out.filter(F.col("doc_id") >= 39_000_000).select("doc_id", "domain")
