"""Registry queries staged for the round-12 rotation and ACTIVATED in
round 12 (now in ``queries._MODULES``; the staging discipline: query +
oracle + driver-style test were written two rounds ahead, so the swap
was a mechanical edit).

Three more still-driver-uncovered operators from the r9 VERDICT's
coverage list get typed-VALUES driver rows here (staged EARLY, in round
10, right after the round-11 set — they only age in place and ride the
oracle-conventions gate meanwhile):

- ``line_quality`` — `operators.lines.line_quality_filter` (the C4
  per-line lexical rules: min words, terminal punctuation, blocklist,
  blank preservation, and the min-retain-ratio DOCUMENT drop — one
  planted doc's ABSENCE from the output is part of the pin)
- ``boilerplate_lines`` — `operators.lines.drop_boilerplate_lines`
  (cross-document repeated-line removal, group-scoped: the same footer
  survives in a group where it is unique — the CCNet shape; the
  case/edge-space normalize path and the short-line exemption are both
  exercised)
- ``quality_pacing_by_group`` —
  `operators.sampling.quality_stratified_resample_by_group` (PER-GROUP
  explicit boundaries: the same score lands in different buckets under
  different groups' edges — the multilingual pacing posture)

All three follow the planted-fixture recipe (ids >= 3.6x10^7, above
every testdata id range and the staged_r10/r11 plants) with the REAL
corpus unioned into the input so the bench pays each operator's true
scan/aggregate cost; the planted answers are pure functions of invented
literals (+ md5 for pacing membership), re-derived from pure Python in
tests/test_staged_r12_queries.py.

ACTIVATED ROUND 12: in ``queries._MODULES``, the three names hold the
window slots freed by retiring `cube_summary` / `variant_props_extract`
/ `listagg_per_group` (relational.RETIRED, still oracle-pinned every
pytest run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..operators.lines import drop_boilerplate_lines, line_quality_filter
from ..operators.sampling import quality_stratified_resample_by_group

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
# line_quality — doc A keeps 2 of 4 lines (a min_words drop and a
# blocklist drop; the blank separator survives), doc B keeps 1 of 4
# (ratio 0.25 < 0.4 -> the DOCUMENT is dropped; its absence is pinned
# by the VALUES row set), doc C keeps everything. Ratios are exact
# binary fractions so no rounding boundary is in play.
# ---------------------------------------------------------------------------

_LQ_PLANTED = [
    (
        36_000_000,
        "This planted sentence has enough words.\ntoo short\n\n"
        "Cookie Policy must be accepted to proceed.",
    ),
    (
        36_000_001,
        "one two\nno punct here at all\n"
        "javascript required to view this page.\n"
        "Only this survives the gauntlet today.",
    ),
    (
        36_000_002,
        "Both lines end with proper punctuation marks.\n"
        "Every word counts here today!",
    ),
]


@register(
    "line_quality",
    """
    SELECT * FROM (VALUES
      (CAST(36000000 AS BIGINT), CAST(0.5 AS DOUBLE),
       'This planted sentence has enough words.' || chr(10)),
      (CAST(36000002 AS BIGINT), CAST(1.0 AS DOUBLE),
       'Both lines end with proper punctuation marks.' || chr(10)
       || 'Every word counts here today!')
    ) AS t(doc_id, line_retain_ratio, text)
    """,
)
def q_line_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style per-line lexical quality pass
    (`operators.lines.line_quality_filter`): minimum word count,
    terminal punctuation, phrase blocklist, blank-line preservation,
    and the retain-ratio document gate.

    Why a typed VALUES oracle is a deterministic twin: every rule is a
    pure function of the planted line literals, re-derived from a
    pure-Python twin in the staged test — including the rebuilt text
    VERBATIM (a mis-kept line is a wrong string) and doc 36000001's
    ABSENCE (retain ratio 0.25 under the 0.4 gate). The real corpus
    unions in and rides the identical map-only predicate chain (zero
    shuffles), so the bench pays the full per-line cost at corpus
    scale; planted rows are selected by the id range."""
    real = _real_docs(spark, sf_dir).select("doc_id", "text")
    planted = spark.createDataFrame(_LQ_PLANTED, "doc_id long, text string")
    pool = real.unionByName(planted)
    out = line_quality_filter(
        pool,
        id_col="doc_id",
        text_col="text",
        min_words=3,
        require_terminal_punct=True,
        min_retain_ratio=0.4,
    )
    return out.filter(F.col("doc_id") >= 36_000_000).select(
        "doc_id", "line_retain_ratio", "text"
    )


# ---------------------------------------------------------------------------
# boilerplate_lines — one footer planted VERBATIM, UPPERCASED, and
# edge-padded across the 3 docs of one group (min_docs=3 binds; the
# normalize path must unify all three spellings), plus a 4th doc in a
# DIFFERENT group carrying the same footer (must survive — the scoping
# contract). "Intro" repeats in all 3 but is < min_chars, so exempt.
# ---------------------------------------------------------------------------

_BP_FOOTER = "All planted rights reserved worldwide."
_BP_PLANTED = [
    (
        37_000_000,
        "planted-boiler.example",
        f"Unique opening line zero.\nIntro\n{_BP_FOOTER}\n"
        "Body paragraph zero stays.",
    ),
    (
        37_000_001,
        "planted-boiler.example",
        f"Unique opening line one.\nIntro\n{_BP_FOOTER.upper()}\n"
        "Body paragraph one stays.",
    ),
    (
        37_000_002,
        "planted-boiler.example",
        f"Unique opening line two.\nIntro\n  {_BP_FOOTER}  \n"
        "Body paragraph two stays.",
    ),
    (
        37_000_010,
        "planted-other.example",
        f"Different site body line.\n{_BP_FOOTER}\nAnother line here.",
    ),
]


@register(
    "boilerplate_lines",
    """
    SELECT * FROM (VALUES
      (CAST(37000000 AS BIGINT), CAST(1 AS INT),
       'Unique opening line zero.' || chr(10) || 'Intro' || chr(10)
       || 'Body paragraph zero stays.'),
      (CAST(37000001 AS BIGINT), CAST(1 AS INT),
       'Unique opening line one.' || chr(10) || 'Intro' || chr(10)
       || 'Body paragraph one stays.'),
      (CAST(37000002 AS BIGINT), CAST(1 AS INT),
       'Unique opening line two.' || chr(10) || 'Intro' || chr(10)
       || 'Body paragraph two stays.'),
      (CAST(37000010 AS BIGINT), CAST(0 AS INT),
       'Different site body line.' || chr(10)
       || 'All planted rights reserved worldwide.' || chr(10)
       || 'Another line here.')
    ) AS t(doc_id, lines_boilerplated, text)
    """,
)
def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate-line removal, group-scoped
    (`operators.lines.drop_boilerplate_lines`): a footer repeating
    across >= min_docs distinct documents WITHIN a group is dropped
    from every one of them; the same footer in another group survives.

    Why a typed VALUES oracle is a deterministic twin: the drop rule is
    the (h32(lower(trim(line))), length) key's distinct-doc count over
    the planted literals — re-derived from a pure-Python twin in the
    staged test, with the rebuilt text pinned VERBATIM (the uppercase
    and edge-padded footer spellings must all die through the normalize
    path; 'Intro' repeats but is short-line exempt). The real corpus
    unions in with `source` as its group, so the narrow-key explode +
    per-group frequency aggregate + rebuild run at corpus scale; real
    sources can never equal the planted group strings."""
    real = _real_docs(spark, sf_dir).select(
        "doc_id", F.col("source").alias("src"), "text"
    )
    planted = spark.createDataFrame(
        _BP_PLANTED, "doc_id long, src string, text string"
    )
    pool = real.unionByName(planted)
    out = drop_boilerplate_lines(
        pool, id_col="doc_id", text_col="text", min_docs=3, group_col="src"
    )
    return out.filter(F.col("doc_id") >= 37_000_000).select(
        "doc_id", "lines_boilerplated", "text"
    )


# ---------------------------------------------------------------------------
# quality_pacing_by_group — group A reuses the canonical 12-score ramp
# under edges (0.3, 0.7]; group B's edges are (10, 20], so its score 15
# lands bucket 1 (it would be bucket 2 under A's edges) and dies to the
# middle-bucket ppm rule while 25 survives in the top bucket — the
# per-group-edges contract in one fixture. Real docs map to the 'real'
# group (explicit edges supplied, so the every-group-present validation
# holds at any sf); their rows are filtered from the output by id range.
# Keeper ids re-derived from hashlib in the staged test.
# ---------------------------------------------------------------------------

_PBG_SCORES_A = [
    0.05, 0.10, 0.25, 0.30, 0.31, 0.45, 0.55, 0.69, 0.70, 0.71, 0.85, 0.99,
]
_PBG_PLANTED = (
    [(38_000_000 + i, float(s), "grp-a.example") for i, s in enumerate(_PBG_SCORES_A)]
    + [(38_000_100 + i, s, "grp-b.example") for i, s in enumerate((5.0, 15.0, 25.0))]
)
_PBG_BOUNDARIES = {
    "real": [0.3, 0.7],
    "grp-a.example": [0.3, 0.7],
    "grp-b.example": [10.0, 20.0],
}


@register(
    "quality_pacing_by_group",
    """
    SELECT * FROM (VALUES
      (CAST(38000005 AS BIGINT), CAST(1 AS INT)),
      (CAST(38000006 AS BIGINT), CAST(1 AS INT)),
      (CAST(38000007 AS BIGINT), CAST(1 AS INT)),
      (CAST(38000008 AS BIGINT), CAST(1 AS INT)),
      (CAST(38000009 AS BIGINT), CAST(2 AS INT)),
      (CAST(38000010 AS BIGINT), CAST(2 AS INT)),
      (CAST(38000011 AS BIGINT), CAST(2 AS INT)),
      (CAST(38000102 AS BIGINT), CAST(2 AS INT))
    ) AS t(doc_id, quality_bucket)
    """,
)
def q_quality_pacing_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP quality-paced resampling
    (`operators.sampling.quality_stratified_resample_by_group`) with
    explicit per-group boundaries — the multilingual posture where each
    language/source gets its own bucket edges so 'drop the bottom
    bucket' means the same thing everywhere.

    Why a typed VALUES oracle is a deterministic twin: with explicit
    edges there is no sketch — bucket = how many of the GROUP'S
    boundaries the planted score exceeds, membership the canonical
    ``h32(id) % 1e6 < keep_ppm[bucket]`` md5 rule, both re-derived from
    hashlib in the staged test. Group B's score 15 pins the per-group
    contract: bucket 1 under B's edges (dropped by the middle ppm),
    where A's edges would have called it bucket 2 (kept). The real
    corpus unions in under the 'real' group (edges supplied, so the
    operator's every-group-present validation holds at any sf) and pays
    the map-only pacing filter at corpus scale."""
    real = _real_docs(spark, sf_dir).select(
        "doc_id",
        (F.col("n_chars") / F.lit(1000.0)).alias("score"),
        F.lit("real").alias("grp"),
    )
    planted = spark.createDataFrame(
        _PBG_PLANTED, "doc_id long, score double, grp string"
    )
    pool = real.unionByName(planted)
    kept = quality_stratified_resample_by_group(
        pool,
        "score",
        "doc_id",
        "grp",
        keep_ppm=[0, 400_000, 1_000_000],
        boundaries=_PBG_BOUNDARIES,
    )
    return kept.filter(F.col("doc_id") >= 38_000_000).select(
        "doc_id", "quality_bucket"
    )
