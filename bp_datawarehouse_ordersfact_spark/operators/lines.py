"""Line-level document cleanup: within-doc line dedup, corpus-level
boilerplate-line removal, and per-line quality filtering.

The public curation recipes (C4's line rules, CCNet's paragraph-level
dedup, RefinedWeb's line-wise filters) all operate BELOW the document:
nav menus, cookie banners, share bars, and footer legalese repeat
across pages and survive document-level dedup because the surrounding
article differs. This module removes them at the line grain.

Reference scope note: no sub-document text layer exists in the
reference engine — training-data-pipeline surface per the build brief
(SURVEY.md §7.1.5).

Scale shape — the one that matters here: **document text never
shuffles.** Every operator that needs cross-row context explodes to
narrow ``(id, pos, line_hash)`` rows (the hash, not the line), finds
the positions to drop, aggregates them to a per-doc drop-list (docs
with nothing to drop produce NO row), and rebuilds text map-side with
an index filter over ``split(text, '\\n')``. A naive
explode → filter → ``groupBy(doc).collect_list`` rebuild would shuffle
the full corpus text twice. The rebuild lambdas are higher-order
functions (interpreted, not codegen) but do O(1) work per line against
a tiny per-doc drop array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import h32

_LINES = "__lines"
_DROP = "__drop_pos"


def _line_key(line, normalize: bool):
    """Hash key for cross-line matching; optionally case/edge-space
    insensitive. 32-bit md5 prefix (`h32`) + length — collision odds
    ~(n_distinct_lines choose 2)/2^32 per length class, and a collision
    only ever drops one extra line."""
    basis = F.lower(F.trim(line)) if normalize else line
    return F.concat_ws(":", h32(basis), F.length(basis))


def _exploded_keys(df: DataFrame, id_col: str, text_col: str, normalize: bool):
    """Narrow (id, pos, key, nchars) rows — the only thing that shuffles."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).select(
        id_col,
        "__pos",
        _line_key(F.col("__line"), normalize).alias("__key"),
        F.length(F.trim("__line")).alias("__nchars"),
    )


def _rebuild_without(df: DataFrame, id_col: str, text_col: str, drops: DataFrame,
                     counter_col: str) -> DataFrame:
    """Left-join the per-doc drop-position arrays back onto the intact
    documents and rebuild text map-side. Docs with no drops keep their
    original text column untouched (cheap branch, no split round-trip)."""
    out = df.join(drops, id_col, "left")
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        F.zip_with(lines, F.sequence(F.lit(0), F.size(lines) - 1),
                   lambda l, i: F.struct(l.alias("l"), i.alias("i"))),
        lambda s: ~F.array_contains(F.col(_DROP), s["i"]),
    )
    rebuilt = F.array_join(F.transform(kept, lambda s: s["l"]), "\n")
    return out.withColumn(
        counter_col,
        F.coalesce(F.size(F.col(_DROP)), F.lit(0)).cast("int"),
    ).withColumn(
        text_col,
        F.when(F.col(_DROP).isNull(), F.col(text_col)).otherwise(rebuilt),
    ).drop(_DROP)


def dedupe_lines_within_doc(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    min_chars: int = 1,
    normalize: bool = True,
    keep: str = "first",
) -> DataFrame:
    """Remove repeated lines WITHIN each document, keeping the first
    (or last) occurrence. Lines shorter than `min_chars` after trim —
    including blank paragraph separators — are never touched, so
    document structure survives.

    Adds ``lines_deduped`` (int): how many lines were removed.

    Scale: one narrow-row shuffle on (id, key) for the occurrence
    window + one narrow aggregate; text rebuilt map-side (module
    docstring). `keep` is deterministic by position — no pandas-style
    physical-order dependence.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    ex = _exploded_keys(df, id_col, text_col, normalize)
    order = F.col("__pos").asc() if keep == "first" else F.col("__pos").desc()
    w = Window.partitionBy(id_col, "__key").orderBy(order)
    drops = (
        ex.filter(F.col("__nchars") >= min_chars)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .groupBy(id_col)
        .agg(F.collect_list("__pos").alias(_DROP))
    )
    return _rebuild_without(df, id_col, text_col, drops, "lines_deduped")


def drop_boilerplate_lines(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    min_docs: int,
    group_col: str | None = None,
    min_chars: int = 6,
    normalize: bool = True,
) -> DataFrame:
    """Remove lines that repeat across >= `min_docs` DISTINCT documents
    (optionally scoped within `group_col` — e.g. host/source, the CCNet
    shape: a footer is boilerplate within its site, a quote is not
    boilerplate globally). Every occurrence is removed, in every doc.

    Short lines (< `min_chars` after trim) are exempt — they repeat for
    legitimate reasons ("Introduction", blank separators).

    Adds ``lines_boilerplated`` (int).

    Scale: the line-frequency aggregate is map-side combined over
    narrow (group, key) rows; the boilerplate key set joins back via a
    shuffled equi-join that AQE broadcasts when small. Text never
    shuffles.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if group_col:
        # carry the group key through the explode (a post-hoc join on id
        # would shuffle a second time)
        ex = df.select(
            F.col(id_col),
            F.col(group_col).cast("string").alias("__grp"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
        ).select(
            id_col, "__grp", "__pos",
            _line_key(F.col("__line"), normalize).alias("__key"),
            F.length(F.trim("__line")).alias("__nchars"),
        )
    else:
        ex = _exploded_keys(df, id_col, text_col, normalize).withColumn(
            "__grp", F.lit("")
        )
    eligible = ex.filter(F.col("__nchars") >= min_chars)
    # distinct-doc count per (group, key) WITHOUT a second derivation of
    # the line explode (r15): the groupBy(count_distinct) + semi-join
    # form referenced `eligible` twice, so the whole text split/hash ran
    # twice per action (different exchange payloads — AQE exchange reuse
    # cannot collapse them). dense_rank→max over one (group, key)
    # partitioning computes the same exact count in a single derivation.
    w_g = Window.partitionBy("__grp", "__key")
    drops = (
        eligible.withColumn("__dr", F.dense_rank().over(w_g.orderBy(id_col)))
        .withColumn("__docs", F.max("__dr").over(w_g))
        .filter(F.col("__docs") >= min_docs)
        .groupBy(id_col)
        .agg(F.collect_list("__pos").alias(_DROP))
    )
    return _rebuild_without(df, id_col, text_col, drops, "lines_boilerplated")


# C4-style per-line lexical rules (public recipe: Raffel et al. 2020 §2.2
# "we only retained lines that ended in a terminal punctuation mark …
# discarded any line with the word Javascript … 'lorem ipsum' … '{'").
DEFAULT_LINE_BLOCKLIST = ("javascript", "lorem ipsum", "cookie policy",
                          "terms of use", "all rights reserved")
_TERMINAL_PUNCT_RE = r'[.!?"”’]\s*$'


def line_quality_filter(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    min_words: int = 3,
    require_terminal_punct: bool = False,
    blocklist: tuple[str, ...] = DEFAULT_LINE_BLOCKLIST,
    keep_blank: bool = True,
    min_retain_ratio: float = 0.0,
) -> DataFrame:
    """Per-line lexical quality pass (the C4 line rules, knobs exposed):
    a line survives if it has >= `min_words` whitespace words, (when
    `require_terminal_punct`) ends in terminal punctuation, and contains
    no blocklisted phrase (case-insensitive). Blank lines survive when
    `keep_blank` (paragraph structure).

    Adds ``line_retain_ratio`` (kept/total, 6dp) and drops documents
    below `min_retain_ratio` — a doc that loses most of its lines was
    boilerplate-dominated and the survivors are usually fragments.

    Scale: entirely map-only — the predicate is per-line O(1), applied
    with a higher-order filter over ``split(text, '\\n')``; no shuffle,
    no UDF, nothing leaves the JVM.
    """
    lines = F.split(F.col(text_col), "\n")

    def good(line):
        t = F.trim(line)
        low = F.lower(t)
        blank = t == ""
        ok = F.size(F.split(t, r"\s+")) >= min_words
        if require_terminal_punct:
            ok = ok & t.rlike(_TERMINAL_PUNCT_RE)
        for phrase in blocklist:
            ok = ok & ~low.contains(phrase.lower())
        return (blank & F.lit(keep_blank)) | (~blank & ok)

    kept = F.filter(lines, good)
    ratio = F.round(
        F.size(kept) / F.greatest(F.size(lines), F.lit(1)), 6
    )
    out = df.withColumn("line_retain_ratio", ratio).withColumn(
        text_col, F.array_join(kept, "\n")
    )
    if min_retain_ratio > 0:
        out = out.filter(F.col("line_retain_ratio") >= min_retain_ratio)
    return out


def paragraph_chunks(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    budget_tokens: int,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Boundary-respecting chunking: split each document at blank-line
    paragraph boundaries and greedily pack CONSECUTIVE paragraphs into
    chunks of at most `budget_tokens` whitespace tokens — the chunking
    shape SFT/RAG prep wants, where a chunk should never cut a sentence
    mid-thought the way the sliding token window (`text_chunking`,
    queries/llmops.py) deliberately does for pretraining.

    A single paragraph larger than the budget becomes its own chunk
    (visible to the caller as ``chunk_tokens > budget_tokens``) rather
    than being torn — callers that must hard-cap re-split those few
    through the token-window chunker.

    Returns (id, *carry_cols, chunk_idx, chunk_text, chunk_tokens),
    chunks in document order, paragraphs re-joined with a blank line;
    `carry_cols` ride along row-locally (no join-back shuffle for
    source/host metadata).

    Scale shape: entirely ROW-LOCAL — the greedy reset-accumulation is a
    sequential recurrence (no prefix-sum/codegen expression exists), so
    it runs as a higher-order `aggregate` carrying the per-paragraph
    group ids in its accumulator; chunk texts are rebuilt with row-local
    array ops and exploded. No shuffle, no Python worker — the
    interpreted-lambda cost is bounded by paragraphs-per-doc (measured
    for this module's shapes in PLANS.md: the map-only HOF side beats
    the explode+re-aggregate side 1.8× AND carries zero exchanges).
    """
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")

    paras = F.filter(
        F.transform(F.split(F.col(text_col), r"\n[ \t]*\n+"), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    ntok = lambda p: F.size(F.split(p, r"\s+"))  # noqa: E731

    # greedy pack: carry (running token count, per-paragraph group ids)
    acc0 = F.struct(
        F.lit(0).alias("run"),
        F.array().cast("array<int>").alias("gids"),
    )

    def step(acc, p):
        t = ntok(p)
        last_g = F.coalesce(F.try_element_at(acc["gids"], F.lit(-1)), F.lit(0))
        overflow = (acc["run"] + t > budget_tokens) & (acc["run"] > 0)
        new_g = F.when(overflow, last_g + 1).otherwise(last_g)
        new_run = F.when(overflow, t).otherwise(acc["run"] + t)
        return F.struct(
            new_run.alias("run"),
            F.concat(acc["gids"], F.array(new_g)).alias("gids"),
        )

    packed = F.aggregate(paras, acc0, step)
    zipped = F.zip_with(
        paras, packed["gids"], lambda p, g: F.struct(p.alias("p"), g.alias("g"))
    )
    n_groups = F.coalesce(F.try_element_at(packed["gids"], F.lit(-1)), F.lit(-1)) + 1
    # sequence(0, -1) is a DESCENDING sequence in Spark, not empty — an
    # all-blank doc (zero paragraphs) must yield an empty chunk array
    chunks = F.when(n_groups <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_groups - 1),
            lambda g: F.array_join(
                F.transform(
                    F.filter(zipped, lambda z: z["g"] == g), lambda z: z["p"]
                ),
                "\n\n",
            ),
        )
    )
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    return out.select(
        id_col,
        *carry_cols,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk_text",
        ntok(F.col("chunk_text")).cast("int").alias("chunk_tokens"),
    )
