"""Line-level cleanup operators (operators/lines.py).

Pins: within-doc line dedup vs a pure-Python reference (keep-first and
keep-last, blank/short exemptions, normalization), corpus-level
boilerplate removal (global and host-scoped), the C4-style per-line
quality rules, the no-text-shuffle rebuild contract (untouched docs keep
their text column byte-identical), and repartition stability.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bp_datawarehouse_ordersfact_spark.operators.lines import (
    dedupe_lines_within_doc,
    drop_boilerplate_lines,
    line_quality_filter,
)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("lines")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def _texts(out):
    return {r["doc_id"]: r["text"] for r in out.collect()}


# ---------------------------------------------------------------------------
# within-doc dedup
# ---------------------------------------------------------------------------


def _py_dedupe(text, min_chars=1, normalize=True, keep="first"):
    lines = text.split("\n")
    idx = range(len(lines)) if keep == "first" else range(len(lines) - 1, -1, -1)
    seen, drop = set(), set()
    for i in idx:
        t = lines[i].strip()
        if len(t) < min_chars:
            continue
        k = t.lower() if normalize else lines[i]
        if k in seen:
            drop.add(i)
        else:
            seen.add(k)
    return "\n".join(l for i, l in enumerate(lines) if i not in drop), len(drop)


@pytest.mark.parametrize("keep", ["first", "last"])
@pytest.mark.parametrize("normalize", [True, False])
def test_dedupe_lines_vs_python(spark, keep, normalize):
    docs = [
        "Menu\nHome\nArticle text here.\nMenu\nmore words\nMENU\n\n\nend",
        "a\nb\nc",  # nothing repeated
        "same\nsame\nsame",
        "x\n \nx\n \nx",  # blank-ish separators never touched (min_chars=1 trims to '')
    ]
    out = dedupe_lines_within_doc(
        _df(spark, docs), id_col="doc_id", text_col="text",
        normalize=normalize, keep=keep,
    )
    got = {r["doc_id"]: (r["text"], r["lines_deduped"]) for r in out.collect()}
    for i, d in enumerate(docs):
        assert got[i] == _py_dedupe(d, normalize=normalize, keep=keep), f"doc {i}"


def test_dedupe_min_chars_exempts_short_lines(spark):
    doc = "Intro\nIntro\nlong enough line\nlong enough line"
    out = dedupe_lines_within_doc(
        _df(spark, [doc]), id_col="doc_id", text_col="text", min_chars=6
    )
    assert _texts(out)[0] == "Intro\nIntro\nlong enough line"


def test_dedupe_untouched_doc_text_identical_and_counted_zero(spark):
    docs = ["unique one\nunique two", "dup\ndup"]
    out = dedupe_lines_within_doc(_df(spark, docs), id_col="doc_id", text_col="text")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["text"] == docs[0] and rows[0]["lines_deduped"] == 0
    assert rows[1]["lines_deduped"] == 1


def test_dedupe_repartition_stable(spark):
    docs = [f"l{i % 4}\nl{(i + 1) % 4}\nl{i % 4}\ntail {i}" for i in range(40)]
    a = _texts(dedupe_lines_within_doc(_df(spark, docs), id_col="doc_id", text_col="text"))
    b = _texts(
        dedupe_lines_within_doc(
            _df(spark, docs).repartition(7), id_col="doc_id", text_col="text"
        )
    )
    assert a == b


def test_dedupe_validates_keep(spark):
    with pytest.raises(ValueError, match="keep"):
        dedupe_lines_within_doc(
            _df(spark, ["x"]), id_col="doc_id", text_col="text", keep="middle"
        )


# ---------------------------------------------------------------------------
# corpus-level boilerplate
# ---------------------------------------------------------------------------


FOOTER = "All material copyright Example Corp contact us at corp dot com"


def test_boilerplate_global(spark):
    docs = [f"Article {i} body text.\n{FOOTER}" for i in range(4)] + [
        "No footer here.\nJust content."
    ]
    out = drop_boilerplate_lines(
        _df(spark, docs), id_col="doc_id", text_col="text", min_docs=3
    )
    got = _texts(out)
    for i in range(4):
        assert got[i] == f"Article {i} body text."
    assert got[4] == docs[4]
    counts = {r["doc_id"]: r["lines_boilerplated"] for r in out.collect()}
    assert counts == {0: 1, 1: 1, 2: 1, 3: 1, 4: 0}


def test_boilerplate_threshold_not_met(spark):
    docs = [f"body {i}\n{FOOTER}" for i in range(2)]
    out = drop_boilerplate_lines(
        _df(spark, docs), id_col="doc_id", text_col="text", min_docs=3
    )
    assert _texts(out) == {i: d for i, d in enumerate(docs)}


def test_boilerplate_counts_distinct_docs_not_occurrences(spark):
    # one doc repeats the line 5 times; only 2 distinct docs carry it
    docs = ["\n".join([FOOTER] * 5) + "\nbody", f"other\n{FOOTER}", "clean doc line"]
    out = drop_boilerplate_lines(
        _df(spark, docs), id_col="doc_id", text_col="text", min_docs=3
    )
    assert _texts(out) == {i: d for i, d in enumerate(docs)}


def test_boilerplate_host_scoped(spark):
    df = spark.createDataFrame(
        [
            (0, "a.com", f"one\n{FOOTER}"),
            (1, "a.com", f"two\n{FOOTER}"),
            (2, "b.org", f"three\n{FOOTER}"),  # only 1 doc on b.org has it
        ],
        "doc_id long, host string, text string",
    )
    out = drop_boilerplate_lines(
        df, id_col="doc_id", text_col="text", min_docs=2, group_col="host"
    )
    got = _texts(out)
    assert got[0] == "one" and got[1] == "two"
    assert got[2] == f"three\n{FOOTER}"  # scoped: b.org copy survives


def test_boilerplate_short_lines_exempt(spark):
    docs = [f"Introduction\nbody {i} with words" for i in range(5)]
    out = drop_boilerplate_lines(
        _df(spark, docs), id_col="doc_id", text_col="text", min_docs=2, min_chars=13
    )
    assert _texts(out) == {i: d for i, d in enumerate(docs)}


def test_boilerplate_validates(spark):
    with pytest.raises(ValueError, match="min_docs"):
        drop_boilerplate_lines(
            _df(spark, ["x"]), id_col="doc_id", text_col="text", min_docs=1
        )


def test_boilerplate_no_text_in_shuffle(spark):
    """The contract the module exists for: the line TEXT reaches neither
    exchange — only hashes/positions do. Assert no shuffle-side plan node
    carries the raw __line attribute."""
    df = _df(spark, ["a\nb", "a\nc"])
    plan = (
        drop_boilerplate_lines(df, id_col="doc_id", text_col="text", min_docs=2)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    for node in plan.splitlines():
        if "Exchange" in node or "Aggregate" in node or "Join" in node:
            assert "__line" not in node, node


# ---------------------------------------------------------------------------
# C4 line quality
# ---------------------------------------------------------------------------


def test_line_quality_rules(spark):
    doc = "\n".join(
        [
            "This is a proper sentence with words.",
            "short",
            "Enable Javascript to continue.",
            "This line has plenty of words but no terminal punctuation",
            "",
            "Another good sentence stands here.",
        ]
    )
    out = line_quality_filter(
        _df(spark, [doc]), id_col="doc_id", text_col="text",
        min_words=3, require_terminal_punct=True,
    )
    r = out.first()
    assert r["text"] == "\n".join(
        ["This is a proper sentence with words.", "", "Another good sentence stands here."]
    )
    assert r["line_retain_ratio"] == 0.5


def test_line_quality_blank_and_blocklist_knobs(spark):
    doc = "good words here\n\nlorem ipsum dolor sit"
    keep_blank = line_quality_filter(
        _df(spark, [doc]), id_col="doc_id", text_col="text", min_words=2
    ).first()["text"]
    assert keep_blank == "good words here\n"
    no_blank = line_quality_filter(
        _df(spark, [doc]), id_col="doc_id", text_col="text",
        min_words=2, keep_blank=False,
    ).first()["text"]
    assert no_blank == "good words here"


def test_line_quality_min_retain_drops_doc(spark):
    docs = ["ok line with words\nbad\nbad\nbad", "all good here\nfine words too"]
    out = line_quality_filter(
        _df(spark, docs), id_col="doc_id", text_col="text",
        min_words=3, min_retain_ratio=0.5,
    )
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_line_quality_map_only_plan(spark):
    plan = (
        line_quality_filter(
            _df(spark, ["x"]), id_col="doc_id", text_col="text"
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# paragraph-aware chunk packing
# ---------------------------------------------------------------------------


def _py_paragraph_chunks(text, budget):
    import re

    paras = [p.strip() for p in re.split(r"\n[ \t]*\n+", text) if p.strip()]
    chunks, cur, run = [], [], 0
    for p in paras:
        t = len(p.split())
        if cur and run + t > budget:
            chunks.append("\n\n".join(cur))
            cur, run = [p], t
        else:
            cur.append(p)
            run += t
    if cur:
        chunks.append("\n\n".join(cur))
    return chunks


def test_paragraph_chunks_vs_python(spark):
    from bp_datawarehouse_ordersfact_spark.operators.lines import paragraph_chunks

    docs = [
        "one two three.\n\nfour five six seven.\n\neight nine.\n\nten.",
        "a single short paragraph.",
        # oversize paragraph becomes its own over-budget chunk
        "word " * 20 + "\n\nshort tail here.",
        # blank-ish separators with spaces/tabs between newlines
        "p one here.\n \t\n\np two there.",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = paragraph_chunks(df, id_col="doc_id", text_col="text", budget_tokens=6)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"], r["chunk_tokens"])
        )
    for i, d in enumerate(docs):
        expect = _py_paragraph_chunks(d, 6)
        rows = sorted(got.get(i, []))
        assert [c for _, c, _ in rows] == expect, f"doc {i}"
        assert [k for k, _, _ in rows] == list(range(len(expect)))
        for _, c, n in rows:
            assert n == len(c.split())
    # the oversize paragraph overshot the budget, visibly
    oversize = [n for _, _, n in got[2]]
    assert max(oversize) == 20 and min(oversize) <= 6


def test_paragraph_chunks_edge_cases_and_plan(spark):
    from bp_datawarehouse_ordersfact_spark.operators.lines import paragraph_chunks

    df = spark.createDataFrame(
        [(1, ""), (2, "\n\n\n"), (3, "exactly six words in this one.")],
        "doc_id long, text string",
    )
    out = paragraph_chunks(df, id_col="doc_id", text_col="text", budget_tokens=6)
    rows = out.collect()
    # empty / all-blank docs emit no chunks
    assert {r["doc_id"] for r in rows} == {3}
    assert rows[0]["chunk_tokens"] == 6
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local, map-only
    with pytest.raises(ValueError, match="budget_tokens"):
        paragraph_chunks(df, id_col="doc_id", text_col="text", budget_tokens=0)
