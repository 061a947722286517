"""Driver-style verification for the STAGED round-11 registry queries
(queries/staged_r11.py) — run a full round before the driver first sees
them, so the round-11 activation is a mechanical edit (the
staged_r10/sketches_r6 discipline). Each typed-VALUES oracle is
additionally re-derived from pure Python so the literals are never the
only place the expected answer lives: the HTML chain from a regex twin
(same patterns, same order), the contamination counts from an n-gram
twin, the split membership from hashlib.
"""

from __future__ import annotations

import hashlib
import re

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r11
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r11")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents",):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", list(staged_r11.QUERIES))
def test_staged_r11_query_passes_driver_comparison(spark, con, name):
    sdf = staged_r11.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r11.ORACLES[name])
    ddf = con.execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_activated():
    """Activation contract (round 11): all three names are live in the
    registry and oracle-paired, holding the capped slots freed by the
    three round-11 relational.RETIRED twins. Window membership is NOT
    pinned (the staged_r10 lesson: it is an activation-round-only fact;
    later rotations correctly move these out of the window under the
    generic staleness invariant in tests/test_window_rotation.py)."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    missing = set(staged_r11.QUERIES) - live
    assert not missing, f"staged queries not in the registry: {missing}"
    assert set(staged_r11.QUERIES) <= set(Q.all_oracles())


# --- pure-Python twin of the functions/html.py codegen chain ----------------
# Same regexes, same order, translated Java->Python verbatim (the (?s)/
# (?i) inline flags and lazy quantifiers mean the same thing in both).

_BLOCK = r"(?is)<(script|style|noscript|template|svg|head)\b[^>]*>.*?</\1\s*>"
_COMMENT = r"(?s)<!--.*?-->"
_BREAK = (
    r"(?i)<\s*/?\s*(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|"
    r"header|footer|blockquote|pre|form)\b[^>]*>"
)
_ANY = r"(?s)<[^>]+>"
_ENTS = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&rsquo;", "’"),
    ("&lsquo;", "‘"), ("&rdquo;", "”"), ("&ldquo;", "“"),
    ("&ndash;", "–"), ("&mdash;", "—"), ("&hellip;", "…"),
    ("&copy;", "©"), ("&reg;", "®"), ("&trade;", "™"),
    ("&amp;", "&"),
]


def _html_to_text_py(html: str) -> str:
    s = re.sub(_BLOCK, "", re.sub(_COMMENT, "", html))
    s = re.sub(_BREAK, "\n", s)
    s = re.sub(_ANY, " ", s)
    for ent, ch in _ENTS:
        s = s.replace(ent, ch)
    s = re.sub(r"[ \t\x0b\f\r]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    return re.sub(r"^\n+|\n+$", "", s)


def _title_py(html: str) -> str:
    m = re.search(r"(?is)<title[^>]*>(.*?)</title\s*>", html)
    t = m.group(1) if m else ""
    for ent, ch in _ENTS:
        t = t.replace(ent, ch)
    return re.sub(r"\s+", " ", t).strip()


def _links_py(html: str) -> list[str]:
    return [
        u
        for u in re.findall(r"""(?i)href\s*=\s*["']([^"'#\s]+)""", html)
        if u != ""
    ]


def test_html_extract_values_rederive_from_python_regex_twin():
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.connect()
        .execute(staged_r11.ORACLES["html_extract"])
        .fetchall()
    }
    got = {
        did: (_title_py(h), _html_to_text_py(h), len(_links_py(h)))
        for did, h in staged_r11._HTML_PLANTED
    }
    assert got == want


# --- pure-Python n-gram twin of the contamination fixture -------------------


def _grams_py(text: str, n: int = 5) -> set[str]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_values_rederive_from_ngram_twin():
    doc_grams = {did: _grams_py(t) for did, t in staged_r11._CONTAM_DOCS}
    expect = {}
    for hid, text in staged_r11._CONTAM_HOLDOUT:
        hg = _grams_py(text)
        hit_docs = sorted(d for d, g in doc_grams.items() if g & hg)
        shared = set().union(*(doc_grams[d] & hg for d in hit_docs)) if hit_docs else set()
        expect[hid] = (
            len(hit_docs),
            len(shared),
            ",".join(str(d) for d in hit_docs[:5]),
        )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.connect()
        .execute(staged_r11.ORACLES["contamination_report"])
        .fetchall()
    }
    assert got == expect
    # the fixture exercises the rank limit: item-b has MORE hits than
    # max_example_ids, so counts and examples must disagree in length
    assert got["item-b"][0] == 7 and got["item-b"][2].count(",") == 4
    # invented tokens cannot collide with real corpus text: every gram
    # of every holdout item contains a digit-bearing nonsense token
    for _, text in staged_r11._CONTAM_HOLDOUT:
        for g in _grams_py(text):
            assert re.search(r"[a-z]+\d", g), g


def test_host_split_values_rederive_from_hashlib():
    def side(host: str) -> str:
        h = int(hashlib.md5(f"0:{host}".encode()).hexdigest()[:8], 16)
        return "val" if h % 1_000_000 < 200_000 else "train"

    expect = {did: side(host) for did, host in staged_r11._SPLIT_PLANTED}
    got = dict(
        duckdb.connect()
        .execute(staged_r11.ORACLES["host_disjoint_split"])
        .fetchall()
    )
    assert got == expect
    # the disjointness contract itself: both docs of each host agree
    by_host: dict[str, set[str]] = {}
    for did, host in staged_r11._SPLIT_PLANTED:
        by_host.setdefault(host, set()).add(got[did])
    assert all(len(s) == 1 for s in by_host.values())
    # and the fixture is non-degenerate: both sides are populated
    assert set(got.values()) == {"train", "val"}
