"""Registry queries for the round-8 curation/SFT layer (r8 VERDICT #1):
driver CORRECTNESS rows for `functions/urls.py`,
`operators/conversations.py`, and `operators/sampling.py`'s
token-mixture planner — the three swaps that replace the retired
beyond-reference twins (`rolling_window_avg`, `event_interarrival`,
`pivot_status`, all kept pytest-pinned in
tests/test_retired_queries.py).

All three use the typed-VALUES-oracle recipe established by
`dedup_passage_spans` (queries/llmops.py): planted fixture rows whose
expected output is a pure function of invented literals — provably
sf-independent — with, where the operator aggregates, the REAL corpus
unioned into the input so the bench still pays the operator's true
scan cost.

Reference scope note: the reference engine has none of this layer —
training-data-pipeline surface per the build brief (SURVEY.md §7.1.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..functions import urls as U
from ..operators.conversations import (
    loss_mask_spans,
    pack_conversations,
    render_conversation,
)
from ..operators.sampling import apply_token_mixture, plan_token_mixture

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# url_canonicalize — functions/urls.py is pure deterministic Column
# expressions, so a fixture list pins every documented rule exactly.
# ---------------------------------------------------------------------------

# One URL per canonicalization rule (tests/test_urls.py pins each rule
# individually; this fixture exercises them jointly): case folding,
# userinfo/default-port/trailing-dot/www stripping, slash collapsing,
# trailing-slash and fragment dropping, utm_*/tracking-param removal
# with parameter sorting, non-default port retention, IPv4 and
# non-URL passthrough, and the public-suffix-lite registrable domain.
_URL_FIXTURE = [
    (1, "HTTP://User:pw@WWW.Example.COM.:80//a//b/?b=2&a=1&utm_source=x#frag"),
    (2, "https://sub.shop.example.CO.UK:8443/index.html?gclid=xyz"),
    (3, "http://192.168.0.1/"),
    (4, "  not a url  "),
    (5, "https://example.com/path/?UTM_Medium=email&ref=tw&x=1"),
    (6, "https://EXAMPLE.com"),
    (7, "ftp://files.example.org:21/data"),
    (8, "https://www.github.io"),
    (9, "https://a.b.example.com/x?y#z"),
    (10, "https://example.com/?utm_campaign=a&utm_term=b"),
]


# RETIRED round 13 (r12 VERDICT #1): superseded in the registry by the
# activated `registrable_domain_psl` (queries/staged_r14.py) — the EXACT
# public-suffix lookup over the same host layer; the canonicalization
# Column rules stay pinned every pytest run via RETIRED below and
# rule-by-rule in tests/test_urls.py.
_URL_CANONICALIZE_ORACLE = """
    SELECT * FROM (VALUES
      (CAST(1 AS INT), 'http://example.com/a/b?a=1&b=2', 'www.example.com', 'example.com'),
      (CAST(2 AS INT), 'https://sub.shop.example.co.uk:8443/index.html', 'sub.shop.example.co.uk', 'example.co.uk'),
      (CAST(3 AS INT), 'http://192.168.0.1/', '192.168.0.1', '192.168.0.1'),
      (CAST(4 AS INT), 'not a url', '', ''),
      (CAST(5 AS INT), 'https://example.com/path?x=1', 'example.com', 'example.com'),
      (CAST(6 AS INT), 'https://example.com/', 'example.com', 'example.com'),
      (CAST(7 AS INT), 'ftp://files.example.org:21/data', 'files.example.org', 'example.org'),
      (CAST(8 AS INT), 'https://github.io/', 'www.github.io', 'github.io'),
      (CAST(9 AS INT), 'https://a.b.example.com/x?y', 'a.b.example.com', 'example.com'),
      (CAST(10 AS INT), 'https://example.com/', 'example.com', 'example.com')
    ) AS t(url_id, canon, host, domain)
    """


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + host extraction + registrable domain
    (`functions/urls.py` — the web-corpus curation key layer) over a
    rule-per-row fixture.

    Why a typed VALUES oracle is a deterministic twin: every function is
    a pure Column expression over the literal URL (regexp/split/array
    ops — no seed, no data dependence), so each expected row is derivable
    by hand from the documented rules; e.g. row 1 exercises, in one URL:
    scheme+host lowercasing, userinfo strip, default-port-80 strip,
    trailing-host-dot strip, www strip, duplicate-slash collapse,
    trailing-slash drop, utm_* removal, parameter sorting, and fragment
    drop."""
    df = spark.createDataFrame(_URL_FIXTURE, "url_id int, url string")
    return df.select(
        "url_id",
        U.canonicalize_url(F.col("url")).alias("canon"),
        U.url_host(F.col("url")).alias("host"),
        U.registrable_domain(U.url_host(F.col("url"))).alias("domain"),
    )


# ---------------------------------------------------------------------------
# conversation_pack — render → loss-mask → pack, value-checked through
# the packed text itself: the output's `block` column SLICES the packed
# string with the offset-adjusted span, so a wrong offset anywhere in
# the chain produces a wrong string, not just a wrong number.
# ---------------------------------------------------------------------------

_CONV_FIXTURE = [
    # leading system turn
    (1, [("system", "Be terse."), ("user", "hi"), ("assistant", "hello")]),
    (2, [("user", "what is 2+2?"), ("assistant", "4")]),
    # over-budget dialog: lands alone in its own bins-window (never torn)
    (3, [("user", "tell me a long story"), ("assistant", "story " * 30)]),
    # multi-assistant dialog: two spans, same bin offset
    (4, [("user", "ok"), ("assistant", "fine"), ("user", "more"),
         ("assistant", "done")]),
    (5, [("user", "bye"), ("assistant", "later")]),
]
_CONV_SCHEMA = "conv_id int, conv array<struct<role:string,content:string>>"


@register(
    "conversation_pack",
    """
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), CAST(1 AS INT), CAST(2 AS INT), CAST(47 AS BIGINT),
       CAST(74 AS BIGINT), '<|assistant|>' || chr(10) || 'hello<|end|>' || chr(10)),
      (CAST(0 AS BIGINT), CAST(2 AS INT), CAST(1 AS INT), CAST(105 AS BIGINT),
       CAST(128 AS BIGINT), '<|assistant|>' || chr(10) || '4<|end|>' || chr(10)),
      (CAST(1 AS BIGINT), CAST(3 AS INT), CAST(1 AS INT), CAST(37 AS BIGINT),
       CAST(239 AS BIGINT),
       '<|assistant|>' || chr(10) || repeat('story ', 30) || '<|end|>' || chr(10)),
      (CAST(3 AS BIGINT), CAST(4 AS INT), CAST(1 AS INT), CAST(19 AS BIGINT),
       CAST(45 AS BIGINT), '<|assistant|>' || chr(10) || 'fine<|end|>' || chr(10)),
      (CAST(3 AS BIGINT), CAST(4 AS INT), CAST(3 AS INT), CAST(66 AS BIGINT),
       CAST(92 AS BIGINT), '<|assistant|>' || chr(10) || 'done<|end|>' || chr(10)),
      (CAST(3 AS BIGINT), CAST(5 AS INT), CAST(1 AS INT), CAST(114 AS BIGINT),
       CAST(141 AS BIGINT), '<|assistant|>' || chr(10) || 'later<|end|>' || chr(10))
    ) AS t(bin_id, conv_id, turn_idx, start, "end", block)
    """,
)
def q_conversation_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT conversation prep end-to-end (`operators/conversations.py`):
    render to ChatML, compute assistant-turn loss-mask char spans, pack
    several dialogs per training row with offset-adjusted spans — then
    SLICE each packed bin's text with its adjusted span and return the
    sliced block, so the driver's value hash checks the whole chain
    (render arithmetic, span math, bin assignment, offset shift) through
    the strings themselves.

    Why a typed VALUES oracle is a deterministic twin: rendering is a
    pure per-turn template, packing is first-fit by id order over
    running char totals (budget 120, separator '\\n\\n') — every offset
    is integer arithmetic over the fixture literals, reproduced
    independently in pure Python (tests/test_conversations.py pins the
    same recurrence). Expected blocks are exactly the rendered assistant
    turns: `<|assistant|>\\n{content}<|end|>\\n`. Dialog 3 overflows the
    budget (239 chars rendered) and lands alone in bin 1 — the
    never-torn contract; bins 0 and 3 each pack two dialogs."""
    import warnings

    df = spark.createDataFrame(_CONV_FIXTURE, _CONV_SCHEMA)
    rendered = render_conversation(df, conv_col="conv")
    spans = loss_mask_spans(df, id_col="conv_id", conv_col="conv")
    with warnings.catch_warnings():
        # the global-window warning is for corpus-scale callers; this
        # fixture is 5 rows by design — opt out so every bench/driver
        # run doesn't train readers to ignore the warning where it matters
        warnings.simplefilter("ignore", UserWarning)
        # carry_text: the spans rows carry their bin's packed text (the
        # identical id-ordered sep-joined concat as packed.text, window
        # form), so the block slice needs NO join back to `packed` —
        # which re-derived the whole render → window chain a second
        # time (r16: one render pass and one SortMergeJoin removed from
        # the plan; values pinned by the unchanged VALUES oracle)
        _, pspans = pack_conversations(
            rendered, spans, id_col="conv_id", budget_chars=120, sep="\n\n",
            carry_text=True,
        )
    return pspans.select(
        "bin_id",
        "conv_id",
        "turn_idx",
        "start",
        "end",
        F.col("text")
        .substr(F.col("start").cast("int") + 1,
                (F.col("end") - F.col("start")).cast("int"))
        .alias("block"),
    )


# ---------------------------------------------------------------------------
# token_mixture — plan + apply over planted sources, with the REAL
# corpus unioned into the input so the planner's per-source aggregate
# (its only corpus-sized work) scans real data at bench scale.
# ---------------------------------------------------------------------------

# Planted sources (ids ≥ 2×10^7, above every testdata id range):
#   synth_books  8 docs × 100 tokens = 800 avail, weight 2
#   synth_code   4 docs ×  50 tokens = 200 avail, weight 1
#   synth_web   20 docs ×  25 tokens = 500 avail, weight 1
# budget 2000 → books target 1000 → 1.25 epochs (full 1, ppm 250000);
#               code  target  500 → 2.5  epochs (full 2, ppm 500000);
#               web   target  500 → 1.0  epochs exactly (full 1, ppm 0
#               — the no-partial-epoch boundary).
_MIX_WEIGHTS = {"synth_books": 2.0, "synth_code": 1.0, "synth_web": 1.0}
_MIX_BUDGET = 2000
_MIX_PLANTED = (
    [(20_000_000 + i, "synth_books", 100) for i in range(8)]
    + [(20_000_100 + i, "synth_code", 50) for i in range(4)]
    + [(20_000_200 + i, "synth_web", 25) for i in range(20)]
)


@register(
    "token_mixture",
    """
    SELECT * FROM (VALUES
      ('synth_books', CAST(0 AS INT), CAST(8 AS BIGINT), CAST(800 AS BIGINT)),
      ('synth_books', CAST(1 AS INT), CAST(2 AS BIGINT), CAST(200 AS BIGINT)),
      ('synth_code',  CAST(0 AS INT), CAST(4 AS BIGINT), CAST(200 AS BIGINT)),
      ('synth_code',  CAST(1 AS INT), CAST(4 AS BIGINT), CAST(200 AS BIGINT)),
      ('synth_code',  CAST(2 AS INT), CAST(1 AS BIGINT), CAST(50 AS BIGINT)),
      ('synth_web',   CAST(0 AS INT), CAST(20 AS BIGINT), CAST(500 AS BIGINT))
    ) AS t(source, epoch, n_docs, sum_tokens)
    """,
)
def q_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planning + application with repetition
    (`operators/sampling.py:plan_token_mixture` / `apply_token_mixture`):
    per-(source, epoch) doc and token counts after materializing the
    plan's epoch copies and hash-selected partial final epoch.

    Why a typed VALUES oracle is a deterministic twin: the plan is pure
    driver arithmetic over the planted sources' fixed token totals
    (docstring table above), and the partial-epoch membership rule is
    the canonical ``h32(epoch ':' id) % 1e6 < ppm`` md5 hash —
    reproduced from hashlib: books' 250000-ppm epoch keeps exactly ids
    {20000000, 20000002} (200 tokens), code's 500000-ppm epoch keeps
    exactly {20000103} (50 tokens). The REAL documents table is unioned
    into the input (source src* ∉ weights → planned 0 → dropped by the
    apply's inner plan-join), so the planner's one corpus-sized
    aggregate scans every real row at bench scale without perturbing
    the planted answer."""
    real = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("n_tokens")
    )
    planted = spark.createDataFrame(
        _MIX_PLANTED, "doc_id long, source string, n_tokens int"
    )
    pool = real.unionByName(planted)
    plan = plan_token_mixture(
        pool,
        source_col="source",
        token_col="n_tokens",
        weights=_MIX_WEIGHTS,
        token_budget=_MIX_BUDGET,
    )
    out = apply_token_mixture(pool, plan, source_col="source", id_col="doc_id")
    return out.groupBy("source", "epoch").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    )


# ---------------------------------------------------------------------------
# Retired registry queries (round 13, r12 VERDICT #1): unregistered to
# free capped slots for the staged_r14/r15 activations, but still pinned
# against their original oracles every pytest run
# (tests/test_retired_queries.py).
# ---------------------------------------------------------------------------

RETIRED: dict[str, tuple] = {
    "url_canonicalize": (q_url_canonicalize, _URL_CANONICALIZE_ORACLE),
}
