"""HTML → text extraction for raw crawl ingestion.

A web corpus starts as markup, and every operator downstream of ingest
(dedup shingles, quality scores, line rules, token counts) assumes
text — this module is the step between `sources/` and the corpus build.

Two speed tiers, the `functions/encoding.py` convention:

- **codegen tier** (`html_to_text`, `extract_title`, `extract_links`,
  `decode_entities`): regexp/replace chains that stay inside
  whole-stage codegen. Regex-based markup stripping is a deliberate
  heuristic — it handles the crawl's bulk (tag soup included, since it
  never needs a parse tree) and mis-handles pathological nesting in
  CDATA/attribute edge cases; that tradeoff is what every published
  at-scale extraction pipeline's fast path makes.
- **exact Arrow tier** (`decode_entities_exact`): full entity decoding
  (all named entities + numeric references) via the stdlib — a
  vectorized ``pandas_udf`` built at CALL time (module-level decoration
  crashes executor deserialization — see encoding.py). Swap point for a
  real DOM extractor (trafilatura/bs4) is the same shape: replace the
  kernel inside the factory, plumbing unchanged.

Scale: everything is map-only, zero shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# blocks whose CONTENT must go, not just the tags
_BLOCK_RE = r"(?is)<(script|style|noscript|template|svg|head)\b[^>]*>.*?</\1\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
# tags that imply a line break when they open or close
_BREAK_TAGS = (
    r"(?i)<\s*/?\s*(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|"
    r"header|footer|blockquote|pre|form)\b[^>]*>"
)
_ANY_TAG_RE = r"(?s)<[^>]+>"

# the high-frequency named entities; the exact tier covers the rest
COMMON_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&rsquo;", "’"),
    ("&lsquo;", "‘"),
    ("&rdquo;", "”"),
    ("&ldquo;", "“"),
    ("&ndash;", "–"),
    ("&mdash;", "—"),
    ("&hellip;", "…"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
    ("&amp;", "&"),  # MUST be last: &amp;lt; must not become <
]


def decode_entities(col: Column) -> Column:
    """Literal-chain decode of the dominant named entities (codegen;
    ``&amp;`` deliberately last so double-escaped text decodes one
    level, not two). `decode_entities_exact` is the complete decoder."""
    out = col
    for ent, ch in COMMON_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def decode_entities_exact(col: Column) -> Column:
    """Full entity decoding — every named entity plus ``&#123;`` /
    ``&#x1F600;`` numeric references — via the stdlib. Arrow tier; UDF
    nested at call time per the repo convention. NULLs pass through."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _unescape(s: pd.Series) -> pd.Series:
        import html as _html

        return s.map(lambda v: _html.unescape(v) if v is not None else None)

    return _unescape(col)


def extract_title(col: Column) -> Column:
    """``<title>`` content, entity-decoded and trimmed ('' when absent)."""
    raw = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    return F.trim(
        F.regexp_replace(decode_entities(raw), r"\s+", " ")
    )


def extract_links(col: Column) -> Column:
    """``href`` targets as an array<string> (quoted attributes, fragment
    stripped, empties dropped) — feed `functions/urls.canonicalize_url`
    / the host layer downstream. Codegen: `regexp_extract_all`."""
    hrefs = F.regexp_extract_all(
        col, F.lit(r"""(?i)href\s*=\s*["']([^"'#\s]+)"""), F.lit(1)
    )
    return F.filter(hrefs, lambda u: u != "")


def html_to_text(col: Column, *, exact_entities: bool = False) -> Column:
    """Markup-stripped visible text, line structure preserved:

    1. comments and script/style/noscript/template/svg/head BLOCKS
       removed with their content;
    2. block-level tags become newlines (paragraph structure survives
       for the line-grain operators), remaining tags become nothing;
    3. entities decoded (codegen chain, or the full stdlib decoder when
       ``exact_entities`` — one Arrow pass);
    4. horizontal whitespace collapsed per line, 3+ blank lines
       squeezed to one blank (paragraph break), ends trimmed.

    Non-HTML input (no tags) passes through steps 3–4 only, so the
    function is safe to run over mixed crawl content.
    """
    no_blocks = F.regexp_replace(
        F.regexp_replace(col, _COMMENT_RE, ""), _BLOCK_RE, ""
    )
    broken = F.regexp_replace(no_blocks, _BREAK_TAGS, "\n")
    untagged = F.regexp_replace(broken, _ANY_TAG_RE, " ")
    decoded = (
        decode_entities_exact(untagged)
        if exact_entities
        else decode_entities(untagged)
    )
    one_space = F.regexp_replace(decoded, r"[ \t\x0b\f\r]+", " ")
    trimmed_lines = F.regexp_replace(one_space, r" ?\n ?", "\n")
    squeezed = F.regexp_replace(trimmed_lines, r"\n{3,}", "\n\n")
    return F.regexp_replace(squeezed, r"^\n+|\n+$", "")
