"""Text-analysis column expressions for large-scale training-data pipelines.

Everything here is a pure Column expression (JVM-side, codegen'd) — no
Python UDFs. Each primitive has an exact ANSI-SQL twin used by the DuckDB
oracles in ``queries.py``; determinism across engines is part of the
contract, so hashing is md5-based (stable everywhere) rather than
engine-native hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
HASH_MOD = 1_000_000_007


def tokens(col: Column) -> Column:
    """Lowercased alnum tokens; empty strings filtered (split artifacts).

    DuckDB twin: ``list_filter(string_split_regex(lower(x),'[^a-z0-9]+'), t -> t <> '')``

    Implemented as strip-then-split rather than split-then-`F.filter`:
    higher-order functions evaluate their lambdas interpreted (outside
    whole-stage codegen) — the filter form costs ~5× more on the same
    data. Stripping leading/trailing separators first means the split can
    never produce empty tokens, except for the all-separator string, which
    maps to the empty array explicitly.
    """
    stripped = F.regexp_replace(F.lower(col), "^[^a-z0-9]+|[^a-z0-9]+$", "")
    return F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, TOKEN_SPLIT_RE)
    )


def h32(col: Column) -> Column:
    """Deterministic unsigned-32-bit hash: first 8 hex chars of md5.

    DuckDB twin: ``('0x' || substr(md5(x),1,8))::BIGINT``
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles (distinct), the unit for MinHash/Jaccard dedup.

    Built with `transform` over an index `sequence` — stays JVM-side.
    """
    # concat_ws over sliding windows: shingle(i) = toks[i] .. toks[i+n-1]
    def shingle_at(i: Column) -> Column:
        cols = [F.element_at(toks, i + j + 1) for j in range(n)]
        return F.concat_ws(" ", *cols)

    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(F.sequence(F.lit(0), F.size(toks) - n), shingle_at),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def word_ngrams_fast(col: Column, n: int = 3) -> Column:
    """Word n-grams of a raw TEXT column as a codegen-only expression —
    the gram-EXPLODE fast path (measured 9x over exploding
    `word_shingles` at sf0.1: 0.33s vs 2.95s, r10).

    Same gram SET as ``word_shingles(tokens(col), n)`` (pinned by a
    property test) but NOT deduplicated — use it where the consumer is
    duplicate-insensitive (distinct joins, count_distinct aggregates:
    decontamination, contamination reporting). MinHash folds take the
    array form; per-row shingle COUNT consumers need `word_shingles`.

    How it stays in whole-stage codegen with zero shuffles: the token
    stream is rendered once as a space-joined normalized string, and
    every n-gram is captured by ONE `regexp_extract_all` pass with a
    token-start anchor + capturing lookahead::

        (?<=^|\\ )(?=((?:[a-z0-9]+\\ ){n-1}[a-z0-9]+))

    — the zero-width match advances one char at a time, but the
    lookbehind restricts hits to token starts, so exactly one capture
    per sliding window. The alternative codegen form (posexplode +
    window leads, `operators/dedup.shingle_rows`) pays a doc-keyed
    SHUFFLE of the whole token stream; the interpreted array form
    (`word_shingles`) pays ~10x per element. This is the only form
    that is both codegen and map-only.

    Edge parity with `word_shingles`: fewer than n tokens → one gram of
    all tokens joined (NULL/empty text → the single empty-string gram).
    """
    toks = tokens(col)
    norm = F.concat_ws(" ", toks)
    pat = r"(?<=^|\ )(?=((?:[a-z0-9]+\ ){%d}[a-z0-9]+))" % (n - 1)
    return F.when(
        F.coalesce(F.size(toks), F.lit(0)) < n, F.array(norm)
    ).otherwise(F.regexp_extract_all(norm, F.lit(pat), F.lit(1)))


def h32b(col: Column) -> Column:
    """Second independent 32-bit hash: hex chars 9-16 of the same md5.

    DuckDB twin: ``('0x' || substr(md5(x),9,8))::BIGINT``
    """
    return F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("long")


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """K min-hashes via universal hashing: one md5 per shingle yields
    (a, b); hash family j is ``(a + j*b) mod 2^32``. One expensive hash
    per shingle instead of K, and the whole signature is ONE fold so
    Catalyst cannot re-inline the md5 work per hash family.

    Array-valued column, no explode — at 100 TB this is a narrow map-only
    transform; the only shuffle in MinHash-LSH dedup is the band bucket join.
    """
    mod = F.lit(2**32).cast("long")
    # materialize (a, b) per shingle once, within one expression tree
    pre = F.transform(
        shingles, lambda s: F.struct(h32(s).alias("a"), h32b(s).alias("b"))
    )

    def merge(acc, x):
        return F.transform(
            acc, lambda m, j: F.least(m, (x["a"] + j.cast("long") * x["b"]) % mod)
        )

    init = F.array_repeat(F.lit(2**33).cast("long"), k)
    return F.aggregate(pre, init, merge)


def simhash32(toks: Column) -> Column:
    """32-bit SimHash over distinct tokens: bit b is set iff
    ``sum over tokens of (token_hash bit b ? +1 : -1) > 0``."""
    td = F.array_distinct(toks)
    hashes = F.transform(td, h32)

    # ONE fold over the hash array maintaining all 32 bit-counters — 32
    # separate per-bit aggregates would each re-inline (and recompute)
    # the md5 transform above.
    def merge(acc, h):
        # explicit 32-wide array: F.shiftright needs a literal bit count
        return F.array(
            *[
                acc[b]
                + F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
                for b in range(32)
            ]
        )

    votes = F.aggregate(
        hashes, F.array_repeat(F.lit(0).cast("long"), 32), merge
    )
    powers = F.array(*[F.lit(2**b).cast("long") for b in range(32)])
    signed = F.zip_with(
        votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
    )
    return F.aggregate(signed, F.lit(0).cast("long"), lambda acc, x: acc + x)


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard over two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter).cast("double")


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling hash of the normalized text:
    ``fold(chars, 0, (acc,c) -> (acc*31 + ascii(c)) % 1e9+7)``.

    DuckDB twin uses ``list_reduce(list_prepend(0, ...))`` for the same
    init-0 left fold.
    """
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % HASH_MOD,
    )


# Marker-word lists for the heuristic language-ID (deterministic; the
# oracle mirrors them). Order = tie-break priority.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "and", "of", "to", "in", "is", "a"]),
    ("es", ["el", "la", "de", "que", "y", "en", "los"]),
    ("fr", ["le", "la", "de", "et", "les", "des", "un"]),
    ("de", ["der", "die", "und", "das", "von", "mit", "ein"]),
    ("zh", ["de5", "shi4", "le5"]),  # romanized placeholders
]


def marker_score(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*[F.lit(m) for m in markers])))
