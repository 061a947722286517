"""Encoding hygiene for web-scale text corpora: unicode normalization,
invisible-character cleanup, and mojibake repair.

Raw crawl text arrives with the same logical string in many physical
spellings — decomposed vs composed accents, 17 flavors of unicode
space, zero-width joiners pasted from rich editors, and UTF-8 bytes
that were mis-decoded through cp1252 somewhere upstream ("mojibake":
``café`` shipped as ``cafÃ©``). Every exact-dedup hash, shingle, token
count, and fingerprint downstream treats those spellings as different
documents, so this normalization belongs BEFORE the dedup tier.

Two speed tiers, consistent with the repo's UDF policy:

- **codegen tier** (``strip_invisible``, ``normalize_spaces``,
  ``demojibake_common``): pure Column expressions — regexp/replace
  chains that stay inside whole-stage codegen. ``demojibake_common`` is
  a table-driven literal chain covering the high-frequency cp1252
  artifacts (the same table-driven shape as
  ``cleaning.DEFAULT_LITERAL_REPLACEMENTS``, which carries the
  reference's OWN observed mojibake — dw3_merge_inc.py:160-169).
- **exact Arrow tier** (``nfc_normalize``, ``repair_mojibake_exact``):
  unicode normalization forms and the full encode/decode roundtrip have
  no JVM expression equivalent, so these are vectorized ``pandas_udf``
  columns (Arrow batch transfer, never row-at-a-time Python). The
  roundtrip repair is gated on a marker pre-check per value, so clean
  corpora pay one substring scan, not an encode/decode per row.

Scale notes: everything here is map-only (zero shuffles); the Arrow
tier parallelizes per input partition (fan out one-row-group parquet
first — see queries/llmops._fan_out).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode space separators (Zs minus ASCII space) + line/para separators
# that should read as a plain space.
_SPACE_CLASS = (
    "[\\u00a0\\u1680\\u2000-\\u200a\\u202f\\u205f\\u3000\\u2028\\u2029]"
)
# Zero-width characters + BOM: contribute nothing visually but split
# tokens and flip hashes.
_ZERO_WIDTH_CLASS = "[\\u200b-\\u200d\\u2060\\ufeff]"
# C0 controls except \t \n \r, plus DEL and C1 controls.
_CONTROL_CLASS = "[\\u0000-\\u0008\\u000b\\u000c\\u000e-\\u001f\\u007f-\\u009f]"

# cp1252-as-UTF-8 artifacts, longest-first so prefixes can't pre-empt
# (e.g. "â€œ" must be tried before any bare "â€" rule). The codegen
# fast path for the handful of sequences that dominate real crawls;
# repair_mojibake_exact below is the complete roundtrip.
COMMON_MOJIBAKE: list[tuple[str, str]] = [
    ("â€œ", "“"),
    ("â€", "”"),
    ("â€™", "’"),
    ("â€˜", "‘"),
    ("â€“", "–"),
    ("â€”", "—"),
    ("â€¦", "…"),
    # bare 2-char remnant: strip_invisible removes the \x9d trailing
    # byte of a mojibake right-double-quote BEFORE this chain runs in
    # clean_text; must stay BELOW every longer entry sharing the prefix
    # (the replace chain is sequential)
    ("â€", "”"),
    ("Ã©", "é"),
    ("Ã¨", "è"),
    ("Ã¡", "á"),
    ("Ã³", "ó"),
    ("Ãº", "ú"),
    ("Ã±", "ñ"),
    ("Ã§", "ç"),
    ("Ã¼", "ü"),
    ("Ã¶", "ö"),
    ("Ã¤", "ä"),
    ("ÃŸ", "ß"),
    ("Â«", "«"),
    ("Â»", "»"),
    ("Â°", "°"),
    ("Â", ""),  # stray cp1252 NBSP high byte; MUST come after Â« / Â»
]


def strip_invisible(col: Column) -> Column:
    """Remove zero-width characters/BOM and non-whitespace control
    characters (keeps \\t \\n \\r). Codegen-only."""
    return F.regexp_replace(
        F.regexp_replace(col, _ZERO_WIDTH_CLASS, ""), _CONTROL_CLASS, ""
    )


def normalize_spaces(col: Column, collapse: bool = True) -> Column:
    """Map every unicode space/line separator to ASCII space; with
    ``collapse``, squeeze runs of blanks to one space and trim. The
    newline-preserving form (``collapse=False``) suits document text
    where line structure is a feature. Codegen-only."""
    out = F.regexp_replace(col, _SPACE_CLASS, " ")
    if collapse:
        out = F.trim(F.regexp_replace(out, "[ \t]+", " "))
    return out


def demojibake_common(col: Column) -> Column:
    """Literal-chain repair of the dominant cp1252-as-UTF-8 sequences.
    Stays in whole-stage codegen; exactness bounded by the table —
    use ``repair_mojibake_exact`` for the full roundtrip."""
    out = col
    for bad, good in COMMON_MOJIBAKE:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def _normalize_udf(form: str):
    """Build the Arrow normalization UDF at CALL time, nested per the
    repo convention (``vectors.hyperplane_band_keys`` is the template):
    a module-level ``@F.pandas_udf`` resolves its return type at import
    time, which (a) requires an active SparkSession and (b) crashes the
    executor-side re-import during UDF deserialization. ``StringType()``
    instance (not the "string" DDL form) so no parser is consulted."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    return _norm


def nfc_normalize(col: Column) -> Column:
    """NFC-normalize (canonical compose): e+combining-acute becomes é,
    so equal-looking strings hash equal. Arrow tier — unicode
    normalization has no JVM expression. NULLs pass through."""
    return _normalize_udf("NFC")(col)


def nfkc_normalize(col: Column) -> Column:
    """NFKC-normalize (compatibility compose): also folds width/ligature
    presentation forms (ﬁ→fi, full-width digits→ASCII) — the stronger
    form training-data token counts usually want. NULLs pass through."""
    return _normalize_udf("NFKC")(col)


_MARKERS = ("Ã", "â€", "Â")


def _roundtrip_seg(s: str) -> str:
    """One whole-segment repair pass: re-encode through cp1252 (latin-1
    fallback for the five cp1252 holes) and decode as UTF-8; return the
    input unchanged if the roundtrip fails or finds nothing to fix."""
    try:
        raw = s.encode("cp1252")
    except UnicodeEncodeError:
        try:
            raw = s.encode("latin-1")
        except UnicodeEncodeError:
            return s
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return s


def _bytelike(ch: str) -> bool:
    """Could this char have come from a single mis-decoded byte?
    (latin-1 range, or one of cp1252's graphic repertoire — e.g. the
    â€œ/â€\x9d family.) Mojibake sequences consist ONLY of such chars,
    so they never span a non-bytelike boundary."""
    if ord(ch) <= 0xFF:
        return True
    try:
        ch.encode("cp1252")
        return True
    except UnicodeEncodeError:
        return False


def _roundtrip_fix(s: str) -> str:
    """One mojibake repair pass. Fast path: roundtrip the whole value.
    When the value holds chars no single-byte codec can represent (an
    emoji, CJK, a zero-width char), a whole-string encode would fail and
    silently skip repair for the ENTIRE document — so fall back to
    repairing each maximal run of byte-like chars independently; genuine
    multi-byte text passes through untouched and corruption localized to
    part of a document still gets fixed."""
    try:
        return _roundtrip_seg_checked(s)
    except UnicodeEncodeError:
        pass
    out = []
    i, n = 0, len(s)
    while i < n:
        j = i
        byteish = _bytelike(s[i])
        while j < n and _bytelike(s[j]) == byteish:
            j += 1
        seg = s[i:j]
        if byteish and any(m in seg for m in _MARKERS):
            seg = _roundtrip_seg(seg)
        out.append(seg)
        i = j
    return "".join(out)


def _roundtrip_seg_checked(s: str) -> str:
    """Like ``_roundtrip_seg`` but lets UnicodeEncodeError propagate so
    the caller can distinguish "not encodable" from "nothing to fix"."""
    try:
        raw = s.encode("cp1252")
    except UnicodeEncodeError:
        raw = s.encode("latin-1")  # may raise — caller handles
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return s


def repair_mojibake_exact(col: Column) -> Column:
    """Exact mojibake repair: the encode(cp1252)/decode(utf-8) roundtrip,
    applied up to twice (double-encoded text exists) and only to values
    carrying a mojibake marker — clean text is returned untouched, so
    the common case costs one substring scan. Idempotent: repaired text
    carries no markers, so a second call is a no-op. Arrow tier, UDF
    nested at call time (see ``_normalize_udf`` for why)."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _repair(s: pd.Series) -> pd.Series:
        def fix(v):
            if v is None:
                return None
            out = v
            for _ in range(2):
                if not any(m in out for m in _MARKERS):
                    break
                repaired = _roundtrip_fix(out)
                if repaired == out:
                    break
                out = repaired
            return out

        return s.map(fix)

    return _repair(col)


def clean_text(col: Column) -> Column:
    """The composed codegen pipeline: common-mojibake chain → invisible
    strip → space normalization (newline-preserving). The full-fidelity
    variant is ``clean_text_exact`` at Arrow cost."""
    return normalize_spaces(demojibake_common(strip_invisible(col)), collapse=False)


def clean_text_exact(col: Column) -> Column:
    """Full-fidelity hygiene: exact mojibake roundtrip repair → NFC
    canonical compose (one Arrow pass each) → the codegen invisible
    strip + space normalization. Idempotent end-to-end: repaired text
    has no markers and NFC is a projection, so a second application is
    the identity (property-pinned in tests/test_encoding.py)."""
    return normalize_spaces(
        strip_invisible(nfc_normalize(repair_mojibake_exact(col))),
        collapse=False,
    )
