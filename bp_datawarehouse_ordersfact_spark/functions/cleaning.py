"""T-family string cleaning (reference §2.8).

The reference does all of this with row-wise Python lambdas over pandas
Series (``dw2_wc_increment.py:81-86``, ``dw4_book_dim.py:104-163``); here
every transform is a native Column expression, so it stays inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Table-driven literal replace chain (reference T2: smart quotes, HTML
# entities, mojibake, typo fixes — ``dw2_wc_increment.py:81-86``,
# ``dw3_merge_inc.py:160-169,202-211``, ``dw4_book_dim.py:248-251``).
DEFAULT_LITERAL_REPLACEMENTS: list[tuple[str, str]] = [
    ("‘", "'"),
    ("’", "'"),
    ("“", '"'),
    ("”", '"'),
    ("&ndash;", "-"),
    ("&#x2122;", ""),
    ("#038;", ""),
    ("<BR>&nbsp;<BR>", " "),
    # mojibake repairs (double-encoded UTF-8 artifacts the source feeds
    # carry — dw3_merge_inc.py:160-169)
    ("├│", "ó"),
    ("ΓÇ£", '"'),
    ("ΓÇ¥", '"'),
    ("Γäó", ""),
    ("â„¢", ""),
    # source-data typo fix (dw3_merge_inc.py:202-211)
    ("COTTONMOUTN", "COTTONMOUTH"),
]

# T3 noise phrases stripped before similarity matching
# (``dw4_book_dim.py:111-140``): edition/availability markers that would
# otherwise dominate the token overlap.
NOISE_PHRASES = ["pre-order", "out of print", "digital only", "paperback", "hardcover"]

# T9 canonicalization map (``dw4_book_dim.py:143-159``): known alternate
# titles mapped to the master form ahead of the fuzzy match. A join
# against a mapping table would scale better; at dictionary size a
# when-chain keeps it in the same projection.
TITLE_CANONICALIZATIONS: list[tuple[str, str]] = [
    ("madness vase", "madness vase gibson"),
]


def replace_literals(col: Column, pairs: list[tuple[str, str]] | None = None) -> Column:
    """Chained literal replacements, table-driven instead of the
    reference's copy-pasted ``.map(lambda ...)`` chains."""
    out = col
    for old, new in pairs or DEFAULT_LITERAL_REPLACEMENTS:
        out = F.replace(out, F.lit(old), F.lit(new))
    return out


def normalize_title(col: Column) -> Column:
    """Reference F3 canonicalization chain (``dw4_book_dim.py:111-140``):
    lowercase, strip non-alphanumerics, drop stop-words, collapse spaces."""
    out = F.lower(col)
    out = F.regexp_replace(out, r"[^a-z0-9\s]", "")
    out = F.regexp_replace(out, r"\s+\b(the|and)\b\s+", " ")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def strip_noise_phrases(col: Column, phrases: list[str] | None = None) -> Column:
    """T3 (``dw4_book_dim.py:111-140``): remove edition/availability
    phrases (case-insensitive) before similarity matching."""
    out = col
    for p in phrases or NOISE_PHRASES:
        out = F.regexp_replace(out, r"(?i)" + p.replace("-", r"\-"), "")
    return out


def canonicalize_title(col: Column, mapping: list[tuple[str, str]] | None = None) -> Column:
    """T9 (``dw4_book_dim.py:143-159``): substitute known alternate title
    forms with the master form (substring substitution, the reference's
    dict/regex style — applied to the already-normalized string). Guarded
    so an already-canonical string is not re-expanded."""
    out = col
    for alt, canon in mapping or TITLE_CANONICALIZATIONS:
        out = F.when(out.contains(canon), out).otherwise(
            F.replace(out, F.lit(alt), F.lit(canon))
        )
    return out


def clean_for_match(col: Column) -> Column:
    """The full F3 pre-match chain (``dw4_book_dim.py:104-163``): literal
    repairs → noise-phrase removal → normalize → canonicalize."""
    return canonicalize_title(
        normalize_title(strip_noise_phrases(replace_literals(col)))
    )


def strip_numeric_suffix(col: Column) -> Column:
    """T10: float-stringified IDs (``123.0`` → ``123``) without the
    pandas ``'nan'`` artifact — cast through bigint then string."""
    return F.col(col) if isinstance(col, str) else col.cast("bigint").cast("string")


def percent_to_fraction(col: Column) -> Column:
    """T11 + C11 (``dw4_book_dim.py:248-264``): strip ``%``, cast, and
    normalize percent-scale values (> 1.0) down to fractions."""
    v = F.regexp_replace(col.cast("string"), "%", "").cast("double")
    return F.when(v > 1.0, v / 100.0).otherwise(v)


def concat_address(city: Column, state: Column, zip_: Column) -> Column:
    """T8 (``dw2_wc_increment.py:467``): ``City, State Zip``."""
    return F.concat(city, F.lit(", "), state, F.lit(" "), zip_)
