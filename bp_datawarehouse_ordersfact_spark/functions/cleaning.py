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
# entities, mojibake — ``dw2_wc_increment.py:81-86``, ``dw3_merge_inc.py:160-169``).
DEFAULT_LITERAL_REPLACEMENTS: list[tuple[str, str]] = [
    ("‘", "'"),
    ("’", "'"),
    ("“", '"'),
    ("”", '"'),
    ("&ndash;", "-"),
    ("&#x2122;", ""),
    ("#038;", ""),
    ("<BR>&nbsp;<BR>", " "),
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
