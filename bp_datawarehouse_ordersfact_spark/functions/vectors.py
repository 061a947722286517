"""Vector/embedding expressions for similarity search.

All JVM-side (`zip_with`/`aggregate` fold in double precision, sequential
by index) so results are reproducible and match the DuckDB oracle's
``list_transform(range(n), ...)`` + left-fold formulation bit-for-bit
modulo final rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(a: Column, n_bits: int = 8) -> Column:
    """LSH bucket id from the sign pattern of the first ``n_bits``
    components — a deterministic random-hyperplane surrogate (axis-aligned
    hyperplanes), reproducible in ANSI SQL for the oracle."""
    out = F.lit(0)
    for i in range(n_bits):
        out = out + F.when(F.element_at(a, i + 1) >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return out


def l2_normalize(a: Column) -> Column:
    """Unit-norm projection (zero vectors pass through unchanged).
    For unit vectors ``‖u − v‖² = 2 − 2·cos(u, v)``, so squared-L2
    ranking over normalized inputs IS cosine ranking — the bridge that
    lets an L2-metric quantizer (PQ/ADC) serve a cosine pipeline."""
    n = norm(a)
    return F.when(n == F.lit(0.0), a).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )


def cosine_nullsafe(a: Column, b: Column) -> Column:
    """``cosine`` that yields NULL (instead of an ANSI divide-by-zero
    error) when either side has zero norm. In a DESC ordering NULLS sort
    last, so an argmax cell assignment over this places zero vectors in
    the tie-break cell (smallest cell_id) deterministically."""
    na, nb = norm(a), norm(b)
    return F.when(
        (na == F.lit(0.0)) | (nb == F.lit(0.0)), F.lit(None).cast("double")
    ).otherwise(dot(a, b) / (na * nb))
