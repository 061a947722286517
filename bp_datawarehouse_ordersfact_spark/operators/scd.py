"""Slowly-changing-dimension maintenance.

The reference maintains every dimension by truncate-load (SCD Type 1 —
``gcp_savebigquery.py:6-38`` overwrite; history is destroyed on every
run). A complete warehouse engine also needs Type 2: effective-dated row
versioning, where an attribute change CLOSES the open row and INSERTS a
new one, preserving point-in-time joinability.

Scale shape: ONE full-outer join between the open rows and the change
set (equi-join on the business key — changes are usually small, so the
join broadcasts), then each joined row emits its 1–2 output versions as
an array exploded in the same stage. No branch of the merge re-reads
either input, so the dimension is scanned once regardless of how many
change cases apply. On Delta/Iceberg staging the same logic is the
classic two-action ``MERGE`` (update-close + insert); this operator is
the storage-agnostic form with identical semantics.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    eff_date,
    order_col: str | None = None,
) -> DataFrame:
    """Apply a change set to an SCD2 dimension.

    ``dim`` carries ``key``, ``attrs``, ``valid_from``, ``valid_to``
    (null while open) and ``is_current`` (1/0). ``changes`` carries
    ``key`` + ``attrs`` with the new values effective at ``eff_date``.

    Per business key:
    - attrs unchanged (null-safe) → open row passes through;
    - attrs differ → open row closes (``valid_to = eff_date``), a new
      open version is inserted;
    - key only in ``changes`` → brand-new open row;
    - key only in ``dim`` → untouched. Closed history always passes
      through unmodified.

    ``changes`` must carry ONE winning value per key (a CDC feed with
    several updates per key in one batch should be collapsed latest-wins
    first — see ``queries.relational.q_cdc_apply``). Duplicate keys here
    would otherwise fan out the join into several open versions, so the
    batch is collapsed defensively to one row per key before the merge:
    latest-wins by ``order_col`` when the caller names the CDC ordering
    column, else deterministically (min by attrs) — an *arbitrary*
    winner, acceptable only because a correctly-prepared batch has no
    duplicates for it to choose between.
    """
    if not attrs:
        raise ValueError(
            "scd2_apply needs at least one tracked attribute in `attrs` — "
            "with none there is no change to detect and no row to version"
        )
    if order_col is not None and order_col in attrs:
        raise ValueError(
            f"order_col {order_col!r} cannot also be a tracked attribute: "
            "the CDC ordering column is dropped after the latest-wins "
            "collapse and would leave the merge referencing a missing column"
        )
    eff = F.lit(eff_date).cast("date")
    history = dim.filter(F.col("is_current") == 0)
    open_rows = dim.filter(F.col("is_current") == 1)
    if order_col is not None:
        w_one = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    else:
        w_one = Window.partitionBy(key).orderBy(
            *[F.col(a).asc_nulls_first() for a in attrs]
        )
    changes = (
        changes.withColumn("__rn", F.row_number().over(w_one))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if order_col is not None:
        changes = changes.drop(order_col)

    o = open_rows.alias("o")
    c = changes.alias("c")
    joined = o.join(c, F.col(f"o.{key}") == F.col(f"c.{key}"), "full_outer")

    differs = reduce(
        lambda a, b: a | b,
        [~F.col(f"o.{a}").eqNullSafe(F.col(f"c.{a}")) for a in attrs],
    )
    in_dim = F.col(f"o.{key}").isNotNull()
    in_chg = F.col(f"c.{key}").isNotNull()

    def version(src: str, valid_from, valid_to, is_current) -> F.Column:
        return F.struct(
            F.coalesce(F.col(f"o.{key}"), F.col(f"c.{key}")).alias(key),
            *[F.col(f"{src}.{a}").alias(a) for a in attrs],
            valid_from.cast("date").alias("valid_from"),
            valid_to.cast("date").alias("valid_to"),
            F.lit(is_current).alias("is_current"),
        )

    kept = version("o", F.col("o.valid_from"), F.col("o.valid_to"), 1)
    closed = version("o", F.col("o.valid_from"), eff, 0)
    opened = version("c", eff, F.lit(None), 1)

    versions = (
        F.when(in_dim & in_chg & differs, F.array(closed, opened))
        .when(in_dim, F.array(kept))
        .otherwise(F.array(opened))
    )
    merged = joined.select(F.explode(versions).alias("v")).select("v.*")
    return history.select(
        key, *attrs, "valid_from", "valid_to", "is_current"
    ).unionByName(merged)


def scd2_point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_date_col: str,
    how: str = "left",
) -> DataFrame:
    """Join each fact row to the dimension VERSION that was valid at the
    fact's date — the query-side purpose of SCD2 maintenance: a row
    effective in ``[valid_from, valid_to)`` (open rows have null
    valid_to) matches facts dated inside that interval.

    Plan shape: an equi-join on the business key with the interval test
    as a residual join condition — the key join does the heavy lifting
    (co-partitioned or broadcast if the dim is small), and the residual
    filters the 1-to-few version fan-out per key down to exactly one
    match per fact row (versions never overlap by construction of
    ``scd2_apply``). No window, no sort: at 100 TB this costs the same
    as the plain dim join plus a per-row comparison."""
    d = dim.alias("d")
    f = facts.alias("f")
    cond = (
        (F.col(f"f.{key}") == F.col(f"d.{key}"))
        & (F.col(f"f.{fact_date_col}") >= F.col("d.valid_from"))
        & (
            F.col("d.valid_to").isNull()
            | (F.col(f"f.{fact_date_col}") < F.col("d.valid_to"))
        )
    )
    return f.join(d, cond, how).drop(F.col(f"d.{key}"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Symmetric snapshot reconciliation: classify every id as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` between two
    snapshots — the audit that runs BEFORE ``cdc_apply``-style
    convergence (what would change?) and after it (did it converge?),
    and the per-row dual of the reference's blind truncate-load (which
    destroys exactly this information every run; SURVEY §2.1 S6).

    ``compare_cols`` selects the columns whose difference marks a row
    ``changed`` (default: every shared non-id column). Comparison is
    exact and NULL-SAFE per column (``eqNullSafe`` — NULL == NULL is
    "unchanged", NULL vs value is "changed"); no content hashing, so
    there are no collision caveats and (a=NULL, b=1) never equals
    (a=1, b=NULL). NULL id values are matched null-safely too — a
    NULL-keyed row is still a row.

    Scale shape: ONE full-outer equi-join on the id columns (the
    unavoidable shuffle each side pays once); the per-column null-safe
    comparisons are map-side codegen over the joined row. Nothing else
    scales with the data; downstream aggregation (counts by status)
    reuses the join's partitioning only if keyed on ids — the usual
    status rollup is a separate tiny exchange of 4 groups.

    Returns ``id_cols`` + ``status`` (string). Ids present in both
    snapshots report their columns from the NEW side semantics-wise
    (the ids themselves are coalesced across sides).
    """
    if not id_cols:
        raise ValueError("id_cols must be non-empty")
    shared = [c for c in old.columns if c in set(new.columns)]
    cmp_cols = (
        [c for c in shared if c not in set(id_cols)]
        if compare_cols is None
        else list(compare_cols)
    )
    missing = [c for c in list(id_cols) + cmp_cols if c not in shared]
    if missing:
        raise ValueError(
            f"columns {missing} not present in both snapshots "
            f"(old: {old.columns}, new: {new.columns})"
        )
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in id_cols],
        *[F.col(c).alias(f"__ov_{c}") for c in cmp_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in id_cols],
        *[F.col(c).alias(f"__nv_{c}") for c in cmp_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in id_cols],
    )
    joined = o.join(n, cond, "full_outer")
    same = (
        reduce(
            lambda a, b: a & b,
            [
                F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}"))
                for c in cmp_cols
            ],
        )
        if cmp_cols
        else F.lit(True)
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c)
            for c in id_cols
        ],
        status.alias("status"),
    )
