"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count,
column names, and order-insensitive values.

DRIVER-FAITHFUL (round 5): the driver fetches both sides as pandas
frames, canonicalizes with ``sort_values`` over all columns, and hashes
the canonical values dtype-sensitively. Two whole bug classes shipped
red driver rows while the old ``fetchall()`` comparison here stayed
green (r2 ``sessionize_events``, r4 ``ann_recall_at_k``: DuckDB HUGEINT
materializes as float64 ``5.0`` vs Spark int64 ``5``; r4
``ann_ivf_kmeans_refine``: array-typed columns crash pandas
``sort_values``). This rewrite mirrors the driver on all three axes:

- Spark side via ``toPandas()``, oracle side via ``fetchdf()`` (NOT
  ``fetchall()`` — fetchall converts HUGEINT to Python int and erases
  the dtype divergence the driver sees);
- any array/list-typed output column is an immediate failure (the
  driver's ``sort_values`` raises ``unhashable type: 'list'``);
- values are compared through per-cell string canonicalization that
  PRESERVES float-vs-int formatting (``5.0`` != ``5``), so an oracle
  column arriving as float64 where Spark produces int64 fails here
  exactly as it fails the driver's value hash. Unusual oracle dtypes
  (HUGEINT->float64 next to an int Spark column, unsigned ints,
  Decimal objects) are also flagged by the dtype cross-check.

Usage: python tests/parity.py [--vanilla] [--window] [sf_dir] [query ...]

``--vanilla`` builds the session the way the DRIVER does (bare
``SparkSession.builder.master("local[8]")`` — none of the factory confs)
so session-dependent bugs (timezone, ANSI, shuffle sizing) surface here
first. ``--window`` restricts to the first 50 registry entries — the
exact slice the driver's correctness gate checks.
"""

from __future__ import annotations

import datetime as _dt
import math
import sys

import duckdb
import numpy as np
import pandas as pd


def _is_arraylike(v) -> bool:
    return isinstance(v, (list, tuple, dict, set, np.ndarray))


def _cell_repr(v) -> str:
    """Dtype-sensitive canonical string for one cell.

    Floats keep float formatting (``repr(5.0)`` = '5.0'), ints keep int
    formatting ('5') — so a float64 oracle column against an int64 Spark
    column mismatches, mirroring the driver's dtype-sensitive hash.
    Datetimes/dates normalize to ISO (midnight timestamps == dates, the
    one place fetchdf()'s DATE->datetime64 widening is representational,
    not a value divergence — driver rows with date columns are green)."""
    if v is None or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # driver-equivalent precision guard: 12dp kills last-bit noise
        # without masking the pre-rounded 2dp/6dp registry convention
        return repr(round(f, 12))
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, (np.integer, int)):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        py = v.to_pydatetime()
        if (py.hour, py.minute, py.second, py.microsecond) == (0, 0, 0, 0):
            return py.date().isoformat()
        return py.isoformat(sep=" ")
    if isinstance(v, _dt.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


_DTYPE_KIND = {"i": "int", "u": "int", "f": "float", "b": "bool",
               "M": "datetime", "O": "object"}


def canonicalize(df: pd.DataFrame, side: str) -> pd.DataFrame:
    """Mirror the driver: sorted columns, sort_values over ALL columns.

    Array-typed cells raise TypeError here just as the driver's pandas
    canonicalization does (r4 ``ann_ivf_kmeans_refine``)."""
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object and df[c].map(_is_arraylike).any():
            raise TypeError(
                f"{side} column {c!r} is array-typed — the driver's pandas "
                "sort_values canonicalization crashes on it "
                "(unhashable type: 'list'); emit scalar columns instead"
            )
    # probe with the driver's literal call: sort_values over all columns
    # raises on mixed-type object columns and other canon hazards the
    # explicit array check above doesn't cover — surface them here
    try:
        df.sort_values(by=cols)
    except Exception as ex:
        raise TypeError(
            f"{side} frame fails the driver's sort_values canonicalization: "
            f"{type(ex).__name__}: {ex}"
        ) from ex
    # ...but the cross-engine comparison itself sorts by canonical cell
    # strings so both sides land in one deterministic order
    key = df.apply(lambda row: tuple(_cell_repr(v) for v in row), axis=1)
    return df.iloc[np.argsort(key.map(str).to_numpy(), kind="stable")].reset_index(
        drop=True
    )


def frames_match(sdf: pd.DataFrame, ddf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(sdf.columns) != sorted(ddf.columns):
        return False, (
            f"schema mismatch: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
        )
    if len(sdf) != len(ddf):
        return False, f"row count: spark={len(sdf)} duck={len(ddf)}"

    # dtype cross-check BEFORE value compare: catches HUGEINT->float64,
    # unsigned, Decimal-object oracles next to clean Spark dtypes
    for c in sorted(sdf.columns):
        sk = _DTYPE_KIND.get(sdf[c].dtype.kind, sdf[c].dtype.kind)
        dk = _DTYPE_KIND.get(ddf[c].dtype.kind, ddf[c].dtype.kind)
        both_empty = sdf[c].isna().all() and ddf[c].isna().all()
        if sk != dk and not both_empty and {sk, dk} != {"object", "datetime"}:
            return False, (
                f"dtype mismatch on {c!r}: spark={sdf[c].dtype} duck={ddf[c].dtype}"
                " (uncast DuckDB integer sum/HUGEINT materializes as float64 —"
                " CAST(... AS BIGINT) in the oracle)"
            )
        if ddf[c].dtype.kind == "u":
            return False, f"oracle column {c!r} is unsigned ({ddf[c].dtype}) — cast it"

    try:
        a = canonicalize(sdf, "spark")
        b = canonicalize(ddf, "duck")
    except TypeError as ex:
        return False, str(ex)

    mism = []
    for i in range(len(a)):
        ra = tuple(_cell_repr(v) for v in a.iloc[i])
        rb = tuple(_cell_repr(v) for v in b.iloc[i])
        if ra != rb:
            mism.append((ra, rb))
            if len(mism) >= 3:
                break
    if mism:
        return False, f"value mismatch, e.g. {mism}"
    return True, f"OK ({len(sdf)} rows)"


def h32_md5(s: str) -> int:
    """Pure-Python twin of functions.text.h32 (first 8 md5 hex chars as
    uint32) — THE canonical sampling/bucketing hash every planted-oracle
    test re-derives membership from. One definition here, imported by
    the query-staging tests, so a production rule change can't leave a
    stale copy green."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def compare_query(spark, con, name, fn, sql, sf_dir) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir).toPandas()
    ddf = con.execute(sql).fetchdf()
    return frames_match(sdf, ddf)


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    window = "--window" in args
    args = [a for a in args if a not in ("--vanilla", "--window")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    if window:
        qs = dict(list(qs.items())[:50])
    # a typo'd query name must be LOUD, not a clean "0 failures" (r10
    # VERDICT #4: `only` silently skipped unknown names, so a bogus name
    # in a pre-commit parity invocation looked like a pass). Checked
    # BEFORE the Spark session comes up, so the failure is immediate.
    unknown = only - set(qs)
    if unknown:
        scope = "the driver window" if window else "the registry"
        print(f"ERROR: query names not in {scope}: {sorted(unknown)}")
        sys.exit(2)

    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from bp_datawarehouse_ordersfact_spark.core.session import get_spark

        spark = get_spark("parity")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            try:
                n = fn(spark, sf_dir).count()
                print(f"[rows-only] {name}: {n} rows")
            except Exception as ex:
                failures += 1
                print(f"[FAIL] {name}: {type(ex).__name__}: {str(ex)[:300]}")
            continue
        try:
            ok, msg = compare_query(spark, con, name, fn, sql, sf_dir)
        except Exception as ex:
            ok, msg = False, f"{type(ex).__name__}: {str(ex)[:500]}"
        if not ok:
            failures += 1
        print(f"[{'OK' if ok else 'FAIL'}] {name}: {msg}")

    print(f"\n{len(qs)} queries, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
