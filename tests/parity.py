"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count,
column names, and order-insensitive values (floats rounded).

Usage: python tests/parity.py [--vanilla] [--window] [sf_dir] [query ...]

``--vanilla`` builds the session the way the DRIVER does (bare
``SparkSession.builder.master("local[8]")`` — none of the factory confs)
so session-dependent bugs (timezone, ANSI, shuffle sizing) surface here
first. ``--window`` restricts to the first 50 registry entries — the
exact slice the driver's correctness gate checks.
"""

from __future__ import annotations

import math
import sys

import duckdb


def normalize(rows: list[tuple], ndigits: int = 4) -> list[tuple]:
    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, ndigits)
        if isinstance(v, list):
            return tuple(norm_val(x) for x in v)
        return v

    return sorted(
        (tuple(norm_val(v) for v in r) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def compare_query(spark, con, name, fn, sql, sf_dir) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    # align duck columns to spark order before value compare
    idx = [duck_cols.index(c) for c in spark_cols]
    duck_rows = [tuple(r[i] for i in idx) for r in duck_rows]
    a, b = normalize(spark_rows), normalize(duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch ({sum(1 for x, y in zip(a, b) if x != y)} rows), e.g. {diffs}"
    return True, f"OK ({len(spark_rows)} rows)"


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    window = "--window" in args
    args = [a for a in args if a not in ("--vanilla", "--window")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

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

    qs, oracles = e.queries(), e.oracle_sql()
    if window:
        qs = dict(list(qs.items())[:50])
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
