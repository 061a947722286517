"""The parity harness must be at least as strict as the driver's gate.

Two bug classes shipped red driver rows while the pre-r5 harness stayed
green (VERDICT r4 'What's wrong' #3): DuckDB HUGEINT materializing as
float64 under ``fetchdf()`` (r2 ``sessionize_events``, r4
``ann_recall_at_k``) and array-typed output columns crashing the
driver's pandas ``sort_values`` canonicalization (r4
``ann_ivf_kmeans_refine``). These tests feed the harness exactly those
shapes — via real DuckDB fetchdf frames, no Spark needed — and assert it
now fails them, plus a green path so the strictness isn't vacuous."""

import duckdb
import pandas as pd
import pytest

from tests.parity import canonicalize, frames_match


def _duck(sql: str) -> pd.DataFrame:
    return duckdb.connect().execute(sql).fetchdf()


def test_hugeint_uncast_sum_fails_like_the_driver():
    # DuckDB integer sum -> HUGEINT -> float64 in fetchdf; Spark would
    # produce int64. Values are numerically identical (5.0 vs 5) — the
    # driver's dtype-sensitive hash still diverges, and so must we.
    oracle = _duck(
        "SELECT g, sum(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS n_hits"
        " FROM (SELECT i % 3 AS g, i FROM range(30) t(i)) GROUP BY g"
    )
    assert oracle["n_hits"].dtype.kind == "f", "precondition: HUGEINT->float64"
    spark_side = oracle.copy()
    spark_side["n_hits"] = spark_side["n_hits"].astype("int64")
    ok, msg = frames_match(spark_side, oracle)
    assert not ok and "dtype" in msg


def test_cast_bigint_sum_passes():
    oracle = _duck(
        "SELECT g, CAST(sum(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_hits"
        " FROM (SELECT i % 3 AS g, i FROM range(30) t(i)) GROUP BY g"
    )
    assert oracle["n_hits"].dtype.kind == "i"
    spark_side = oracle.sample(frac=1.0, random_state=7).reset_index(drop=True)
    ok, msg = frames_match(spark_side, oracle)
    assert ok, msg


def test_array_column_fails_like_the_driver():
    oracle = _duck("SELECT 1 AS cell_id, [0.1, 0.2] AS centroid")
    with pytest.raises(TypeError, match="array-typed"):
        canonicalize(oracle, "duck")
    ok, msg = frames_match(oracle.copy(), oracle)
    assert not ok and "array-typed" in msg


def test_float_values_compare_after_rounding_noise():
    a = pd.DataFrame({"k": [1, 2], "v": [0.1 + 0.2, 1.5]})
    b = pd.DataFrame({"k": [2, 1], "v": [1.5, 0.30000000000000004]})
    ok, msg = frames_match(a, b)
    assert ok, msg


def test_real_value_divergence_fails():
    a = pd.DataFrame({"k": [1], "v": [0.31]})
    b = pd.DataFrame({"k": [1], "v": [0.30]})
    ok, msg = frames_match(a, b)
    assert not ok and "value mismatch" in msg


def test_unknown_query_name_exits_loudly():
    """r10 VERDICT #4: `python tests/parity.py <sf> <bogus-name>` used to
    print a clean "0 failures" — the `only` filter silently skipped
    names not in the registry. It must exit nonzero BEFORE any Spark
    session comes up."""
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "/root/repo/tests/parity.py",
         "/root/testdata/sf0.001", "no_such_query_xyz"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert "no_such_query_xyz" in proc.stdout
