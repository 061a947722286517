"""Static oracle-convention gate (DuckDB only — no Spark, runs in
seconds under plain pytest, unlike tests/parity.py which must be invoked
manually).

Two whole bug classes reached the driver as red rows because nothing in
the pytest suite executed the oracles: HUGEINT from an uncast integer
aggregate materializing as float64 (r2 ``sessionize_events``, r4
``ann_recall_at_k``) and array-typed output columns crashing the
driver's pandas canonicalization (r4 ``ann_ivf_kmeans_refine``). This
test runs EVERY registry oracle against sf0.001 and rejects those
shapes — so a new query with a gate-incompatible oracle fails
``pytest tests/`` immediately, before parity or the driver ever run.
(Cross-engine value equality remains parity.py / the driver's job.)
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from bp_datawarehouse_ordersfact_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# dtype kinds pandas produces for driver-compatible DuckDB results:
# i=int, f=float, b=bool, O=object (str/date), M=datetime
ALLOWED_KINDS = set("ifbOM")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def oracle_frames(con):
    from bp_datawarehouse_ordersfact_spark.functions.rounding import (
        sql_rewrite_rounds,
    )
    from bp_datawarehouse_ordersfact_spark.queries import (
        staged_canary,
        staged_eval,
        staged_eval2,
        staged_profile,
        staged_r18,
        staged_r19,
        staged_r20,
    )

    frames = {}
    for name, sql in Q.all_oracles().items():
        frames[name] = con.execute(sql).fetchdf()
    # STAGED (not-yet-registered) oracles get the same convention gate
    # ahead of activation, so a gate-incompatible shape is caught while
    # the activation is still a mechanical edit (r10; staged_r10's
    # oracles were only convention-checked once activated)
    for mod in (
        staged_eval, staged_eval2, staged_r18, staged_r19, staged_r20,
        staged_canary, staged_profile,
    ):
        for name, sql in mod.ORACLES.items():
            frames[f"staged:{name}"] = con.execute(
                sql_rewrite_rounds(sql)
            ).fetchdf()
    return frames


def test_every_query_has_an_oracle():
    missing = [k for k in Q.all_queries() if k not in Q.all_oracles()]
    assert not missing, (
        f"queries without oracles get only the driver's weak rows-only "
        f"check: {missing}"
    )


def test_oracles_produce_driver_compatible_dtypes(oracle_frames):
    # Catches unsigned ints and exotic dtypes (DECIMAL arrives as object
    # of decimal.Decimal — caught below by the value probe). The
    # int-vs-float divergence (HUGEINT) needs BOTH engine outputs and is
    # the parity harness's dtype cross-check (tests/parity.py).
    import decimal

    bad = []
    for name, df in oracle_frames.items():
        for c in df.columns:
            kind = df[c].dtype.kind
            if kind == "u" or kind not in ALLOWED_KINDS:
                bad.append((name, c, str(df[c].dtype)))
            elif df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, decimal.Decimal)
            ).any():
                bad.append((name, c, "object of decimal.Decimal — cast to DOUBLE"))
    assert not bad, f"driver-incompatible oracle dtypes: {bad}"


def test_oracles_never_emit_array_columns(oracle_frames):
    bad = []
    for name, df in oracle_frames.items():
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, tuple, dict, np.ndarray))
            ).any():
                bad.append((name, c))
    assert not bad, (
        f"array-typed oracle columns crash the driver's pandas "
        f"canonicalization (r4 ann_ivf_kmeans_refine): {bad}"
    )


def test_oracles_sort_under_driver_canonicalization(oracle_frames):
    failures = []
    for name, df in oracle_frames.items():
        try:
            df.sort_values(by=sorted(df.columns))
        except Exception as ex:
            failures.append((name, f"{type(ex).__name__}: {ex}"))
    assert not failures, f"oracle frames the driver cannot canonicalize: {failures}"


def test_staged_modules_and_registry_names_are_pairwise_disjoint():
    """With staged modules queued (r18-r20 + staged_eval/eval2 after the
    round-14 double activation), two defining the same
    query name — or a staged name colliding with a live registry one —
    would make an activation silently overwrite a dict entry instead of
    adding a row. Every staged module's names must be disjoint from
    every other's AND from the live registry, and every staged query
    must carry an oracle (or be a deliberate rows-only op, of which
    there are none staged)."""
    from bp_datawarehouse_ordersfact_spark.queries import (
        staged_canary,
        staged_eval,
        staged_eval2,
        staged_profile,
        staged_r18,
        staged_r19,
        staged_r20,
    )

    mods = [
        staged_eval, staged_eval2, staged_r18, staged_r19, staged_r20,
        staged_canary, staged_profile,
    ]
    live = set(Q.all_queries())
    seen: dict[str, str] = {}
    for mod in mods:
        names = set(mod.QUERIES)
        assert names == set(mod.ORACLES), (
            f"{mod.__name__}: query/oracle key mismatch"
        )
        clash_live = names & live
        assert not clash_live, f"{mod.__name__} collides with registry: {clash_live}"
        for n in names:
            assert n not in seen, (
                f"{n} staged in both {seen[n]} and {mod.__name__}"
            )
            seen[n] = mod.__name__
