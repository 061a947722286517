"""Driver-style verification for the STAGED round-16 registry query
(queries/staged_r16.py). The typed-VALUES oracle is re-derived from a
pure-Python BPE twin — fit (overlapping pair counts weighted by word
freq, max-count/lexicographic tie-break) and encode (sequential replay
of the merge list, leftmost-non-overlapping) — so the literals are
never the only place the expected answer lives.
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.functions.rounding import sql_rewrite_rounds
from bp_datawarehouse_ordersfact_spark.queries import staged_r16
from tests.parity import frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("staged-r16")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.mark.parametrize("name", list(staged_r16.QUERIES))
def test_staged_r16_query_passes_driver_comparison(spark, name):
    sdf = staged_r16.QUERIES[name](spark, SF_DIR).toPandas()
    sql = sql_rewrite_rounds(staged_r16.ORACLES[name])
    ddf = duckdb.connect().execute(sql).fetchdf()
    ok, msg = frames_match(sdf, ddf)
    assert ok, f"{name}: {msg}"


def test_staged_module_is_activated():
    """Activation contract (round 14, per the accelerated schedule):
    `bpe_tokenize` is live in the registry and oracle-paired, holding a
    capped slot freed by the round-14 retirements (`text_token_count` —
    which this fitted-merge tokenizer supersedes — stays oracle-pinned
    via llmops.RETIRED).
    Window membership is NOT pinned (activation-round-only fact)."""
    from bp_datawarehouse_ordersfact_spark import queries as Q

    live = set(Q.all_queries())
    missing = set(staged_r16.QUERIES) - live
    assert not missing, f"staged queries not in the registry: {missing}"
    assert set(staged_r16.QUERIES) <= set(Q.all_oracles())


# --- pure-Python BPE twin ----------------------------------------------------
# Independent of operators/bpe.py: tokenize (repo rule: lowercase, split
# non-alphanumerics), fit by overlapping adjacent-pair counts weighted
# by word frequency with the (max n, asc a, asc b) tie-break, encode by
# sequential replay of the merge list (pinned equivalent to the
# production rank-greedy encode by tests/test_bpe.py).

_EOW = "</w>"


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _merge(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_twin(text: str, n_merges: int, min_freq: int = 1):
    freqs = Counter(_toks(text))
    vocab = {w: list(w) + [_EOW] for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, f in freqs.items():
            syms = vocab[w]
            for pair in zip(syms, syms[1:]):
                counts[pair] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_freq:
            break
        merges.append(best)
        vocab = {w: _merge(s, *best) for w, s in vocab.items()}
    return merges


def _encode_twin(text: str, merges) -> list[str]:
    out: list[str] = []
    for w in _toks(text):
        syms = list(w) + [_EOW]
        for a, b in merges:
            syms = _merge(syms, a, b)
        out.extend(syms)
    return out


def test_bpe_values_rederive_from_python_twin():
    merges = _train_twin(staged_r16._BPE_TRAIN_TEXT, staged_r16._BPE_N_MERGES)
    assert len(merges) == staged_r16._BPE_N_MERGES
    expect = {
        did: (" ".join(enc), len(enc))
        for did, t in staged_r16._BPE_DOCS
        for enc in [_encode_twin(t, merges)]
    }
    got = {
        r[0]: (r[1], r[2])
        for r in duckdb.connect()
        .execute(staged_r16.ORACLES["bpe_tokenize"])
        .fetchall()
    }
    assert got == expect
    # non-degenerate: a learned multi-char unit appears in an encoding,
    # the out-of-vocab word fell back to characters (every symbol short),
    # and the empty doc kept its empty-row contract
    assert "est</w>" in got[42_000_000][0]
    unknown_part = got[42_000_001][0].split(" n ew </w> ")[1]
    assert all(len(s) == 1 for s in unknown_part.split(" ")[:-1])
    assert got[42_000_002] == ("", 0)
