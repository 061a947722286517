"""BPE trainer/encoder pinned against a pure-Python Sennrich reference.

The trainer's whole value is determinism: same corpus → same merge
sequence, regardless of partitioning. The reference here is the textbook
word-frequency BPE fit (count adjacent pairs weighted by word freq, merge
the argmax, repeat) with the same tie-break (count DESC, pair ASC).
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from bp_datawarehouse_ordersfact_spark.operators.bpe import (
    END_OF_WORD,
    _encode_word,
    bpe_encode,
    bpe_train,
    load_merges,
    merges_df,
    word_freqs,
)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("unit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


# --- pure-Python reference ------------------------------------------------


def _ref_merge_word(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(word_freqs: dict[str, int], n_merges: int, min_freq: int = 1):
    vocab = {
        tuple(list(w) + [END_OF_WORD]): f for w, f in word_freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        merges.append((a, b))
        vocab = {
            _ref_merge_word(s, a, b): f for s, f in vocab.items()
        }
    return merges


def _ref_tokenize(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest newer new"),
    (3, "the lowest newest widest"),
    (4, "wide wider widest wide"),
    (5, "low new wide the the the"),
    (6, None),
    (7, "   ...   "),
]


def _ref_word_freqs(corpus) -> dict[str, int]:
    wf: dict[str, int] = {}
    for _, text in corpus:
        for w in _ref_tokenize(text or ""):
            wf[w] = wf.get(w, 0) + 1
    return wf


class TestBpe:
    def test_word_freqs_matches_reference(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id int, body string")
        got = {
            r["word"]: r["freq"] for r in word_freqs(df, "body").collect()
        }
        assert got == _ref_word_freqs(CORPUS)

    def test_merge_sequence_matches_reference(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id int, body string")
        # repartition to prove the fit is partitioning-independent
        wf = word_freqs(df, "body").repartition(7)
        got = bpe_train(wf, n_merges=12)
        want = _ref_train(_ref_word_freqs(CORPUS), 12)
        assert got == want
        assert len(got) == 12  # corpus is rich enough to fill all 12

    def test_min_freq_stops_early(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id int, body string")
        wf = word_freqs(df, "body")
        got = bpe_train(wf, n_merges=50, min_freq=4)
        want = _ref_train(_ref_word_freqs(CORPUS), 50, min_freq=4)
        assert got == want
        assert 0 < len(got) < 50

    def test_driver_side_twins_match_distributed_fit(self, spark):
        """The literal-text fit path (word_freqs_py +
        bpe_train_local_freqs, r16: no cluster job for a planted
        training string) must produce the identical (word, freq)
        multiset and the identical merge sequence as the distributed
        word_freqs + bpe_train_local it replaces in q_bpe_tokenize."""
        from bp_datawarehouse_ordersfact_spark.operators.bpe import (
            bpe_train_local,
            bpe_train_local_freqs,
            word_freqs_py,
        )

        text = " | ".join(t for _, t in CORPUS if t)
        df = spark.createDataFrame([(text,)], "body string")
        dist_freqs = {
            r["word"]: r["freq"] for r in word_freqs(df, "body").collect()
        }
        assert word_freqs_py(text) == dist_freqs
        for n, mf in [(12, 1), (50, 4), (0, 1)]:
            assert bpe_train_local_freqs(
                word_freqs_py(text), n_merges=n, min_freq=mf
            ) == bpe_train_local(word_freqs(df, "body"), n_merges=n, min_freq=mf)
        with pytest.raises(ValueError):
            bpe_train_local_freqs({"a": 1}, n_merges=-1)

    def test_rank_greedy_encode_equals_sequential_replay(self):
        merges = _ref_train(_ref_word_freqs(CORPUS), 12)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in list(_ref_word_freqs(CORPUS)) + ["slowest", "newlywed", "a"]:
            seq = tuple(list(w) + [END_OF_WORD])
            for a, b in merges:
                seq = _ref_merge_word(seq, a, b)
            assert _encode_word(w, ranks) == list(seq), w

    def test_encode_roundtrip_and_empty_docs(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id int, body string")
        merges = _ref_train(_ref_word_freqs(CORPUS), 8)
        out = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_encode(df, "body", "doc_id", merges).collect()
        }
        assert set(out) == {i for i, _ in CORPUS}
        assert out[6] == [] and out[7] == []
        ranks = {p: i for i, p in enumerate(merges)}
        for doc_id, text in CORPUS:
            want = [
                t for w in _ref_tokenize(text or "") for t in _encode_word(w, ranks)
            ]
            assert out[doc_id] == want, doc_id
            # lossless: concatenating tokens restores words + markers
            joined = "".join(want)
            assert joined == "".join(
                w + END_OF_WORD for w in _ref_tokenize(text or "")
            )

    def test_merges_persist_roundtrip(self, spark):
        merges = _ref_train(_ref_word_freqs(CORPUS), 5)
        assert load_merges(merges_df(spark, merges)) == merges

    def test_n_merges_validation(self, spark):
        df = spark.createDataFrame(CORPUS, "doc_id int, body string")
        with pytest.raises(ValueError):
            bpe_train(word_freqs(df, "body"), n_merges=-1)
        assert bpe_train(word_freqs(df, "body"), n_merges=0) == []


class TestBpeVocab:
    def test_vocab_ids_deterministic_and_complete(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.bpe import (
            bpe_vocab,
            word_freqs,
        )

        df = spark.createDataFrame(CORPUS, "doc_id int, body string")
        wf = word_freqs(df, "body")
        merges = _ref_train(_ref_word_freqs(CORPUS), 8)
        v1 = {(r["token"], r["token_id"]) for r in bpe_vocab(wf, merges).collect()}
        v2 = {(r["token"], r["token_id"]) for r in bpe_vocab(wf, merges).collect()}
        assert v1 == v2
        toks = {t for t, _ in v1}
        # every base char, the marker, and every merge product present
        chars = {c for w in _ref_word_freqs(CORPUS) for c in w}
        assert chars <= toks and END_OF_WORD in toks
        assert {a + b for a, b in merges} <= toks
        # ids dense 0..n-1
        assert sorted(i for _, i in v1) == list(range(len(v1)))

    def test_encode_ids_roundtrip_and_unk(self, spark):
        from bp_datawarehouse_ordersfact_spark.operators.bpe import (
            bpe_encode_ids,
            bpe_vocab,
            word_freqs,
        )

        df = spark.createDataFrame(CORPUS, "doc_id int, body string")
        wf = word_freqs(df, "body")
        merges = _ref_train(_ref_word_freqs(CORPUS), 8)
        vocab = bpe_vocab(wf, merges)
        inv = {r["token_id"]: r["token"] for r in vocab.collect()}
        ranks = {p: i for i, p in enumerate(merges)}
        out = {
            r["doc_id"]: list(r["token_ids"])
            for r in bpe_encode_ids(df, "body", "doc_id", merges, vocab).collect()
        }
        for doc_id, text in CORPUS:
            want = [
                t for w in _ref_tokenize(text or "") for t in _encode_word(w, ranks)
            ]
            assert [inv[i] for i in out[doc_id]] == want, doc_id
        # unseen character -> unk id
        alien = spark.createDataFrame([(99, "zzz 9 low")], "doc_id int, body string")
        got = bpe_encode_ids(alien, "body", "doc_id", merges, vocab).collect()[0]
        assert -1 in list(got["token_ids"])  # 'z'/'9' never fitted
        assert any(i >= 0 for i in got["token_ids"])  # 'low' still encodes
