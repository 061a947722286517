"""STAGED registry query for the round-16 rotation (not yet in
``queries._MODULES`` — the sketches_r6/staged_r10 staging discipline:
write the query + oracle + driver-style test ahead of activation, so
the activation is a mechanical edit).

One query: ``bpe_tokenize`` — the BPE family (`operators/bpe.py`:
corpus word-freq pass, merge fit, rank-greedy encode, corpus join-back)
was pytest-pinned only; this gives the full chain a driver row.

The fit runs on a PLANTED training text (the classic
low/lower/newest/widest corpus), because merges fitted on the real
corpus would be sf-dependent and so would every planted encoding. The
fit path is ``word_freqs_py`` + ``bpe_train_local_freqs`` (driver-side
twins of the distributed pass — the training text is a 17-word literal,
so the cluster job the distributed forms schedule would only count
planted words; both twins are pinned ≡ their distributed forms by
equality tests in tests/test_bpe.py, and real corpus fits keep the
``word_freqs`` + ``bpe_train_local`` division of labor). The ENCODE
then runs over the real corpus
unioned with three planted docs (ids >= 4.2x10^7: in-vocab words, an
out-of-vocab word exercising the character-level fallback, and an
empty text pinning the keep-empty-array contract), so the bench pays
the operator's true cost shape — token fan-out, distinct-word Arrow
encode, join-back, per-doc reassembly; planted rows are selected by
the id range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_table
from ..operators.bpe import bpe_encode, bpe_train_local_freqs, word_freqs_py

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_BPE_TRAIN_TEXT = (
    "low low low low low lower lower "
    "newest newest newest newest newest newest "
    "widest widest widest"
)
_BPE_N_MERGES = 6

# (doc_id, text): in-vocab words; an out-of-vocab word (character-level
# fallback); empty text (bpe_encode's keep-empty-array contract)
_BPE_DOCS = [
    (42_000_000, "low lower newest"),
    (42_000_001, "widest new unknown"),
    (42_000_002, ""),
]


@register(
    "bpe_tokenize",
    """
    SELECT * FROM (VALUES
      (CAST(42000000 AS BIGINT), 'low </w> low e r </w> n ew est</w>',
       CAST(9 AS INT)),
      (CAST(42000001 AS BIGINT),
       'w i d est</w> n ew </w> u n k n o w n </w>', CAST(15 AS INT)),
      (CAST(42000002 AS BIGINT), '', CAST(0 AS INT))
    ) AS t(doc_id, bpe, n_bpe)
    """,
)
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE subword tokenization end-to-end (`operators/bpe.py`): fit
    merges on a training corpus, encode every document, reassemble
    per-doc token streams — the token-counting substrate a training
    pipeline budgets with.

    Why a typed VALUES oracle is a deterministic twin: the merge
    sequence is a pure function of the planted training text under the
    fit's documented tie-break (max count, then lexicographic pair),
    and each encoding is the sequential replay of those merges over the
    planted words — both re-derived from a pure-Python BPE twin in the
    staged test, so the literals are never the only place the answer
    lives. The fit is planted-only (real-corpus merges would make every
    encoding sf-dependent); the ENCODE pays the real corpus: token
    posexplode, one Arrow pass over the DISTINCT word dimension (the
    merge loop is genuinely sequential per word — the justified Python
    case), a word equi-join back, and one per-doc groupBy — two uniform
    shuffles at any corpus size. The out-of-vocab planted word pins the
    character-fallback path; the empty doc pins the left-join
    keep-empty contract."""
    # The fit input is a 17-word LITERAL — counting it through
    # ``word_freqs`` (explode + aggregate + collect over a 1-row frame)
    # scheduled a full Spark job per query construction just to count
    # planted words (r16: ~0.3s pure scheduling, measured). The
    # driver-side twins produce the identical (word, freq) multiset and
    # the identical merge sequence (both test-pinned against the
    # distributed forms); the ENCODE below still pays the real corpus,
    # which is the operator cost this row exists to exercise.
    merges = bpe_train_local_freqs(
        word_freqs_py(_BPE_TRAIN_TEXT), n_merges=_BPE_N_MERGES, min_freq=1
    )
    real = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(_BPE_DOCS, "doc_id long, text string")
    docs = real.unionByName(planted)
    enc = bpe_encode(docs, "text", "doc_id", merges)
    return enc.filter(F.col("doc_id") >= 42_000_000).select(
        "doc_id",
        F.array_join("bpe_tokens", " ").alias("bpe"),
        F.size("bpe_tokens").cast("int").alias("n_bpe"),
    )
