"""Distributed BPE (byte-pair-encoding) tokenizer TRAINING and encoding.

The reference counts tokens with a fixed regex (SURVEY §2 text-analysis
row; our ``text_token_count`` query mirrors it) but has no trainable
tokenizer. A training-data pipeline at 100 TB needs one: the tokenizer
that a model trains with is itself fit on the corpus. This module runs
the classic Sennrich-style BPE fit AS A SPARK JOB.

Scale shape — the word-frequency compression is the whole trick:

1. ``word_freqs`` tokenizes the corpus and aggregates to (word, freq).
   This is the ONLY corpus-scale pass: one shuffle with map-side partial
   counts. 100 TB of text collapses to a vocab of ~10M distinct words —
   cluster-trivial from here on.
2. ``bpe_train`` iterates on that (word, freq) table, never the corpus:
   each merge step is one vocab-scale aggregation (adjacent-pair counts,
   weighted by word freq, map-side combined) plus a 1-row argmax collect
   — the same driver-probe discipline as ``operators/graph.py``'s
   convergence checks and ``kmeans_lloyd_centroids``'s centroid fetch.
   Lineage is truncated with a tracked localCheckpoint every iteration
   (merge application rewrites the symbol arrays in place), so the plan
   stays flat across hundreds of merges.
3. ``bpe_encode`` applies a trained merge list to a corpus by encoding
   each DISTINCT word once (an Arrow-batched pandas UDF running the
   standard rank-greedy merge loop — genuinely sequential per word, so
   Python is justified) and equi-joining the results back. The join is
   on the word — uniform, and the encoded-vocab side is dictionary-sized.

Everything is deterministic: pair ties break on (count DESC, left ASC,
right ASC); no RNG anywhere, so a re-fit reproduces the identical merge
sequence and tests can pin it against a pure-Python reference
(tests/test_bpe.py::TestBpe; tests/test_property.py fuzzes the same
equalities).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.persist import tracked_local_checkpoint, unpersist_rdd_ids
from ..functions.text import TOKEN_SPLIT_RE

END_OF_WORD = "</w>"


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale shuffle of a
    BPE fit. Tokenization matches the repo-wide rule
    (``functions.text.tokens``: lowercase, split on non-alphanumerics,
    drop empties) so fitted merges compose with the other text operators.
    """
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs; empty for 1-symbol
    words (slice of length 0 is the empty array, so explode drops them).
    """
    return F.zip_with(
        F.slice(syms, 1, F.size(syms) - 1),
        F.slice(syms, 2, F.size(syms) - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Leftmost-non-overlapping replacement of adjacent (a, b) with a+b —
    a single left fold, equivalent to the textbook while-loop merge (the
    merged symbol a+b can never itself equal ``a``, since ``b`` is
    non-empty, so a fresh merge never cascades within the same pass).
    """
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _initial_symbols(word: Column) -> Column:
    # split on "" yields the character array (unicode-safe, prototyped);
    # the end-of-word marker is its own symbol, so merges can learn
    # suffix units ("er</w>") distinct from infix ones ("er")
    return F.concat(F.split(word, ""), F.array(F.lit(END_OF_WORD)))


def bpe_train(
    words: DataFrame,
    n_merges: int,
    min_freq: int = 1,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[str, str]]:
    """Fit up to ``n_merges`` BPE merges on a (word, freq) table (from
    ``word_freqs``). Returns the ordered merge list — rank i = i-th
    learned pair. Stops early when no adjacent pair reaches ``min_freq``
    (weighted by word frequency) or no pairs remain.

    Per merge: one vocab-scale pair-count aggregation + a 1-row argmax
    collect + a map-side conditional rewrite of the symbol arrays (the
    fold only evaluates on words that actually contain the pair — CASE
    WHEN branches lazily). The vocab never leaves the cluster.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    sc = words.sparkSession.sparkContext
    vocab = words.select(
        _initial_symbols(F.col(word_col)).alias("s"),
        F.col(freq_col).cast("long").alias("freq"),
    )
    # lazy checkpoint: the next pair-count agg is the materializing action
    vocab, ckpt_ids = tracked_local_checkpoint(vocab, eager=False)

    merges: list[tuple[str, str]] = []
    # blocks freed one action late (graph.py's pattern): iteration i's
    # pair-count collect is the action that materializes the checkpoint
    # written in iteration i-1, so i-1's INPUT blocks die only here —
    # freeing them any earlier would force a full lineage recompute.
    stale_ids: set[int] = set()
    for _ in range(n_merges):
        best = (
            vocab.select(F.explode(_adjacent_pairs(F.col("s"))).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        unpersist_rdd_ids(sc, stale_ids)
        stale_ids = set()
        if not best or best[0]["n"] < min_freq:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        has_pair = F.exists(
            _adjacent_pairs(F.col("s")),
            lambda p: (p["a"] == F.lit(a)) & (p["b"] == F.lit(b)),
        )
        new_vocab, new_ids = tracked_local_checkpoint(
            vocab.select(
                F.when(has_pair, _merge_fold(F.col("s"), a, b))
                .otherwise(F.col("s"))
                .alias("s"),
                "freq",
            ),
            eager=False,
        )
        stale_ids = ckpt_ids
        vocab, ckpt_ids = new_vocab, new_ids

    unpersist_rdd_ids(sc, stale_ids | ckpt_ids)
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    """(rank, left, right) frame for persisting a fitted tokenizer to a
    table (mirror of the persisted-centroid IVF index pattern)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


def load_merges(df: DataFrame) -> list[tuple[str, str]]:
    rows = df.select("rank", "left", "right").orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard rank-greedy BPE encode: repeatedly merge the
    lowest-ranked adjacent pair present. Provably equivalent to replaying
    the merge list in fit order (each merge's inputs exist only before
    any later merge consumes them); the unit test pins the equivalence.
    """
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        ranked = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        a, b = syms[i], syms[i + 1]
        # leftmost-non-overlapping merge of (a, b) across the whole word
        out: list[str] = []
        j = 0
        while j < len(syms):
            if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def encode_distinct_words(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """(word, bpe) for each distinct word — the dictionary-sized encode
    that ``bpe_encode`` joins back to the corpus. Arrow-batched pandas
    UDF: the merge loop is genuinely sequential per word, the justified
    Python case; the ranks dict ships once in the task closure (a few
    hundred KB for a real vocab)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def enc(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _encode_word(w, ranks))

    # user-pinned fan-out (the `_fan_out` contract, PLANS.md "Round
    # 10"): the encode's cost scales with ROWS (a sequential merge loop
    # per word), so AQE's bytes-based coalescing would serialize the
    # dictionary onto a few cores. Partition by xxhash64(word), not the
    # bare word: callers pass a just-distinct'd frame whose aggregate
    # exchange already hash-partitions on word, and the planner elides
    # a same-key same-count user repartition as redundant — leaving
    # only the coalescible ENSURE_REQUIREMENTS exchange. The derived
    # key keeps the REPARTITION_BY_NUM pin in the plan; the frame is
    # dictionary-sized, so the extra exchange is noise.
    n = words.sparkSession.sparkContext.defaultParallelism
    return words.repartition(n, F.xxhash64(word_col)).select(
        word_col, enc(F.col(word_col)).alias("bpe")
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, bpe_tokens array<string>) per document: tokenize, encode each
    DISTINCT word once, equi-join back, reassemble in token order.
    Documents with no tokens (null/empty/punctuation-only text) keep an
    empty array. Plan: corpus token fan-out → distinct-word encode (tiny)
    → join on word → one groupBy(id) with an array_sort re-assembly —
    two uniform shuffles total at any corpus size."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    encoded = encode_distinct_words(toks.select("word").distinct(), merges)
    per_doc = (
        toks.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "bpe"))),
                    lambda s: s["bpe"],
                )
            ).alias("bpe_tokens")
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(
            F.col("bpe_tokens"), F.array().cast("array<string>")
        ).alias("bpe_tokens"),
    )


def _merge_symbols(syms: list[str], a: str, b: str) -> list[str]:
    """Leftmost-non-overlapping (a, b) -> a+b, the Python twin of
    ``_merge_fold``."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train_local(
    words: DataFrame,
    n_merges: int,
    min_freq: int = 1,
    word_col: str = "word",
    freq_col: str = "freq",
) -> list[tuple[str, str]]:
    """Same fit as ``bpe_train`` — identical merge sequence, pinned by a
    hypothesis equality test — but the merge LOOP runs on the driver.

    Division of labor for real tokenizer fits (30k+ merges): the corpus
    pass (``word_freqs``) is the cluster's job; the resulting distinct
    vocab is almost always driver-sized (~10M words ≈ hundreds of MB
    even for 100 TB of text), and the merge loop on it is pure
    bookkeeping. Running it locally with INCREMENTAL pair maintenance
    (a pair→words inverted index; only words containing the merged pair
    recount) costs O(touched words) per merge instead of one full Spark
    job per merge — thousands of times faster at real merge counts. Use
    ``bpe_train`` only when the vocab itself exceeds driver memory.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    rows = words.select(word_col, freq_col).collect()
    return _train_merges_driver(
        [r[word_col] for r in rows],
        [int(r[freq_col]) for r in rows],
        n_merges,
        min_freq,
    )


def word_freqs_py(text: str) -> dict[str, int]:
    """Driver-side twin of ``word_freqs`` for LITERAL training texts
    (planted fixtures): same tokenization rule — lowercase, split on
    ``TOKEN_SPLIT_RE``, drop empties — same (word, freq) multiset,
    without scheduling a cluster job to count a few planted words
    (``word_freqs`` on a literal frame still runs an explode + aggregate
    + collect job; profiled at ~0.3s of pure scheduling for a 17-word
    string). ASCII-compatible inputs only: Python ``str.lower`` and JVM
    ``lower`` agree there, which planted fixture text is by construction
    — corpus-scale fits must keep using ``word_freqs``. Equality with
    ``word_freqs`` is test-pinned (tests/test_bpe.py)."""
    import re
    from collections import Counter

    return dict(
        Counter(w for w in re.split(TOKEN_SPLIT_RE, text.lower()) if w)
    )


def bpe_train_local_freqs(
    freqs: dict[str, int], n_merges: int, min_freq: int = 1
) -> list[tuple[str, str]]:
    """``bpe_train_local`` for a driver-resident (word, freq) mapping —
    the fit path for planted/fixture training texts where the vocab
    never was on the cluster. Identical merge sequence: the selection
    rule (count DESC, pair ASC) is a pure function of the multiset, so
    dict ordering cannot perturb it (test-pinned against
    ``bpe_train_local``)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    items = list(freqs.items())
    return _train_merges_driver(
        [w for w, _ in items], [int(f) for _, f in items], n_merges, min_freq
    )


def _train_merges_driver(
    words: list[str], word_freqs: list[int], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Shared driver-side merge loop (incremental pair maintenance) —
    the body of ``bpe_train_local``, factored so the literal-text path
    (``bpe_train_local_freqs``) runs the exact same code."""
    from collections import defaultdict

    syms_list = [list(w) + [END_OF_WORD] for w in words]
    freqs = word_freqs

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(syms_list):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freqs[i]
            pair_words[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        (a, b), n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        merges.append((a, b))
        for i in list(pair_words[(a, b)]):
            f = freqs[i]
            old = syms_list[i]
            for p in zip(old, old[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(i)
            new = _merge_symbols(old, a, b)
            syms_list[i] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += f
                pair_words[p].add(i)
    return merges


def bpe_vocab(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """(token, token_id) for the full tokenizer vocabulary: every base
    character seen in the corpus (one distributed distinct over exploded
    chars), the end-of-word marker, then each merge product in rank
    order. Ids are deterministic — characters sorted ascending get
    0..C-1, the marker C, merge products C+1.. — so vocab files
    regenerate identically and encoded ids are stable across refits on
    the same corpus."""
    spark = words.sparkSession
    chars = sorted(
        r["c"]
        for r in words.select(
            F.explode(F.split(F.col(word_col), "")).alias("c")
        )
        .distinct()
        .collect()
    )
    tokens = chars + [END_OF_WORD] + [a + b for a, b in merges]
    seen: set[str] = set()
    rows = []
    for t in tokens:
        if t not in seen:  # a merge product could collide with a raw char
            seen.add(t)
            rows.append((t, len(rows)))
    return spark.createDataFrame(rows, "token string, token_id int")


def bpe_encode_ids(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    unk_id: int = -1,
) -> DataFrame:
    """(id, token_ids array<int>) — ``bpe_encode`` then token→id via a
    broadcast vocab map (a tokenizer vocab is always driver-small).
    Tokens outside the vocab (only possible when encoding text whose
    characters the fitted corpus never contained) map to ``unk_id``.
    Same plan as ``bpe_encode`` plus one map-side transform."""
    mapping = {
        r["token"]: r["token_id"] for r in vocab.select("token", "token_id").collect()
    }
    vmap = F.create_map(
        *[F.lit(x) for t, i in sorted(mapping.items()) for x in (t, i)]
    )
    return bpe_encode(df, text_col, id_col, merges).select(
        F.col(id_col),
        F.transform(
            F.col("bpe_tokens"),
            lambda t: F.coalesce(
                F.element_at(vmap, t), F.lit(unk_id)
            ).cast("int"),
        ).alias("token_ids"),
    )
