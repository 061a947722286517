"""STAGED registry queries for the round-20 rotation (not yet in
``queries._MODULES`` — the sketches_r6/staged_r10 staging discipline).

Eight rows, closing the last shipped-operator-without-a-driver-row gaps
and adding six new scale operators:

- ``weighted_sample_by_group`` — `operators.sampling.
  weighted_sample_per_group` (Efraimidis–Spirakis A-ES weighted
  sampling without replacement), shipped since r8 with only pytest
  pins. The per-group race is INDEPENDENT across groups (the window
  partitions by group), so a planted group's winners are a pure
  function of the planted (doc_id, weight) literals — unperturbable by
  the real corpus, which unions in as its own groups (grp = source,
  weight = n_chars) so the bench pays the full one-shuffle window at
  corpus scale. Typed VALUES oracle; winners re-derived from pure
  Python hashlib/math in tests/test_staged_r20_queries.py.
- ``bigram_lm_score`` — `operators.ml.bigram_logprob` (interpolated
  bigram LM quality score, the CCNet-style perplexity-filter step),
  shipped since r9 with only pytest pins. Computed oracle over the
  REAL documents table: both engines count the same bigram/context/
  unigram tables and average ``ln(0.7·P_ML(w|prev) + 0.3·P_uni(w))``
  per document (the cross-engine ln-mean discipline
  ``text_unigram_logprob`` has run green since r9).
- ``bloom_join_prune`` — NEW `operators.joins.bloom_prefilter`:
  runtime Bloom-filter join pruning (the explicit form of Spark's
  ``runtime.bloomFilter`` rewrite). The oracle is a plain semi-join
  aggregate — the row pins the operator's contract itself: a Bloom
  prefilter has NO false negatives, so prefilter + exact join must
  equal the plain join EXACTLY, cross-engine.
- ``outlier_iqr_per_group`` — NEW `operators.aggregates.
  outlier_iqr_per_group`: per-group Tukey-fence outlier audit on exact
  quartiles (Spark ``percentile`` and DuckDB ``quantile_cont`` are
  bit-identical linear interpolation — verified, not assumed), with a
  ``percentile_approx`` tier for the 100 TB path.
- ``pmi_collocations`` — NEW `operators.ml.pmi_collocations`:
  corpus-level PMI collocation mining (the vocabulary/tokenizer-audit
  dual of the per-doc bigram score). Computed oracle; membership is an
  integer count threshold, never a float comparison.
- ``temperature_mixture`` — NEW `operators.sampling.
  temperature_mixture_weights`: α-sampling mixture weights
  ``n_i^α / Σ n_j^α`` (the multilingual pretraining rule), the
  weight-derivation step in front of ``token_mixture``'s epoch
  budgeting. Computed oracle over the per-source token sums.
- ``mixture_drift`` — NEW `operators.aggregates.mixture_drift`:
  per-source Jensen–Shannon drift between two corpus snapshots (the
  data-drift alarm before a refreshed corpus ships). Computed oracle
  over the doc_id parity halves of the real corpus; CASE-guarded
  0·ln(0) limit terms mirrored on both engines.
- ``corr_profile`` — NEW `operators.aggregates.corr_matrix`: pairwise
  Pearson over all column pairs in ONE aggregation pass (the built-in
  ``df.stat.corr`` costs one job per pair); explicit moment sums +
  ``try_divide`` because Spark 4's ``corr`` aggregate throws
  DIVIDE_BY_ZERO on zero-variance columns under ANSI. Computed oracle
  against DuckDB's ``corr()``.

Planted-id floor: 47_000_000 (above every testdata id range and every
other staged module's floor — each module owns a disjoint 10^6-wide
range; gated by tests/test_staged_r20_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core.io import load_table
from ..functions.rounding import rnd
from ..operators.aggregates import outlier_iqr_per_group
from ..operators.joins import bloom_prefilter
from ..operators.ml import bigram_logprob
from ..operators.sampling import weighted_sample_per_group

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# weighted_sample_by_group — ten planted docs in their own group; the
# four A-ES winners (race key -ln(u)/w, u = md5-derived 52-bit uniform,
# seed 'r20') are a pure function of these literals, re-derived from
# hashlib/math in the staged test. The heaviest weights (120, 42, 18.5,
# 3.25) win in exactly that order for this seed — weight-monotone here,
# though A-ES is a lottery, not a sort (weight 9.5 drew a losing u).
# ---------------------------------------------------------------------------

_WS_SEED = "r20"
_WS_N = 4
_WS_GRP = "planted-fixture"
_WS_PLANTED = [
    (47_000_000 + i, _WS_GRP, w)
    for i, w in enumerate(
        [9.5, 0.01, 3.25, 120.0, 0.5, 42.0, 7.75, 1.0, 0.02, 18.5]
    )
]


@register(
    "weighted_sample_by_group",
    """
    SELECT * FROM (VALUES
      (CAST(47000003 AS BIGINT), CAST(1 AS BIGINT)),
      (CAST(47000005 AS BIGINT), CAST(2 AS BIGINT)),
      (CAST(47000009 AS BIGINT), CAST(3 AS BIGINT)),
      (CAST(47000002 AS BIGINT), CAST(4 AS BIGINT))
    ) AS t(doc_id, sample_rank)
    """,
)
def q_weighted_sample_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling without replacement, per group
    (`operators.sampling.weighted_sample_per_group`): the
    Efraimidis–Spirakis exponential race — rank by ``-ln(u)/w`` with a
    deterministic md5-derived u — keeps the n smallest keys per group.
    Inclusion odds follow the weight; the sample is a pure function of
    (row key, seed): stable under repartitioning, retries, and AQE.

    Why a typed VALUES oracle is a deterministic twin: the window
    partitions by group, so the planted group's four winners depend
    ONLY on the planted (doc_id, weight) literals — hashlib-rederived
    in the staged test — while the real corpus (grp = source, weight =
    n_chars) unions in as its own groups, so the bench pays the full
    race: map-side key computation over every row, ONE shuffle on the
    group key, rank-limit-pushed window (WindowGroupLimit partial
    top-n map-side). Output selected by the planted group."""
    real = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("source").alias("grp"),
        F.col("n_chars").cast("double").alias("w"),
    )
    planted = spark.createDataFrame(
        _WS_PLANTED, "doc_id long, grp string, w double"
    )
    pool = real.unionByName(planted)
    out = weighted_sample_per_group(
        pool, _WS_N, "w", "doc_id", ["grp"], seed=_WS_SEED
    )
    w = Window.partitionBy("grp").orderBy(F.asc("es_key"), F.asc("doc_id"))
    return (
        out.filter(F.col("grp") == _WS_GRP)
        .select("doc_id", F.row_number().over(w).cast("long").alias("sample_rank"))
    )


# ---------------------------------------------------------------------------
# bigram_lm_score — computed oracle over the real corpus: the same
# token/bigram/context/unigram counts on both engines, then the same
# Jelinek–Mercer interpolated log-probability mean per document.
# ---------------------------------------------------------------------------

_SQL_TOKS = "list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), t -> t <> '')"


@register(
    "bigram_lm_score",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS.format(c='text')} AS t FROM documents),
    uni_c AS (SELECT tok, CAST(count(*) AS DOUBLE) AS uc
              FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
    tot AS (SELECT sum(uc) AS n FROM uni_c),
    pr AS (SELECT doc_id, split_part(g, ' ', 1) AS prev,
                  split_part(g, ' ', 2) AS tok, g
           FROM (SELECT doc_id,
                        unnest(list_transform(range(len(t) - 1),
                               i -> t[i+1] || ' ' || t[i+2])) AS g
                 FROM toks WHERE len(t) >= 2)),
    big_c AS (SELECT g, CAST(count(*) AS DOUBLE) AS bc FROM pr GROUP BY g),
    ctx_c AS (SELECT prev, CAST(count(*) AS DOUBLE) AS cc FROM pr GROUP BY prev),
    scored AS (SELECT p.doc_id,
                      -- (CAST .. AS DOUBLE) forces IEEE double subtraction
                      -- = Python's 1.0 - 0.7 = 0.30000000000000004; bare
                      -- (1.0 - 0.7) is DuckDB DECIMAL arithmetic = exact
                      -- 0.3, one ulp BELOW the Spark side's weight
                      ln(0.7 * (b.bc / c.cc)
                         + (CAST(1.0 AS DOUBLE) - 0.7) * (u.uc / t.n)) AS lp
               FROM pr p JOIN big_c b USING (g)
                         JOIN ctx_c c USING (prev)
                         JOIN uni_c u USING (tok)
                         CROSS JOIN tot t)
    SELECT d.doc_id,
           CAST(coalesce(s.nb, 0) AS BIGINT) AS n_bigrams,
           s.ml AS mean_logprob
    FROM documents d LEFT JOIN (
      SELECT doc_id, count(*) AS nb, round(avg(lp), 6) AS ml
      FROM scored GROUP BY doc_id) s USING (doc_id)
    """,
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM quality score (`operators.ml.
    bigram_logprob`, λ = 0.7): per document, the mean of
    ``ln(0.7·P_ML(w|prev) + 0.3·P_uni(w))`` over its token bigrams,
    both distributions counted from the corpus itself — the step past
    ``text_unigram_logprob`` toward a KenLM-style perplexity filter:
    common words in garbage ORDER now score low.

    Scale shape (see the operator docstring): the bigram-probability
    lookup is a hash join keyed on (prev, tok) — the bigram stream
    shuffles once; the vocabulary-sized context/unigram tables
    broadcast (forced here — the synthetic vocab is tiny; the operator
    auto-probes and falls back to shuffled joins past the knob, which
    is the 10^8-token web-corpus path). Docs with < 2 tokens report
    n_bigrams 0 and a NULL score on BOTH engines."""
    d = load_table(spark, sf_dir, "documents")
    return bigram_logprob(
        d, "text", "doc_id", lambda_bigram=0.7, broadcast_vocab=True
    )


# ---------------------------------------------------------------------------
# bloom_join_prune — the oracle is the PLAIN semi-join aggregate: the
# row pins the Bloom contract itself (no false negatives ⇒ prefilter +
# exact join ≡ plain join), cross-engine, at every sf.
# ---------------------------------------------------------------------------

_BLOOM_PRICE_MIN = 400_000.0


@register(
    "bloom_join_prune",
    f"""
    WITH k AS (SELECT DISTINCT o_orderkey FROM orders
               WHERE o_totalprice > {_BLOOM_PRICE_MIN})
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_quantity), 2) AS sum_qty,
           round(sum(l.l_extendedprice), 2) AS sum_price
    FROM lineitem l JOIN k ON l.l_orderkey = k.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def q_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning (`operators.joins.
    bloom_prefilter`): lineitem is prefiltered by a 64 Ki-bit Bloom
    bitmap of the high-value order keys BEFORE the exact semi join —
    the explicit, deterministic form of Spark's own
    ``runtime.bloomFilter`` rewrite, for build sides too large to
    broadcast as a hash set but whose bitmap fits in KiB.

    Why the plain-join oracle IS the operator's contract: a Bloom
    filter admits false positives but NEVER false negatives, so
    prefilter + exact join must equal the plain join exactly — any
    dropped match reddens the row. The bench pays the real sequence:
    bitmap build (map-side partial bit_or, collect bounded by bitmap
    size, never key count), map-side codegen bit test over every
    lineitem row (no shuffle, no Python), then the exact semi join over
    the surviving ~20%."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build = orders.filter(F.col("o_totalprice") > _BLOOM_PRICE_MIN).select(
        "o_orderkey"
    )
    pre = bloom_prefilter(li, "l_orderkey", build, "o_orderkey")
    # NO broadcast hint on the exact join: the operator's premise is a
    # build side too large to broadcast as a hash set — the honest plan
    # is a shuffle semi join over the PRUNED probe (AQE still converts
    # to broadcast at test scale, where the build measures tiny). And
    # no distinct(): semi-join semantics already ignore build-side
    # duplicates — the extra exchange would be pure waste at scale.
    exact = pre.join(
        build.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey",
        "left_semi",
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
        rnd(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# outlier_iqr_per_group — computed oracle over the real corpus; the
# quartiles are exact on both engines (bit-identical linear
# interpolation), so the strict fence comparisons agree row-for-row.
# ---------------------------------------------------------------------------


@register(
    "outlier_iqr_per_group",
    """
    WITH s AS (SELECT l_returnflag, l_linestatus,
                      quantile_cont(l_extendedprice, 0.25) AS q1_raw,
                      quantile_cont(l_extendedprice, 0.75) AS q3_raw
               FROM lineitem GROUP BY l_returnflag, l_linestatus)
    SELECT l.l_returnflag, l.l_linestatus,
           CAST(count(l.l_extendedprice) AS BIGINT) AS n,
           round(s.q1_raw, 2) AS q1,
           round(s.q3_raw, 2) AS q3,
           CAST(sum(CASE WHEN l.l_extendedprice <
                              s.q1_raw - 1.5 * (s.q3_raw - s.q1_raw)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(sum(CASE WHEN l.l_extendedprice >
                              s.q3_raw + 1.5 * (s.q3_raw - s.q1_raw)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM lineitem l
    JOIN s USING (l_returnflag, l_linestatus)
    GROUP BY l.l_returnflag, l.l_linestatus, s.q1_raw, s.q3_raw
    """,
)
def q_outlier_iqr_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Tukey-fence outlier audit (`operators.aggregates.
    outlier_iqr_per_group`, exact tier): values strictly outside
    ``[q1 − 1.5·iqr, q3 + 1.5·iqr]`` per (returnflag, linestatus) —
    the robust data-quality step moments can't provide, because means
    and stddevs are corrupted by the very outliers they would flag.

    Cross-engine determinism: Spark's exact ``percentile`` and DuckDB's
    ``quantile_cont`` compute the SAME linear interpolation on the same
    parquet doubles (verified bit-identical on this data), so the
    strict fence comparisons agree row-for-row without rounding games;
    only the REPORTED quartiles are 2dp-rounded. Two passes, both
    keyed on the same group columns: ``broadcast_stats=True`` is forced
    here because (returnflag, linestatus) is a known 6-group key — the
    stats rows land on pass 2's map side and the detail rows shuffle
    once (forcing also skips the auto mode's group-count probe, which
    would re-run the percentile pass). High-cardinality callers leave
    the default auto probe or pass ``False``. The ``exact=False`` tier
    swaps in ``percentile_approx`` for groups that outgrow a task at
    100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return outlier_iqr_per_group(
        li,
        "l_extendedprice",
        ["l_returnflag", "l_linestatus"],
        fence_k=1.5,
        broadcast_stats=True,
    )


# ---------------------------------------------------------------------------
# pmi_collocations — computed oracle over the real corpus: identical
# bigram/unigram count tables on both engines, identical PMI arithmetic
# order; membership is an integer count threshold, never a float test.
# ---------------------------------------------------------------------------

_PMI_MIN_PAIRS = 5


@register(
    "pmi_collocations",
    f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS.format(c='text')} AS t FROM documents),
    pr AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2
           FROM (SELECT unnest(list_transform(range(len(t) - 1),
                        i -> t[i+1] || ' ' || t[i+2])) AS g
                 FROM toks WHERE len(t) >= 2)),
    pair_c AS (SELECT w1, w2, count(*) AS pair_cnt FROM pr GROUP BY w1, w2),
    np AS (SELECT CAST(sum(pair_cnt) AS DOUBLE) AS np FROM pair_c),
    uni AS (SELECT tok, CAST(count(*) AS DOUBLE) AS uc
            FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
    nt AS (SELECT sum(uc) AS nt FROM uni)
    SELECT k.w1, k.w2, CAST(k.pair_cnt AS BIGINT) AS pair_cnt,
           round(ln((CAST(k.pair_cnt AS DOUBLE) / np.np)
                    / ((u1.uc / nt.nt) * (u2.uc / nt.nt))), 6) AS pmi
    FROM pair_c k JOIN uni u1 ON u1.tok = k.w1
                  JOIN uni u2 ON u2.tok = k.w2
                  CROSS JOIN np CROSS JOIN nt
    WHERE k.pair_cnt >= {_PMI_MIN_PAIRS}
    """,
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level collocation mining (`operators.ml.pmi_collocations`):
    pointwise mutual information of adjacent token pairs — the
    vocabulary/tokenizer-audit step that surfaces multiword units
    before committing a merge table, and the corpus-level dual of
    ``bigram_lm_score``'s per-document fluency score.

    Driver-stability: output membership is ``pair_cnt >= 5`` — an
    integer threshold — and the PMI value itself is ``ln`` of a ratio
    of counts with identical arithmetic order on both engines,
    6dp-rounded (the ln discipline ``text_unigram_logprob`` pins).
    Scale shape: pair counts shuffle once (map-side combined) and the
    threshold shrinks the pair table BEFORE the vocabulary-sized
    unigram joins; the two 1-row totals broadcast."""
    d = load_table(spark, sf_dir, "documents")
    from ..operators.ml import pmi_collocations

    return pmi_collocations(d, "text", "doc_id", min_pair_count=_PMI_MIN_PAIRS)


# ---------------------------------------------------------------------------
# temperature_mixture — computed oracle over the real corpus: one
# rows-per-source aggregate, then the α-sampling arithmetic.
# ---------------------------------------------------------------------------

_TEMP_ALPHA = 0.3


@register(
    "temperature_mixture",
    f"""
    WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_tokens
               FROM documents GROUP BY source)
    SELECT source, n_tokens,
           round(CAST(n_tokens AS DOUBLE)
                 / sum(CAST(n_tokens AS DOUBLE)) OVER (), 6) AS raw_share,
           round(pow(CAST(n_tokens AS DOUBLE), {_TEMP_ALPHA})
                 / sum(pow(CAST(n_tokens AS DOUBLE), {_TEMP_ALPHA})) OVER (), 6)
             AS temp_share,
           round((pow(CAST(n_tokens AS DOUBLE), {_TEMP_ALPHA})
                  / sum(pow(CAST(n_tokens AS DOUBLE), {_TEMP_ALPHA})) OVER ())
                 / (CAST(n_tokens AS DOUBLE)
                    / sum(CAST(n_tokens AS DOUBLE)) OVER ()), 6) AS boost
    FROM s
    """,
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (`operators.sampling.
    temperature_mixture_weights`, α = 0.3): ``w_i = n_i^α / Σ n_j^α`` —
    the multilingual α-sampling rule that lifts low-resource sources
    without letting any source dominate; the weight-DERIVATION step in
    front of ``token_mixture``'s epoch budgeting.

    Scale shape: ONE map-side-combined aggregate reduces the corpus to
    a rows-per-source frame; the window arithmetic runs over that tiny
    frame only. Cross-engine: ``pow``/division/ln-free shares rounded
    6dp (both engines compute the same IEEE arithmetic on the same
    integer token sums)."""
    d = load_table(spark, sf_dir, "documents")
    from ..operators.sampling import temperature_mixture_weights

    return temperature_mixture_weights(
        d, source_col="source", token_col="n_chars", alpha=_TEMP_ALPHA
    )


# ---------------------------------------------------------------------------
# mixture_drift — computed oracle over two deterministic snapshots of
# the real corpus (doc_id parity halves); identical arithmetic order,
# CASE-guarded 0·ln(0) limit terms on both engines.
# ---------------------------------------------------------------------------


@register(
    "mixture_drift",
    """
    WITH b AS (SELECT source AS key, CAST(sum(CAST(n_chars AS DOUBLE)) AS DOUBLE) AS n_base
               FROM documents WHERE doc_id % 2 = 0 GROUP BY source),
    c AS (SELECT source AS key, CAST(sum(CAST(n_chars AS DOUBLE)) AS DOUBLE) AS n_cur
          FROM documents WHERE doc_id % 2 = 1 GROUP BY source),
    j AS (SELECT coalesce(b.key, c.key) AS key,
                 coalesce(b.n_base, 0.0) AS n_base,
                 coalesce(c.n_cur, 0.0) AS n_cur
          FROM b FULL OUTER JOIN c ON b.key IS NOT DISTINCT FROM c.key),
    s AS (SELECT key, n_base, n_cur,
                 n_base / sum(n_base) OVER () AS p,
                 n_cur / sum(n_cur) OVER () AS q
          FROM j)
    SELECT key, round(n_base, 6) AS n_base,
           round(n_cur, 6) AS n_cur,
           round(p, 6) AS p_share, round(q, 6) AS q_share,
           round(0.5 * (CASE WHEN p > 0
                             THEN p * ln(p / ((p + q) / 2.0))
                             ELSE 0.0 END)
               + 0.5 * (CASE WHEN q > 0
                             THEN q * ln(q / ((p + q) / 2.0))
                             ELSE 0.0 END), 6) AS js_contrib
    FROM s
    """,
)
def q_mixture_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture drift monitor (`operators.aggregates.
    mixture_drift`): per source, the token-weighted share of a baseline
    snapshot vs the current one, and that source's contribution to the
    Jensen–Shannon divergence between the mixtures — the data-drift
    alarm a pipeline runs before a refreshed corpus replaces the one
    the last model trained on. JS, not KL: a source present in only one
    snapshot must contribute a FINITE penalty.

    The two snapshots here are the doc_id parity halves of the real
    corpus — deterministic, sf-independent, and both sides pay a real
    map-side-combined aggregate at bench scale; everything after the
    two rows-per-source aggregates (full-outer align, window totals,
    JS arithmetic) runs on source-cardinality frames only. The
    CASE-guarded 0·ln(0)=0 limit terms and the arithmetic order are
    mirrored exactly in the oracle; shares and contributions are
    6dp-rounded (the established cross-engine ln discipline)."""
    from ..operators.aggregates import mixture_drift

    d = load_table(spark, sf_dir, "documents")
    return mixture_drift(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        key_col="source",
        weight_col="n_chars",
    )


# ---------------------------------------------------------------------------
# corr_profile — computed oracle over the real corpus: DuckDB's corr()
# (stable covariance updates) vs the one-pass moment form, agreeing at
# the repo's 6dp rounding on every pair.
# ---------------------------------------------------------------------------


@register(
    "corr_profile",
    """
    WITH pairs(col_a, col_b) AS (VALUES
      ('l_quantity', 'l_extendedprice'),
      ('l_quantity', 'l_discount'),
      ('l_extendedprice', 'l_discount')
    )
    SELECT p.col_a, p.col_b,
           CAST(CASE p.col_a || '|' || p.col_b
             WHEN 'l_quantity|l_extendedprice' THEN
               (SELECT count(*) FROM lineitem
                WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL)
             WHEN 'l_quantity|l_discount' THEN
               (SELECT count(*) FROM lineitem
                WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL)
             ELSE
               (SELECT count(*) FROM lineitem
                WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL)
           END AS BIGINT) AS n_pairs,
           round(CASE p.col_a || '|' || p.col_b
             WHEN 'l_quantity|l_extendedprice' THEN
               (SELECT corr(l_quantity, l_extendedprice) FROM lineitem)
             WHEN 'l_quantity|l_discount' THEN
               (SELECT corr(l_quantity, l_discount) FROM lineitem)
             ELSE
               (SELECT corr(l_extendedprice, l_discount) FROM lineitem)
           END, 6) AS corr
    FROM pairs p
    """,
)
def q_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass pairwise Pearson profile (`operators.aggregates.
    corr_matrix`) over lineitem's numeric measures — which features are
    redundant, which leak; the built-in ``df.stat.corr`` costs one JOB
    per pair, this costs one corpus scan for the whole matrix.

    Cross-engine: DuckDB's ``corr()`` (stable covariance updates) and
    the one-pass moment form agree at 6dp on this data (the moment
    form's cancellation error is ~1e-14 relative at these magnitudes —
    far below the rounding grain; the operator docstring records when
    to center first). Constant columns would report NULL on both
    engines — Spark via try_divide, DuckDB via corr's own NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    from ..operators.aggregates import corr_matrix

    return corr_matrix(li, ["l_quantity", "l_extendedprice", "l_discount"])
