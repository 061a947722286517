"""Staged end-to-end training-corpus build.

``corpus_prep_pipeline`` (queries/llmops.py) proves the gate→dedup→
chunk→pack flow composes into ONE declarative plan. This module is the
PRODUCTION shape of the same flow: each stage materializes to Parquet
under ``out_dir`` so a 100 TB run is restartable per stage, inspectable
between stages, and each stage's shuffle graph stays small enough for
AQE to plan well; a manifest records per-stage row counts so corpus
yield (what fraction survived each filter) is first-class.

Stages (all built from the repo's operators — nothing new semantically):

0a. ``00a_html``     — OPTIONAL (``extract_html``): markup → visible
                       text (functions/html.py — block-content removal,
                       break-tag line structure, entity decode; exact
                       stdlib entities when ``extract_html="exact"``),
                       the step between a raw crawl and everything
                       else; ``n_chars`` recomputed.
0. ``00_encoding``   — OPTIONAL (``encoding_normalize``): unicode/
                       mojibake hygiene (functions/encoding.py) so
                       logically-equal spellings hash equal in every
                       later stage; "codegen" = map-only literal/regexp
                       chain, "exact" = Arrow roundtrip repair + NFC.
                       ``n_chars`` recomputed from the cleaned text.
0b. ``00b_lines``    — OPTIONAL (``line_dedup`` /
                       ``line_boilerplate_min_docs``): sub-document
                       hygiene (operators/lines.py) — within-doc line
                       dedup and cross-doc boilerplate-line removal
                       (optionally scoped per ``line_boilerplate_scope``)
                       before any hash-based stage; text never shuffles;
                       ``n_chars`` recomputed.
0c. ``00c_urldedup`` — OPTIONAL (``url_dedup_col``): one keeper per
                       canonical URL (operators/curation.py) before any
                       content hashing pays for refetched spellings.
1. ``01_gated``      — quality gate: length + stopword-ratio heuristics.
1b. ``01b_hostcap``  — OPTIONAL (``host_col`` + ``max_docs_per_host`` /
                       ``host_blocklist``): registrable-domain blocklist
                       and a seeded deterministic per-domain doc cap
                       (operators/curation.py, two-phase skew shape).
2. ``02_deduped``    — exact dedup (md5 keep-first), then MinHash-LSH
                       near-dup clusters closed via connected components,
                       keeping the smallest doc_id per cluster — or the
                       HIGHEST-scoring member when
                       ``dedup_keep_score_col`` names a quality column
                       (keep the better copy, not the first-crawled).
2b. ``02b_passage``  — OPTIONAL (``passage_dedup``): "drop" removes
                       docs whose verbatim-shared-passage fraction
                       (content-defined anchors, operators/dedup)
                       exceeds ``max_passage_dup_fraction``; "cut"
                       splices shared passages out of every doc except
                       one keeper and re-applies the min_chars gate —
                       boilerplate handling document dedup cannot give.
3. ``03_decontam``   — drop docs sharing any 5-gram with the holdout
                       (broadcast holdout, one hash join).
3b. ``03b_semantic`` — OPTIONAL (``holdout_embeddings`` +
                       ``doc_embeddings``): drop docs within
                       ``semantic_threshold`` cosine of any holdout
                       embedding (banded cross-frame LSH + exact
                       verify) — catches paraphrased benchmark items
                       the 5-gram join cannot see.
4. ``04_mixed``      — per-source mix resample to target ppm weights
                       (deterministic md5 bucket, zero shuffles).
4a. ``04a_quality``  — OPTIONAL (``quality_scores`` +
                       ``quality_keep_ppm``): thin each score-quantile
                       bucket at its own ppm rate (drop the worst,
                       thin the middle, keep the best whole) — the
                       QUALITY counterpart of the source mix;
                       ``quality_boundaries`` reuses edges fitted on
                       another snapshot.
4b. ``04b_sampled``  — OPTIONAL (``sample_n``): fixed-size weighted draw
                       (Efraimidis–Spirakis, operators/sampling.py) when
                       the budget is "n documents, favor weight" rather
                       than a per-source fraction. Shuffle-free top-n.
5. ``05_chunks``     — sliding-window token chunks (``chunk_mode=
                       "window"``) or boundary-respecting paragraph
                       packing (``chunk_mode="paragraph"``,
                       operators/lines.py), token-budget packed
                       into bins, written COMPACTED (sources.files.
                       compact_write) — the artifact a tokenizer reads.
5b. ``05b_shards``   — OPTIONAL (``tar_shard_rows``): re-export the
                       packed chunks as WebDataset-style tar shards
                       (sources.files.write_tar_shards) — the format a
                       sequential training loader streams; reads the
                       STAGED chunk parquet, so the heavy chunk/pack
                       plan never re-runs. ``shard_shuffle_seed``
                       applies a deterministic global training-order
                       shuffle (operators.sampling.
                       seeded_global_shuffle) first — re-seedable per
                       epoch from the same staged chunks.
6. ``06_tokenizer``  — OPTIONAL (``bpe_merges``): fit a BPE merge list
                       on the SAME corpus the chunks came from
                       (operators/bpe.py) and persist it next to the
                       chunks, so the tokenizer and the data it will
                       tokenize ship together.

Each stage reads the previous stage's Parquet, so reruns of a later
stage never recompute earlier ones — the restartability that a single
fused plan cannot give at scale.

``build_corpus_increment`` is the DAILY-DELTA complement: the same
gates over today's crawl increment only, with the accumulated corpus
participating solely through its MinHash signature store
(``pipelines/dedup_store.py``) and one versioned snapshot append
(``sources/versioned.py``) — increment-sized cost per day instead of a
full rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import encoding as Enc
from ..functions import text as Tx
from ..operators.bpe import bpe_train, merges_df, word_freqs
from ..operators.dedup import exact_dedup, minhash_lsh_pairs
from ..operators.graph import connected_components
from ..operators.sampling import weighted_sample
from ..sources.files import compact_write


def _cluster_keepers(
    comps: DataFrame, docs: DataFrame, score_col: str | None
) -> DataFrame:
    """One keeper doc_id per near-dup component. Default: smallest id
    (deterministic, content-blind). With `score_col` (a quality column
    on the docs frame — perplexity rank, classifier score), the keeper
    is the HIGHEST-scoring member (ties -> smallest id): when a cluster
    holds a clean original and a boilerplate-wrapped mirror, min-id
    keeps whichever crawled first; score-keep keeps the better copy.

    Aggregate shape (`min_by` over (-score, id)) — map-side combinable,
    no per-component window, so a boilerplate mega-cluster can't melt a
    task."""
    if score_col is None:
        return comps.groupBy("component").agg(F.min("id").alias("doc_id"))
    scored = comps.join(
        docs.select(
            F.col("doc_id").alias("id"),
            F.col(score_col).cast("double").alias("__s"),
        ),
        "id",
    )
    # min_by over (-score, id): struct order is ascending — highest
    # score first, then SMALLEST id. The id participates in its native
    # ordering (never negated/cast), so string doc ids work; a max_by
    # with -id would CAST_INVALID_INPUT under ANSI on non-numeric ids.
    return scored.groupBy("component").agg(
        F.min_by(
            "id", F.struct((-F.col("__s")).alias("ns"), F.col("id").alias("i"))
        ).alias("doc_id")
    )


def _stage(df: DataFrame, out_dir: str, name: str) -> tuple[DataFrame, int]:
    """Write a stage and return (reloaded frame, row count). The count
    comes from an observed metric collected DURING the write action —
    one scan per stage, not write-then-count (at 100 TB the saved second
    pass per stage is the difference between 5 and 10 full reads)."""
    path = os.path.join(out_dir, name)
    obs = Observation(name)
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "overwrite"
    ).parquet(path)
    return df.sparkSession.read.parquet(path), int(obs.get["rows"])


def build_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    holdout: DataFrame | None = None,
    holdout_embeddings: DataFrame | None = None,
    doc_embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.95,
    quality_scores: DataFrame | None = None,
    quality_keep_ppm: list[int] | None = None,
    quality_boundaries: list[float] | None = None,
    min_chars: int = 100,
    extract_html: bool | str = False,
    dedup_keep_score_col: str | None = None,
    url_dedup_col: str | None = None,
    line_dedup: bool = False,
    line_boilerplate_min_docs: int | None = None,
    line_boilerplate_scope: str | None = None,
    host_col: str | None = None,
    max_docs_per_host: int | None = None,
    host_blocklist=None,
    mix_ppm: dict[str, int] | None = None,
    near_dup_threshold: float = 0.5,
    encoding_normalize: str | None = None,
    passage_dedup: str | None = None,
    max_passage_dup_fraction: float = 0.5,
    passage_window: int = 50,
    passage_stride: int = 10,
    sample_n: int | None = None,
    sample_weight: str = "n_chars",
    bpe_merges: int | None = None,
    tar_shard_rows: int | None = None,
    shard_shuffle_seed: str | None = None,
    chunk_mode: str = "window",
    chunk_tokens: int = 50,
    chunk_stride: int = 40,
    pack_budget: int = 500,
    rows_per_file: int = 1_000_000,
) -> dict:
    """Run the five stages over ``docs`` (doc_id, source, text, n_chars);
    ``holdout`` carries a ``text`` column of benchmark documents whose
    5-grams must not leak into training data. Returns the manifest:
    per-stage paths and row counts."""
    if (max_docs_per_host is not None or host_blocklist is not None) and (
        host_col is None
    ):
        raise ValueError(
            "host curation (max_docs_per_host / host_blocklist) "
            "requires host_col"
        )

    manifest: dict = {"out_dir": out_dir, "stages": {}}

    def record(name: str, df: DataFrame) -> DataFrame:
        staged, rows = _stage(df, out_dir, name)
        manifest["stages"][name] = {
            "path": os.path.join(out_dir, name),
            "rows": rows,
        }
        return staged

    # 0a — OPTIONAL HTML extraction (``extract_html``): raw crawl pages
    # become visible text before any text-grain stage; True = codegen
    # entity chain, "exact" = full stdlib entity decode (one Arrow pass).
    if extract_html:
        from ..functions.html import html_to_text

        if extract_html not in (True, "exact"):
            raise ValueError(
                f"extract_html must be False, True, or 'exact'; "
                f"got {extract_html!r}"
            )
        docs = record(
            "00a_html",
            docs.withColumn(
                "text",
                html_to_text(
                    F.col("text"), exact_entities=extract_html == "exact"
                ),
            ).withColumn("n_chars", F.length("text")),
        )

    # 0 — OPTIONAL encoding hygiene (``encoding_normalize``): unify the
    # physical spellings of logically-equal text BEFORE any hash-based
    # stage sees it — mojibake, zero-width characters, and unicode space
    # flavors otherwise make exact-dup md5s, minhash shingles, and
    # decontam 5-grams miss equal documents. "codegen" is the map-only
    # literal/regexp chain (zero Python); "exact" adds the Arrow
    # roundtrip repair + NFC compose (functions/encoding.py).
    # ``n_chars`` is recomputed — downstream gates and sampling weights
    # must see the cleaned lengths.
    if encoding_normalize is not None:
        if encoding_normalize == "codegen":
            cleaned_text = Enc.clean_text(F.col("text"))
        elif encoding_normalize == "exact":
            cleaned_text = Enc.clean_text_exact(F.col("text"))
        else:
            raise ValueError(
                "encoding_normalize must be None, 'codegen', or 'exact'; "
                f"got {encoding_normalize!r}"
            )
        docs = record(
            "00_encoding",
            docs.withColumn("text", cleaned_text).withColumn(
                "n_chars", F.length("text")
            ),
        )

    # 0b — OPTIONAL line hygiene (``line_dedup`` /
    # ``line_boilerplate_min_docs``): sub-document cleanup BEFORE any
    # hash-based stage — nav menus and footers repeated across pages
    # otherwise survive document dedup (the surrounding article differs)
    # and poison shingles/5-grams. Within-doc line dedup plus, when
    # ``line_boilerplate_min_docs`` is set, removal of lines shared by
    # that many distinct docs (scoped per ``line_boilerplate_scope``
    # column — e.g. source/host — when given). Document text never
    # shuffles (operators/lines.py); ``n_chars`` recomputed.
    if line_dedup or line_boilerplate_min_docs is not None:
        from ..operators import lines as Ln

        cleaned = docs
        if line_dedup:
            cleaned = Ln.dedupe_lines_within_doc(
                cleaned, id_col="doc_id", text_col="text"
            ).drop("lines_deduped")
        if line_boilerplate_min_docs is not None:
            cleaned = Ln.drop_boilerplate_lines(
                cleaned,
                id_col="doc_id",
                text_col="text",
                min_docs=line_boilerplate_min_docs,
                group_col=line_boilerplate_scope,
            ).drop("lines_boilerplated")
        docs = record(
            "00b_lines", cleaned.withColumn("n_chars", F.length("text"))
        )

    # 0c — OPTIONAL URL-level dedup (``url_dedup_col``): the same page
    # refetched under different URL spellings collapses to one keeper
    # BEFORE any content hashing pays for it (operators/curation.py —
    # the first dedup tier of a real crawl pipeline).
    if url_dedup_col is not None:
        from ..operators.curation import dedup_by_canonical_url

        docs = record(
            "00c_urldedup",
            dedup_by_canonical_url(docs, url_col=url_dedup_col, id_col="doc_id"),
        )

    # 1 — quality gate (cheap, codegen-only; runs first so every later
    # stage sees less data)
    toks = Tx.tokens(F.col("text"))
    gated = record(
        "01_gated",
        docs.filter(
            (F.col("n_chars") >= min_chars) & (F.size(toks) > 0)
        ),
    )

    # 1b — OPTIONAL host curation (``host_col``): registrable-domain
    # blocklist, then a seeded deterministic cap of docs per domain
    # (two-phase: only over-cap zipf-head hosts pay the rank window —
    # operators/curation.py). After 01 so the cap counts only docs that
    # survived the cheap gate.
    if max_docs_per_host is not None or host_blocklist is not None:
        from ..operators import curation as Cu

        curated = gated
        if host_blocklist is not None:
            curated = Cu.filter_blocked_hosts(
                curated, host_blocklist, host_col=host_col
            )
        if max_docs_per_host is not None:
            curated = Cu.cap_docs_per_host(
                curated,
                id_col="doc_id",
                max_docs=max_docs_per_host,
                host_col=host_col,
            )
        gated = record("01b_hostcap", curated)

    # 2 — exact dedup, then near-dup clusters keep-one
    keep_exact = exact_dedup(gated, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    exact_kept = gated.join(keep_exact, "doc_id")
    pairs = minhash_lsh_pairs(
        exact_kept, "text", "doc_id", threshold=near_dup_threshold, eager=False
    )
    comps = connected_components(
        exact_kept.select(F.col("doc_id").alias("id")),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
    )
    keep_nd = _cluster_keepers(comps, exact_kept, dedup_keep_score_col)
    deduped = record(
        "02_deduped", exact_kept.join(keep_nd.select("doc_id"), "doc_id")
    )

    # 2b — OPTIONAL passage-level dedup: document dedup keeps distinct
    # docs even when they share verbatim boilerplate. Two modes
    # (operators/dedup, content-defined anchors):
    #   "drop" — docs whose duplicated-passage fraction exceeds
    #            max_passage_dup_fraction are removed outright;
    #   "cut"  — shared passages are SPLICED OUT of every doc except one
    #            keeper (the corpus retains exactly one boilerplate
    #            copy), then the min_chars gate re-applies to the
    #            trimmed text so husks don't flow downstream.
    if passage_dedup is not None:
        if passage_dedup == "drop":
            from ..operators.dedup import duplicated_passage_fraction

            pf = duplicated_passage_fraction(
                deduped,
                "text",
                "doc_id",
                window=passage_window,
                stride=passage_stride,
            )
            keep_pf = pf.filter(
                F.col("dup_fraction") <= max_passage_dup_fraction
            ).select("doc_id")
            deduped = record("02b_passage", deduped.join(keep_pf, "doc_id"))
        elif passage_dedup == "cut":
            from ..operators.dedup import cut_duplicated_passages

            trimmed = cut_duplicated_passages(
                deduped,
                "text",
                "doc_id",
                window=passage_window,
                stride=passage_stride,
            )
            meta_cols = [
                c for c in deduped.columns if c not in ("text", "n_chars")
            ]
            deduped = record(
                "02b_passage",
                deduped.select(*meta_cols)
                .join(trimmed.drop("n_cut_chars"), "doc_id")
                .withColumn("n_chars", F.length("text"))
                .filter(F.col("n_chars") >= min_chars),
            )
        else:
            raise ValueError(
                f"passage_dedup must be None, 'drop', or 'cut'; "
                f"got {passage_dedup!r}"
            )

    # 3 — decontamination against the holdout's 5-grams (holdout is
    # benchmark-sized → broadcast; one semi-join, corpus never reshuffles)
    if holdout is not None:
        # codegen map-only gram explode (9x the interpreted
        # word_shingles form on the corpus side, r10); non-distinct
        # grams are safe: both consumers dedup (hold side .distinct(),
        # doc side joins then .distinct() on doc_id)
        grams5 = lambda c: Tx.word_ngrams_fast(c, 5)  # noqa: E731
        hold_grams = (
            holdout.select(F.explode(grams5(F.col("text"))).alias("gram"))
            .distinct()
        )
        doc_grams = deduped.select(
            "doc_id", F.explode(grams5(F.col("text"))).alias("gram")
        )
        contaminated = (
            doc_grams.join(F.broadcast(hold_grams), "gram")
            .select("doc_id")
            .distinct()
        )
        clean = deduped.join(contaminated, "doc_id", "left_anti")
    else:
        clean = deduped
    clean = record("03_decontam", clean)

    # 3b — OPTIONAL SEMANTIC decontamination: paraphrased benchmark
    # items share no 5-gram with the holdout but sit close in embedding
    # space; the banded cross-frame LSH (operators/dedup.
    # decontaminate_semantic) drops docs within ``semantic_threshold``
    # cosine of any holdout embedding. ``doc_embeddings`` carries
    # (doc_id, embedding) for the corpus, ``holdout_embeddings``
    # (doc_id, embedding) for the benchmark set; the corpus-side cost
    # is one map-only Arrow key pass + one narrow-key shuffle.
    if holdout_embeddings is not None:
        if doc_embeddings is None:
            raise ValueError(
                "holdout_embeddings given without doc_embeddings — the "
                "semantic gate needs an embedding per surviving doc"
            )
        from ..operators.dedup import decontaminate_semantic

        survivors = decontaminate_semantic(
            clean.select("doc_id").join(doc_embeddings, "doc_id"),
            holdout_embeddings,
            vec_col="embedding",
            id_col="doc_id",
            threshold=semantic_threshold,
        )
        clean = record(
            "03b_semantic", clean.join(survivors.select("doc_id"), "doc_id")
        )

    # 4 — source mix resample (deterministic md5 ppm bucket, map-side).
    # Uses the repo's canonical 8-hex-char h32 rule (functions/text.py,
    # fuzz-pinned vs hashlib in tests/test_property.py) — a shorter
    # prefix would both bias the modulo (16^6 is not a multiple of 1e6)
    # and diverge from corpus_mix_resample/sample_stratified membership.
    if mix_ppm:
        ppm = F.create_map(
            *[F.lit(x) for kv in mix_ppm.items() for x in kv]
        )[F.col("source")]
        bucket = Tx.h32(F.col("doc_id").cast("string")) % 1_000_000
        mixed = clean.filter(bucket < F.coalesce(ppm, F.lit(1_000_000)))
    else:
        mixed = clean
    mixed = record("04_mixed", mixed)

    # 4a — OPTIONAL quality pacing: thin each score-quantile bucket at
    # its own ppm rate (operators/sampling.quality_stratified_resample —
    # drop the worst, thin the middle, keep the best whole). Scores
    # arrive as a (doc_id, score) frame — produced by any scorer
    # (bigram_logprob, apply_text_quality_filter, an external model);
    # docs without a score are dropped by the operator's NULL rule, so
    # the join here is inner by construction.
    if quality_keep_ppm is not None:
        if quality_scores is None:
            raise ValueError(
                "quality_keep_ppm given without quality_scores — the "
                "quality gate needs a score per surviving doc"
            )
        from ..operators.sampling import quality_stratified_resample

        paced = quality_stratified_resample(
            mixed.join(quality_scores, "doc_id"),
            "score",
            "doc_id",
            quality_keep_ppm,
            boundaries=quality_boundaries,
        )
        mixed = record(
            "04a_quality", paced.drop("score", "quality_bucket")
        )

    # 4b — optional fixed-size weighted draw on top of the mix: the mix
    # stage shapes the SOURCE proportions, this stage caps the absolute
    # document budget, favoring high-weight docs (es_key is the audit
    # trail of the draw; dropped before staging)
    if sample_n is not None:
        mixed = record(
            "04b_sampled",
            weighted_sample(
                mixed, sample_n, sample_weight, "doc_id", seed="corpus"
            ).drop("es_key"),
        )

    # 5 — chunk + pack + compacted write. Two chunking modes:
    # "window" (default) — sliding token windows of ``chunk_tokens`` at
    # ``chunk_stride`` (overlap = pretraining shape); "paragraph" —
    # boundary-respecting greedy packing of consecutive paragraphs into
    # ≤ chunk_tokens chunks (operators/lines.paragraph_chunks — the
    # SFT/RAG shape that never cuts mid-sentence; oversize paragraphs
    # overshoot visibly rather than tearing). Both emit the same
    # (doc_id, source, chunk_idx, chunk: array<token>) schema into the
    # pack window.
    if chunk_mode == "paragraph":
        from ..operators.lines import paragraph_chunks

        chunks = paragraph_chunks(
            mixed,
            id_col="doc_id",
            text_col="text",
            budget_tokens=chunk_tokens,
            carry_cols=("source",),
        ).select(
            # same token rule as window mode (Tx.tokens: lowercased
            # alnum) so the 05_chunks artifact has ONE vocabulary across
            # chunk modes; the operator's whitespace counts governed the
            # packing BUDGET, the stage's tokens define the ARTIFACT
            "doc_id",
            "source",
            "chunk_idx",
            Tx.tokens(F.col("chunk_text")).alias("chunk"),
        )
    elif chunk_mode == "window":
        t = mixed.select("doc_id", "source", Tx.tokens(F.col("text")).alias("t"))
        sized = t.withColumn("n", F.size("t")).filter(F.col("n") > 0)
        n_chunks = F.floor(
            (F.greatest(F.col("n") - chunk_tokens, F.lit(0)) + chunk_stride - 1)
            / chunk_stride
        ) + 1
        chunks = sized.select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
            "t",
        ).select(
            "doc_id",
            "source",
            "chunk_idx",
            F.slice(
                F.col("t"), F.col("chunk_idx") * chunk_stride + 1, chunk_tokens
            ).alias("chunk"),
        )
    else:
        raise ValueError(
            f"chunk_mode must be 'window' or 'paragraph'; got {chunk_mode!r}"
        )
    w = Window.partitionBy("source").orderBy("doc_id", "chunk_idx")
    packed = chunks.withColumn("chunk_tokens", F.size("chunk")).withColumn(
        "bin_id",
        F.floor(
            (
                F.sum("chunk_tokens").over(w) - F.col("chunk_tokens")
            )
            / pack_budget
        ).cast("long"),
    )
    # the chunk+pack plan (two windows + explode) is the heaviest in the
    # pipeline — run it exactly ONCE: stage it with an observed count,
    # then compact FROM the staged parquet (a cheap columnar rescan, not
    # a recompute) with the known row count, and drop the raw staging
    # (Hadoop FS delete: out_dir may be s3a://hdfs://, where a
    # driver-local rmtree silently leaves the corpus-sized staging)
    def _fs_delete(path: str) -> None:
        jvm = spark._jvm
        jp = jvm.org.apache.hadoop.fs.Path(path)
        jp.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jp, True)

    raw_path = os.path.join(out_dir, "05_chunks_raw")
    obs = Observation("05_chunks")
    packed.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "overwrite"
    ).parquet(raw_path)
    n_rows = int(obs.get["rows"])
    final_path = os.path.join(out_dir, "05_chunks")
    n_files = compact_write(
        spark.read.parquet(raw_path),
        final_path,
        target_rows_per_file=rows_per_file,
        n_rows=n_rows,
    )
    _fs_delete(raw_path)
    manifest["stages"]["05_chunks"] = {
        "path": final_path,
        "rows": n_rows,
        "files": n_files,
    }

    # 5b — optional tar-shard delivery of the packed chunks (reads the
    # staged parquet; the chunk/pack plan never re-runs)
    if tar_shard_rows is not None:
        from ..sources.files import write_tar_shards

        chunks_staged = spark.read.parquet(final_path)
        keyed = chunks_staged.select(
            F.concat_ws("-", "doc_id", "chunk_idx").alias("key"),
            F.concat_ws(" ", "chunk").alias("body"),
        )
        if shard_shuffle_seed is not None:
            # deterministic global training-order shuffle: shard
            # membership and within-shard order become a pure function
            # of (key, seed) — reproducible across reruns, re-seedable
            # per epoch from the same staged chunks
            from ..operators.sampling import seeded_global_shuffle

            keyed = seeded_global_shuffle(keyed, "key", seed=shard_shuffle_seed)
        else:
            keyed = keyed.sortWithinPartitions("key")
        shard_dir = os.path.join(out_dir, "05b_shards")
        # every other stage overwrites; tar shards are appended files,
        # so a rerun must clear stale shards or read_tar_shards would
        # mix two generations into the delivery
        _fs_delete(shard_dir)
        shard_manifest = write_tar_shards(
            keyed, shard_dir, "key", {"txt": "body"}, shard_rows=tar_shard_rows
        ).collect()
        manifest["stages"]["05b_shards"] = {
            "path": shard_dir,
            "rows": sum(r["rows"] for r in shard_manifest),
            "files": len(shard_manifest),
        }

    # 6 — optional tokenizer fit on the corpus the chunks came from, so
    # the merge list ships with the data it will tokenize (the fit reads
    # the STAGED parquet of the final doc set — restartable like every
    # other stage, and never recomputes the upstream filters)
    if bpe_merges is not None:
        merges = bpe_train(word_freqs(mixed, "text"), n_merges=bpe_merges)
        tok_path = os.path.join(out_dir, "06_tokenizer")
        merges_df(spark, merges).write.mode("overwrite").parquet(tok_path)
        manifest["stages"]["06_tokenizer"] = {
            "path": tok_path,
            "rows": len(merges),
        }
    return manifest


def build_corpus_increment(
    spark: SparkSession,
    new_docs: DataFrame,
    out_dir: str,
    store_dir: str,
    corpus_dir: str,
    holdout: DataFrame | None = None,
    holdout_embeddings: DataFrame | None = None,
    doc_embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.95,
    embedding_store_dir: str | None = None,
    embedding_dup_threshold: float = 0.999,
    embedding_probe_flips: int = 0,
    quality_scores: DataFrame | None = None,
    quality_keep_ppm: list[int] | None = None,
    quality_boundaries: list[float] | None = None,
    min_chars: int = 100,
    near_dup_threshold: float = 0.5,
    dedup_keep_score_col: str | None = None,
    extract_html: bool | str = False,
    encoding_normalize: str | None = None,
    line_dedup: bool = False,
    line_boilerplate_min_docs: int | None = None,
    line_boilerplate_scope: str | None = None,
    url_dedup_col: str | None = None,
    host_blocklist=None,
    host_col: str | None = None,
    admit: bool = True,
    snapshot_label: str | None = None,
    retain_snapshots: int | None = None,
) -> dict:
    """The DAILY-DELTA corpus job: run ``new_docs`` (today's crawl
    increment) through the same gates as ``build_corpus`` WITHOUT
    re-reading the accumulated corpus — every stage's cost is
    increment-sized; the existing corpus participates only through its
    MinHash signature store (``pipelines/dedup_store.py``, band
    equi-join against increment signatures) and one snapshot append.

    Stage chain (manifest mirrors ``build_corpus``):

    - ``i00a_html``   — optional markup extraction, same modes as the
      full build's ``00a_html`` (the store's corpus must have been
      extracted the same way — shingles hash the visible text).
    - ``i00_encoding`` — optional hygiene, same modes as the full build
      (MUST match the mode the store was built with: the store holds
      shingle hashes of the NORMALIZED text).
    - ``i00b_lines``  — optional line hygiene (same knobs as the full
      build's ``00b_lines``; like encoding, it MUST match what the
      store's corpus saw — shingle hashes are of the cleaned text).
    - ``i00c_urldedup`` — optional within-increment URL dedup (a
      refetch of an ALREADY-STORED page that survives here is still
      killed by the content gate ``i03_store``, so no URL store is
      needed across increments).
    - ``i01_gated``    — min_chars + nonempty-token gate.
    - ``i01b_hostblock`` — optional registrable-domain blocklist
      (``host_blocklist`` + ``host_col``; stateless, so it composes
      daily). LIFETIME per-host caps need cross-increment state — that
      is ``streaming/jobs.run_host_cap_ingest_stream``'s counts-ledger
      job, not this one.
    - ``i02_dedup``    — WITHIN-increment exact dedup + MinHash-LSH
      near-dup clusters (keep min doc_id), the full build's policy.
    - ``i03_store``    — AGAINST-corpus dedup via the signature store:
      ``dedup_against_store`` candidates from the band equi-join, exact
      Jaccard verify on candidates only; exact cross-corpus dups are
      the Jaccard-1.0 subset, so one gate covers both tiers.
    - ``i03b_embedding`` — OPTIONAL (``embedding_store_dir`` +
      ``doc_embeddings``): AGAINST-corpus dedup at the EMBEDDING level
      through the banded hyperplane store
      (``embedding_dedup_against_store``) — paraphrase-grade dups
      share few shingles, so the MinHash gate can't see them;
      ``embedding_probe_flips`` adds query-side multi-probe recall
      without touching the store.
    - ``i04_decontam`` / ``i04b_semantic`` — the same holdout gates as
      the full build (benchmarks change rarely; re-gating the increment
      keeps NEW leaks out without touching old data).
    - ``i05_quality``  — quality pacing with EXPLICIT boundaries only:
      quantile edges must come from the snapshot the filter was fitted
      on (``quality_stratified_resample(boundaries=...)``); re-fitting
      edges per increment would let one day's score drift silently
      reshape the mix (raises if ``quality_keep_ppm`` arrives without
      ``quality_boundaries``).
    - admit survivors' signatures to the store (skippable via
      ``admit=False`` for a dry run) and COMMIT them as the next
      version of ``corpus_dir`` (``sources/versioned.write_snapshot``
      — manifest append is the commit point, crash-safe);
      ``retain_snapshots`` then expires all but the newest N versions
      (append-only tombstones — a daily job otherwise accretes one
      full increment copy per day forever).

    Id uniqueness vs the store is the caller's contract (as in
    ``admit_to_store``). Returns the manifest with per-stage rows plus
    ``admitted`` and ``snapshot_version``.
    """
    from ..sources.versioned import write_snapshot
    from .dedup_store import admit_to_store, dedup_against_store

    if host_blocklist is not None and host_col is None:
        raise ValueError("host_blocklist requires host_col")

    manifest: dict = {"out_dir": out_dir, "stages": {}}

    def record(name: str, df: DataFrame) -> DataFrame:
        staged, rows = _stage(df, out_dir, name)
        manifest["stages"][name] = {
            "path": os.path.join(out_dir, name),
            "rows": rows,
        }
        return staged

    if extract_html:
        from ..functions.html import html_to_text

        if extract_html not in (True, "exact"):
            raise ValueError(
                f"extract_html must be False, True, or 'exact'; "
                f"got {extract_html!r}"
            )
        new_docs = record(
            "i00a_html",
            new_docs.withColumn(
                "text",
                html_to_text(
                    F.col("text"), exact_entities=extract_html == "exact"
                ),
            ).withColumn("n_chars", F.length("text")),
        )

    if encoding_normalize is not None:
        if encoding_normalize == "codegen":
            cleaned_text = Enc.clean_text(F.col("text"))
        elif encoding_normalize == "exact":
            cleaned_text = Enc.clean_text_exact(F.col("text"))
        else:
            raise ValueError(
                "encoding_normalize must be None, 'codegen', or 'exact'; "
                f"got {encoding_normalize!r}"
            )
        new_docs = record(
            "i00_encoding",
            new_docs.withColumn("text", cleaned_text).withColumn(
                "n_chars", F.length("text")
            ),
        )

    if line_dedup or line_boilerplate_min_docs is not None:
        from ..operators import lines as Ln

        cleaned = new_docs
        if line_dedup:
            cleaned = Ln.dedupe_lines_within_doc(
                cleaned, id_col="doc_id", text_col="text"
            ).drop("lines_deduped")
        if line_boilerplate_min_docs is not None:
            cleaned = Ln.drop_boilerplate_lines(
                cleaned,
                id_col="doc_id",
                text_col="text",
                min_docs=line_boilerplate_min_docs,
                group_col=line_boilerplate_scope,
            ).drop("lines_boilerplated")
        new_docs = record(
            "i00b_lines", cleaned.withColumn("n_chars", F.length("text"))
        )

    if url_dedup_col is not None:
        from ..operators.curation import dedup_by_canonical_url

        new_docs = record(
            "i00c_urldedup",
            dedup_by_canonical_url(
                new_docs, url_col=url_dedup_col, id_col="doc_id"
            ),
        )

    toks = Tx.tokens(F.col("text"))
    gated = record(
        "i01_gated",
        new_docs.filter((F.col("n_chars") >= min_chars) & (F.size(toks) > 0)),
    )

    if host_blocklist is not None:
        from ..operators.curation import filter_blocked_hosts

        gated = record(
            "i01b_hostblock",
            filter_blocked_hosts(gated, host_blocklist, host_col=host_col),
        )

    # within-increment dedup: the store can't see today's docs yet, so
    # intra-batch dups need the full build's exact+near-dup policy
    keep_exact = exact_dedup(gated, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    exact_kept = gated.join(keep_exact, "doc_id")
    pairs = minhash_lsh_pairs(
        exact_kept, "text", "doc_id", threshold=near_dup_threshold, eager=False
    )
    comps = connected_components(
        exact_kept.select(F.col("doc_id").alias("id")),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
    )
    keep_nd = _cluster_keepers(comps, exact_kept, dedup_keep_score_col)
    deduped = record(
        "i02_dedup", exact_kept.join(keep_nd.select("doc_id"), "doc_id")
    )

    # against-corpus dedup through the signature store (increment-sized
    # band join; the corpus itself is never re-read)
    dups = dedup_against_store(
        spark,
        deduped,
        store_dir,
        threshold=near_dup_threshold,
    )
    fresh = record(
        "i03_store",
        deduped.join(dups.select("doc_id").distinct(), "doc_id", "left_anti"),
    )

    if embedding_store_dir is not None:
        if doc_embeddings is None:
            raise ValueError(
                "embedding_store_dir given without doc_embeddings — the "
                "embedding dedup gate needs a vector per increment doc"
            )
        from .dedup_store import embedding_dedup_against_store

        emb_dups = embedding_dedup_against_store(
            spark,
            fresh.select("doc_id").join(doc_embeddings, "doc_id"),
            embedding_store_dir,
            vec_col="embedding",
            id_col="doc_id",
            threshold=embedding_dup_threshold,
            probe_flips=embedding_probe_flips,
        )
        fresh = record(
            "i03b_embedding",
            fresh.join(
                emb_dups.select("doc_id").distinct(), "doc_id", "left_anti"
            ),
        )

    if holdout is not None:
        # codegen map-only gram explode (9x the interpreted
        # word_shingles form on the corpus side, r10); non-distinct
        # grams are safe: both consumers dedup (hold side .distinct(),
        # doc side joins then .distinct() on doc_id)
        grams5 = lambda c: Tx.word_ngrams_fast(c, 5)  # noqa: E731
        hold_grams = (
            holdout.select(F.explode(grams5(F.col("text"))).alias("gram"))
            .distinct()
        )
        doc_grams = fresh.select(
            "doc_id", F.explode(grams5(F.col("text"))).alias("gram")
        )
        contaminated = (
            doc_grams.join(F.broadcast(hold_grams), "gram")
            .select("doc_id")
            .distinct()
        )
        fresh = record(
            "i04_decontam", fresh.join(contaminated, "doc_id", "left_anti")
        )

    if holdout_embeddings is not None:
        if doc_embeddings is None:
            raise ValueError(
                "holdout_embeddings given without doc_embeddings — the "
                "semantic gate needs an embedding per surviving doc"
            )
        from ..operators.dedup import decontaminate_semantic

        survivors = decontaminate_semantic(
            fresh.select("doc_id").join(doc_embeddings, "doc_id"),
            holdout_embeddings,
            vec_col="embedding",
            id_col="doc_id",
            threshold=semantic_threshold,
        )
        fresh = record(
            "i04b_semantic", fresh.join(survivors.select("doc_id"), "doc_id")
        )

    if quality_keep_ppm is not None:
        if quality_scores is None:
            raise ValueError(
                "quality_keep_ppm given without quality_scores — the "
                "quality gate needs a score per surviving doc"
            )
        if quality_boundaries is None:
            raise ValueError(
                "incremental quality pacing needs EXPLICIT "
                "quality_boundaries (edges fitted on the reference "
                "snapshot) — refitting quantiles on one day's increment "
                "would silently reshape the mix"
            )
        from ..operators.sampling import quality_stratified_resample

        paced = quality_stratified_resample(
            fresh.join(quality_scores, "doc_id"),
            "score",
            "doc_id",
            quality_keep_ppm,
            boundaries=quality_boundaries,
        )
        fresh = record(
            "i05_quality", fresh.join(paced.select("doc_id"), "doc_id")
        )

    manifest["admitted"] = (
        admit_to_store(spark, fresh, store_dir) if admit else 0
    )
    if admit and embedding_store_dir is not None:
        from .dedup_store import admit_embeddings_to_store

        manifest["admitted_embeddings"] = admit_embeddings_to_store(
            spark,
            fresh.select("doc_id").join(doc_embeddings, "doc_id"),
            embedding_store_dir,
            vec_col="embedding",
            id_col="doc_id",
        )
    manifest["snapshot_version"] = write_snapshot(
        fresh, corpus_dir, label=snapshot_label
    )
    if retain_snapshots is not None:
        # a daily job otherwise accretes one full increment copy per
        # day forever; expiry is the same append-only tombstone commit
        # the snapshot itself uses (sources/versioned.expire_snapshots)
        from ..sources.versioned import expire_snapshots

        manifest["expired_snapshots"] = expire_snapshots(
            spark, corpus_dir, keep_last=retain_snapshots
        )
    return manifest
