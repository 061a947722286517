"""Host-aware corpus curation: per-host caps, blocklists, host stats.

Web corpora are wildly host-skewed (a handful of registrable domains
contribute most of the crawl), and the public curation recipes
(C4 / RefinedWeb / Gopher) all include a host layer: cap how many
documents any one domain contributes, drop blocklisted domains, and
report the host concentration so the mixture is auditable. This module
is that layer, keyed on `functions/urls.py` host extraction.

Reference scope note: no URL/host layer exists in the reference engine —
this is training-data-pipeline surface added per the build brief
(SURVEY.md §7.1.5), same tier as dedup/decontamination.

Scale shapes:
- `cap_docs_per_host` is ONE rank-limited window: `row_number() <=
  max_docs` per host subsumes the old two-phase under-/over-cap split
  (an under-cap host's every rank is <= its row count <= the cap), and
  the rank-<=-k filter shape lets Spark push a WindowGroupLimit below
  the exchange — each map task forwards at most max_docs rows per host,
  so the shuffle and sort carry less than the two-phase split (3 input
  derivations + 2 full-row join shuffles) ever avoided. Hostless rows
  rank in per-row singleton groups, which both exempts them and removes
  the shared '' pseudo-partition skew.
- `filter_blocked_hosts` broadcasts small lists as a literal IN (plan
  pushdown-able) and anti-joins DataFrame blocklists.
- `host_stats` is one aggregate + one small rollup; document text never
  shuffles (only per-host counters do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import h32
from ..functions.urls import (
    canonicalize_url,
    registrable_domain,
    registrable_domain_py,
    url_host,
    url_scheme,
)

_HOST = "__curation_host"


def _with_host(df: DataFrame, url_col: str | None, host_col: str | None) -> DataFrame:
    """Attach the registrable-domain grouping key from either a raw URL
    column or a pre-extracted host column (exactly one must be given).
    NULL / unparseable inputs normalize to the empty string — the
    HOSTLESS sentinel each operator must handle explicitly (they are
    one shared pseudo-key otherwise; `cap_docs_per_host` exempts them,
    `filter_blocked_hosts` can never block them, `host_stats` reports
    them as the '' row)."""
    if (url_col is None) == (host_col is None):
        raise ValueError("pass exactly one of url_col / host_col")
    src = url_host(F.col(url_col)) if url_col else F.col(host_col)
    return df.withColumn(
        _HOST, F.coalesce(registrable_domain(F.lower(src)), F.lit(""))
    )


def cap_docs_per_host(
    df: DataFrame,
    *,
    id_col: str,
    max_docs: int,
    url_col: str | None = None,
    host_col: str | None = None,
    seed: str = "0",
) -> DataFrame:
    """Keep at most `max_docs` documents per registrable domain,
    deterministically (the kept set is a pure function of ids + seed —
    repartition- and rerun-stable, like every sampling rule in
    `operators/sampling.py`).

    Selection rule: the `max_docs` smallest ``(h32(seed:id), id)`` keys
    per host — a seeded uniform choice, not head-of-file bias.

    Two-phase skew shape (see module docstring): hosts at/under the cap
    bypass the window entirely; only over-cap hosts rank. At web scale
    the over-cap side is the zipf head — small row share, but exactly
    where a single-phase window would concentrate sort cost.

    Docs with a NULL/unparseable host are EXEMPT (pass through
    uncapped): they cannot be attributed to a domain, and treating them
    as one shared pseudo-domain would silently delete all but
    `max_docs` of them corpus-wide.
    """
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    from pyspark.sql import Window

    keyed = _with_host(df, url_col, host_col).withColumn(
        "__rk", h32(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    )
    # ONE derivation, one exchange (r15): "every row of an under-cap
    # host, plus the max_docs best-ranked rows of an over-cap host" IS
    # simply rank <= max_docs — a host with n <= max_docs rows has every
    # rank <= n <= max_docs. The previous two-phase form (count
    # aggregate -> anti join -> semi join -> window -> union) re-derived
    # the input lineage three times and shuffled full rows twice to
    # avoid sorting compliant hosts; the rank-<=-k filter instead
    # enables Spark's WindowGroupLimit pushdown, which keeps only the
    # top max_docs rows PER HOST PER MAP PARTITION before the exchange —
    # less data shuffled and sorted than the two-phase split ever saved.
    # Hostless rows stay exempt by ranking in a SINGLETON group (a \0
    # prefix no registrable domain can contain + the row's own id):
    # rank 1 passes any cap, and the former shared '' pseudo-partition
    # (all unattributable docs sorted in one task) disappears.
    grp = F.when(
        F.col(_HOST) == "",
        F.concat(F.lit("\x00"), F.col(id_col).cast("string")),
    ).otherwise(F.col(_HOST))
    w = Window.partitionBy("__grp").orderBy("__rk", id_col)
    return (
        keyed.withColumn("__grp", grp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_docs)
        .drop(_HOST, "__rk", "__grp", "__rn")
    )


def filter_blocked_hosts(
    df: DataFrame,
    blocklist,
    *,
    url_col: str | None = None,
    host_col: str | None = None,
) -> DataFrame:
    """Drop documents whose REGISTRABLE DOMAIN is blocklisted, so
    ``evil.example.com`` dies when ``example.com`` is blocked.

    `blocklist` is a list/tuple of domains (literal NOT-IN — fine for
    operational lists, stays in codegen) or a single-column DataFrame
    (left_anti join — the shape for big published blocklists; AQE
    broadcasts it when it fits). Blocklist entries are normalized to
    their own registrable domain, so a list carrying ``www.foo.co.uk``
    still kills ``foo.co.uk``.
    """
    keyed = _with_host(df, url_col, host_col)
    if isinstance(blocklist, DataFrame):
        bcols = blocklist.columns
        if len(bcols) != 1:
            raise ValueError(f"blocklist DataFrame must have 1 column, has {bcols}")
        bl = blocklist.select(
            registrable_domain(F.lower(F.col(bcols[0]))).alias(_HOST)
        )
        return keyed.join(bl, _HOST, "left_anti").drop(_HOST)
    norm = sorted(
        {registrable_domain_py(d) for d in blocklist if d and d.strip()}
    )
    if not norm:
        return keyed.drop(_HOST)
    return keyed.filter(~F.col(_HOST).isin(*norm)).drop(_HOST)


def host_stats(
    df: DataFrame,
    *,
    url_col: str | None = None,
    host_col: str | None = None,
    text_col: str | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """Per-registrable-domain corpus concentration report: doc counts,
    corpus share, and — when `top_n` is given — cumulative share in
    descending-share order (the "top 10 hosts are X% of the corpus"
    number every dataset card wants). Char volume when `text_col` set.

    Scale shape: one aggregate (map-side combined; text reduced to
    `length()` before the shuffle) + the corpus total as a broadcast
    1-row cross join — NEVER a global window over the per-host frame,
    which at web scale is 10^8+ registrable domains and would serialize
    into one task. Cumulative share is computed only over the `top_n`
    truncation (TakeOrdered — distributed — then a window over `top_n`
    rows), and both shares stay shares of the WHOLE corpus.
    """
    from pyspark.sql import Window

    aggs = [F.count(F.lit(1)).cast("bigint").alias("docs")]
    if text_col:
        aggs.append(F.sum(F.length(F.col(text_col))).cast("bigint").alias("chars"))
    per_host = (
        _with_host(df, url_col, host_col)
        .groupBy(F.col(_HOST).alias("host"))
        .agg(*aggs)
    )
    total = F.broadcast(per_host.agg(F.sum("docs").alias("__total")))
    out = per_host.crossJoin(total).withColumn(
        "doc_share", F.round(F.col("docs") / F.col("__total"), 6)
    )
    if top_n is None:
        return out.drop("__total").orderBy(F.desc("docs"), F.asc("host"))
    top = out.orderBy(F.desc("docs"), F.asc("host")).limit(top_n)
    cum = Window.partitionBy().orderBy(F.desc("docs"), F.asc("host")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.withColumn(
            "cum_doc_share", F.round(F.sum("docs").over(cum) / F.col("__total"), 6)
        )
        .drop("__total")
        .orderBy(F.desc("docs"), F.asc("host"))
    )


def host_disjoint_split(
    df: DataFrame,
    *,
    val_ppm: int,
    url_col: str | None = None,
    host_col: str | None = None,
    seed: str = "0",
    split_col: str = "split",
) -> DataFrame:
    """Train/validation split that keeps every REGISTRABLE DOMAIN on one
    side (`split_col` ∈ {'train','val'}): near-duplicate documents
    concentrate within hosts (templates, boilerplate, syndication), so a
    doc-level random split leaks host-local near-dups across the
    boundary and inflates eval. This is the zero-cost host-grain
    complement to `leakage_safe_split` (queries/llmops.py), which closes
    CONTENT near-dup clusters via LSH + connected components; use both —
    hosts here, cross-host near-dups there.

    Membership is the canonical deterministic rule on the HOST —
    ``h32(seed ':' domain) % 1e6 < val_ppm`` → val — a pure function of
    (domain, seed): stable under repartitioning, appends (tomorrow's
    docs from a known host land on the known side), and reruns, and
    reproducible from hashlib. Expect val's DOC share to deviate from
    ``val_ppm`` by the host-size distribution (hosts are the sampling
    unit); at web scale the law of large numbers over millions of
    domains tightens it.

    Map-only: no shuffle, no UDF.
    """
    if not 0 <= val_ppm <= 1_000_000:
        raise ValueError(f"val_ppm must be in [0, 1e6], got {val_ppm}")
    keyed = _with_host(df, url_col, host_col)
    is_val = (
        h32(F.concat_ws(":", F.lit(seed), F.col(_HOST))) % 1_000_000 < val_ppm
    )
    return keyed.withColumn(
        split_col, F.when(is_val, F.lit("val")).otherwise(F.lit("train"))
    ).drop(_HOST)


def dedup_by_canonical_url(
    df: DataFrame,
    *,
    url_col: str,
    id_col: str,
) -> DataFrame:
    """URL-level dedup — the FIRST dedup tier of a real crawl pipeline,
    upstream of every content tier (`operators/dedup.py`): the same page
    fetched under different URL spellings (tracking params, fragments,
    parameter order, www/case/port noise) collapses to one keeper per
    `functions/urls.canonicalize_url` identity, before anyone pays to
    hash its content. Keeps the smallest `id_col` per canonical URL —
    deterministic, no physical-order dependence.

    Scale shape: one shuffle on the canonical-URL key; per-key groups
    are refetch-count-sized (a handful), so the rank window has no skew
    exposure, and Catalyst's ``WindowGroupLimit`` keeps only the
    top row per key per partition before the sort.

    Docs whose URL is NULL or not a parseable ``scheme://`` URL PASS
    THROUGH untouched: a shared "no URL" pseudo-key would silently
    collapse every URL-less doc in the corpus into one keeper. Only a
    real canonical identity dedups.
    """
    from pyspark.sql import Window

    raw = F.col(url_col)
    parseable = raw.isNotNull() & (url_scheme(raw) != "")
    # non-parseable rows get a per-row unique key (never collide);
    # \x00 prefix cannot appear in a canonical URL, so the key spaces
    # are disjoint
    key = F.when(parseable, canonicalize_url(raw)).otherwise(
        F.concat(F.lit("\x00rowkey:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("__canon").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__canon", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__canon", "__rn")
    )


def host_authority(
    df: DataFrame,
    *,
    url_col: str,
    html_col: str,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Link-graph authority score per registrable domain — the classic
    curation quality prior (a page linked from many independent sites
    is likelier worth keeping than an orphan SEO farm): extract hrefs
    from the raw HTML (`functions/html.extract_links`), collapse both
    endpoints to registrable domains, and run the repo's PageRank
    (`operators/graph.pagerank`) over the DISTINCT host→host edge set
    (self-links dropped — intra-site nav carries no authority).
    Relative links (no scheme) have no host and are skipped.

    Returns (host, authority), ranks summing to 1 over the observed
    hosts; join onto the corpus as a quality signal for
    `quality_stratified_resample` / `dedup_keep_score_col`.

    Scale shape: link extraction is map-only; the edge set dedups on
    (src,dst) host pairs — web-scale small relative to the page count —
    and PageRank iterates over that host graph (10^7-ish nodes), never
    over pages.
    """
    from ..functions.html import extract_links
    from .graph import pagerank

    src_host = registrable_domain(url_host(F.col(url_col)))
    links = df.select(
        src_host.alias("src"),
        F.explode(extract_links(F.col(html_col))).alias("__target"),
    )
    dst_host = registrable_domain(url_host(F.col("__target")))
    edges = (
        links.select("src", dst_host.alias("dst"))
        .filter((F.col("dst") != "") & (F.col("src") != ""))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .unionByName(df.select(src_host.alias("id")).filter(F.col("id") != ""))
        .distinct()
    )
    # tol passes through so a caller needing a REPRODUCIBLE iteration
    # count (a driver-pinned fixture; cross-engine replay) can set
    # tol=0.0 and get exactly max_iter power steps — the early-stop
    # delta is a float aggregate whose last-ulp could otherwise flip
    # the stop round under a different partitioning.
    ranks = pagerank(
        nodes, edges, damping=damping, max_iter=max_iter, tol=tol
    )
    return ranks.select(F.col("id").alias("host"), F.col("rank").alias("authority"))


def canary_scan(
    docs: DataFrame,
    canaries: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    canary_col: str = "canary",
    max_example_ids: int = 5,
) -> DataFrame:
    """EXACT canary-string scan: for each planted marker string (the
    BIG-bench–style canary GUID convention — benchmark suites embed a
    unique literal so trained models can be probed for contamination),
    count the documents whose text contains it VERBATIM and list
    example ids. The exact-literal dual of
    ``dedup.decontaminate_ngram_overlap`` (fuzzy n-gram overlap finds
    paraphrased leakage; this finds the planted marker itself — a
    corpus that carries the canary must be filtered BEFORE training,
    not probed after).

    Every canary reports (zero matches included — the audit posture:
    a canary silently missing from the report is indistinguishable
    from an unchecked one); empty/NULL canaries are rejected loudly
    (``contains(x, '')`` is true for every row — an empty marker would
    flag the whole corpus and hide real hits).

    Scale shape: the canary set is small by construction (one or a few
    per benchmark suite) and broadcasts; the corpus-text pass applies
    |canaries| codegen ``contains`` predicates per row (a broadcast
    nested-loop join bounded by the canary count — the
    ``decontaminate_ngram_overlap`` holdout pattern). The corpus never
    shuffles. Counts and examples are computed as two bounded rollups
    over the hit set (r14 VERDICT #4): exact ``n_docs`` by map-side
    partial count, example ids by a rank limit that pushes down as a
    WindowGroupLimit — at most ``max_example_ids`` ids per canary leave
    any map task, so even a canary present in millions of documents
    never buffers or sorts its full hit set anywhere.

    Returns one row per canary: ``canary``, ``n_docs`` (bigint),
    ``example_doc_ids`` (comma-joined string of up to
    ``max_example_ids`` smallest ids — scalar, driver-hashable).
    """
    if max_example_ids < 1:
        raise ValueError(
            f"max_example_ids must be >= 1, got {max_example_ids}"
        )
    cans = canaries.select(F.col(canary_col).alias("__canary")).distinct()
    n_bad = cans.filter(
        F.col("__canary").isNull() | (F.length("__canary") == 0)
    ).count()  # bounded: |canaries| rows
    if n_bad:
        raise ValueError(
            f"{n_bad} empty/NULL canary string(s) — an empty marker "
            "matches every document and would drown real hits"
        )
    matched = (
        docs.select(F.col(id_col).alias("__doc"), F.col(text_col).alias("__t"))
        .filter(F.col("__t").isNotNull())
        .join(
            F.broadcast(cans),
            F.col("__t").contains(F.col("__canary")),
        )
        .select("__canary", "__doc")
    )
    # counts and examples SPLIT (r14 VERDICT #4): the r14 form ranked
    # the hit set with a window whose row_number was consumed INSIDE the
    # aggregate (a when(rn <= max) under collect_list), so Spark could
    # not rewrite it to a WindowGroupLimit — a mega-hit canary shipped
    # and sorted its full hit set in one task before the rollup. Now the
    # exact count is a plain groupBy (map-side partial combine — only
    # |canaries| x n_tasks counter rows cross the exchange) and the
    # example list is rank + filter(rn <= K), which DOES qualify for the
    # WindowGroupLimit pushdown: each map task forwards at most K ids
    # per canary, so nothing ever buffers or sorts an unbounded hit set.
    # The price is a second derivation of the (rare-by-construction) hit
    # set — i.e. a second corpus pass of |canaries| contains predicates;
    # callers for whom the scan dominates can materialize `docs` first.
    counts = matched.groupBy("__canary").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy("__canary").orderBy("__doc")
    examples = (
        matched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_example_ids)
        .groupBy("__canary")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("__doc")),
                    lambda x: x.cast("string"),
                ),
            ).alias("example_doc_ids"),
        )
    )
    # every canary with a count row has >= 1 hit, so it has an examples
    # row too — the inner join rebuilds exactly the old rollup rows
    hits = counts.join(examples, "__canary")
    return (
        cans.join(hits, "__canary", "left")
        .select(
            F.col("__canary").alias(canary_col),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("example_doc_ids", F.lit("")).alias("example_doc_ids"),
        )
        .orderBy(F.desc("n_docs"), F.asc(canary_col))
    )
