"""URL canonicalization and host extraction for web-corpus curation.

Web-crawl curation is host-aware: the same page is fetched under many
URL spellings (scheme/host case, default ports, tracking parameters,
fragments, parameter order), and per-host caps / blocklists / stats all
key on the *registrable domain*, not the raw hostname. Everything here
is a pure Column expression (regexp/split/array ops — JVM-side,
codegen'd except the documented tiny-array lambdas), mirroring the
repo's UDF policy (`functions/text.py`).

Reference scope note: the reference engine has no URL layer — this
module is part of the training-data-pipeline surface the build brief
adds beyond reference parity (SURVEY.md §7.1.5), modeled on the public
C4 / CCNet / RefinedWeb curation recipes (per-host dedup keys, utm_*
stripping, registrable-domain caps).

Scale shape: every function is map-only (zero shuffles); the
higher-order `filter`/`transform` lambdas run interpreted (outside
whole-stage codegen) but only over query-parameter arrays, which are
bounded by URL length (~tens of elements) — not over document text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Anatomy capture: scheme://host[:port][/path][?query][#fragment].
# Host may carry userinfo (user@host) — stripped by the host rule below.
_URL_RE = r"^\s*([A-Za-z][A-Za-z0-9+.-]*):\/\/([^\/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?"

# Query parameters that identify the click, not the page. Matched on the
# key (case-insensitive), `utm_` as a prefix.
TRACKING_PARAMS = (
    "gclid", "fbclid", "msclkid", "dclid", "twclid", "igshid", "mc_cid",
    "mc_eid", "yclid", "wbraid", "gbraid", "ref", "ref_src", "referrer",
    "spm", "mkt_tok", "oly_anon_id", "oly_enc_id", "s_kwcid", "_hsenc",
    "_hsmi", "vero_id", "wickedid", "soc_src", "soc_trk", "_openstat",
)

# Multi-label public suffixes (the high-frequency subset of the public
# suffix list). `registrable_domain` keeps one label more than the
# suffix; anything not listed here is treated as a single-label TLD.
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.in", "net.in", "org.in", "co.kr", "or.kr", "co.za", "org.za",
    "co.nz", "net.nz", "org.nz", "co.id", "com.my", "com.ph", "com.vn",
)


def _part(col: Column, idx: int) -> Column:
    return F.regexp_extract(col, _URL_RE, idx)


def url_scheme(col: Column) -> Column:
    """Lowercased scheme (``''`` when the value doesn't parse as a URL)."""
    return F.lower(_part(col, 1))


def url_host(col: Column) -> Column:
    """Lowercased hostname: userinfo (``user@``) and ``:port`` stripped,
    trailing dot removed (``example.com.`` ≡ ``example.com`` in DNS)."""
    authority = F.lower(_part(col, 2))
    no_user = F.regexp_replace(authority, "^[^@]*@", "")
    no_port = F.regexp_replace(no_user, ":[0-9]*$", "")
    return F.regexp_replace(no_port, r"\.$", "")


def url_path(col: Column) -> Column:
    """Path component, duplicate slashes collapsed; ``'/'`` when absent."""
    path = F.regexp_replace(_part(col, 3), "//+", "/")
    return F.when(path == "", F.lit("/")).otherwise(path)


def url_query(col: Column) -> Column:
    """Raw query string (no leading ``?``; ``''`` when absent)."""
    return _part(col, 4)


def registrable_domain(host: Column) -> Column:
    """Public-suffix-lite registrable domain of a (already-normalized)
    hostname: one label more than the public suffix.

    ``a.b.example.co.uk`` → ``example.co.uk``; ``www.example.com`` →
    ``example.com``; IPv4 literals and one-label hosts pass through
    unchanged. Covers the high-frequency multi-label suffixes
    (`SECOND_LEVEL_SUFFIXES`); a full public-suffix-list lookup is a
    broadcast join against the published table — the per-host stats and
    caps in `operators/curation.py` take the host column as input, so
    swapping in the exact table changes nothing downstream.

    Tolerates a trailing dot (stripped) so pre-extracted host columns
    that bypassed `url_host` still normalize.
    """
    host = F.regexp_replace(host, r"\.$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_ipv4 = host.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    return (
        F.when(is_ipv4 | (n <= 2), host)
        .when(last2.isin(*SECOND_LEVEL_SUFFIXES), last3)
        .otherwise(last2)
    )


def registrable_domain_py(host: str) -> str:
    """Driver-side twin of `registrable_domain` for normalizing literal
    blocklists etc. without a Spark job; pinned equal to the Column form
    in tests/test_urls.py."""
    import re

    h = host.strip().lower().lstrip(".").rstrip(".")
    labels = h.split(".")
    if len(labels) <= 2 or re.fullmatch(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+", h):
        return h
    if ".".join(labels[-2:]) in SECOND_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def _canonical_query(query: Column, drop_params: tuple[str, ...]) -> Column:
    """Sorted, tracking-stripped query string (tiny-array lambdas)."""
    pairs = F.filter(F.split(query, "&"), lambda p: p != "")
    prefix_ok = lambda p: ~F.lower(p).rlike("^utm_")  # noqa: E731
    listed_ok = lambda p: ~F.lower(  # noqa: E731
        F.element_at(F.split(p, "=", 2), 1)
    ).isin(*drop_params) if drop_params else F.lit(True)
    kept = F.filter(pairs, lambda p: prefix_ok(p) & listed_ok(p))
    return F.array_join(F.array_sort(kept), "&")


def canonicalize_url(
    col: Column,
    *,
    strip_www: bool = True,
    drop_params: tuple[str, ...] = TRACKING_PARAMS,
) -> Column:
    """One canonical spelling per logical page, so URL-keyed dedup and
    per-host grouping see through crawl noise.

    Rules (each pinned in tests/test_urls.py):
    - scheme + host lowercased; userinfo, default port (``:80`` http /
      ``:443`` https), and trailing host dot stripped; leading ``www.``
      stripped when ``strip_www``;
    - fragment dropped (client-side only);
    - duplicate path slashes collapsed; trailing slash dropped except root;
    - query parameters: ``utm_*`` + `drop_params` removed (key match,
      case-insensitive), remainder sorted for order-independence; the
      ``?`` disappears when nothing survives.

    Non-URL strings (no ``scheme://``) pass through trimmed — callers
    filter on ``url_scheme != ''`` when they need strict parses.
    """
    scheme = url_scheme(col)
    host = url_host(col)
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    # Default ports are scheme-relative; url_host already stripped the
    # port, so re-append only a NON-default explicit port.
    port = F.regexp_extract(F.lower(_part(col, 2)), ":([0-9]+)$", 1)
    is_default = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    host_port = F.when(is_default, host).otherwise(F.concat_ws(":", host, port))

    path = url_path(col)
    path = F.when(path == "/", path).otherwise(F.regexp_replace(path, "/$", ""))
    query = _canonical_query(url_query(col), drop_params)

    rebuilt = F.concat(
        scheme, F.lit("://"), host_port, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(scheme == "", F.trim(col)).otherwise(rebuilt)


def registrable_domain_psl(
    df,
    psl_df,
    *,
    host_col: str,
    out_col: str = "domain",
    max_suffix_labels: int = 5,
):
    """EXACT public-suffix-list registrable domain (r8 VERDICT #6): the
    longest-matching-suffix lookup `registrable_domain`'s docstring
    promises, as a broadcast join against the published table —
    including the list's WILDCARD and EXCEPTION rule forms.

    `psl_df` is a one-column DataFrame of raw PSL lines (``suffix``
    string) — either bare rules, or the published list
    (https://publicsuffix.org/list/) verbatim: `//` comments, blank
    lines, and section markers are filtered here per the spec's line
    rules (text after the first whitespace ignored), so
    ``load_psl_snapshot(spark, path)`` output plugs in directly. All
    three rule forms are honored with the spec's semantics:

    - plain (``com``, ``co.uk``, ``github.io``): the rule is a public
      suffix; registrable = one label more;
    - wildcard (``*.kobe.jp``): every single label under the base is a
      public suffix (``x.kobe.jp`` public → ``y.x.kobe.jp`` registrable
      ``y.x.kobe.jp``[-3:]);
    - exception (``!city.kobe.jp``): overrides any matching wildcard —
      the public suffix is the exception minus its leftmost label, so
      ``www.city.kobe.jp`` → ``city.kobe.jp``. Exceptions beat all
      other matches; otherwise the LONGEST match wins (the spec's
      prevailing-rule order).

    Hosts that ARE a public suffix, IPv4 literals, and hosts matching
    no rule pass through unchanged (an unlisted TLD means the cut is
    unknowable — unlike the lite form's guess, the exact form refuses
    to invent one; the spec's implicit ``*`` default is deliberately
    NOT applied, matching `registrable_domain`'s passthrough).
    `max_suffix_labels` must be ≥ the longest rule's label count
    (5 covers the published list).

    Scale shape: the lookup runs over the DISTINCT host dimension, not
    the corpus — each distinct host explodes to its trailing label
    suffixes of length 1..`max_suffix_labels`, each emitting its plain
    key and its wildcard key (first label replaced by ``*``), equi-joins
    the BROADCAST rule table once, and keeps the prevailing match per
    host (max of an (is_exception, match_len) struct). The result joins
    back on the host value itself (deterministic key — no
    monotonically_increasing_id self-join hazard): one corpus shuffle
    on the host, the same partitioning every per-host curation operator
    (`operators/curation.py`) reuses downstream; AQE broadcasts the
    host→domain map instead when it fits.
    """
    from pyspark.sql import functions as F

    host_norm = F.regexp_replace(F.lower(F.col(host_col)), r"\.$", "")
    base = df.withColumn("__host_norm", host_norm)

    hosts = base.select("__host_norm").distinct()
    labels = F.split(F.col("__host_norm"), r"\.")
    n = F.size(labels)
    # each trailing suffix of length k emits (key, pub_len_if_plain):
    # its own string, and — for k >= 2 — the wildcard spelling with the
    # first label replaced by "*" (a wildcard rule's public suffix
    # INCLUDES the wildcard label, so pub_len stays k)
    cand = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.least(n, F.lit(max_suffix_labels))),
            lambda k: F.concat(
                F.array(
                    F.struct(
                        F.concat_ws(".", F.slice(labels, n - k + 1, k)).alias("s"),
                        k.alias("k"),
                    )
                ),
                F.when(
                    k >= 2,
                    F.array(
                        F.struct(
                            F.concat_ws(
                                ".",
                                F.concat(
                                    F.array(F.lit("*")),
                                    F.slice(labels, n - k + 2, k - 1),
                                ),
                            ).alias("s"),
                            k.alias("k"),
                        )
                    ),
                ).otherwise(F.array().cast("array<struct<s:string,k:int>>")),
            ),
        )
    )
    exploded = hosts.select(
        "__host_norm", F.explode(cand).alias("__c")
    ).select(
        "__host_norm",
        F.col("__c.s").alias("__key"),
        F.col("__c.k").alias("__len"),
    )
    # The published file's text format carries `//` comment lines (some
    # with dotted text — emails, URLs), blank lines, and section
    # markers; none can ever match a host, but an unfiltered comment
    # with many dots CAN exceed `max_suffix_labels` and abort the depth
    # probe below with a spurious ValueError (r9 ADVICE). Apply the
    # spec's line rules here — drop comments/blanks, keep only up to
    # the first whitespace — so callers may hand this function the raw
    # published file verbatim (see `load_psl_snapshot`).
    line = F.lower(F.trim(F.col("suffix")))
    raw = F.regexp_extract(line, r"^(\S+)", 1)
    rules_base = (
        psl_df.select(line.alias("__line"), raw.alias("__raw"))
        .filter((F.col("__raw") != "") & ~F.col("__line").startswith("//"))
        .select(
            F.when(
                F.col("__raw").startswith("!"),
                F.substring(F.col("__raw"), 2, 2048),
            )
            .otherwise(F.col("__raw"))
            .alias("__key"),
            F.col("__raw").startswith("!").alias("__exc"),
        )
    )
    rules = rules_base.distinct()
    # the documented precondition, VALIDATED: a rule deeper than the
    # candidate explode silently loses to a shorter match for every
    # host under it — wrong domains with no error. The rules table is
    # broadcast-sized, so this is one cheap driver pull. Probing the
    # pre-distinct projection (not an aggregate) lets Catalyst fold the
    # whole probe into a LocalRelation when `psl_df` is a literal rules
    # frame — `collect()` is then a jobless driver-side read instead of
    # a scheduled aggregate job per operator construction; the max folds
    # in Python over the (broadcast-sized) label counts.
    depths = rules_base.select(
        F.size(F.split(F.col("__key"), r"\.")).alias("m")
    ).collect()
    deepest = max((r["m"] for r in depths), default=0)
    if deepest > max_suffix_labels:
        raise ValueError(
            f"psl_df contains a rule with {deepest} labels but "
            f"max_suffix_labels={max_suffix_labels}; raise it to cover "
            "the deepest rule or hosts under that suffix resolve wrongly"
        )
    matched = exploded.join(F.broadcast(rules), "__key").select(
        "__host_norm",
        F.struct(
            F.col("__exc").cast("int").alias("p"),
            # an exception rule's public suffix drops its leftmost label
            (F.col("__len") - F.col("__exc").cast("int")).alias("pub_len"),
        ).alias("__m"),
    )
    best = matched.groupBy("__host_norm").agg(
        F.max("__m")["pub_len"].alias("__pub_len")
    )
    joined = base.join(best, "__host_norm", "left")

    lbls = F.split(F.col("__host_norm"), r"\.")
    nn = F.size(lbls)
    keep = F.col("__pub_len") + 1
    is_ipv4 = F.col("__host_norm").rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    dom = F.when(
        is_ipv4 | F.col("__pub_len").isNull() | (nn <= F.col("__pub_len")),
        F.col("__host_norm"),
    ).otherwise(
        F.concat_ws(".", F.slice(lbls, nn - F.least(keep, nn) + 1, F.least(keep, nn)))
    )
    return joined.withColumn(out_col, dom).drop("__host_norm", "__pub_len")


def load_psl_snapshot(spark, path: str, *, section: str | None = None):
    """Load a downloaded ``public_suffix_list.dat`` snapshot verbatim
    into the one-column ``suffix`` frame `registrable_domain_psl`
    takes (r9 VERDICT #5) — the published list is public, versioned
    content, so a deployment pins a snapshot next to its code and
    points this at it.

    Parses the published text format per the spec's line rules:

    - ``//`` lines are comments (including the
      ``// ===BEGIN ICANN DOMAINS===`` / ``===END ...=== `` section
      markers); blank/whitespace-only lines are ignored;
    - a rule is the text up to the first whitespace of every other
      line (the list's own test vectors carry trailing commentary);
    - `section` = ``"icann"`` or ``"private"`` keeps only the rules
      between the matching BEGIN/END markers (training-data curation
      usually wants ICANN-only so `github.io` pages group by USER, not
      all under one private suffix — pass ``"icann"`` deliberately;
      default keeps both, matching browser behavior).

    Scale shape: the list is ~250 KB / ~10k lines — one driver-side
    text read, then a broadcast join inside `registrable_domain_psl`.
    The section scan is a tiny driver loop over the raw lines, not a
    Spark job; the returned frame is createDataFrame-backed so the
    lookup's broadcast is exact. Unicode rules are kept as published
    (lowercased downstream); hosts in punycode only match ASCII rules —
    IDN normalization is the caller's ingest concern.
    """
    if section not in (None, "icann", "private"):
        raise ValueError(f"section must be None|'icann'|'private': {section!r}")
    with open(path, encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    if section is not None:
        marker = section.upper()
        keep, active = [], False
        begin_seen = end_seen = False
        for ln in lines:
            s = ln.strip()
            if s.startswith("//"):
                # ORDERING is checked, not just existence (r11 review):
                # a stray END before the BEGIN, or a duplicate BEGIN,
                # would otherwise satisfy the seen-flags while active
                # still runs to EOF — silently bleeding the next
                # section's rules into this one.
                if f"===BEGIN {marker} DOMAINS===" in s:
                    if begin_seen:
                        raise ValueError(
                            f"duplicate BEGIN {marker} DOMAINS marker in "
                            f"{path!r} — corrupted snapshot"
                        )
                    active, begin_seen = True, True
                elif f"===END {marker} DOMAINS===" in s:
                    if not active:
                        raise ValueError(
                            f"END {marker} DOMAINS marker before a matching "
                            f"BEGIN in {path!r} — corrupted snapshot"
                        )
                    active, end_seen = False, True
                continue
            if active:
                keep.append(ln)
        # unbalanced markers must be LOUD (r10 ADVICE): a missing END
        # leaves active=True to EOF, silently bleeding the NEXT section's
        # rules into this one (section='icann' would absorb the private
        # rules — the exact grouping mistake the parameter exists to
        # avoid); a missing BEGIN silently returns nothing between them.
        if not (begin_seen and end_seen):
            raise ValueError(
                f"unbalanced section markers in {path!r}: "
                f"BEGIN {marker} DOMAINS {'seen' if begin_seen else 'MISSING'}, "
                f"END {marker} DOMAINS {'seen' if end_seen else 'MISSING'} — "
                "truncated or non-published-format snapshot"
            )
        lines = keep
    rules = [
        (s.split()[0],)
        for s in (ln.strip() for ln in lines)
        if s and not s.startswith("//")
    ]
    if not rules:
        raise ValueError(
            f"no PSL rules parsed from {path!r}"
            + (f" (section={section!r})" if section else "")
            + " — wrong file or section markers absent"
        )
    return spark.createDataFrame(rules, "suffix string")
