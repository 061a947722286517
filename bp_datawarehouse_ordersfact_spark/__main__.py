"""Command-line entry point: ``python -m bp_datawarehouse_ordersfact_spark``.

The library is the product; this is the thin operational wrapper a user
switching from the reference's shell-driven pipeline
(``bp_etl.sh`` — sequential ``python dw*.py`` calls) runs instead:

- ``warehouse --out DIR``              the dw2→dw3→dw4→dw5 pipeline on
                                       the deterministic fixtures
                                       (production swaps the source
                                       bundle in code — see
                                       ``domain/orchestrator.py``);
- ``query NAME --sf-dir DIR``          any registry query by name,
                                       printed (or row-counted);
- ``corpus --docs P --out DIR``        the staged training-corpus build
                                       over a documents parquet (optional
                                       stages via ``--encoding``,
                                       ``--line-dedup``,
                                       ``--boilerplate-min-docs``,
                                       ``--host-col`` +
                                       ``--max-docs-per-host`` /
                                       ``--host-blocklist``);
- ``host-stats --docs P --host-col C`` registrable-domain concentration
                                       report (top-N hosts, doc/char
                                       share, cumulative share);
- ``contamination --docs P --holdout H`` per-benchmark-item n-gram leak
                                       report (worst items first, with
                                       example doc ids);
- ``corpus-increment --docs P --out DIR --store S --corpus C``
                                       the daily-delta build: gate the
                                       increment against the signature
                                       store, admit survivors, commit
                                       the next corpus snapshot
                                       (``--retain N`` expires old
                                       versions);
- ``list``                             the registry query names.

Everything returns a JSON manifest on stdout so the commands compose in
shells/schedulers the way the reference's steps did.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_blocklist(s: str | None) -> list[str] | None:
    return [h.strip() for h in s.split(",") if h.strip()] if s else None


def _spark():
    from .core.session import get_spark

    return get_spark()


def cmd_warehouse(args) -> dict:
    from .domain import orchestrator

    spark = _spark()
    return orchestrator.run_warehouse(
        spark,
        orchestrator.fixture_sources(spark),
        args.out,
        snapshot_dims=args.snapshot_dims,
    )


def cmd_query(args) -> dict:
    from .queries import all_queries

    qs = all_queries()
    if args.name not in qs:
        raise SystemExit(
            f"unknown query {args.name!r}; `list` prints the registry"
        )
    spark = _spark()
    df = qs[args.name](spark, args.sf_dir)
    if args.show:
        # materialize ONCE; the preview and the count both read the
        # checkpointed blocks — a show()-then-count() pair recomputes
        # the whole query from scratch (ADVICE r7)
        df = df.localCheckpoint(eager=True)
        df.show(args.show, truncate=False)
    n = df.count()
    return {"query": args.name, "sf_dir": args.sf_dir, "rows": n}


def cmd_corpus(args) -> dict:
    from .pipelines import build_corpus

    spark = _spark()
    docs = spark.read.parquet(args.docs)
    holdout = spark.read.parquet(args.holdout) if args.holdout else None
    blocklist = _parse_blocklist(args.host_blocklist)
    return build_corpus(
        spark,
        docs,
        args.out,
        holdout=holdout,
        encoding_normalize=args.encoding,
        line_dedup=args.line_dedup,
        line_boilerplate_min_docs=args.boilerplate_min_docs,
        line_boilerplate_scope=args.boilerplate_scope,
        host_col=args.host_col,
        max_docs_per_host=args.max_docs_per_host,
        host_blocklist=blocklist,
        url_dedup_col=args.url_dedup_col,
        chunk_mode=args.chunk_mode,
    )


def cmd_host_stats(args) -> dict:
    from .operators.curation import host_stats

    spark = _spark()
    docs = spark.read.parquet(args.docs)
    # exactly one of the two — mirroring curation._with_host's contract:
    # silently preferring url_col over a supplied --host-col (the old
    # behavior) masks an operator-level ambiguity error (r8 ADVICE)
    if bool(args.url_col) == bool(args.host_col):
        raise SystemExit("host-stats needs exactly one of --url-col / --host-col")
    kw = {"url_col": args.url_col} if args.url_col else {"host_col": args.host_col}
    report = host_stats(docs, text_col=args.text_col, top_n=args.top, **kw)
    return {"docs": args.docs, "hosts": [r.asDict() for r in report.collect()]}


def cmd_corpus_increment(args) -> dict:
    from .pipelines import build_corpus_increment

    spark = _spark()
    docs = spark.read.parquet(args.docs)
    holdout = spark.read.parquet(args.holdout) if args.holdout else None
    blocklist = _parse_blocklist(args.host_blocklist)
    return build_corpus_increment(
        spark,
        docs,
        args.out,
        args.store,
        args.corpus,
        holdout=holdout,
        snapshot_label=args.label,
        retain_snapshots=args.retain,
        encoding_normalize=args.encoding,
        line_dedup=args.line_dedup,
        url_dedup_col=args.url_dedup_col,
        host_blocklist=blocklist,
        host_col=args.host_col,
    )


def cmd_contamination(args) -> dict:
    from pyspark.sql import functions as F

    from .operators.dedup import contamination_report

    spark = _spark()
    docs = spark.read.parquet(args.docs)
    holdout = spark.read.parquet(args.holdout)
    if args.holdout_id_col not in holdout.columns:
        # benchmarks often ship as bare text files — synthesize stable ids
        holdout = holdout.withColumn(
            args.holdout_id_col, F.md5(F.col(args.text_col))
        )
    report = contamination_report(
        docs,
        holdout,
        holdout_id_col=args.holdout_id_col,
        doc_id_col=args.doc_id_col,
        text_col=args.text_col,
        n=args.ngram,
    ).limit(args.top)
    return {"docs": args.docs, "holdout": args.holdout,
            "items": [r.asDict() for r in report.collect()]}


def cmd_list(args) -> dict:
    from .queries import all_oracles, all_queries

    oracles = all_oracles()
    return {
        "queries": [
            {"name": k, "oracle": k in oracles} for k in all_queries()
        ]
    }


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="bp_datawarehouse_ordersfact_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("warehouse", help="run the domain pipeline end to end")
    w.add_argument("--out", required=True)
    w.add_argument("--snapshot-dims", action="store_true", dest="snapshot_dims")
    w.set_defaults(fn=cmd_warehouse)

    q = sub.add_parser("query", help="run one registry query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--show", type=int, default=0, metavar="N")
    q.set_defaults(fn=cmd_query)

    c = sub.add_parser("corpus", help="staged training-corpus build")
    c.add_argument("--docs", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--holdout")
    c.add_argument("--encoding", choices=("codegen", "exact"), default=None,
                   help="optional 00_encoding hygiene stage")
    c.add_argument("--line-dedup", action="store_true", dest="line_dedup",
                   help="00b: within-doc duplicate-line removal")
    c.add_argument("--boilerplate-min-docs", type=int, default=None,
                   dest="boilerplate_min_docs",
                   help="00b: drop lines shared by >= N distinct docs")
    c.add_argument("--boilerplate-scope", default=None,
                   dest="boilerplate_scope",
                   help="00b: column scoping boilerplate counting (e.g. source)")
    c.add_argument("--host-col", default=None, dest="host_col",
                   help="01b: column holding the document host/domain")
    c.add_argument("--max-docs-per-host", type=int, default=None,
                   dest="max_docs_per_host",
                   help="01b: seeded deterministic per-domain doc cap")
    c.add_argument("--host-blocklist", default=None, dest="host_blocklist",
                   help="01b: comma-separated registrable domains to drop")
    c.add_argument("--url-dedup-col", default=None, dest="url_dedup_col",
                   help="00c: URL column for canonical-URL dedup")
    c.add_argument("--chunk-mode", choices=("window", "paragraph"),
                   default="window", dest="chunk_mode",
                   help="05: sliding token windows or paragraph packing")
    c.set_defaults(fn=cmd_corpus)

    hs = sub.add_parser(
        "host-stats",
        help="registrable-domain concentration report over a documents parquet",
    )
    hs.add_argument("--docs", required=True)
    hs.add_argument("--url-col", default=None, dest="url_col")
    hs.add_argument("--host-col", default=None, dest="host_col")
    hs.add_argument("--text-col", default=None, dest="text_col")
    hs.add_argument("--top", type=int, default=20)
    hs.set_defaults(fn=cmd_host_stats)

    ci = sub.add_parser(
        "corpus-increment",
        help="daily-delta corpus build gated against the signature store",
    )
    ci.add_argument("--docs", required=True)
    ci.add_argument("--out", required=True)
    ci.add_argument("--store", required=True)
    ci.add_argument("--corpus", required=True)
    ci.add_argument("--holdout")
    ci.add_argument("--label")
    ci.add_argument("--retain", type=int, default=None)
    ci.add_argument("--encoding", choices=("codegen", "exact"), default=None)
    ci.add_argument("--line-dedup", action="store_true", dest="line_dedup")
    ci.add_argument("--url-dedup-col", default=None, dest="url_dedup_col")
    ci.add_argument("--host-blocklist", default=None, dest="host_blocklist")
    ci.add_argument("--host-col", default=None, dest="host_col")
    ci.set_defaults(fn=cmd_corpus_increment)

    ct = sub.add_parser(
        "contamination",
        help="per-benchmark-item n-gram contamination report",
    )
    ct.add_argument("--docs", required=True)
    ct.add_argument("--holdout", required=True)
    ct.add_argument("--holdout-id-col", default="holdout_id",
                    dest="holdout_id_col")
    ct.add_argument("--doc-id-col", default="doc_id", dest="doc_id_col")
    ct.add_argument("--text-col", default="text", dest="text_col")
    ct.add_argument("--ngram", type=int, default=5)
    ct.add_argument("--top", type=int, default=50)
    ct.set_defaults(fn=cmd_contamination)

    ls = sub.add_parser("list", help="registry query names")
    ls.set_defaults(fn=cmd_list)

    args = p.parse_args(argv)
    out = args.fn(args)
    json.dump(out, sys.stdout, default=str)
    print()
    return out


if __name__ == "__main__":
    main()
