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
                                       over a documents parquet;
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
    return build_corpus(spark, docs, args.out, holdout=holdout)


def cmd_corpus_increment(args) -> dict:
    from .pipelines import build_corpus_increment

    spark = _spark()
    docs = spark.read.parquet(args.docs)
    holdout = spark.read.parquet(args.holdout) if args.holdout else None
    return build_corpus_increment(
        spark,
        docs,
        args.out,
        args.store,
        args.corpus,
        holdout=holdout,
        snapshot_label=args.label,
        retain_snapshots=args.retain,
    )


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
    c.set_defaults(fn=cmd_corpus)

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
    ci.set_defaults(fn=cmd_corpus_increment)

    ls = sub.add_parser("list", help="registry query names")
    ls.set_defaults(fn=cmd_list)

    args = p.parse_args(argv)
    out = args.fn(args)
    json.dump(out, sys.stdout, default=str)
    print()
    return out


if __name__ == "__main__":
    main()
