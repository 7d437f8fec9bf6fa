"""Command-line entry points, mirroring the reference's operational
surface (``python wd_tmdb.py`` / ``python wd_opencritic.py`` — cron
runs a module, RDF statements land on stdout; SURVEY §3.1).

    python -m wikidatabots_spark tmdb        [--sf-dir DIR] [--limit N]
    python -m wikidatabots_spark opencritic  [--sf-dir DIR] [--limit N]
    python -m wikidatabots_spark run QUERY   [--sf-dir DIR] [--limit N]
    python -m wikidatabots_spark list

``tmdb``/``opencritic`` execute the composed mains through the guarded
RDF sink exactly as the reference does (build 7/2 lazy pipelines,
concat, cap at --limit with warn+sample). ``run`` executes any
registered query and prints up to --limit rows as TSV — the ad-hoc
surface for the other 150+ queries. ``list`` prints the registry.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="wikidatabots_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("tmdb", "opencritic"):
        sp = sub.add_parser(name, help=f"run the composed {name} main")
        sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
        sp.add_argument("--limit", type=int, default=250)
    sp = sub.add_parser("run", help="run any registered query")
    sp.add_argument("query")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--limit", type=int, default=100)
    sub.add_parser("list", help="list registered queries")
    args = p.parse_args(argv)

    from wikidatabots_spark import plans

    if args.cmd == "list":
        for name in plans.queries():
            print(name)
        return 0

    from wikidatabots_spark.session import get_spark

    spark = get_spark(app_name=f"wikidatabots-spark-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "tmdb":
        from wikidatabots_spark.plans.mains import run_tmdb_main

        run_tmdb_main(spark, args.sf_dir, limit=args.limit)
        return 0
    if args.cmd == "opencritic":
        from wikidatabots_spark.plans.mains import run_opencritic_main

        run_opencritic_main(spark, args.sf_dir, limit=args.limit)
        return 0
    # run <query>
    if args.query not in plans.REGISTRY:
        print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
        return 2
    df = plans.REGISTRY[args.query].fn(spark, args.sf_dir)
    print("\t".join(df.columns))
    for row in df.limit(args.limit).collect():
        print("\t".join("" if v is None else str(v) for v in row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
