"""CLI entry point: run any registered query against a data directory.

    python -m solace_apache_beam_spark --list
    python -m solace_apache_beam_spark QUERY [--sf-dir DIR] [--out PATH]
        [--cpus N] [--show N]

Writes parquet when --out is given, otherwise prints the first --show
rows. The same registry the driver/bench use backs the CLI, so every
operator in COVERAGE.md is runnable from a shell."""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="solace_apache_beam_spark", description=__doc__
    )
    parser.add_argument("query", nargs="?", help="registered query name")
    parser.add_argument("--list", action="store_true", help="list queries and exit")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--out", default=None, help="write result parquet here")
    parser.add_argument("--cpus", type=int, default=8)
    parser.add_argument("--show", type=int, default=20)
    args = parser.parse_args(argv)

    from solace_apache_beam_spark.registry import all_queries

    queries = all_queries()
    if args.list or not args.query:
        for name in sorted(queries):
            print(name)
        return 0
    if args.query not in queries:
        print(f"unknown query: {args.query} (use --list)", file=sys.stderr)
        return 2

    from solace_apache_beam_spark.session import get_spark

    spark = get_spark("cli", cpus=args.cpus)
    df = queries[args.query](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
