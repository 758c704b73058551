"""Command-line entry point: ``python -m frinesis_spark``.

Commands:

- ``list`` — every registered query name (the engine's operator
  surface, SURVEY.md §2).
- ``run NAME`` — execute one query against ``--sf-dir`` and print
  rows as JSON lines (``--limit`` caps output; 0 = all rows, streamed
  partition-at-a-time, never a full driver collect).
- ``sql "SELECT ..."`` — run an ANSI-SQL string against the
  registered table views.

Exit code 0 on success, 2 on unknown query.
"""

from __future__ import annotations

import argparse
import json
import sys


def _json_default(v):
    try:
        return v.isoformat()  # timestamps/dates
    except AttributeError:
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        return str(v)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="frinesis_spark")
    p.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="directory of the parquet tables",
    )
    p.add_argument(
        "--limit",
        type=int,
        default=20,
        help="max rows to print (0 = stream ALL rows via toLocalIterator)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    runp = sub.add_parser("run")
    runp.add_argument("name")
    sqlp = sub.add_parser("sql")
    sqlp.add_argument("query")
    args = p.parse_args(argv)

    from frinesis_spark import registry

    queries = registry.queries()
    if args.cmd == "list":
        for name in sorted(queries):
            print(name)
        return 0

    # Validate BEFORE the JVM spins up: a typo'd name or a negative
    # limit must fail instantly, not after multi-second session
    # startup (r9 review wave 9).
    if args.limit < 0:
        print("--limit must be >= 0 (0 streams all rows)", file=sys.stderr)
        return 2
    fn = None
    if args.cmd == "run":
        fn = queries.get(args.name)
        if fn is None:
            print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
            return 2

    from frinesis_spark.session import get_spark

    spark = get_spark("frinesis_spark_cli")
    if args.cmd == "sql":
        from frinesis_spark.catalog import register_views

        register_views(spark, args.sf_dir)
        df = spark.sql(args.query)
    else:
        df = fn(spark, args.sf_dir)

    # --limit 0 streams via toLocalIterator(), never df.collect(): the
    # CLI must stay usable against a full-scale table, and an unbounded
    # collect materializes the whole result in driver memory (r5
    # verdict #8 — the one driver-side bottleneck grep still found).
    # toLocalIterator pulls one partition at a time, so driver memory
    # is bounded by the largest partition regardless of result size.
    rows = df.limit(args.limit).collect() if args.limit else df.toLocalIterator()
    for row in rows:
        print(json.dumps(row.asDict(recursive=True), default=_json_default))
    return 0


if __name__ == "__main__":
    sys.exit(main())
