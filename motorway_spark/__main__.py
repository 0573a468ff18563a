"""Command-line entry point: ``python -m motorway_spark``.

The operational surface a user of the reference gets from its
``examples/*.py`` runner scripts (/root/reference/examples/app.py:1-60
builds a pipeline and runs it from the shell), re-expressed for a
query-library engine:

  list                      registry names (* = DuckDB-oracle-paired)
  run NAME [NAME...]        run queries, print rows
  explain NAME              formatted physical plan (the judge-your-
                            own-plan loop SCALE.md documents)
  check [NAME...]           Spark-vs-DuckDB oracle comparison
                            (thin alias of ``python -m motorway_spark.oracle``)
  sql "SELECT ..."          run an SQL string against the catalog views
                            (the motorway_spark.sql façade from the shell);
                            --table NAME=DIR registers an UpsertParquetSink
                            manifest table as a view (repeatable)

Common flags: --sf-dir (default $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.01), --cpus N, --show N.
"""

from __future__ import annotations

import argparse
import os
import sys


def _default_sf() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m motorway_spark")
    p.add_argument("--sf-dir", default=_default_sf(), help="fixture dir")
    p.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    run = sub.add_parser("run", help="run queries, print rows")
    run.add_argument("names", nargs="+")
    run.add_argument("--show", type=int, default=20, help="max rows to print")
    exp = sub.add_parser("explain", help="formatted physical plan")
    exp.add_argument("names", nargs="+")
    chk = sub.add_parser("check", help="oracle comparison")
    chk.add_argument("names", nargs="*")
    sql = sub.add_parser(
        "sql", help="run an SQL string against the catalog views"
    )
    sql.add_argument("query", help="ANSI SQL over the fixture tables")
    sql.add_argument("--show", type=int, default=20, help="max rows to print")
    sql.add_argument(
        "--explain", action="store_true", help="print the plan instead"
    )
    sql.add_argument(
        "--table",
        action="append",
        default=[],
        metavar="NAME=DIR",
        help="register an UpsertParquetSink manifest table as view NAME "
        "(repeatable); shadows a fixture view of the same name",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    from motorway_spark.queries import ORACLES, QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            mark = "*" if name in ORACLES else " "
            print(f"{mark} {name}")
        print(f"\n{len(QUERIES)} queries, {len(ORACLES)} oracle-paired")
        return 0

    if args.cmd == "sql":
        from motorway_spark.session import get_session
        from motorway_spark.sqlapi import sql as facade_sql

        tables: dict[str, str] = {}
        for spec in args.table:
            name, sep, tdir = spec.partition("=")
            if not sep or not name or not tdir:
                print(f"--table expects NAME=DIR, got {spec!r}", file=sys.stderr)
                return 2
            tables[name] = tdir

        spark = get_session("motorway-sql-cli", cpus=args.cpus)
        df = facade_sql(args.query, args.sf_dir, spark, tables=tables or None)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.show, truncate=False)
        return 0

    unknown = [n for n in getattr(args, "names", []) if n not in QUERIES]
    if unknown:
        print(f"unknown query name(s): {unknown}", file=sys.stderr)
        return 2

    if args.cmd == "check":
        from motorway_spark.oracle import run_check

        results = run_check(args.sf_dir, args.names or None)
        bad = 0
        for name, problems in results.items():
            real = [p for p in problems if p != "(rows-only check)"]
            status = "ok  " if not real else "FAIL"
            bad += bool(real)
            print(f"{status} {name}" + (f" {real[:2]}" if real else ""))
        print(f"\n{len(results) - bad}/{len(results)} passed")
        return 1 if bad else 0

    from motorway_spark.session import get_session

    spark = get_session("motorway-cli", cpus=args.cpus)
    for name in args.names:
        df = QUERIES[name](spark, args.sf_dir)
        if args.cmd == "explain":
            print(f"== {name} ==")
            df.explain("formatted")
        else:
            print(f"== {name} ==")
            df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
