"""Full-registry correctness sweep: every registered query vs its DuckDB
oracle over the same parquet fixture dir — the builder-side replica of
the driver's CORRECTNESS gate.

Usage:
    python tools/sweep_correctness.py [sf_dir] [out.json] [query ...]

Defaults: sf_dir=/root/testdata/sf0.01, out written to stdout path arg
or printed; trailing names run a TARGETED sweep of just those queries.
Rows-only queries (no oracle) are executed and recorded as
status=rows_only with their row count; failures carry the first
problem/exception line. Exit code 1 if any query fails or errors.

A clean run writes .sweep_stamp.json (tools/sweep_stamp.py) recording
which query-module file contents this sweep vouches for — the input to
tools/check_sweep_freshness.py, the guard against shipping a query
rewrite with no post-change oracle evidence.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else ""
    only = sys.argv[3:]

    from motorway_spark.oracle import _duckdb_con, compare_frames
    from motorway_spark.queries import ORACLES, QUERIES
    from motorway_spark.session import get_session

    unknown = [n for n in only if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    to_run = {n: QUERIES[n] for n in only} if only else QUERIES

    spark = get_session("sweep-correctness", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = _duckdb_con(sf_dir)

    results: dict[str, dict] = {}
    n_bad = 0
    for name, fn in to_run.items():
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            if name not in ORACLES:
                results[name] = {
                    "status": "rows_only",
                    "check": "rows",
                    "rows": len(spark_pdf),
                }
            else:
                problems = compare_frames(spark_pdf, con.sql(ORACLES[name]).df())
                results[name] = {
                    "status": "pass" if not problems else "fail",
                    "check": "oracle",
                    "problems": [str(p)[:300] for p in problems[:3]],
                }
                if problems:
                    n_bad += 1
        except Exception as exc:  # noqa: BLE001
            results[name] = {
                "status": "error",
                "check": "oracle" if name in ORACLES else "rows",
                "problems": [f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"],
            }
            n_bad += 1
        finally:
            from motorway_spark.maintenance import CACHES

            CACHES.release_all()
            spark.catalog.clearCache()
        tag = results[name]["status"]
        print(f"# {name}: {tag}", file=sys.stderr)

    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_pass": sum(1 for r in results.values() if r["status"] == "pass"),
        "n_rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
        "n_fail_or_error": n_bad,
        "results": results,
    }
    blob = json.dumps(summary, indent=1)
    if out_path:
        Path(out_path).write_text(blob)
        print(f"wrote {out_path}", file=sys.stderr)
    else:
        print(blob)
    if not n_bad:
        from tools.sweep_stamp import write_stamp

        stamp = write_stamp(
            Path(__file__).resolve().parent.parent,
            list(results),
            sf_dir,
            artifact=out_path,
        )
        print(f"stamped {stamp}", file=sys.stderr)
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
