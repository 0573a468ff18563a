"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and
order-insensitive values (rows sorted by all columns, exact equality).
This is intentionally stricter than a tolerance compare: the query
conventions (helpers.py) are designed to make doubles bit-identical
across engines, so any mismatch is a real semantics bug.

Usage: python -m motorway_spark.oracle [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

from motorway_spark.catalog import TABLES


def _duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # tolerate BOTH layouts: a single parquet file (the driver
        # fixtures) and a Spark-written directory of part files
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns (stringified for
    mixed/NaN-safe total order)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str)
    order = key.sort_values(by=list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a_l, b_l = list(a), list(b)
        return len(a_l) == len(b_l) and all(_values_equal(x, y) for x, y in zip(a_l, b_l))
    return a == b or str(a) == str(b)


def _dtype_problems(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Flag per-column dtype-KIND mismatches (int vs float vs bool vs
    datetime). The driver's value hash is dtype-sensitive — round 1 lost
    `pivot_status_by_priority` and round 2 `fn_math` to columns whose
    VALUES matched but arrived as BIGINT on one engine and DOUBLE on the
    other (e.g. Spark `floor` → long, DuckDB `floor` → double), which a
    value-level compare like `25 == 25.0` sails straight through. Skipped
    when either side is `object` (strings/lists/decimals all land there)
    or contains nulls (engines promote nullable ints to float64
    differently — that asymmetry is benign and value-checked anyway)."""
    problems: list[str] = []
    for col in spark_pdf.columns:
        a, b = spark_pdf[col], oracle_pdf[col]
        ka = "i" if a.dtype.kind == "u" else a.dtype.kind
        kb = "i" if b.dtype.kind == "u" else b.dtype.kind
        if "O" in (ka, kb) or ka == kb:
            continue
        if a.isna().any() or b.isna().any():
            continue
        problems.append(f"dtype[{col}]: spark={a.dtype} oracle={b.dtype}")
    return problems


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    problems.extend(_dtype_problems(spark_pdf, oracle_pdf))
    if problems:
        return problems
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    n_bad = 0
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _values_equal(x, y):
                n_bad += 1
                if n_bad <= 3:
                    problems.append(f"value[{col}][row {i}]: spark={x!r} oracle={y!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched cells total")
    return problems


def run_check(sf_dir: str, names: list[str] | None = None, spark=None) -> dict[str, list[str]]:
    from motorway_spark.queries import QUERIES, ORACLES
    from motorway_spark.session import get_session

    unknown = set(names or ()) - set(QUERIES)
    if unknown:
        raise SystemExit(f"unknown query name(s): {sorted(unknown)}")
    spark = spark or get_session("oracle-check")
    con = _duckdb_con(sf_dir)
    results: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        print(f"... running {name}", flush=True)
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            results[name] = [f"SPARK ERROR: {type(exc).__name__}: {exc}"]
            continue
        if name not in ORACLES:
            # mirror the driver's rows>0 gate: empty output is a failure
            results[name] = [] if len(spark_pdf) > 0 else ["no rows"]
            results[name].append("(rows-only check)")
            continue
        try:
            oracle_pdf = con.sql(ORACLES[name]).df()
        except Exception as exc:  # noqa: BLE001
            results[name] = [f"ORACLE ERROR: {type(exc).__name__}: {exc}"]
            continue
        results[name] = compare_frames(spark_pdf, oracle_pdf)
    return results


def json_record(results: dict[str, list[str]]) -> dict[str, dict]:
    """Encode ``run_check`` results for ``--json`` output.  ``status``
    reflects the outcome ("pass"/"fail") regardless of check kind — a
    rows-only query that produced zero rows is a "fail", not a third
    status consumers would miss — while ``check`` records which gate ran
    ("oracle" vs "rows_only")."""
    return {
        name: {
            "status": (
                "fail" if [p for p in probs if p != "(rows-only check)"] else "pass"
            ),
            "check": "rows_only" if "(rows-only check)" in probs else "oracle",
            "problems": [p for p in probs if p != "(rows-only check)"],
        }
        for name, probs in results.items()
    }


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("error: --json requires an output-path operand", file=sys.stderr)
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1:] or None
    results = run_check(sf_dir, names)
    if json_out:
        import json as _json

        with open(json_out, "w") as fh:
            _json.dump(
                {"sf_dir": sf_dir, "results": json_record(results)}, fh, indent=1
            )
    n_fail = 0
    for name in sorted(results):
        problems = [p for p in results[name] if p != "(rows-only check)"]
        tag = "rows-only" if "(rows-only check)" in results[name] else "oracle"
        if problems:
            n_fail += 1
            print(f"FAIL {name} [{tag}]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name} [{tag}]")
    print(f"\n{len(results) - n_fail}/{len(results)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
