"""Steady-state ingest decade measurement for UpsertParquetSink.

Builds a registry at two sizes a decade apart, then times a 2 000-row
shard of FRESH keys through (a) the append fast path (monotone ids
above the registry's range) and (b) the forced copy-on-write MERGE
(fresh ids interleaved inside the range, so disjointness is unprovable).
The steady-state claim is that (a) stays flat across the decade while
(b) grows with touched-bucket contents.

Usage:
    python tools/measure_append_decade.py [--key-type string|bigint]
                                          [--sizes 200000,2000000]

String keys exercise the round-11 exact-manifest-stats proof
(sink-computed klo/khi); bigint keys reproduce the round-10 footer-stats
numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .appName("append-decade")
        .getOrCreate()
    )


def _keys_df(spark, ids_expr, n, key_type):
    """n rows with key = f(id): even ids for the registry, odd/high ids
    for shards. key_type 'string' zero-pads so lexicographic == numeric."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(ids_expr.alias("id"))
    if key_type == "string":
        key = F.format_string("doc-%012d", F.col("id"))
    else:
        key = F.col("id").cast("bigint")
    return df.select(
        key.alias("k"),
        (F.col("id") % 1000).cast("bigint").alias("ts"),
        F.format_string("payload-%d", F.col("id")).alias("v"),
    )


def _last_op(table):
    names = sorted(
        n for n in os.listdir(f"{table}/_mlog") if n.endswith(".delta.json")
    )
    with open(f"{table}/_mlog/{names[-1]}") as fh:
        return json.load(fh)["op"]


def run(key_type: str, sizes: list[int]) -> dict:
    from pyspark.sql import functions as F

    from motorway_spark.sinks import UpsertParquetSink

    spark = _spark()
    out = {"key_type": key_type, "points": []}
    base = tempfile.mkdtemp(prefix=f"append_decade_{key_type}_")
    try:
        for rows in sizes:
            buckets = 64 if rows <= 500_000 else 256
            table = os.path.join(base, f"reg{rows}")
            sink = UpsertParquetSink(
                spark, table, key_cols=["k"], num_buckets=buckets
            )
            t0 = time.time()
            sink.upsert_batch(
                _keys_df(spark, F.col("id") * 2, rows, key_type), batch_id=0
            )
            t_build = time.time() - t0

            # (a) append: 2k fresh monotone ids above the registry range
            shard_a = _keys_df(
                spark, F.col("id") + 2 * rows + 10, 2000, key_type
            )
            t0 = time.time()
            sink.upsert_batch(shard_a, batch_id=1)
            t_append = time.time() - t0
            op_a = _last_op(table)

            # (b) forced merge: 2k fresh ODD ids interleaved in-range
            shard_b = _keys_df(spark, F.col("id") * 2 + 1, 2000, key_type)
            t0 = time.time()
            sink.upsert_batch(shard_b, batch_id=2)
            t_merge = time.time() - t0
            op_b = _last_op(table)

            point = {
                "rows": rows,
                "num_buckets": buckets,
                "build_sec": round(t_build, 2),
                "append_sec": round(t_append, 2),
                "append_op": op_a,
                "merge_sec": round(t_merge, 2),
                "merge_op": op_b,
            }
            out["points"].append(point)
            print(json.dumps(point), flush=True)
            shutil.rmtree(table, ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    if len(out["points"]) == 2:
        a, b = out["points"]
        out["append_decade_ratio"] = round(b["append_sec"] / a["append_sec"], 2)
        out["merge_decade_ratio"] = round(b["merge_sec"] / a["merge_sec"], 2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--key-type", default="string", choices=["string", "bigint"])
    ap.add_argument("--sizes", default="200000,2000000")
    args = ap.parse_args()
    res = run(args.key_type, [int(s) for s in args.sizes.split(",")])
    bad = [p for p in res["points"] if p["append_op"] != "append" or p["merge_op"] != "merge"]
    sys.exit(1 if bad else 0)
