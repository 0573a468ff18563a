"""The manifest sink's full lifecycle, end to end.

The reference's durable sink is a SQL upsert intersection
(contrib/sql_alchemy/intersections.py:57-98) with no concurrency or
maintenance story. The Spark-first rebuild is a lakehouse table:
bucket-pruned MERGE with a numbered optimistic commit log. This
example walks the whole operational lifecycle on a throwaway table:

  1. bulk load          -> append fast path (empty table, one commit)
  2. fresh-key ingest   -> append fast path proven by footer stats
  3. hot-key update     -> bucket-pruned MERGE (only touched buckets)
  4. compliance delete  -> delete_keys, bucket-pruned the same way
  5. rebucket(16)       -> bucket-count migration through the log
  6. vacuum()           -> retention-aged orphan collection

Run: ``python examples/lakehouse_maintenance.py``
"""

from __future__ import annotations

import json
import os as _os
import sys as _sys
import tempfile

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from pyspark.sql import functions as F

from motorway_spark.session import get_session
from motorway_spark.sinks import UpsertParquetSink


def rows(spark, lo: int, n: int, tag: str):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("ts"),
        F.concat(F.lit(tag), F.col("id")).cast("string").alias("v"),
    )


def ops(table: str) -> list[tuple]:
    out = []
    for name in sorted(_os.listdir(f"{table}/_mlog")):
        if name.endswith(".delta.json"):
            with open(f"{table}/_mlog/{name}") as fh:
                r = json.load(fh)
                out.append((r["batch_id"], r["op"], len(r["buckets"])))
    return out


def main() -> None:
    spark = get_session("lakehouse-example", cpus=4, shuffle_partitions=8)
    table = tempfile.mkdtemp(prefix="lakehouse_")
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=8)

    sink.upsert_batch(rows(spark, 0, 1000, "v"), batch_id=0)  # bulk load
    sink.upsert_batch(rows(spark, 1000, 100, "n"), batch_id=1)  # fresh keys
    sink.upsert_batch(  # 3 hot keys -> bucket-pruned merge
        rows(spark, 10, 3, "upd"), batch_id=2
    )
    deleted = sink.delete_keys(spark.createDataFrame([(5,)], "k bigint"))

    print("commit log (batch_id, op, touched buckets):")
    for entry in ops(table):
        print("  ", entry)
    print("rows:", sink.row_count(), "| deleted:", deleted)

    sink.rebucket(16)  # resize as the table grows
    print("after rebucket(16):", sink.row_count(), "rows across",
          len(sink._load_manifest()["buckets"]), "buckets")

    removed = sink.vacuum()  # retention-aged: young staged files survive
    print("vacuum (default retention) removed:", removed, "files")
    got = {r["k"]: r["v"] for r in sink.read().filter("k < 13").collect()}
    print("spot read:", dict(sorted(got.items())))


if __name__ == "__main__":
    main()
