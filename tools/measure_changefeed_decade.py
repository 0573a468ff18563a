"""Changefeed cost decade: feed cost follows CHANGE volume, not table
size.

Builds an UpsertParquetSink registry at two sizes a decade apart at
CONSTANT rows-per-bucket (the layout a rebucket_policy-maintained table
keeps at any size: bucket count scales, bucket size stays bounded),
then applies the SAME fixed-size mutation to each — a merge updating a
fixed number of existing keys all hashing into ONE bucket, the shape of
a narrow CDC tick against a big table — and times:

  (a) read_changes() over that one commit (batch CDF: per-bucket
      before/after full-outer diff of the TOUCHED buckets only), and
  (b) read_stream() draining the same commit through the
      manifest_changefeed source (executor-side Arrow diff, one input
      partition per (commit, bucket)).

The O(changed buckets) claim: at healthy (constant) bucket size, both
feed times stay FLAT across the decade — the diff reads one bucket's
before/after contents regardless of how many sibling buckets exist —
while the full-table-read control grows with the table.

Usage:
    python tools/measure_changefeed_decade.py [--sizes 200000,2000000]
                                              [--changes 2000]
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
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .appName("changefeed-decade")
        .getOrCreate()
    )


def _one_bucket_keys(spark, n_rows, n_buckets, n_changes):
    """n_changes existing keys that all hash into bucket 0 (the sink's
    pmod(hash(k), n) assignment, computed with the same expression)."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_rows)
        .select(F.col("id").alias("k"))
        .filter(F.pmod(F.hash("k"), F.lit(n_buckets)) == 0)
        .limit(n_changes)
    )


def _measure(spark, n_rows: int, n_changes: int, n_buckets: int) -> dict:
    from pyspark.sql import functions as F

    from motorway_spark.sinks import UpsertParquetSink

    table_dir = tempfile.mkdtemp(prefix=f"cfdecade_{n_rows}_")
    try:
        sink = UpsertParquetSink(
            spark, table_dir, key_cols=["k"], num_buckets=n_buckets
        )
        base = spark.range(n_rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("long").alias("v"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        sink.upsert_batch(base, batch_id=0)

        # fixed-size mutation bounded to ONE bucket: the feed's work is
        # that bucket's before/after contents, however large the table
        upd = _one_bucket_keys(spark, n_rows, n_buckets, n_changes).select(
            "k",
            F.lit(-1).cast("long").alias("v"),
            F.lit("updated").alias("payload"),
        )
        t0 = time.time()
        sink.upsert_batch(upd, batch_id=1)
        t_commit = time.time() - t0

        head = sink._head_seq
        t0 = time.time()
        changes = sink.read_changes(since_seq=head - 1)
        n_change_rows = changes.count()
        t_batch_cdf = time.time() - t0

        t0 = time.time()
        from motorway_spark.streaming.runner import run_stream_to_memory

        drained = run_stream_to_memory(
            sink.read_stream(since_seq=head - 1), output_mode="append"
        )
        n_stream_rows = drained.count()
        t_stream_cdf = time.time() - t0

        t0 = time.time()
        _ = sink.read().count()  # the O(table) control
        t_full_read = time.time() - t0

        return {
            "rows": n_rows,
            "buckets": n_buckets,
            "changed_keys": n_changes,
            "commit_sec": round(t_commit, 2),
            "batch_cdf_sec": round(t_batch_cdf, 2),
            "stream_cdf_sec": round(t_stream_cdf, 2),
            "full_read_sec": round(t_full_read, 2),
            "change_rows_batch": n_change_rows,
            "change_rows_stream": n_stream_rows,
        }
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="200000,2000000")
    ap.add_argument("--changes", type=int, default=2000)
    ap.add_argument("--rows-per-bucket", type=int, default=31250)
    args = ap.parse_args()

    spark = _spark()
    out = []
    for n in (int(s) for s in args.sizes.split(",")):
        # constant rows-per-bucket: bucket count scales with the table
        # (power of two, like rebucket_policy recommends)
        n_buckets = 1
        while n_buckets * args.rows_per_bucket < n:
            n_buckets *= 2
        r = _measure(spark, n, args.changes, n_buckets)
        print(json.dumps(r))
        out.append(r)
    print(json.dumps({"decade": out}))


if __name__ == "__main__":
    main()
