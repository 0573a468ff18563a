"""Table maintenance: small-file compaction (the OPTIMIZE primitive).

Streaming sinks and incremental batch writes leave lakehouse tables as
thousands of KB-scale files; at 100 TB the resulting footer/task
overhead dominates scan time (one Spark task per tiny file, one footer
round-trip each). Compaction rewrites a directory into
ceil(total_bytes / target_file_bytes) files — the background OPTIMIZE
job every production table runs on a schedule.

Reference analogue: none — motorway's sinks append forever (e.g. the
per-record SQS/file sinks, /root/reference/motorway/contrib/amazon_sqs/
intersections.py:7-18); this is the missing maintenance half of that
write path, expressed Spark-first.

Scale notes: sizing uses the filesystem's content summary (works on
HDFS/S3A, not just local), the rewrite is one distributed job, and an
optional ``cluster_by`` re-sorts via ``repartitionByRange`` +
``sortWithinPartitions`` so compaction doubles as range-clustering
(file-level min/max stay tight → scan pruning keeps working after the
rewrite). The write lands in a fresh directory; swapping it over the
source atomically is the caller's (table format's) job — this module
never deletes data.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


@dataclass
class CompactionStats:
    in_files: int
    in_bytes: int
    out_files: int
    rows: int


def _content_summary(spark: SparkSession, path: str) -> tuple[int, int]:
    """(data_file_count, total_bytes) via the Hadoop FS API — FS-agnostic."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n_files, n_bytes = 0, 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith(("_", ".")):  # _SUCCESS, hidden markers
            continue
        n_files += 1
        n_bytes += status.getLen()
    return n_files, n_bytes


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    cluster_by: list[str] | None = None,
    zorder_by: tuple[str, str] | None = None,
) -> CompactionStats:
    """Rewrite the parquet files under ``src_dir`` into
    ``ceil(total_bytes / target_file_bytes)`` files at ``dst_dir``.

    ``cluster_by``: optionally range-partition + sort the rewrite on
    these columns, so compacted files carry tight min/max ranges for
    scan pruning (the OPTIMIZE ... ZORDER-lite for a single sort key
    family). Without it the rewrite is a plain round-robin
    ``repartition`` — pure size normalization.

    ``zorder_by``: two INTEGER key columns to interleave into a Morton
    value and range-cluster on it — the OPTIMIZE ZORDER layout: each
    compacted file becomes a rectangle in (a, b) key space, so its
    min/max stats prune scans filtered on EITHER key (the property the
    ``zorder_clustering`` query materializes; this writes it). The
    helper column is dropped before the write. Mutually exclusive with
    ``cluster_by``.
    """
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    in_files, in_bytes = _content_summary(spark, src_dir)
    n_out = max(1, math.ceil(in_bytes / target_file_bytes))

    df = spark.read.parquet(src_dir)
    if zorder_by:
        from pyspark.sql import functions as F

        from motorway_spark.queries.profiling import _z_expr

        a, b = zorder_by
        df = (
            df.withColumn("__zval", F.expr(_z_expr(a, b)))
            .repartitionByRange(n_out, "__zval")
            .sortWithinPartitions("__zval")
            .drop("__zval")
        )
    elif cluster_by:
        df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.repartition(n_out)
    df.write.mode("errorifexists").parquet(dst_dir)

    out_files, _ = _content_summary(spark, dst_dir)
    rows = spark.read.parquet(dst_dir).count()
    return CompactionStats(
        in_files=in_files, in_bytes=in_bytes, out_files=out_files, rows=rows
    )
