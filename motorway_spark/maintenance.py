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


# ---------------------------------------------------------------------------
# Operator cache lifecycle
# ---------------------------------------------------------------------------
#
# Several operators persist an intermediate frame that feeds multiple plan
# branches of ONE invocation (containment doc_sets, pagerank edge list,
# SemDeDup cell assignment). The frame must outlive the call — the returned
# DataFrame references it lazily and materializes later — so it can't be
# unpersisted on return; but left unmanaged, back-to-back jobs accumulate
# live caches that starve each other's fills (the SCALE.md sf10 lesson:
# three operators' leftover caches evicted the fourth's working set).
#
# CacheRegistry gives those operators one shared lifecycle:
#   * one live frame per SCOPE (an operator name) — re-invoking an operator
#     releases its own previous cache;
#   * registering under a NEW scope releases every OTHER scope's cache
#     (exclusive-by-default): these are single-job working sets, and by the
#     time the next operator starts, the previous one's result has been
#     materialized. Release is unpersist, not deletion — Spark lineage
#     recomputes if a stale handle is re-materialized, so this is a
#     performance policy, never a correctness hazard. Pass exclusive=False
#     for deliberately concurrent jobs.
#   * every release is BEST-EFFORT: the old frame may belong to a
#     since-stopped SparkSession (test suites and tools create several);
#     py4j raises on a stopped context, and that must not fail the NEXT
#     job before it starts.

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402


class CacheRegistry:
    def __init__(self) -> None:
        self._live: dict[str, DataFrame] = {}

    def persist_swap(
        self,
        scope: str,
        df: DataFrame,
        *,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        eager: bool = True,
        exclusive: bool = True,
    ) -> DataFrame:
        """Persist ``df`` as ``scope``'s live cache, releasing the scope's
        previous frame (and, when ``exclusive``, every other scope's).
        ``eager`` fills the cache with a count() so concurrent plan
        branches don't race an empty cache and each re-run the input map.

        Lifetime contract for ``exclusive=False`` scopes (the second+
        cache of one query, e.g. the ivfpq codes frames): they stay
        resident until the next exclusive swap — a harness running many
        queries in one session must call :meth:`release_all` between
        queries (bench.py and tools/sweep_correctness.py do)."""
        self.release(scope)
        if exclusive:
            for other in [s for s in self._live if s != scope]:
                self.release(other)
        df = df.persist(storage_level)
        self._live[scope] = df
        if eager:
            df.count()
        return df

    def release(self, scope: str) -> None:
        df = self._live.pop(scope, None)
        if df is not None:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — stopped session, dead JVM
                pass

    def release_all(self) -> None:
        for scope in list(self._live):
            self.release(scope)

    def scopes(self) -> list[str]:
        return sorted(self._live)


CACHES = CacheRegistry()
