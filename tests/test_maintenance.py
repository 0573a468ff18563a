"""Small-file compaction: size-targeted rewrite, content-preserving,
optional range clustering with tight per-file key ranges."""

from __future__ import annotations

import glob
import os
import uuid

from motorway_spark.maintenance import compact_parquet


def _fragmented_copy(spark, sf_dir, tmp, n_frag=64):
    src = os.path.join(tmp, "frag")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(n_frag).write.parquet(
        src
    )
    return src


def test_compaction_reduces_file_count_preserving_content(spark, sf_dir):
    tmp = f"/tmp/motorway_compact/{uuid.uuid4().hex}"
    src = _fragmented_copy(spark, sf_dir, tmp)
    dst = os.path.join(tmp, "compact")

    orig = spark.read.parquet(src)
    n_rows = orig.count()
    _, total_bytes = __import__(
        "motorway_spark.maintenance", fromlist=["_content_summary"]
    )._content_summary(spark, src)

    stats = compact_parquet(
        spark, src, dst, target_file_bytes=max(1, total_bytes // 4)
    )
    assert stats.in_files == 64
    assert stats.rows == n_rows
    assert stats.out_files <= 5  # ceil(total/(total/4)) = 4 (+rounding)
    assert stats.out_files < stats.in_files

    # content equality, order-insensitive: anti-joins empty both ways
    compacted = spark.read.parquet(dst)
    cols = orig.columns
    assert orig.join(compacted, cols, "left_anti").count() == 0
    assert compacted.join(orig, cols, "left_anti").count() == 0


def test_compaction_cluster_by_gives_tight_file_ranges(spark, sf_dir):
    tmp = f"/tmp/motorway_compact/{uuid.uuid4().hex}"
    src = _fragmented_copy(spark, sf_dir, tmp, n_frag=16)
    dst = os.path.join(tmp, "clustered")

    _, total_bytes = __import__(
        "motorway_spark.maintenance", fromlist=["_content_summary"]
    )._content_summary(spark, src)
    stats = compact_parquet(
        spark,
        src,
        dst,
        target_file_bytes=max(1, total_bytes // 8),  # ~8 clustered files
        cluster_by=["l_orderkey"],
    )
    assert stats.rows == spark.read.parquet(src).count()

    # per-file l_orderkey ranges must be (near-)disjoint after range
    # clustering: the max of file i stays below the min of file i+2
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(glob.glob(os.path.join(dst, "part-*.parquet"))):
        t = pq.read_table(f, columns=["l_orderkey"])
        if t.num_rows:
            col = t.column("l_orderkey").to_pylist()
            ranges.append((min(col), max(col)))
    ranges.sort()
    overlaps = sum(
        1 for (a, b) in zip(ranges, ranges[1:]) if a[1] > b[0]
    )
    # rangepartitioning boundaries are sampled => allow boundary touch,
    # but wholesale interleaving means clustering failed
    assert overlaps <= len(ranges) // 4


def test_compaction_zorder_interleaves_keys(spark, sf_dir):
    tmp = f"/tmp/motorway_compact/{uuid.uuid4().hex}"
    src = _fragmented_copy(spark, sf_dir, tmp, n_frag=16)
    dst = os.path.join(tmp, "zordered")

    _, total_bytes = __import__(
        "motorway_spark.maintenance", fromlist=["_content_summary"]
    )._content_summary(spark, src)
    stats = compact_parquet(
        spark,
        src,
        dst,
        target_file_bytes=max(1, total_bytes // 8),
        zorder_by=("l_partkey", "l_suppkey"),
    )
    assert stats.rows == spark.read.parquet(src).count()
    compacted = spark.read.parquet(dst)
    assert "__zval" not in compacted.columns

    # Morton range-clustering must tighten per-file l_partkey spans well
    # below the global span (the dominant-bit dimension at this key
    # ratio; the smaller-width key tightens once file count exceeds the
    # larger key's bit headroom — not asserted here).
    import pyarrow.parquet as pq

    spans, glo_min, glo_max = [], None, None
    for f in sorted(glob.glob(os.path.join(dst, "part-*.parquet"))):
        t = pq.read_table(f, columns=["l_partkey"])
        if t.num_rows:
            col = t.column("l_partkey").to_pylist()
            lo, hi = min(col), max(col)
            spans.append(hi - lo)
            glo_min = lo if glo_min is None else min(glo_min, lo)
            glo_max = hi if glo_max is None else max(glo_max, hi)
    assert len(spans) >= 4
    assert sum(spans) / len(spans) < 0.6 * (glo_max - glo_min)


def test_compaction_single_file_and_roundtrip_stats(spark, sf_dir):
    """Edge: a source already within target size compacts to ONE file
    and stats stay truthful."""
    tmp = f"/tmp/motorway_compact/{uuid.uuid4().hex}"
    src = os.path.join(tmp, "small")
    spark.read.parquet(f"{sf_dir}/region.parquet").coalesce(1).write.parquet(src)
    dst = os.path.join(tmp, "compacted")
    stats = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert stats.out_files == 1
    assert stats.rows == spark.read.parquet(src).count()


# ---------------------------------------------------------------------------
# CacheRegistry: shared operator cache lifecycle
# ---------------------------------------------------------------------------

from motorway_spark.maintenance import CACHES, CacheRegistry


def test_cache_registry_exclusive_swap_releases_other_scopes(spark, sf_dir):
    reg = CacheRegistry()
    # genuinely different plans: same-shaped frames that differ only in
    # output NAMES canonicalize identically, and CacheManager would match
    # one against the other's cache entry
    a = spark.range(100).withColumnRenamed("id", "a")
    b = spark.range(200).filter("id % 2 = 0").withColumnRenamed("id", "b")

    a = reg.persist_swap("op_a", a)
    assert a.storageLevel.useMemory
    assert reg.scopes() == ["op_a"]

    b = reg.persist_swap("op_b", b)
    assert b.storageLevel.useMemory
    # op_a's cache was released when op_b registered (exclusive default)
    assert reg.scopes() == ["op_b"]
    assert not a.storageLevel.useMemory
    # released-but-referenced frames still compute (lineage recompute)
    assert a.count() == 100
    reg.release_all()
    assert reg.scopes() == []
    assert not b.storageLevel.useMemory


def test_cache_registry_same_scope_swap_and_non_exclusive(spark):
    reg = CacheRegistry()
    a1 = reg.persist_swap("op", spark.range(10))
    a2 = reg.persist_swap("op", spark.range(20))
    assert not a1.storageLevel.useMemory
    assert a2.storageLevel.useMemory

    other = reg.persist_swap("other", spark.range(5), exclusive=False)
    # non-exclusive: both live
    assert sorted(reg.scopes()) == ["op", "other"]
    assert a2.storageLevel.useMemory and other.storageLevel.useMemory
    reg.release_all()


def test_cache_registry_release_is_best_effort(spark):
    """A dead frame (stopped session / raising unpersist) must not fail
    the NEXT operator's registration (r5 advice)."""

    class _Dead:
        def unpersist(self):
            raise RuntimeError("SparkContext was shut down")

    reg = CacheRegistry()
    reg._live["dead"] = _Dead()  # simulate a frame from a stopped session
    fresh = reg.persist_swap("fresh", spark.range(3))
    assert fresh.storageLevel.useMemory
    assert reg.scopes() == ["fresh"]
    reg.release_all()


def test_operators_back_to_back_release_each_other(spark, sf_dir):
    """The SCALE.md sf10 lesson, pinned: running containment then
    pagerank leaves only pagerank's cache live (and vice versa)."""
    from motorway_spark.queries.dedup import dedup_containment
    from motorway_spark.queries.graph import graph_pagerank_bipartite

    dedup_containment(spark, sf_dir).count()
    assert "containment.doc_sets" in CACHES.scopes()

    graph_pagerank_bipartite(spark, sf_dir).count()
    assert "pagerank.edges" in CACHES.scopes()
    assert "containment.doc_sets" not in CACHES.scopes()

    dedup_containment(spark, sf_dir).count()
    assert CACHES.scopes() == ["containment.doc_sets"]
    CACHES.release_all()
