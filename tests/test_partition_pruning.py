"""Partition layout + pruning: static partition pruning and dynamic
partition pruning (DPP) against a year-partitioned fact table — the
lakehouse layout pattern for 100 TB facts (SCALE.md "Scans")."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F


def _partitioned_orders(spark, sf_dir, tmp_path) -> str:
    out = str(tmp_path / f"orders_part_{uuid.uuid4().hex[:6]}")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.partitionBy("o_year").parquet(out)
    return out


def test_static_partition_pruning(spark, sf_dir, tmp_path):
    path = _partitioned_orders(spark, sf_dir, tmp_path)
    df = spark.read.parquet(path).filter(F.col("o_year") == 1995)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan
    # count must equal the unpartitioned filter
    expected = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.year("o_orderdate") == 1995)
        .count()
    )
    assert df.count() == expected


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: the partition filter comes from the OTHER side of a join at
    runtime — a dim filter prunes fact partitions without a static
    predicate on the fact."""
    path = _partitioned_orders(spark, sf_dir, tmp_path)
    fact = spark.read.parquet(path)
    dim = (
        spark.createDataFrame([(1995, "y95"), (1996, "y96")], "yr int, tag string")
    )
    joined = fact.join(dim, fact.o_year == dim.yr).filter(F.col("tag") == "y95")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.year("o_orderdate") == 1995)
        .count()
    )
    assert joined.count() == expected


def test_staging_tags_distinct_for_same_basename_dirs(tmp_path):
    """r5 regression: two fixture dirs with the same BASENAME must not
    share a staged-derivation cache (a generated /tmp/x/sf0.001 next to
    the real sf0.001 silently served the other's staged CSV/topic —
    caught by the generated-fixture sweep)."""
    from motorway_spark.queries.scans import _sf_tag

    a = str(tmp_path / "a" / "sf0.001")
    b = str(tmp_path / "b" / "sf0.001")
    assert _sf_tag(a) != _sf_tag(b)
    assert _sf_tag(a) == _sf_tag(a + "/")  # trailing-slash stable
    assert _sf_tag(a).startswith("sf0.001-")


def test_staging_tag_changes_when_fixture_regenerated_in_place(tmp_path):
    """The staging tag must also key on fixture CONTENT (size/mtime):
    the driver regenerates fixtures at the SAME path between rounds, and
    a path-only tag would serve the previous round's staged derivations."""
    import os
    import time

    from motorway_spark.catalog import sf_tag

    d = tmp_path / "sf0.001"
    d.mkdir()
    f = d / "supplier.parquet"
    f.write_bytes(b"one")
    t1 = sf_tag(str(d))
    time.sleep(0.01)
    f.write_bytes(b"two+")  # different size AND mtime
    t2 = sf_tag(str(d))
    assert t1 != t2
    # unchanged content -> stable tag
    assert sf_tag(str(d)) == t2
    # and an empty dir still tags (path-only fallback)
    e = tmp_path / "empty" / "sf0.001"
    os.makedirs(e)
    assert sf_tag(str(e)).startswith("sf0.001-")
