"""rebucket_policy — the policy half of rebucket(n): manifest-stat
sizing recommendations (hold rows/bucket at the target, power-of-two
counts, 2x hysteresis), applied migrations keeping the layout matched
to a decade of registry growth, and the shrink direction after mass
deletes."""

from __future__ import annotations

from pyspark.sql import functions as F

from motorway_spark.sinks import UpsertParquetSink


def _shard(spark, lo, n):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("ts"),
        F.format_string("v%d", F.col("id")).alias("v"),
    )


def test_policy_keeps_rows_per_bucket_across_growth_decade(spark, tmp_path):
    """A registry growing 16x (>a decade) with the helper applied after
    each epoch: bucket count follows, rows/bucket stays within 2x of
    target (the flat-ingest discipline), content survives every
    migration, and post-migration ingest still rides the append path."""
    table = str(tmp_path / "gtab")
    target = 500
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    total = 0
    bid = 0
    for epoch, add in enumerate((2000, 2000, 4000, 8000, 16000)):
        sink.upsert_batch(_shard(spark, total, add), batch_id=bid)
        total += add
        bid += 1
        rep = sink.rebucket_policy(target_rows_per_bucket=target, apply=True)
        assert rep["rows"] == total
        after = sink.rebucket_policy(target_rows_per_bucket=target)
        assert after["action"] == "keep"  # hysteresis: no thrash
        assert after["rows_per_bucket"] <= 2 * target
        assert after["rows_per_bucket"] >= target / 2
    assert sink.num_buckets == 64  # 32000 rows / 500 -> 64
    assert sink.row_count() == total
    # the resized layout still takes the O(|shard|) append path
    import json
    import os

    sink.upsert_batch(_shard(spark, total, 100), batch_id=bid)
    names = sorted(
        n for n in os.listdir(f"{table}/_mlog") if n.endswith(".delta.json")
    )
    with open(f"{table}/_mlog/{names[-1]}") as fh:
        assert json.load(fh)["op"] == "append"


def test_policy_recommends_shrink_after_mass_delete(spark, tmp_path):
    table = str(tmp_path / "stab")
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=64)
    sink.upsert_batch(_shard(spark, 0, 32000), batch_id=0)
    assert sink.delete_where(F.col("k") >= 2000) == 30000
    rep = sink.rebucket_policy(target_rows_per_bucket=500)
    assert rep["action"] == "shrink"
    assert rep["recommended_num_buckets"] == 4
    assert rep["applied"] is False  # report-only without apply
    assert sink.num_buckets == 64
    rep = sink.rebucket_policy(target_rows_per_bucket=500, apply=True)
    assert rep["applied"] and sink.num_buckets == 4
    assert sink.row_count() == 2000


def test_policy_report_fields_and_keep(spark, tmp_path):
    table = str(tmp_path / "ktab")
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    sink.upsert_batch(_shard(spark, 0, 2000), batch_id=0)
    rep = sink.rebucket_policy(target_rows_per_bucket=500)
    assert rep["action"] == "keep" and rep["applied"] is False
    assert rep["num_buckets"] == 4 and rep["rows"] == 2000
    assert rep["rows_per_bucket"] == 500.0
    assert rep["files"] >= 4
