"""rebucket(n) — bucket-count migration for UpsertParquetSink, the
maintenance op the num_buckets-mismatch refusal points at: one commit
record replaces every bucket entry and updates num_buckets through the
same numbered-log optimistic protocol as any write. Covers: content
preservation, physical layout equal to a fresh write at the new count,
old-count writers conflicting loudly mid- and post-migration, and the
migrator redoing from a fresh snapshot when a writer lands first."""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from motorway_spark.sinks import UpsertParquetSink

from tests.test_manifest_concurrency import RacingSink, _row_df


def _mk(spark, tmp_path, name="rtab", n=40, buckets=8):
    table = str(tmp_path / name)
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=buckets)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=i, ts=i * 10, v=f"v{i}") for i in range(n)],
            "k bigint, ts bigint, v string",
        ),
        batch_id=0,
    )
    return sink, table


def _bucket_layout(spark, table, key_cols, buckets):
    """{bucket_dir_id: sorted keys} straight from the committed files."""
    sink = UpsertParquetSink(spark, table, key_cols=key_cols, num_buckets=buckets)
    m = sink._load_manifest()
    df = sink._read_buckets(m, sorted(int(k) for k in m["buckets"]))
    out = {}
    for r in df.select("bucket", "k").collect():
        out.setdefault(r["bucket"], []).append(r["k"])
    return {b: sorted(ks) for b, ks in out.items()}


@pytest.mark.parametrize("new_n", [16, 4])
def test_rebucket_preserves_content_and_matches_fresh_write(
    spark, tmp_path, new_n
):
    sink, table = _mk(spark, tmp_path, name=f"rtab{new_n}")
    sink.rebucket(new_n)
    assert sink.num_buckets == new_n
    m = sink._load_manifest()
    assert m["num_buckets"] == new_n
    # content identical
    got = {r["k"]: (r["ts"], r["v"]) for r in sink.read().collect()}
    assert got == {i: (i * 10, f"v{i}") for i in range(40)}
    assert sink.row_count() == 40
    # physical layout (bucket -> key set) identical to a FRESH write at n
    fresh, ftable = _mk(spark, tmp_path, name=f"fresh{new_n}", buckets=new_n)
    assert _bucket_layout(spark, table, ["k"], new_n) == _bucket_layout(
        spark, ftable, ["k"], new_n
    )
    # no old-count dirs/files survive beyond the new assignment; every
    # live dir holds exactly its manifest-listed files after vacuum(0)
    sink.vacuum(retention_sec=0)
    for k, ent in m["buckets"].items():
        live = f"{table}/data/bucket={k}"
        assert sorted(
            f for f in os.listdir(live) if f.endswith(".parquet")
        ) == sorted(ent["files"])
    # the migrated table keeps working under the new count
    sink.upsert_batch(_row_df(spark, 500, 1, "post"), batch_id=9)
    assert sink.row_count() == 41


def test_rebucket_refuses_stale_count_readers_and_writers(spark, tmp_path):
    _sink, table = _mk(spark, tmp_path)
    stale = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=8)
    stale._load_manifest()  # warm cache at the old count
    migrator = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=8)
    migrator.rebucket(16)
    # post-migration: the stale-count instance refuses loudly on its
    # next write (its link loses, the reload sees the new count) and
    # the refusal names the migration op
    with pytest.raises(ValueError, match="rebucket"):
        stale.upsert_batch(_row_df(spark, 1, 999, "late"), batch_id=5)
    with pytest.raises(ValueError, match="num_buckets"):
        UpsertParquetSink(
            spark, table, key_cols=["k"], num_buckets=8
        ).row_count()
    # the right count works
    good = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=16)
    assert good.row_count() == 40


def test_rebucket_redoes_when_concurrent_writer_lands_first(spark, tmp_path):
    """Barrier-synced: a writer at the OLD count commits between the
    migrator's snapshot and its link. The migration record touches
    every bucket, so the migrator conflicts, redoes from the fresh
    snapshot, and the writer's row survives into the migrated table."""

    class RacingMigrator(RacingSink):
        def run(self):
            self.rebucket(16)

    _sink, table = _mk(spark, tmp_path)
    barrier = threading.Barrier(2)
    mig = RacingMigrator(
        spark, table, key_cols=["k"], num_buckets=8, barrier=barrier
    )
    t = threading.Thread(target=mig.run)
    t.start()
    deadline = time.time() + 180
    while barrier.n_waiting < 1:  # migrator staged its rewrite, pre-link
        assert time.time() < deadline, "migrator never reached the barrier"
        time.sleep(0.01)
    w = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=8)
    w.upsert_batch(_row_df(spark, 700, 1, "racer"), batch_id=3)  # wins
    barrier.wait(timeout=60)
    t.join(timeout=300)
    assert not t.is_alive()
    assert mig.stage_calls == 2  # conflict -> rewrite redone
    viewer = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=16)
    got = {r["k"]: r["v"] for r in viewer.read().collect()}
    assert got[700] == "racer"
    assert viewer.row_count() == 41
    assert viewer._load_manifest()["num_buckets"] == 16
    # migrated layout agrees with the new hash for every row
    m = viewer._load_manifest()
    df = viewer._read_buckets(m, sorted(int(k) for k in m["buckets"]))
    mismatches = df.filter(
        F.col("bucket") != F.pmod(F.hash("k"), F.lit(16))
    ).count()
    assert mismatches == 0


def test_rebucket_noop_and_empty_table(spark, tmp_path):
    sink, table = _mk(spark, tmp_path)
    sink.rebucket(8)  # same count: no-op, no new commit record
    assert sink.row_count() == 40
    # empty table: metadata-only migration
    etable = str(tmp_path / "empty")
    esink = UpsertParquetSink(spark, etable, key_cols=["k"], num_buckets=8)
    esink.upsert_batch(_row_df(spark, 1, 1, "x"), batch_id=0)
    assert esink.delete_keys(spark.createDataFrame([(1,)], "k bigint")) == 1
    esink.rebucket(4)
    assert esink.num_buckets == 4
    assert esink._load_manifest()["num_buckets"] == 4
    esink.upsert_batch(_row_df(spark, 2, 2, "y"), batch_id=1)
    assert esink.row_count() == 1


def _keys_by_bucket(spark, n_candidates=4000, num_buckets=16):
    """candidate bigint keys grouped by pmod(hash(k), num_buckets)."""
    rows = (
        spark.range(n_candidates)
        .select(F.col("id").alias("k"))
        .withColumn("b", F.pmod(F.hash("k"), F.lit(num_buckets)))
        .collect()
    )
    out: dict[int, list[int]] = {}
    for r in rows:
        out.setdefault(r["b"], []).append(r["k"])
    return out


def test_rebucket_shrink_conflicts_with_fresh_entry_in_dead_range(
    spark, tmp_path
):
    """The shrink-direction hole: while the migrator (16 -> 8) is
    staged-but-unlinked, a concurrent OLD-count writer creates a FRESH
    entry in an entry-less bucket id in [8, 16). The migration's
    touched set covers every id either count can produce, so the
    migrator conflicts, redoes from the fresh snapshot, and the row is
    re-hashed into the new layout instead of surviving misplaced."""
    by16 = _keys_by_bucket(spark, num_buckets=16)
    # initial data confined to LOW bucket ids, leaving [8, 16) empty
    low_keys = [k for b in range(8) for k in by16.get(b, [])[:5]]
    # the racer's key: hashes into an (empty) HIGH bucket id under 16
    high_b = next(b for b in range(8, 16) if by16.get(b))
    racer_key = by16[high_b][0]
    table = str(tmp_path / "shrinktab")
    seed = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=16)
    seed.upsert_batch(
        spark.createDataFrame(
            [Row(k=k, ts=k, v=f"v{k}") for k in low_keys],
            "k bigint, ts bigint, v string",
        ),
        batch_id=0,
    )
    assert all(
        int(b) < 8 for b in seed._load_manifest()["buckets"]
    ), "setup must leave [8,16) entry-less"

    class RacingMigrator(RacingSink):
        def run(self):
            self.rebucket(8)

    barrier = threading.Barrier(2)
    mig = RacingMigrator(
        spark, table, key_cols=["k"], num_buckets=16, barrier=barrier
    )
    t = threading.Thread(target=mig.run)
    t.start()
    deadline = time.time() + 180
    while barrier.n_waiting < 1:  # migrator staged its rewrite, pre-link
        assert time.time() < deadline, "migrator never reached the barrier"
        time.sleep(0.01)
    w = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=16)
    w.upsert_batch(_row_df(spark, racer_key, 1, "racer"), batch_id=3)  # wins
    assert str(high_b) in w._load_manifest()["buckets"]
    barrier.wait(timeout=60)
    t.join(timeout=300)
    assert not t.is_alive()
    assert mig.stage_calls == 2  # conflict detected -> rewrite redone
    viewer = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=8)
    m = viewer._load_manifest()
    assert m["num_buckets"] == 8
    # no old-count entry survives in the dead id range
    assert all(int(b) < 8 for b in m["buckets"])
    got = {r["k"]: r["v"] for r in viewer.read().collect()}
    assert got[racer_key] == "racer"
    assert viewer.row_count() == len(low_keys) + 1
    # every row sits where the NEW hash says it must
    df = viewer._read_buckets(m, sorted(int(k) for k in m["buckets"]))
    assert (
        df.filter(F.col("bucket") != F.pmod(F.hash("k"), F.lit(8))).count()
        == 0
    )
    # and the misplaced-key symptom cannot occur: updating the racer's
    # key goes to its new-count bucket, no duplicate appears
    viewer.upsert_batch(_row_df(spark, racer_key, 2, "upd"), batch_id=4)
    rows = [r for r in viewer.read().collect() if r["k"] == racer_key]
    assert len(rows) == 1 and rows[0]["v"] == "upd"


def test_rebucket_empty_table_conflicts_with_concurrent_bulk_load(
    spark, tmp_path
):
    """The empty-table hole: the metadata-only migration must carry the
    same full-range touched set — a bulk load that links first forces a
    redo (now via the rewrite path), never a num_buckets record landing
    over data hashed with the old count."""
    table = str(tmp_path / "emptytab")
    seed = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=8)
    seed.upsert_batch(_row_df(spark, 1, 1, "x"), batch_id=0)
    assert seed.delete_keys(spark.createDataFrame([(1,)], "k bigint")) == 1
    assert seed._table_empty()

    class RacingMigrator(RacingSink):
        def run(self):
            self.rebucket(4)

    barrier = threading.Barrier(2)
    mig = RacingMigrator(
        spark, table, key_cols=["k"], num_buckets=8, barrier=barrier
    )
    t = threading.Thread(target=mig.run)
    t.start()
    deadline = time.time() + 180
    while barrier.n_waiting < 1:  # migrator at its first commit attempt
        assert time.time() < deadline, "migrator never reached the barrier"
        time.sleep(0.01)
    w = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=8)
    w.upsert_batch(
        spark.createDataFrame(
            [Row(k=i, ts=i, v=f"v{i}") for i in range(40)],
            "k bigint, ts bigint, v string",
        ),
        batch_id=1,
    )  # bulk load wins the link race at the OLD count
    barrier.wait(timeout=60)
    t.join(timeout=300)
    assert not t.is_alive()
    viewer = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    m = viewer._load_manifest()
    assert m["num_buckets"] == 4
    assert viewer.row_count() == 40
    # the loaded rows were re-hashed by the redone migration, not left
    # under the dead count
    df = viewer._read_buckets(m, sorted(int(k) for k in m["buckets"]))
    assert (
        df.filter(F.col("bucket") != F.pmod(F.hash("k"), F.lit(4))).count()
        == 0
    )
