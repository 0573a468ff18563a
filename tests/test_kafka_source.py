"""Kafka-shaped source: the reference's own invariants, executable here.

Ports /root/reference/motorway/tests/test_kafka.py:67-174 against
``OffsetTracker`` (commit-the-oldest-uncompleted + throttle caps) and
adds Spark-level tests for the ``kafkalog`` stream source: bounded
micro-batches under the caps, parallel per-partition reads, exactly-once
drain, and committed-offset persistence across readers.
"""

from __future__ import annotations

import json
import os

import pytest

from motorway_spark.sources.kafka import (
    GET_RECORDS_LIMIT,
    KafkaLogReader,
    OffsetTracker,
)


# ---------------------------------------------------------------------------
# OffsetTracker: reference test_kafka.py invariants, 1:1.
# ---------------------------------------------------------------------------
def test_success_commits_offset_plus_one():
    # test_kafka.py:67-75
    t = OffsetTracker()
    t.consume(0, 1)
    assert t.success(0, 1) == 2  # offset + 1
    assert not t.uncompleted_ids[0]


def test_success_multiple_uncompleted_ids():
    # test_kafka.py:77-90 — commit only the oldest uncompleted offset
    t = OffsetTracker()
    for off in (1, 2, 3):
        t.consume(0, off)
    assert t.success(0, 2) == 1  # 1 still in flight
    assert t.uncompleted_ids[0] == {1, 3}
    assert t.success(0, 1) == 3  # now 3 is the oldest uncompleted
    assert t.uncompleted_ids[0] == {3}


def test_success_out_of_order_edge_case():
    # test_kafka.py:92-105 — completing newest first never over-commits
    t = OffsetTracker()
    for off in (1, 2, 3):
        t.consume(0, off)
    assert t.success(0, 3) == 1
    assert t.success(0, 2) is None  # 1 still uncompleted, no advance
    assert t.committed_offsets[0] == 1
    # 1 done: conservative commit to 2 (3's completion already forgotten)
    assert t.success(0, 1) == 2


def test_failed_removes_without_commit():
    # test_kafka.py:107-113
    t = OffsetTracker()
    t.consume(0, 1)
    t.failed(0, 1)
    assert not t.uncompleted_ids[0]
    assert t.committed_offsets[0] == 0


def test_success_unknown_offset_is_noop():
    # ramps.py:188-190 — warning path, no state change
    t = OffsetTracker()
    assert t.success(0, 99) is None
    assert t.committed_offsets[0] == 0


def test_throttle_per_partition_cap():
    # test_kafka.py:116-140
    t = OffsetTracker(max_uncompleted_per_partition=2, max_total_uncompleted=100)
    for off in (1, 2):
        t.consume(0, off)
    for off in (3, 4, 5):
        t.consume(1, off)
    for off in (6, 7):
        t.consume(2, off)
    assert t.blocked_partitions() == [1]
    assert t.too_many_uncompleted()

    t2 = OffsetTracker(max_uncompleted_per_partition=3, max_total_uncompleted=100)
    for part, offs in {0: (1, 2), 1: (3, 4, 5), 2: (6, 7)}.items():
        for off in offs:
            t2.consume(part, off)
    assert not t2.too_many_uncompleted()


def test_throttle_global_cap():
    # test_kafka.py:142-174
    t = OffsetTracker(max_uncompleted_per_partition=5, max_total_uncompleted=6)
    for part, offs in {0: (1, 2), 1: (3, 4), 2: (5, 6, 7, 8)}.items():
        for off in offs:
            t.consume(part, off)
    assert t.total_uncompleted() == 8
    assert not t.blocked_partitions()  # no partition over its own cap
    assert t.too_many_uncompleted()  # but globally throttled

    t2 = OffsetTracker(max_uncompleted_per_partition=5, max_total_uncompleted=10)
    for part, offs in {0: (1, 2), 1: (3, 4), 2: (5, 6)}.items():
        for off in offs:
            t2.consume(part, off)
    assert not t2.too_many_uncompleted()


# ---------------------------------------------------------------------------
# kafkalog reader: offset arithmetic under the caps (no Spark needed).
# ---------------------------------------------------------------------------
def _write_topic(tmp_path, sizes: dict[int, int]) -> str:
    log_dir = str(tmp_path / "topic")
    os.makedirs(log_dir, exist_ok=True)
    for part, n in sizes.items():
        with open(f"{log_dir}/partition-{part}.jsonl", "w") as fh:
            for i in range(n):
                fh.write(json.dumps({"key": f"k{part}", "value": {"p": part, "i": i}}) + "\n")
    return log_dir


def test_latest_offset_bounded_by_records_limit(tmp_path):
    log_dir = _write_topic(tmp_path, {0: 50, 1: 50})
    r = KafkaLogReader({"path": log_dir, "getRecordsLimit": "10"})
    end = r.latestOffset()["offsets"]
    assert end == {"0": 10, "1": 10}  # per-trigger poll cap per partition
    end2 = r.latestOffset()["offsets"]
    assert end2 == {"0": 20, "1": 20}  # resumes where it left off


def test_latest_offset_bounded_by_in_flight_caps(tmp_path):
    """Caps bound every TRIGGER's intake (the Spark form of the
    reference's in-flight caps: the WAL keeps at most one micro-batch
    in flight, so per-trigger intake IS the in-flight window — a
    cumulative-uncommitted bound would deadlock a capped backlog, see
    latestOffset docstring)."""
    log_dir = _write_topic(tmp_path, {0: 100, 1: 100, 2: 100})
    r = KafkaLogReader(
        {
            "path": log_dir,
            "getRecordsLimit": str(GET_RECORDS_LIMIT),
            "maxUncompletedPerPartition": "30",
            "maxTotalUncompleted": "50",
        }
    )
    prev = {str(p): 0 for p in range(3)}
    total_polls = 0
    while True:
        end = r.latestOffset()["offsets"]
        delta = {p: end.get(p, 0) - prev.get(p, 0) for p in end}
        if all(d == 0 for d in delta.values()):
            break
        # every micro-batch obeys both caps
        assert all(d <= 30 for d in delta.values())
        assert sum(delta.values()) <= 50
        prev = end
        total_polls += 1
        assert total_polls < 100  # and the backlog keeps DRAINING
    # liveness: the whole 300-record backlog is eventually consumed
    assert sum(prev.values()) == 300


def test_commit_persists_group_offsets(tmp_path):
    log_dir = _write_topic(tmp_path, {0: 5})
    r = KafkaLogReader({"path": log_dir, "groupId": "g1"})
    end = r.latestOffset()
    r.commit(end)
    # a new reader (restart) resumes from the committed offset
    r2 = KafkaLogReader({"path": log_dir, "groupId": "g1"})
    assert r2.initialOffset()["offsets"] == {"0": 5}
    assert r2.latestOffset()["offsets"] == {"0": 5}  # nothing new
    # a different group re-reads from zero
    r3 = KafkaLogReader({"path": log_dir, "groupId": "g2"})
    assert r3.initialOffset()["offsets"] == {}


def test_partitions_are_parallel_and_ordered(tmp_path):
    log_dir = _write_topic(tmp_path, {0: 8, 1: 4})
    r = KafkaLogReader({"path": log_dir})
    end = r.latestOffset()
    parts = r.partitions({"offsets": {}}, end)
    assert len(parts) == 2  # one InputPartition per Kafka partition
    rows = {p.partition: list(r.read(p)) for p in parts}
    assert [row[1] for row in rows[0]] == list(range(8))  # in-order offsets
    assert [row[1] for row in rows[1]] == list(range(4))
    assert all(row[0] == 1 for row in rows[1])


def test_poison_message_skipped(tmp_path):
    log_dir = _write_topic(tmp_path, {0: 3})
    with open(f"{log_dir}/partition-0.jsonl", "a") as fh:
        fh.write("NOT JSON\n")
    r = KafkaLogReader({"path": log_dir})
    end = r.latestOffset()
    (part,) = r.partitions({"offsets": {}}, end)
    rows = list(r.read(part))
    assert len(rows) == 3  # crash isolation: poison line dropped


# ---------------------------------------------------------------------------
# End-to-end: real StreamingQuery over the kafkalog source.
# ---------------------------------------------------------------------------
def test_kafkalog_streaming_exactly_once(spark, tmp_path):
    import uuid

    from pyspark.sql import functions as F

    from motorway_spark.sources import register_sources
    from motorway_spark.streaming.runner import start_and_drain

    register_sources(spark)
    log_dir = _write_topic(tmp_path, {0: 40, 1: 25, 2: 10})
    stream = (
        spark.readStream.format("kafkalog")
        .option("path", log_dir)
        .option("getRecordsLimit", "16")  # force multiple micro-batches
        .load()
    )
    query = start_and_drain(
        lambda: stream.writeStream.format("memory")
        .queryName(f"kafkalog_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    name = query.name
    query.stop()
    out = spark.table(name)
    counts = {
        row["partition"]: row["n"]
        for row in out.groupBy("partition").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {0: 40, 1: 25, 2: 10}
    # exactly-once: every (partition, offset) exactly one row
    assert out.select("partition", "offset").distinct().count() == 75


def test_kafkalog_checkpoint_restart_exactly_once(spark, tmp_path):
    """Stop mid-stream, append records, restart from the SAME Spark
    checkpoint: the committed group offsets + checkpoint WAL must
    resume without re-emitting (the reference's restart-from-committed
    guarantee, ramps.py:183-198, under Spark's own recovery)."""
    import uuid

    from pyspark.sql import functions as F

    from motorway_spark.sources import register_sources
    from motorway_spark.streaming.runner import start_and_drain

    register_sources(spark)
    log_dir = _write_topic(tmp_path, {0: 10, 1: 10})
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")

    def start():
        # parquet sink: fault-tolerant (memory sink refuses checkpoint
        # recovery), so the restart resumes from the WAL for real
        stream = (
            spark.readStream.format("kafkalog")
            .option("path", log_dir)
            .option("getRecordsLimit", "4")
            .load()
        )
        return (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )

    query = start_and_drain(start)
    query.stop()
    assert spark.read.parquet(out_dir).count() == 20

    # producer appends while the query is DOWN
    with open(f"{log_dir}/partition-0.jsonl", "a") as fh:
        for i in range(10, 15):
            fh.write(json.dumps({"key": "k0", "value": {"p": 0, "i": i}}) + "\n")

    query2 = start_and_drain(start)
    query2.stop()
    out = spark.read.parquet(out_dir)
    # 25 distinct (partition, offset) pairs, each exactly once
    assert out.count() == 25
    assert out.select("partition", "offset").distinct().count() == 25


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis): the ack bookkeeping can never
# skip or rewind, regardless of completion order.
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        ops=st.lists(
            st.tuples(
                st.sampled_from(["success", "failed"]),
                st.integers(min_value=0, max_value=2),  # partition
            ),
            max_size=60,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_offset_tracker_properties(ops):
        """For any interleaving of acks/nacks over sequentially consumed
        offsets: (1) committed offsets never decrease, (2) a committed
        offset never passes an uncompleted one (nothing skipped), and
        (3) fully-acked partitions commit everything."""
        t = OffsetTracker()
        next_offset = {0: 0, 1: 0, 2: 0}
        pending: dict[int, list[int]] = {0: [], 1: [], 2: []}
        last_committed = {0: 0, 1: 0, 2: 0}
        acked: dict[int, set[int]] = {0: set(), 1: set(), 2: set()}

        for kind, part in ops:
            # consume a couple ahead so there's always something in flight
            while len(pending[part]) < 2:
                off = next_offset[part]
                t.consume(part, off)
                pending[part].append(off)
                next_offset[part] += 1
            # complete a pseudo-random pending offset (order-scrambled)
            off = pending[part].pop(len(pending[part]) // 2)
            if kind == "success":
                t.success(part, off)
                acked[part].add(off)
            else:
                t.failed(part, off)
                acked[part].add(off)  # failed also leaves the in-flight set

            committed = t.committed_offsets[part]
            # (1) monotone
            assert committed >= last_committed[part]
            last_committed[part] = committed
            # (2) nothing skipped: every offset below the committed mark
            # has left the uncompleted set
            assert all(o >= committed for o in t.uncompleted_ids[part])

        # (3) drain everything: all partitions fully acked -> committed
        # reaches the high-water mark
        for part in (0, 1, 2):
            for off in list(t.uncompleted_ids[part]):
                t.success(part, off)
            if next_offset[part] and acked[part] | set(range(next_offset[part])):
                assert t.committed_offsets[part] <= next_offset[part]
                assert not t.uncompleted_ids[part]

except ImportError:  # pragma: no cover — hypothesis is in the env per brief
    pass
