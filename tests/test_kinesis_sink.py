"""Kinesis-shaped sink invariants (reference contract:
/root/reference/motorway/contrib/amazon_kinesis/intersections.py:26-69):
retry ONLY throttled/internal-failure records; permanent errors are
dead-lettered without dropping the rest of the batch; requests honor the
500-record put_records cap."""

from __future__ import annotations

import json
import os

import pytest

from motorway_spark.sinks.kinesis import (
    KinesisPutRecordsSink,
    MockKinesisStream,
    _chunk_requests,
)


def _mk_sink(tmp_path, **kw):
    stream_dir = str(tmp_path / "stream")
    stream = MockKinesisStream(stream_dir)
    sink = KinesisPutRecordsSink(
        client_factory=lambda: MockKinesisStream(stream_dir),
        stream_name="test-stream",
        dead_letter_dir=str(tmp_path / "dlq"),
        key_col="user",
        body_cols=["user", "amount"],
        throttle_wait_sec=0.0,
        **kw,
    )
    return stream, sink


def _batch(spark, rows):
    return spark.createDataFrame(rows, "user string, amount long").coalesce(1)


def test_all_success_lands_every_record(spark, tmp_path):
    stream, sink = _mk_sink(tmp_path)
    sink.put_batch(_batch(spark, [(f"u{i}", i) for i in range(20)]), 0)
    got = stream.accepted()
    assert len(got) == 20
    assert {r["PartitionKey"] for r in got} == {f"u{i}" for i in range(20)}


def test_throttled_records_retry_and_land_exactly_once(spark, tmp_path):
    stream, sink = _mk_sink(tmp_path)
    stream.set_plan(throttle={"u1": 2, "u3": 1})  # throttled for N attempts
    sink.put_batch(_batch(spark, [(f"u{i}", i) for i in range(5)]), 0)
    got = stream.accepted()
    assert {r["PartitionKey"] for r in got} == {f"u{i}" for i in range(5)}
    assert len(got) == 5  # exactly once despite retries


def test_retry_resends_only_the_failed_records(spark, tmp_path):
    """The index-alignment property the reference gets wrong
    (intersections.py:54 indexes the original batch with a
    shrunken-response index): every retry call must contain exactly the
    records the previous attempt throttled — nothing else."""
    stream, sink = _mk_sink(tmp_path)
    stream.set_plan(throttle={"u1": 1, "u4": 2})
    sink.put_batch(_batch(spark, [(f"u{i}", i) for i in range(5)]), 0)
    calls = stream.calls()
    assert [sorted(r["PartitionKey"] for r in c) for c in calls] == [
        ["u0", "u1", "u2", "u3", "u4"],  # attempt 1: full batch
        ["u1", "u4"],                    # attempt 2: only throttled
        ["u4"],                          # attempt 3: only still-throttled
    ]


def test_permanent_errors_dead_letter_without_dropping_batch(spark, tmp_path):
    stream, sink = _mk_sink(tmp_path)
    stream.set_plan(fail={"u2": "ValidationException"}, throttle={"u4": 1})
    sink.put_batch(_batch(spark, [(f"u{i}", i) for i in range(5)]), 0)
    # the other four records all land
    assert {r["PartitionKey"] for r in stream.accepted()} == {"u0", "u1", "u3", "u4"}
    # the bad record is dumped for replayability, never retried
    dlq = os.listdir(str(tmp_path / "dlq"))
    assert len(dlq) == 1
    with open(tmp_path / "dlq" / dlq[0]) as fh:
        dumped = json.load(fh)
    assert dumped["ErrorCode"] == "ValidationException"
    assert json.loads(dumped["Data"])["user"] == "u2"
    for call in stream.calls()[1:]:  # retry calls exclude the failed record
        assert "u2" not in {r["PartitionKey"] for r in call}


def test_retry_exhaustion_raises(spark, tmp_path):
    stream, sink = _mk_sink(tmp_path, max_attempts=3)
    stream.set_plan(throttle={"u0": 99})
    with pytest.raises(Exception, match="still throttled"):
        sink.put_batch(_batch(spark, [("u0", 0), ("u1", 1)]), 0)
    # the healthy record was not blocked by its throttled peer
    assert {r["PartitionKey"] for r in stream.accepted()} == {"u1"}


def test_requests_chunk_at_500_records():
    records = [
        {"PartitionKey": f"k{i}", "Data": b"x" * 10} for i in range(1203)
    ]
    chunks = _chunk_requests(records)
    assert [len(c) for c in chunks] == [500, 500, 203]
    # order preserved end to end
    flat = [r["PartitionKey"] for c in chunks for r in c]
    assert flat == [f"k{i}" for i in range(1203)]


def test_requests_chunk_at_5mb():
    big = b"x" * (1024 * 1024 - 2)  # ~1 MB each → 4 per 5 MB request
    records = [{"PartitionKey": f"k{i}", "Data": big} for i in range(9)]
    chunks = _chunk_requests(records)
    assert [len(c) for c in chunks] == [5, 4]


def test_oversize_record_dead_letters(spark, tmp_path):
    stream, sink = _mk_sink(tmp_path)
    rows = [("small", 1), ("big", 2)]
    df = spark.createDataFrame(rows, "user string, amount long").coalesce(1)
    # inflate the "big" row's body past 1 MB via a padded column
    from pyspark.sql import functions as F

    df = df.withColumn(
        "pad",
        F.when(F.col("user") == "big", F.lit("p" * 16).cast("string")).otherwise(F.lit("")),
    )
    df = df.withColumn("pad", F.rpad("pad", 1_100_000, "p"))
    df = df.withColumn("pad", F.when(F.col("user") == "big", F.col("pad")).otherwise(F.lit("")))
    sink.body_cols = ["user", "amount", "pad"]
    sink.put_batch(df, 0)
    assert {r["PartitionKey"] for r in stream.accepted()} == {"small"}
    dlq_files = os.listdir(str(tmp_path / "dlq"))
    assert len(dlq_files) == 1
    with open(tmp_path / "dlq" / dlq_files[0]) as fh:
        assert json.load(fh)["ErrorCode"] == "RecordTooLarge"
