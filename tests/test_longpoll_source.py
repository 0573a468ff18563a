"""Push-shaped long-poll source invariants (S5 twin of
/root/reference/motorway/contrib/salesforce/ramps.py:13-69): pushed
events leave the wire on poll, so the subscriber's internal buffer —
the contrib/kafka/ramps.py:40 ``insertion_queue`` pattern — must carry
them from transport to delivery; replays serve from the buffer; a
restart replays the WAL above the committed watermark."""

from __future__ import annotations

import json
import os

from motorway_spark.sources.longpoll import LongPollChannel, LongPollStreamReader
from motorway_spark.sources import register_sources
from motorway_spark.streaming.runner import start_and_drain


def _events(lo, hi):
    return [{"Id": f"sobj-{i}", "Amount": i * 10} for i in range(lo, hi)]


def test_poll_consumes_wire_and_buffers(tmp_path):
    chan = LongPollChannel(str(tmp_path / "chan"))
    chan.push(_events(0, 3))
    chan.push(_events(3, 5))
    r = LongPollStreamReader({"path": str(tmp_path / "chan")})
    start = r.initialOffset()
    end = r.latestOffset()
    assert end["seq"] - start["seq"] == 5
    # the wire is now empty (push files consumed)...
    assert chan.connect() == []
    # ...but the batch still serves every pushed event, in push order
    rows = [row for p in r.partitions(start, end) for row in r.read(p)]
    assert [row[0] for row in rows] == [f"sobj-{i}" for i in range(5)]
    assert json.loads(rows[2][1])["Amount"] == 20


def test_replayed_batch_rereads_identical_rows(tmp_path):
    chan = LongPollChannel(str(tmp_path / "chan"))
    chan.push(_events(0, 4))
    r = LongPollStreamReader({"path": str(tmp_path / "chan")})
    start, end = r.initialOffset(), r.latestOffset()
    first = [row for p in r.partitions(start, end) for row in r.read(p)]
    replay = [row for p in r.partitions(start, end) for row in r.read(p)]
    assert first == replay  # wire long gone; buffer is authoritative


def test_commit_evicts_and_restart_replays_uncommitted(tmp_path):
    chan = LongPollChannel(str(tmp_path / "chan"))
    r = LongPollStreamReader({"path": str(tmp_path / "chan")})
    chan.push(_events(0, 3))
    end1 = r.latestOffset()
    r.commit(end1)  # batch 1 delivered
    chan.push(_events(3, 6))
    r.latestOffset()  # batch 2 polled (wire consumed!) but NOT committed
    del r

    # crash + restart: a FRESH reader must re-deliver exactly the
    # uncommitted events — the reference's in-memory queue loses these
    r2 = LongPollStreamReader({"path": str(tmp_path / "chan")})
    start2 = r2.initialOffset()
    assert start2["seq"] == end1["seq"]  # committed watermark honored
    end2 = r2.latestOffset()  # nothing new on the wire
    rows = [row for p in r2.partitions(start2, end2) for row in r2.read(p)]
    assert [row[0] for row in rows] == ["sobj-3", "sobj-4", "sobj-5"]


def test_longpoll_streaming_end_to_end_exactly_once(spark, tmp_path):
    import uuid

    register_sources(spark)
    chan_dir = str(tmp_path / "chan_e2e")
    chan = LongPollChannel(chan_dir)
    chan.push(_events(0, 8))
    chan.push(_events(8, 12))

    stream = spark.readStream.format("longpoll").option("path", chan_dir).load()
    query = start_and_drain(
        lambda: stream.writeStream.format("memory")
        .queryName(f"lp_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    name = query.name
    query.stop()
    out = spark.table(name)
    assert out.count() == 12
    assert out.select("event_id").distinct().count() == 12  # exactly once
    amounts = {json.loads(r["payload"])["Amount"] for r in out.collect()}
    assert amounts == {i * 10 for i in range(12)}


def test_wal_compacts_on_commit(tmp_path):
    chan = LongPollChannel(str(tmp_path / "chan"))
    r = LongPollStreamReader({"path": str(tmp_path / "chan")})
    chan.push(_events(0, 100))
    end = r.latestOffset()
    wal = os.path.join(str(tmp_path / "chan"), "_subscriber_wal.jsonl")
    assert sum(1 for _ in open(wal)) == 100
    r.commit(end)
    assert sum(1 for _ in open(wal)) == 0  # bounded by in-flight data


def test_longpoll_query_restart_from_checkpoint(spark, tmp_path):
    """Full StreamingQuery restart: events pushed between runs must be
    counted exactly once after resuming from the checkpoint — the
    query-level proof that the WAL + committed-watermark machinery
    composes with Spark's offset log (the unit tests above prove the
    reader contract in isolation)."""
    register_sources(spark)
    chan_dir = str(tmp_path / "chan_restart")
    chan = LongPollChannel(chan_dir)
    chk = str(tmp_path / "chk")
    out_name = "lp_restart_counts"

    def start_query():
        stream = spark.readStream.format("longpoll").option("path", chan_dir).load()
        from pyspark.sql import functions as F

        agg = stream.agg(F.count("*").alias("n"))
        return (
            agg.writeStream.format("memory")
            .queryName(out_name)
            .outputMode("complete")
            .option("checkpointLocation", chk)
            .start()
        )

    chan.push(_events(0, 6))
    q = start_and_drain(start_query)
    q.stop()
    chan.push(_events(6, 10))  # pushed while the query is DOWN
    q2 = start_and_drain(start_query)  # fresh reader: commit + WAL resume
    q2.processAllAvailable()
    n = spark.table(out_name).collect()[0]["n"]
    q2.stop()
    assert n == 10  # every pushed event exactly once across the restart
