"""Push-shaped (long-poll) SaaS source with a durable internal buffer.

Rebuilds SalesforceStreamingObjectRamp (/root/reference/motorway/
contrib/salesforce/ramps.py:13-69): a CometD push-topic subscriber
whose ``next()`` long-polls ``/meta/connect`` and yields whatever the
server pushed since the last poll. Unlike the cursor-paginated shape
(pagedapi), pushed events are NOT re-addressable — once a poll returns
them they are gone from the wire, so the subscriber must buffer them
until delivery is assured. The reference pattern is an internal buffer
between the transport and the emit loop (``KafkaRamp.insertion_queue``,
contrib/kafka/ramps.py:40 — the risk-register item SURVEY §7.4).

Mapping onto Spark's pull-based source contract:

- ``latestOffset()`` performs the long-poll (transport → buffer),
  assigns each pushed event a monotonically increasing sequence number,
  appends it to a WAL sidecar (fsync before the offset is exposed), and
  returns the high-water mark. This is the ONE place the wire is read.
- ``partitions(start, end)/read()`` serve rows purely from the buffer —
  a replayed or re-planned batch re-reads identical rows even though
  the wire was consumed long ago.
- ``commit(end)`` persists the delivered watermark and evicts buffered
  events below it; the WAL is compacted to the live suffix.
- On restart a fresh reader replays the WAL above the committed
  watermark, so pushed-but-undelivered events survive a crash — this is
  where the twin is deliberately STRONGER than the reference, whose
  in-memory queue drops such events (modern CometD offers ``replayId``
  for the same reason).

Driver/executor split at scale: the long-poll is inherently a single
subscription (one clientId), so the transport thread lives with the
reader; the per-batch fan-out to executors happens in ``read`` over
sequence-ranged partitions. Throughput-bound ingest belongs to the
partitioned sources (kafkalog/spooldir); this shape exists for push
feeds, which are low-rate control/CDC streams.

The wire sits behind a pluggable poll transport (sources/transports.py):
the default ``dir`` transport is the mock channel DIRECTORY (same twin
pattern as the kafkalog broker — producers drop ``push-*.json`` files,
a poll consumes every unconsumed file and moves it to ``consumed/``,
emulating "delivered once, gone from the wire"); ``transport=http``
long-polls a real endpoint over stdlib urllib (the production wiring,
same source code path). The WAL/commit sidecars need a local dir in
either case: ``walDir`` (defaults to the channel dir for the dir
transport).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "event_id STRING, payload STRING, seq BIGINT"


class LongPollChannel:
    """Mock CometD channel: push side drops files, poll side consumes
    them (a consumed file moves out of the channel — pushed data is
    delivered exactly once by the transport, like a long-poll response)."""

    def __init__(self, channel_dir: str):
        self.channel_dir = channel_dir
        os.makedirs(channel_dir, exist_ok=True)
        os.makedirs(os.path.join(channel_dir, "consumed"), exist_ok=True)

    def push(self, events: list[dict]) -> None:
        """Producer side (the server pushing to the subscriber). File
        names sort in push order (monotonic clock prefix) — the
        transport delivers in order, like a CometD event stream."""
        import time
        import uuid

        path = os.path.join(
            self.channel_dir,
            f"push-{time.monotonic_ns():020d}-{uuid.uuid4().hex[:6]}.json",
        )
        tmp = f"{path}.tmp"
        with open(tmp, "w") as fh:
            json.dump(events, fh)
        os.replace(tmp, path)

    def connect(self) -> list[dict]:
        """Subscriber side: one ``/meta/connect`` long-poll — returns
        (and consumes) everything pushed since the previous poll."""
        events: list[dict] = []
        for name in sorted(os.listdir(self.channel_dir)):
            if not (name.startswith("push-") and name.endswith(".json")):
                continue
            path = os.path.join(self.channel_dir, name)
            with open(path) as fh:
                events.extend(json.load(fh))
            os.replace(path, os.path.join(self.channel_dir, "consumed", name))
        return events


class _SeqPartition(InputPartition):
    def __init__(self, rows: list[tuple[str, str, int]]):
        self.rows = rows


class LongPollStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        from motorway_spark.sources.transports import make_poll_transport

        # durable subscriber state (WAL + commit watermark) needs a local
        # dir even when the wire is HTTP; defaults to the channel dir
        self.state_dir = options.get("walDir") or options.get("path")
        if not self.state_dir:
            raise ValueError("longpoll needs 'path' or 'walDir' for its WAL")
        os.makedirs(self.state_dir, exist_ok=True)
        self.id_field = options.get("idField", "Id")
        self.rows_per_partition = int(options.get("rowsPerPartition", 500))
        self.channel = make_poll_transport(options)
        committed = self._committed()
        # replay the WAL suffix above the committed watermark: pushed
        # events a crashed run polled but never delivered come back
        self._buffer: list[tuple[int, str, str]] = [
            (seq, eid, payload)
            for seq, eid, payload in self._read_wal()
            if seq >= committed
        ]
        self._next_seq = max(
            [committed] + [seq + 1 for seq, _e, _p in self._buffer]
        )

    # -- sidecars -------------------------------------------------------
    def _wal_file(self) -> str:
        return os.path.join(self.state_dir, "_subscriber_wal.jsonl")

    def _commit_file(self) -> str:
        return os.path.join(self.state_dir, "_subscriber_commit.json")

    def _committed(self) -> int:
        try:
            with open(self._commit_file()) as fh:
                return int(json.load(fh)["seq"])
        except (OSError, json.JSONDecodeError, KeyError, ValueError):
            return 0

    def _read_wal(self) -> list[tuple[int, str, str]]:
        out = []
        try:
            with open(self._wal_file()) as fh:
                for line in fh:
                    if line.strip():
                        rec = json.loads(line)
                        out.append((int(rec["seq"]), rec["id"], rec["payload"]))
        except OSError:
            pass
        return out

    def _append_wal(self, entries: list[tuple[int, str, str]]) -> None:
        with open(self._wal_file(), "a") as fh:
            for seq, eid, payload in entries:
                fh.write(json.dumps({"seq": seq, "id": eid, "payload": payload}) + "\n")
            fh.flush()
            os.fsync(fh.fileno())

    # -- stream reader contract ----------------------------------------
    def initialOffset(self) -> dict:
        return {"seq": self._committed()}

    def latestOffset(self) -> dict:
        pushed = self.channel.connect()
        fresh: list[tuple[int, str, str]] = []
        for event in pushed:
            eid = str(event.get(self.id_field))
            payload = json.dumps(event, sort_keys=True)
            fresh.append((self._next_seq, eid, payload))
            self._next_seq += 1
        if fresh:
            # WAL before the offset becomes visible: once Spark plans a
            # batch over these seqs they must be servable after a crash
            self._append_wal(fresh)
            self._buffer.extend(fresh)
        return {"seq": self._next_seq}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["seq"]), int(end["seq"])
        rows = [
            (eid, payload, seq)
            for seq, eid, payload in self._buffer
            if lo <= seq < hi
        ]
        if not rows:
            return [_SeqPartition([])]
        k = self.rows_per_partition
        return [_SeqPartition(rows[i : i + k]) for i in range(0, len(rows), k)]

    def read(self, partition: _SeqPartition):
        yield from partition.rows

    def commit(self, end: dict) -> None:
        watermark = int(end["seq"])
        tmp = self._commit_file() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"seq": watermark}, fh)
        os.replace(tmp, self._commit_file())
        delivered = [eid for seq, eid, _p in self._buffer if seq < watermark]
        self._buffer = [e for e in self._buffer if e[0] >= watermark]
        # transports with server-side acknowledgement (SQS delete-on-
        # commit) get told which events Spark has durably delivered;
        # the ack runs AFTER the local watermark is durable, so a crash
        # between the two re-delivers (at-least-once) instead of losing.
        # Best-effort: a transient delete failure must not kill the
        # stream — the un-deleted messages re-deliver after the
        # visibility timeout and the id-keyed downstream absorbs them.
        ack = getattr(self.channel, "ack", None)
        if ack is not None and delivered:
            try:
                ack(delivered)
            except Exception:  # noqa: BLE001
                pass
        # compact the WAL to the live suffix (bounded by in-flight data)
        wal_tmp = self._wal_file() + ".tmp"
        with open(wal_tmp, "w") as fh:
            for seq, eid, payload in self._buffer:
                fh.write(json.dumps({"seq": seq, "id": eid, "payload": payload}) + "\n")
        os.replace(wal_tmp, self._wal_file())


class LongPollSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "longpoll"

    def schema(self) -> str:
        return SCHEMA_DDL

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return LongPollStreamReader(self.options)
