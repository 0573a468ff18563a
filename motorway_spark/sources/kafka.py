"""Kafka-shaped streaming source (mocked broker, real Spark contract).

Rebuilds the KafkaRamp contract (/root/reference/motorway/contrib/kafka/
ramps.py:17-235) without a broker in the environment — exactly as the
reference itself tests it with a mocked consumer
(/root/reference/motorway/tests/test_kafka.py:10-17). Two layers:

1. ``OffsetTracker`` — the ramp's ack bookkeeping, isolated and
   reusable: per-partition uncompleted-offset sets, commit-the-oldest-
   uncompleted on success (ramps.py:180-198), drop-on-failure
   (ramps.py:200-211), and the two throttle caps
   (MAX_UNCOMPLETED_ITEMS_PER_PARTITION=3000 per partition,
   MAX_TOTAL_UNCOMPLETED_ITEMS=10000 global, ramps.py:30-31,61-84).
   The reference's invariant tests port against this class verbatim
   (tests/test_kafka.py:67-174).

2. ``KafkaLogSource`` ("kafkalog") — a Python DataSource stream reader
   over a partitioned append-only log directory
   (``partition-N.jsonl``; offset = line number, key/value per line),
   the on-disk shape of a topic. One ``InputPartition`` per Kafka
   partition → Spark reads partitions in parallel, the consumer-group
   model minus the rebalance protocol (Spark's scheduler owns
   assignment, like the cluster manager owns membership for T8).
   ``latestOffset`` bounds each micro-batch by the reference's caps:
   per-trigger record limit (GET_RECORDS_LIMIT=1000, ramps.py:32),
   per-partition and global in-flight caps counted as
   read-but-uncommitted offsets — backpressure as an offset-range
   bound instead of a sleep loop (ramps.py:86-93). ``commit(end)``
   persists the consumer group's committed offsets to a sidecar JSON —
   by then every earlier offset has been processed, which is precisely
   the "commit the oldest uncompleted" guarantee the reference
   maintains by hand.

At scale: a real broker version of this is ``spark.readStream
.format("kafka")`` with ``maxOffsetsPerTrigger`` (the per-trigger cap)
and ``minPartitions``; this source exists so the contract and its
invariants are executable in-repo.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "partition INT, offset BIGINT, key STRING, value STRING"

MAX_UNCOMPLETED_ITEMS_PER_PARTITION = 3000  # ramps.py:30
MAX_TOTAL_UNCOMPLETED_ITEMS = 10000  # ramps.py:31
GET_RECORDS_LIMIT = 1000  # ramps.py:32


class OffsetTracker:
    """KafkaRamp's in-flight bookkeeping (ramps.py:40-42,61-93,180-211).

    Offsets become *uncompleted* when consumed and leave the set on
    success/failure; the committed offset per partition only ever
    advances to the oldest still-uncompleted offset, so a restart
    re-reads at most the in-flight window and never skips a message.
    """

    def __init__(
        self,
        max_uncompleted_per_partition: int = MAX_UNCOMPLETED_ITEMS_PER_PARTITION,
        max_total_uncompleted: int = MAX_TOTAL_UNCOMPLETED_ITEMS,
    ):
        self.max_uncompleted_per_partition = max_uncompleted_per_partition
        self.max_total_uncompleted = max_total_uncompleted
        self.uncompleted_ids: dict[int, set[int]] = defaultdict(set)
        self.committed_offsets: dict[int, int] = defaultdict(int)

    # -- consumption ---------------------------------------------------
    def consume(self, partition: int, offset: int) -> None:
        self.uncompleted_ids[partition].add(offset)

    # -- throttle (ramps.py:61-84) -------------------------------------
    def blocked_partitions(self) -> list[int]:
        return [
            p
            for p, items in self.uncompleted_ids.items()
            if len(items) > self.max_uncompleted_per_partition
        ]

    def total_uncompleted(self) -> int:
        return sum(len(items) for items in self.uncompleted_ids.values())

    def too_many_uncompleted(self) -> bool:
        return bool(self.blocked_partitions()) or (
            self.total_uncompleted() > self.max_total_uncompleted
        )

    # -- ack path (ramps.py:180-211) -----------------------------------
    def success(self, partition: int, offset: int) -> int | None:
        """Mark processed; return the newly committed offset (or None).

        Commits the oldest uncompleted offset for the partition — or
        ``offset + 1`` when nothing is in flight — and only if that
        advances the committed position.
        """
        if offset not in self.uncompleted_ids[partition]:
            return None
        self.uncompleted_ids[partition].remove(offset)
        remaining = self.uncompleted_ids[partition]
        oldest = min(remaining) if remaining else offset + 1
        if oldest > self.committed_offsets[partition]:
            self.committed_offsets[partition] = oldest
            return oldest
        return None

    def failed(self, partition: int, offset: int) -> None:
        self.uncompleted_ids[partition].discard(offset)


class _LogPartition(InputPartition):
    def __init__(self, path: str, partition: int, start: int, end: int):
        self.path = path
        self.partition = partition
        self.start = start
        self.end = end


class KafkaLogReader(DataSourceStreamReader):
    def __init__(self, options):
        self.log_dir = options["path"]
        self.records_limit = int(options.get("getRecordsLimit", GET_RECORDS_LIMIT))
        self.max_per_partition = int(
            options.get("maxUncompletedPerPartition", MAX_UNCOMPLETED_ITEMS_PER_PARTITION)
        )
        self.max_total = int(
            options.get("maxTotalUncompleted", MAX_TOTAL_UNCOMPLETED_ITEMS)
        )
        self.group_id = options.get("groupId", "motorway")
        # read-position per partition (advanced in latestOffset — the
        # Python DataSource API polls latestOffset for availability, so
        # offsets MUST move there, not in commit()).
        self._positions: dict[str, int] = dict(self._committed())

    # -- broker-side state --------------------------------------------
    def _partition_files(self) -> dict[str, str]:
        try:
            names = os.listdir(self.log_dir)
        except FileNotFoundError:
            return {}
        out = {}
        for name in sorted(names):
            if name.startswith("partition-") and name.endswith(".jsonl"):
                out[name[len("partition-"):-len(".jsonl")]] = os.path.join(
                    self.log_dir, name
                )
        return out

    def _log_end_offsets(self) -> dict[str, int]:
        ends = {}
        for part, path in self._partition_files().items():
            with open(path, "rb") as fh:
                ends[part] = sum(1 for _ in fh)
        return ends

    # -- consumer-group sidecar ---------------------------------------
    def _group_file(self) -> str:
        return os.path.join(self.log_dir, f"_group-{self.group_id}.json")

    def _committed(self) -> dict[str, int]:
        try:
            with open(self._group_file()) as fh:
                return {str(k): int(v) for k, v in json.load(fh).items()}
        except (OSError, json.JSONDecodeError):
            return {}

    # -- stream reader contract ---------------------------------------
    def initialOffset(self) -> dict:
        return {"offsets": dict(self._committed())}

    def latestOffset(self) -> dict:
        """Advance each partition, bounded by the reference's caps
        applied PER TRIGGER.

        The reference caps *cumulative unacked* records and pauses
        consumption until acks catch up (ramps.py:74-93). In Spark the
        WAL already guarantees at most one micro-batch is in flight —
        batch N completes before N+1 plans — so the equivalent bound
        is on per-trigger intake. Bounding *cumulative uncommitted*
        here instead would DEADLOCK a capped backlog: the engine fires
        ``commit(N)`` only when batch N+1 starts, but would never
        start N+1 because a blocked latestOffset reports no new data
        (found by the sf0.1 sweep: a 100k-row topic truncated at the
        10k global cap).
        """
        ends = self._log_end_offsets()
        global_budget = self.max_total
        new_positions = dict(self._positions)
        for part in sorted(ends):
            pos = new_positions.get(part, 0)
            headroom = min(
                ends[part] - pos,  # available in the log
                self.records_limit,  # per-trigger poll cap
                self.max_per_partition,  # per-partition trigger cap
                max(global_budget, 0),  # global trigger cap
            )
            if headroom > 0:
                new_positions[part] = pos + headroom
                global_budget -= headroom
        self._positions = new_positions
        return {"offsets": new_positions}

    def partitions(self, start: dict, end: dict):
        files = self._partition_files()
        out = []
        for part, end_off in sorted(end["offsets"].items()):
            start_off = start.get("offsets", {}).get(part, 0)
            if end_off > start_off and part in files:
                out.append(
                    _LogPartition(files[part], int(part), start_off, end_off)
                )
        # one InputPartition per Kafka partition → parallel read
        return out or [_LogPartition("", -1, 0, 0)]

    def read(self, partition: _LogPartition):
        if partition.partition < 0:
            return
        with open(partition.path) as fh:
            for offset, line in enumerate(fh):
                if offset >= partition.end:
                    break
                if offset < partition.start:
                    continue
                try:
                    msg = json.loads(line)
                except json.JSONDecodeError:
                    continue  # crash isolation: skip poison message
                yield (
                    partition.partition,
                    offset,
                    msg.get("key"),
                    json.dumps(msg.get("value"), sort_keys=True),
                )

    def commit(self, end: dict) -> None:
        """Batch fully processed → persist the group's committed
        offsets. Spark only calls this once every record before ``end``
        is done, so committing ``end`` IS committing the oldest
        uncompleted offset (ramps.py:183-198) — there are none older."""
        committed = self._committed()
        for part, off in end.get("offsets", {}).items():
            if off > committed.get(part, 0):
                committed[part] = off
        tmp = self._group_file() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(committed, fh)
        os.replace(tmp, self._group_file())


class KafkaLogSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafkalog"

    def schema(self) -> str:
        return SCHEMA_DDL

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return KafkaLogReader(self.options)
