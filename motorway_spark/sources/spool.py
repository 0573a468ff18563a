"""SQS-shaped spool-directory streaming source.

Rebuilds the SQSRamp contract (/root/reference/motorway/contrib/
amazon_sqs/ramps.py:8-31: poll a queue, emit message bodies, delete on
pipeline-wide success) against a local spool directory standing in for
the queue (boto3/SQS isn't available in this environment; the Spark-side
contract — offsets, partitions, batch commit, delete-on-commit — is the
real thing and is what a boto3-backed twin would reuse unchanged).

Each spool file is one JSON message: {"id": ..., "body": {...}}.
Offsets are sorted-filename watermarks; ``commit`` deletes consumed
files exactly like SQS delete-on-success (ramps.py:28-31).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "message_id STRING, body STRING, grouping_value STRING"


class _FilesPartition(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class SpoolStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.spool_dir = options["path"]
        self.delete_on_commit = str(options.get("deleteOnCommit", "true")).lower() == "true"
        self.max_files = int(options.get("maxFilesPerTrigger", 100))
        self.num_partitions = int(options.get("numPartitions", 4))
        self._seen: list[str] = []

    def _list(self) -> list[str]:
        try:
            return sorted(
                f for f in os.listdir(self.spool_dir) if f.endswith(".json")
            )
        except FileNotFoundError:
            return []

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        """Advance by at most ``maxFilesPerTrigger`` NEW files per poll.

        The cap bounds per-trigger intake (R4 backpressure), not total
        progress: filtering against already-seen names lets the source
        advance past the cap even when ``deleteOnCommit`` is off (the
        replayable-log mode) — taking the first N of the raw listing
        would wedge on the same N files forever in that mode."""
        seen = set(self._seen)
        new = [f for f in self._list() if f not in seen][: self.max_files]
        merged = sorted(seen | set(new))
        self._seen = merged
        return {"files": merged}

    def partitions(self, start: dict, end: dict):
        """Shard the batch into up to ``numPartitions`` InputPartitions.

        The Kinesis shard model (/root/reference/motorway/contrib/
        amazon_kinesis/ramps.py:186-315) minus the DynamoDB lease table:
        Spark's scheduler replaces lease ownership, each InputPartition
        reads its slice in parallel on an executor. A single partition
        per batch would cap source throughput at one Python worker —
        the throughput ceiling a 1000-executor cluster must not have.
        Round-robin over the sorted listing keeps every shard's file
        list itself sorted (per-shard ordering, like Kinesis preserves
        order within a shard but not across shards).
        """
        new_files = sorted(set(end["files"]) - set(start["files"]))
        n = max(1, min(self.num_partitions, len(new_files)))
        shards = [new_files[i::n] for i in range(n)]
        return [
            _FilesPartition([os.path.join(self.spool_dir, f) for f in shard])
            for shard in shards
            if shard
        ] or [_FilesPartition([])]

    def read(self, partition: _FilesPartition):
        for path in partition.files:
            try:
                with open(path) as fh:
                    msg = json.load(fh)
            except (OSError, json.JSONDecodeError):
                continue  # crash isolation: bad message, skip (ramp.py:167-168)
            body = msg.get("body")
            body_str = json.dumps(body, sort_keys=True)
            yield (
                str(msg.get("id")),
                body_str,
                str(body.get("group")) if isinstance(body, dict) else None,
            )

    def commit(self, end: dict) -> None:
        """Pipeline-wide success → delete consumed messages (SQS
        delete-on-success semantics)."""
        if not self.delete_on_commit:
            return
        for f in end["files"]:
            try:
                os.remove(os.path.join(self.spool_dir, f))
            except FileNotFoundError:
                pass


class _SpoolWriteMessage(WriterCommitMessage):
    """Per-task commit message: staged (tmp_path, final_name) pairs."""

    def __init__(self, staged: list[tuple[str, str]]):
        self.staged = staged


class SpoolStreamWriter(DataSourceStreamWriter):
    """First-class streaming WRITER on the Python Data Source API —
    the sink half of the Ramp contract done as a data source rather
    than ``foreachBatch`` (``SpoolDirSink`` in sinks/spool.py is the
    foreachBatch twin; this one lets user code say
    ``df.writeStream.format("spooldir")`` symmetrically with the read
    side).

    Two-phase protocol: ``write`` (executor) stages each record under
    ``_staging/`` and returns the staged names; ``commit`` (driver,
    only after EVERY task succeeded) atomically renames them to their
    final per-record-id names — a replayed micro-batch re-stages and
    the renames overwrite the same names, so replay is a no-op
    (SQS-dedup-id semantics, exactly like the foreachBatch twin);
    ``abort`` removes the staged files so failed batches leave no
    partial output. Local/shared-FS semantics: commit renames on the
    driver — the pattern object stores implement with a manifest."""

    def __init__(self, options, schema: StructType):
        self.spool_dir = options["path"]
        self.id_col = options.get("idCol", "message_id")
        if self.id_col not in schema.fieldNames():
            raise ValueError(
                f"idCol {self.id_col!r} not in stream schema {schema.fieldNames()}"
            )

    def write(self, iterator) -> _SpoolWriteMessage:
        import uuid

        staged_dir = os.path.join(self.spool_dir, "_staging")
        os.makedirs(staged_dir, exist_ok=True)
        staged: list[tuple[str, str]] = []
        for row in iterator:
            d = row.asDict(recursive=True)
            rid = str(d.pop(self.id_col))
            tmp = os.path.join(staged_dir, f"{rid}-{uuid.uuid4().hex[:8]}.json.tmp")
            with open(tmp, "w") as fh:
                json.dump({"id": rid, "body": d}, fh, sort_keys=True)
            staged.append((tmp, f"{rid}.json"))
        return _SpoolWriteMessage(staged)

    def commit(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, final in m.staged:
                try:
                    os.replace(tmp, os.path.join(self.spool_dir, final))
                except FileNotFoundError:
                    pass  # already promoted by a duplicate task attempt

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is None:
                continue
            for tmp, _final in m.staged:
                try:
                    os.remove(tmp)
                except FileNotFoundError:
                    pass


class SpoolBatchReader(DataSourceReader):
    """Batch quadrant of the spool source: one-shot read of the ENTIRE
    spool (no offsets, no delete) — the ``spark.read`` form for
    reprocessing a queue's backlog as a table. Same file sharding and
    crash-isolated parse as the stream reader."""

    def __init__(self, options):
        self._stream = SpoolStreamReader(options)

    def partitions(self):
        files = self._stream._list()
        return self._stream.partitions({"files": []}, {"files": files})

    def read(self, partition: _FilesPartition):
        return self._stream.read(partition)


class SpoolBatchWriter(DataSourceWriter):
    """Batch quadrant of the spool sink: ``df.write.format("spooldir")``
    with the SAME two-phase staged protocol as the streaming writer —
    stage on executors, promote on driver commit only after every task
    succeeded, abort removes partials. Re-writing the same rows
    overwrites the same per-id names (replay/no-dupe semantics)."""

    def __init__(self, options, schema: StructType):
        self._impl = SpoolStreamWriter(options, schema)

    def write(self, iterator) -> _SpoolWriteMessage:
        return self._impl.write(iterator)

    def commit(self, messages) -> None:
        self._impl.commit(messages, batchId=-1)

    def abort(self, messages) -> None:
        self._impl.abort(messages, batchId=-1)


class SpoolDirSource(DataSource):
    """All four Python Data Source API quadrants over one format:
    batch read, stream read (offsets + delete-on-commit), batch write,
    stream write (two-phase staged commit)."""

    @classmethod
    def name(cls) -> str:
        return "spooldir"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SpoolBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return SpoolStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> SpoolBatchWriter:
        return SpoolBatchWriter(self.options, schema)

    def streamWriter(self, schema: StructType, overwrite: bool) -> SpoolStreamWriter:
        return SpoolStreamWriter(self.options, schema)
