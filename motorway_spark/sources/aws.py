"""boto3 transports for the queue-shaped connectors (SQS + Kinesis).

The reference's AWS connectors speak real boto3:

- SQSRamp polls a queue, yields message bodies, deletes on
  pipeline-wide success (/root/reference/motorway/contrib/amazon_sqs/
  ramps.py:8-31);
- KinesisInsertIntersection batch-puts with a per-record failure
  taxonomy (/root/reference/motorway/contrib/amazon_kinesis/
  intersections.py:10-69);
- KinesisRamp walks shard iterators (/root/reference/motorway/contrib/
  amazon_kinesis/ramps.py:186-315);
- SQSInsertIntersection sends with a message-size guard
  (/root/reference/motorway/contrib/amazon_sqs/intersections.py:7-18,
  utils.py).

The repo's connector twins were built transport-first — dir/HTTP mocks
behind narrow seams — precisely so real AWS could plug in without
touching the Spark-side contract code. This module is that plug:

- :class:`SqsPollTransport` — poll transport for ``LongPollSource``
  (``transport="sqs"``). ``connect()`` drains ``receive_message``;
  messages stay IN-FLIGHT (SQS visibility timeout) until the reader
  commits the Spark batch, at which point the reader's commit hook
  calls :meth:`ack` → ``delete_message_batch``: true SQS
  delete-on-success, scoped to Spark's batch commit instead of the
  reference's per-message ack. A crash between receive and commit
  re-delivers after the visibility timeout (at-least-once — the
  reference's posture, ramps.py:25-31); the WAL-buffered reader plus an
  id-keyed downstream upsert turn that into exactly-once results.
- :class:`KinesisClientFactory` — picklable ``client_factory`` for
  ``KinesisPutRecordsSink``: the adapter's ``put_records(records,
  stream_name)`` is literally ``boto3 put_records``, whose response
  shape (``Records`` rows with ``SequenceNumber`` or ``ErrorCode``) is
  exactly what the sink's selective-retry loop parses — the scripted
  ``MockKinesisStream`` twin and real AWS are drop-in swaps.
- :class:`SqsSendBatchSink` — foreachBatch sink over
  ``send_message_batch`` with the AWS 10-record request cap and the
  reference's 256 KiB message-size guard (amazon_sqs/utils.py) routed
  to a dead-letter spool (the Kinesis sink's pattern).
- :func:`read_stream_records` — the shard-iterator cursor walk
  (TRIM_HORIZON → get_records → NextShardIterator), used by tests to
  verify sink output landed; the driver-side skeleton a partitioned
  Kinesis stream reader fans out per shard.
- :func:`read_stream_records_since` — the same walk with per-shard
  AFTER_SEQUENCE_NUMBER resume (the reference ramp's DynamoDB
  checkpoint contract, caller-owned): returns the advanced checkpoint
  map so a crash between read and commit replays exactly the
  uncommitted window.

Everything is endpoint-overridable (``endpoint_url``) so the contract
tests run against an in-process moto server (or localstack via
docker-compose) with no code change; omit it and the default AWS
endpoint/credential chain applies. boto3 imports are lazy and inside
methods — the module imports fine without boto3 installed, and clients
are built per-process so factories pickle cleanly into executor tasks.
"""

from __future__ import annotations

import json
import os

# reference guard: SQS rejects messages over 256 KiB
# (/root/reference/motorway/contrib/amazon_sqs/utils.py)
SQS_MAX_MESSAGE_BYTES = 256 * 1024
SQS_MAX_BATCH_RECORDS = 10


def _boto3_client(service: str, cfg: dict):
    import boto3
    from botocore.config import Config

    # Application-level retry lives in the transports/sinks themselves
    # (selective per-record retry in KinesisPutRecordsSink, visibility-
    # timeout redelivery in SQS). botocore's own retry layer must stay
    # OFF: an HTTP-level resend of a non-idempotent put_records that the
    # server already applied silently duplicates records. The generous
    # read timeout replaces retries for a slow endpoint.
    kwargs = {
        "config": Config(
            retries={"max_attempts": 1, "mode": "standard"},
            connect_timeout=30,
            read_timeout=300,
        )
    }
    for opt, key in (
        ("region", "region_name"),
        ("endpointUrl", "endpoint_url"),
        ("accessKey", "aws_access_key_id"),
        ("secretKey", "aws_secret_access_key"),
    ):
        if cfg.get(opt):
            kwargs[key] = cfg[opt]
    return boto3.client(service, **kwargs)


# ---------------------------------------------------------------------------
# SQS source transport (LongPollSource, transport="sqs")
# ---------------------------------------------------------------------------
class SqsPollTransport:
    """Poll transport over ``receive_message`` with commit-scoped
    deletes. Receipt handles are kept in memory keyed by event id; a
    handle lost to a crash simply means SQS re-delivers after the
    visibility timeout and ``ack`` skips ids it no longer knows."""

    def __init__(
        self,
        queue_url: str,
        *,
        region: str = "",
        endpoint_url: str = "",
        access_key: str = "",
        secret_key: str = "",
        id_field: str = "Id",
        wait_time_sec: int = 0,
        # reference default: 10-minute visibility window
        # (amazon_sqs/ramps.py:19-20; receive batches are already capped
        # at the AWS 10/call inside connect()). wait_time_sec defaults 0
        # because the Spark reader polls on its own trigger cadence — a
        # server-side long poll would block latestOffset; set 5 to
        # mirror the reference's 5 s long poll against real AWS.
        visibility_timeout_sec: int = 600,
        max_messages_per_poll: int = 1000,
    ):
        self.queue_url = queue_url
        self.id_field = id_field
        self.wait_time_sec = wait_time_sec
        self.visibility_timeout_sec = visibility_timeout_sec
        self.max_messages_per_poll = max_messages_per_poll
        self._cfg = {
            "region": region,
            "endpointUrl": endpoint_url,
            "accessKey": access_key,
            "secretKey": secret_key,
        }
        self._client = None
        self._handles: dict[str, str] = {}

    def _cli(self):
        if self._client is None:
            self._client = _boto3_client("sqs", self._cfg)
        return self._client

    def connect(self) -> list[dict]:
        """One poll: drain up to ``max_messages_per_poll`` available
        messages (receive_message caps at 10/call, so loop until empty).
        Bodies must be JSON objects; non-JSON bodies are wrapped as
        ``{"Id": MessageId, "body": <raw>}`` (crash isolation — a bad
        message must not kill the reader, reference ramp.py:167-168)."""
        events: list[dict] = []
        while len(events) < self.max_messages_per_poll:
            resp = self._cli().receive_message(
                QueueUrl=self.queue_url,
                MaxNumberOfMessages=min(
                    10, self.max_messages_per_poll - len(events)
                ),
                WaitTimeSeconds=self.wait_time_sec,
                VisibilityTimeout=self.visibility_timeout_sec,
            )
            messages = resp.get("Messages", [])
            if not messages:
                break
            for msg in messages:
                try:
                    event = json.loads(msg["Body"])
                    if not isinstance(event, dict):
                        raise ValueError("non-object body")
                except (ValueError, KeyError):
                    event = {self.id_field: msg["MessageId"], "body": msg.get("Body")}
                event.setdefault(self.id_field, msg["MessageId"])
                eid = str(event[self.id_field])
                self._handles[eid] = msg["ReceiptHandle"]
                events.append(event)
        return events

    def ack(self, event_ids: list[str]) -> None:
        """Delete the messages behind ``event_ids`` — called by the
        reader when Spark COMMITS the batch that delivered them (the
        SQS delete-on-pipeline-success contract, ramps.py:28-31).
        Unknown ids (handle lost to a restart, or already deleted) are
        skipped; SQS re-delivers their messages and the downstream
        id-keyed upsert absorbs the duplicate."""
        entries = [
            {"Id": str(i), "ReceiptHandle": self._handles.pop(eid)}
            for i, eid in enumerate(event_ids)
            if eid in self._handles
        ]
        for lo in range(0, len(entries), SQS_MAX_BATCH_RECORDS):
            self._cli().delete_message_batch(
                QueueUrl=self.queue_url,
                Entries=entries[lo : lo + SQS_MAX_BATCH_RECORDS],
            )


def make_sqs_poll_transport(options) -> SqsPollTransport:
    """Factory for make_poll_transport (string DataSource options)."""
    return SqsPollTransport(
        options["queueUrl"],
        region=options.get("region", ""),
        endpoint_url=options.get("endpointUrl", ""),
        access_key=options.get("accessKey", ""),
        secret_key=options.get("secretKey", ""),
        id_field=options.get("idField", "Id"),
        wait_time_sec=int(options.get("waitTimeSec", 0)),
        visibility_timeout_sec=int(options.get("visibilityTimeoutSec", 600)),
        max_messages_per_poll=int(options.get("maxMessagesPerPoll", 1000)),
    )


# ---------------------------------------------------------------------------
# Kinesis sink client (KinesisPutRecordsSink client_factory)
# ---------------------------------------------------------------------------
class _KinesisBoto3Adapter:
    def __init__(self, cfg: dict):
        self._client = _boto3_client("kinesis", cfg)

    def put_records(self, records: list[dict], stream_name: str) -> dict:
        # request and response shapes pass through untouched: records
        # are [{"Data": bytes, "PartitionKey": str}], the response's
        # Records rows carry SequenceNumber or ErrorCode/ErrorMessage —
        # the exact taxonomy the sink's retry loop interprets.
        return self._client.put_records(Records=records, StreamName=stream_name)


class KinesisClientFactory:
    """Picklable ``client_factory`` for :class:`KinesisPutRecordsSink`.
    The boto3 client is built lazily inside the executor task (boto3
    clients don't pickle); one client per partition-task, the same
    per-process connection shape as the reference's thread-local
    connections (amazon_kinesis/ramps.py:22-44)."""

    def __init__(
        self,
        *,
        region: str = "",
        endpoint_url: str = "",
        access_key: str = "",
        secret_key: str = "",
    ):
        self._cfg = {
            "region": region,
            "endpointUrl": endpoint_url,
            "accessKey": access_key,
            "secretKey": secret_key,
        }

    def __call__(self) -> _KinesisBoto3Adapter:
        return _KinesisBoto3Adapter(self._cfg)


def read_stream_records(client, stream_name: str) -> list[dict]:
    """Shard-iterator cursor walk: TRIM_HORIZON → get_records →
    NextShardIterator until the tip, for every shard (the reference
    ramp's consumption loop, amazon_kinesis/ramps.py:186-315, minus the
    DynamoDB lease table — Spark's scheduler owns shard assignment).
    Returns [{"PartitionKey": ..., "Data": bytes}] in per-shard order;
    used by the contract tests to verify what the sink landed, and the
    per-shard skeleton a partitioned Kinesis reader would run one
    InputPartition each."""
    records, _ckpt = read_stream_records_since(client, stream_name)
    return [
        {"PartitionKey": r["PartitionKey"], "Data": r["Data"]}
        for r in records
    ]


def read_stream_records_since(
    client, stream_name: str, since: dict | None = None
) -> tuple[list[dict], dict]:
    """Checkpointed shard walk — the R3 (per-source checkpointing)
    contract for Kinesis: each shard resumes AFTER its committed
    sequence number instead of TRIM_HORIZON. The reference ramp
    persists exactly these checkpoints in its DynamoDB lease table
    (amazon_kinesis/ramps.py:186-315 checkpoint/fetch loop); here the
    caller owns them (Spark's streaming checkpoint, or the spool WAL).

    ``since`` maps shard id → last COMMITTED sequence number (missing
    shard = from the horizon, so resharding's new shards are picked
    up). Returns ``(records, checkpoints)``: records carry
    ``ShardId``/``SequenceNumber`` so the caller can commit precisely
    what it processed; ``checkpoints`` is the advanced map to persist
    AFTER downstream effects commit. A crash between read and commit
    replays from the last committed map — no gaps, duplicates bounded
    to the uncommitted window (at-least-once; the engine's idempotent
    sinks make it exactly-once end to end)."""
    since = dict(since or {})
    out: list[dict] = []
    ckpt = dict(since)
    shards = client.describe_stream(StreamName=stream_name)["StreamDescription"][
        "Shards"
    ]
    for shard in shards:
        sid = shard["ShardId"]
        if sid in since:
            it = client.get_shard_iterator(
                StreamName=stream_name,
                ShardId=sid,
                ShardIteratorType="AFTER_SEQUENCE_NUMBER",
                StartingSequenceNumber=since[sid],
            )["ShardIterator"]
        else:
            it = client.get_shard_iterator(
                StreamName=stream_name,
                ShardId=sid,
                ShardIteratorType="TRIM_HORIZON",
            )["ShardIterator"]
        while it:
            resp = client.get_records(ShardIterator=it, Limit=1000)
            for rec in resp["Records"]:
                out.append(
                    {
                        "PartitionKey": rec["PartitionKey"],
                        "Data": rec["Data"],
                        "ShardId": sid,
                        "SequenceNumber": rec["SequenceNumber"],
                    }
                )
                ckpt[sid] = rec["SequenceNumber"]
            if not resp["Records"] and resp.get("MillisBehindLatest", 0) == 0:
                break
            it = resp.get("NextShardIterator")
    return out, ckpt


# ---------------------------------------------------------------------------
# SQS sink (send_message_batch + size guard)
# ---------------------------------------------------------------------------
class SqsSendBatchSink:
    """foreachBatch sink over ``send_message_batch``: rows serialize to
    JSON bodies keyed by ``id_col`` (the SQS MessageDeduplicationId
    analogue); requests chunk at the AWS 10-record cap; a body over
    256 KiB never reaches the wire — it dead-letters to a spool file
    (deterministic name → idempotent on batch replay), the reference's
    size-guard class (amazon_sqs/utils.py) with the Kinesis sink's
    dead-letter treatment."""

    def __init__(
        self,
        queue_url: str,
        dead_letter_dir: str,
        *,
        id_col: str = "message_id",
        region: str = "",
        endpoint_url: str = "",
        access_key: str = "",
        secret_key: str = "",
    ):
        self.queue_url = queue_url
        self.dead_letter_dir = dead_letter_dir
        self.id_col = id_col
        self._cfg = {
            "region": region,
            "endpointUrl": endpoint_url,
            "accessKey": access_key,
            "secretKey": secret_key,
        }
        os.makedirs(dead_letter_dir, exist_ok=True)

    def put_batch(self, batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        queue_url = self.queue_url
        dead_letter_dir = self.dead_letter_dir
        cfg = self._cfg

        def send_partition(rows):
            client = None
            entries: list[dict] = []

            def flush():
                nonlocal client, entries
                if not entries:
                    return
                if client is None:
                    client = _boto3_client("sqs", cfg)
                resp = client.send_message_batch(
                    QueueUrl=queue_url, Entries=entries
                )
                failed = resp.get("Failed", [])
                if failed:
                    # sender-side faults would loop forever; surface them
                    # as a task failure → Spark task retry / batch replay
                    # (at-least-once, the reference's posture)
                    raise RuntimeError(f"send_message_batch failed: {failed}")
                entries = []

            for row in rows:
                rid, body = row["_id"], row["_body"]
                if len(body.encode()) > SQS_MAX_MESSAGE_BYTES:
                    import hashlib

                    digest = hashlib.md5(body.encode()).hexdigest()
                    path = os.path.join(dead_letter_dir, f"{digest}.json")
                    tmp = f"{path}.tmp-{os.getpid()}"
                    with open(tmp, "w") as fh:
                        # body included so the record is REPLAYABLE from
                        # the spool (same treatment as the Kinesis sink's
                        # dump, sinks/kinesis.py), not just logged
                        json.dump(
                            {
                                "Id": rid,
                                "ErrorCode": "MessageTooLong",
                                "MessageBody": body,
                            },
                            fh,
                        )
                    os.replace(tmp, path)
                    continue
                entries.append({"Id": str(len(entries)), "MessageBody": body})
                if len(entries) >= SQS_MAX_BATCH_RECORDS:
                    flush()
            flush()

        out = batch_df.select(
            F.col(self.id_col).cast("string").alias("_id"),
            F.to_json(F.struct("*")).alias("_body"),
        )
        out.foreachPartition(send_partition)

    def foreach_batch(self):
        return self.put_batch
