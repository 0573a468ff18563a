"""boto3 transport contract tests against an in-process moto server.

The dir/HTTP connector twins proved the Spark-side contracts (WAL
buffering, delete-on-commit, selective retry, two-phase commit); these
tests re-prove the queue-shaped invariants over REAL boto3 wire calls —
the rung the reference's AWS connectors occupy
(/root/reference/motorway/contrib/amazon_sqs/ramps.py:8-31,
amazon_kinesis/intersections.py:10-69). moto runs in SERVER mode
(real HTTP on localhost) so executor-side tasks — the Kinesis sink's
``foreachPartition`` — reach it from Python worker processes, exactly
like localstack in the docker-compose path.
"""

from __future__ import annotations

import json
import uuid

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")


@pytest.fixture(scope="module")
def moto_endpoint():
    """AWS endpoint for the suite: a localstack URL via AWS_ENDPOINT_URL
    (the docker-compose path), else an in-process moto server — the same
    tests run against either, no code change."""
    import os

    external = os.environ.get("AWS_ENDPOINT_URL")
    if external:
        yield external
        return
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0)
    srv.start()
    port = srv._server.socket.getsockname()[1]
    yield f"http://127.0.0.1:{port}"
    srv.stop()


_CREDS = {
    "region": "us-east-1",
    "endpoint_url": "",  # filled per-test
    "access_key": "testing",
    "secret_key": "testing",
}


def _client(service, endpoint):
    return boto3.client(
        service,
        region_name="us-east-1",
        endpoint_url=endpoint,
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )


def _queue_depth(cli, queue_url) -> int:
    attrs = cli.get_queue_attributes(
        QueueUrl=queue_url,
        AttributeNames=["ApproximateNumberOfMessages", "ApproximateNumberOfMessagesNotVisible"],
    )["Attributes"]
    return int(attrs["ApproximateNumberOfMessages"]) + int(
        attrs["ApproximateNumberOfMessagesNotVisible"]
    )


# ---------------------------------------------------------------------------
# SQS poll transport: receive keeps in-flight, ack deletes
# ---------------------------------------------------------------------------
def test_sqs_transport_deletes_only_on_ack(moto_endpoint):
    from motorway_spark.sources.aws import SqsPollTransport

    cli = _client("sqs", moto_endpoint)
    q = cli.create_queue(QueueName=f"t{uuid.uuid4().hex[:8]}")["QueueUrl"]
    for i in range(7):
        cli.send_message(QueueUrl=q, MessageBody=json.dumps({"Id": f"m-{i}", "v": i}))

    t = SqsPollTransport(
        q,
        region="us-east-1",
        endpoint_url=moto_endpoint,
        access_key="testing",
        secret_key="testing",
    )
    events = t.connect()
    assert sorted(e["Id"] for e in events) == [f"m-{i}" for i in range(7)]
    # received but NOT deleted: messages are in-flight awaiting commit
    assert _queue_depth(cli, q) == 7

    t.ack([e["Id"] for e in events[:4]])
    assert _queue_depth(cli, q) == 3
    t.ack([e["Id"] for e in events[4:]])
    assert _queue_depth(cli, q) == 0
    # re-acking (replayed commit) is a no-op, not an error
    t.ack([e["Id"] for e in events])


def test_sqs_transport_isolates_bad_message_bodies(moto_endpoint):
    from motorway_spark.sources.aws import SqsPollTransport

    cli = _client("sqs", moto_endpoint)
    q = cli.create_queue(QueueName=f"t{uuid.uuid4().hex[:8]}")["QueueUrl"]
    cli.send_message(QueueUrl=q, MessageBody="this is not json {")
    cli.send_message(QueueUrl=q, MessageBody=json.dumps({"Id": "good", "v": 1}))

    t = SqsPollTransport(
        q, region="us-east-1", endpoint_url=moto_endpoint,
        access_key="testing", secret_key="testing",
    )
    events = t.connect()
    assert len(events) == 2  # bad body wrapped, not dropped, not fatal
    ids = {e["Id"] for e in events}
    assert "good" in ids
    wrapped = next(e for e in events if e["Id"] != "good")
    assert wrapped["body"] == "this is not json {"


# ---------------------------------------------------------------------------
# SQS as a Spark stream: LongPollSource + transport="sqs" end to end
# ---------------------------------------------------------------------------
def test_sqs_stream_end_to_end_delete_on_commit(spark, tmp_path, moto_endpoint):
    from motorway_spark.sources import register_sources
    from motorway_spark.streaming.runner import start_and_drain

    register_sources(spark)
    cli = _client("sqs", moto_endpoint)
    q = cli.create_queue(QueueName=f"t{uuid.uuid4().hex[:8]}")["QueueUrl"]
    for i in range(12):
        cli.send_message(QueueUrl=q, MessageBody=json.dumps({"Id": f"m-{i:02d}", "v": i}))

    stream = (
        spark.readStream.format("longpoll")
        .option("transport", "sqs")
        .option("queueUrl", q)
        .option("region", "us-east-1")
        .option("endpointUrl", moto_endpoint)
        .option("accessKey", "testing")
        .option("secretKey", "testing")
        .option("walDir", str(tmp_path / "wal"))
        .load()
    )
    name = f"sqs_{uuid.uuid4().hex[:8]}"
    query = start_and_drain(
        lambda: stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        rows = spark.table(name).collect()
        got = sorted(r.event_id for r in rows)
        assert got == [f"m-{i:02d}" for i in range(12)]
        payloads = {r.event_id: json.loads(r.payload) for r in rows}
        assert payloads["m-03"]["v"] == 3

        # the engine commits batch N as batch N+1 starts (only once N is
        # durably delivered — exactly SQS delete-after-success); drive
        # one more message through to trigger the commit of the first
        # batches, then check the delivered 12 are DELETED from the
        # queue while the late one stays in-flight/uncommitted
        cli.send_message(QueueUrl=q, MessageBody=json.dumps({"Id": "late", "v": 99}))
        query.processAllAvailable()
    finally:
        query.stop()
    assert spark.table(name).count() == 13
    assert _queue_depth(cli, q) == 1  # only the late, not-yet-committed one


# ---------------------------------------------------------------------------
# Kinesis sink over boto3: same selective-retry sink, real wire
# ---------------------------------------------------------------------------
def _locked_kinesis_factory(lock_path: str, endpoint: str):
    """moto's in-memory Kinesis backend assigns sequence numbers without
    a lock (max+1, then dict insert keyed on it), so two concurrent
    put_records requests landing on one shard can compute the same
    number and one record silently overwrites the other. Serialize the
    MOCK's writes with a cross-process file lock; the sink under test
    still runs one independent client per executor task. Test-only —
    the race is in the mock, not in the sink."""
    from motorway_spark.sources.aws import KinesisClientFactory

    base = KinesisClientFactory(
        region="us-east-1",
        endpoint_url=endpoint,
        access_key="testing",
        secret_key="testing",
    )

    def make():
        import fcntl

        adapter = base()
        inner = adapter.put_records

        def locked_put(records, stream_name):
            with open(lock_path, "w") as fh:
                fcntl.flock(fh, fcntl.LOCK_EX)
                try:
                    return inner(records, stream_name)
                finally:
                    fcntl.flock(fh, fcntl.LOCK_UN)

        adapter.put_records = locked_put
        return adapter

    return make


def test_kinesis_sink_boto3_roundtrip(spark, tmp_path, moto_endpoint):
    from motorway_spark.sinks.kinesis import KinesisPutRecordsSink
    from motorway_spark.sources.aws import read_stream_records

    cli = _client("kinesis", moto_endpoint)
    stream_name = f"s{uuid.uuid4().hex[:8]}"
    cli.create_stream(StreamName=stream_name, ShardCount=2)

    sink = KinesisPutRecordsSink(
        _locked_kinesis_factory(str(tmp_path / "put.lock"), moto_endpoint),
        stream_name,
        dead_letter_dir=str(tmp_path / "dlq"),
        key_col="k",
        body_cols=["k", "v"],
    )
    df = spark.createDataFrame(
        [(f"key-{i}", i) for i in range(25)], "k string, v int"
    ).repartition(4)
    sink.put_batch(df, batch_id=0)

    landed = read_stream_records(cli, stream_name)
    assert len(landed) == 25  # every record landed exactly once
    by_key = {r["PartitionKey"]: json.loads(r["Data"]) for r in landed}
    assert by_key["key-7"] == {"k": "key-7", "v": 7}
    import os

    assert os.listdir(str(tmp_path / "dlq")) == []


def test_sqs_send_batch_sink_lands_and_guards_size(spark, tmp_path, moto_endpoint):
    import os

    from motorway_spark.sources.aws import SqsSendBatchSink

    cli = _client("sqs", moto_endpoint)
    q = cli.create_queue(QueueName=f"t{uuid.uuid4().hex[:8]}")["QueueUrl"]

    sink = SqsSendBatchSink(
        q,
        dead_letter_dir=str(tmp_path / "dlq"),
        id_col="message_id",
        region="us-east-1",
        endpoint_url=moto_endpoint,
        access_key="testing",
        secret_key="testing",
    )
    rows = [(f"id-{i}", "x" * 10) for i in range(15)]
    rows.append(("id-big", "x" * (300 * 1024)))  # > 256 KiB -> dead letter
    df = spark.createDataFrame(rows, "message_id string, payload string").repartition(3)
    sink.put_batch(df, batch_id=0)

    # 15 small messages on the queue, the oversize one dead-lettered
    assert _queue_depth(cli, q) == 15
    dlq = os.listdir(str(tmp_path / "dlq"))
    assert len(dlq) == 1
    with open(os.path.join(str(tmp_path / "dlq"), dlq[0])) as fh:
        rec = json.load(fh)
    assert rec["ErrorCode"] == "MessageTooLong"
    # the record must be REPLAYABLE from the spool: body included
    # (same treatment as the Kinesis sink's dead-letter dump)
    assert rec["Id"] == "id-big"
    assert json.loads(rec["MessageBody"])["message_id"] == "id-big"


# ---------------------------------------------------------------------------
# Visibility-timeout redelivery: the crash-shaped at-least-once path
# ---------------------------------------------------------------------------
def test_sqs_visibility_timeout_redelivery(moto_endpoint):
    """A polled-but-unacked message (reader crashed before commit)
    stays INVISIBLE for the visibility window, then SQS re-delivers it;
    a FRESH transport (the restarted reader) receives it under a new
    receipt handle and its ack deletes for good. This is exactly the
    reference's SQS failure contract (amazon_sqs/ramps.py: success
    deletes, failure just lets visibility lapse) — no explicit nack
    anywhere. Runs against moto in-process or localstack via
    AWS_ENDPOINT_URL (docker compose up -d localstack)."""
    import time as _time

    from motorway_spark.sources.aws import SqsPollTransport

    cli = _client("sqs", moto_endpoint)
    q = cli.create_queue(QueueName=f"redeliver{uuid.uuid4().hex[:8]}")[
        "QueueUrl"
    ]
    cli.send_message(QueueUrl=q, MessageBody=json.dumps({"Id": "m1", "v": 1}))

    def transport():
        return SqsPollTransport(
            q,
            region="us-east-1",
            endpoint_url=moto_endpoint,
            access_key="testing",
            secret_key="testing",
            visibility_timeout_sec=2,
        )

    t1 = transport()
    assert [e["Id"] for e in t1.connect()] == ["m1"]
    # crash before ack: the message is in flight, INVISIBLE to a fresh
    # reader inside the window — no double-processing while the first
    # owner might still commit
    t2 = transport()
    assert t2.connect() == []
    assert _queue_depth(cli, q) == 1  # not lost, just not visible

    deadline = _time.time() + 30
    redelivered = []
    while not redelivered and _time.time() < deadline:
        _time.sleep(0.5)
        redelivered = t2.connect()
    assert [e["Id"] for e in redelivered] == ["m1"], (
        "message was not re-delivered after the visibility timeout"
    )
    # the restarted reader's commit deletes it under the NEW handle
    t2.ack(["m1"])
    assert _queue_depth(cli, q) == 0
    # and the ORIGINAL crashed owner's late ack is a harmless no-op
    t1.ack(["m1"])
    assert _queue_depth(cli, q) == 0


def test_kinesis_sequence_number_checkpoint_resume(moto_endpoint):
    """R3 for Kinesis over real boto3 wire: the walk resumes each shard
    AFTER its committed sequence number (the reference ramp's DynamoDB
    checkpoint contract, amazon_kinesis/ramps.py:186-315) — a restart
    from the committed map reads exactly the records that arrived
    since, and a CRASH before commit (stale map) replays exactly the
    uncommitted window: no gaps either way."""
    from motorway_spark.sources.aws import read_stream_records_since

    cli = _client("kinesis", moto_endpoint)
    stream_name = f"s{uuid.uuid4().hex[:8]}"
    cli.create_stream(StreamName=stream_name, ShardCount=2)

    def put(keys):
        cli.put_records(
            StreamName=stream_name,
            Records=[
                {"PartitionKey": k, "Data": k.encode()} for k in keys
            ],
        )

    batch_a = [f"a-{i}" for i in range(10)]
    put(batch_a)
    got_a, ckpt_a = read_stream_records_since(cli, stream_name)
    assert sorted(r["PartitionKey"] for r in got_a) == sorted(batch_a)
    # the checkpoint map covers every shard that yielded records, and
    # each record's own (ShardId, SequenceNumber) is commit-precise
    assert all(r["ShardId"] in ckpt_a for r in got_a)

    batch_b = [f"b-{i}" for i in range(7)]
    put(batch_b)
    # restart from the COMMITTED map: only the new records, no dups
    got_b, ckpt_b = read_stream_records_since(cli, stream_name, ckpt_a)
    assert sorted(r["PartitionKey"] for r in got_b) == sorted(batch_b)
    # crash-before-commit: the stale map replays the SAME window
    replay, _ = read_stream_records_since(cli, stream_name, ckpt_a)
    assert sorted(r["PartitionKey"] for r in replay) == sorted(batch_b)
    # fully committed: nothing left, checkpoints idempotent
    empty, ckpt_c = read_stream_records_since(cli, stream_name, ckpt_b)
    assert empty == [] and ckpt_c == ckpt_b
