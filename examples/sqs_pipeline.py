"""The reference's SQS ramp example, Spark-first — over REAL boto3.

Upstream's SQSJSONRamp polls a queue, a pipeline processes the bodies,
and delete fires only on pipeline-wide success
(/root/reference/motorway/contrib/amazon_sqs/ramps.py:8-31). Here the
same loop runs end to end: JSON messages land on an SQS queue (an
in-process moto server stands in for AWS — set ``AWS_ENDPOINT_URL`` to
point at localstack or real AWS instead, credentials via the normal
chain), the ``longpoll`` source streams them through Spark with its
durable WAL buffer, a keyed aggregation lands in a real upsert table,
and the source's batch commit triggers ``delete_message_batch`` — SQS
delete-on-success, scoped to Spark's commit.

Run: ``python examples/sqs_pipeline.py``
"""

from __future__ import annotations

# allow "python examples/<name>.py" from a source checkout without install
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import tempfile
import uuid

from pyspark.sql import functions as F


def _endpoint():
    """External endpoint (localstack / real AWS) or an in-process moto
    server. Returns (endpoint_url, stop_fn)."""
    external = os.environ.get("AWS_ENDPOINT_URL")
    if external:
        return external, lambda: None
    from moto.server import ThreadedMotoServer

    srv = ThreadedMotoServer(port=0)
    srv.start()
    port = srv._server.socket.getsockname()[1]
    return f"http://127.0.0.1:{port}", srv.stop


def _client(endpoint: str):
    import boto3

    return boto3.client(
        "sqs",
        region_name="us-east-1",
        endpoint_url=endpoint,
        aws_access_key_id=os.environ.get("AWS_ACCESS_KEY_ID", "testing"),
        aws_secret_access_key=os.environ.get("AWS_SECRET_ACCESS_KEY", "testing"),
    )


def produce(endpoint: str, queue_url: str, events: list[dict]) -> None:
    """Producer branch: the upstream system dropping JSON messages on
    the queue (each carries an Id and a measurement)."""
    cli = _client(endpoint)
    for event in events:
        cli.send_message(QueueUrl=queue_url, MessageBody=json.dumps(event))


def consume_to_table(spark, endpoint: str, queue_url: str, table_dir: str):
    """Consumer branch: queue -> longpoll stream (WAL-buffered,
    delete-on-commit) -> per-sensor totals MERGEd into a real parquet
    table. Returns the landed table DataFrame."""
    from motorway_spark.sources import register_sources
    from motorway_spark.streaming.runner import run_stream_to_upsert

    register_sources(spark)
    stream = (
        spark.readStream.format("longpoll")
        .option("transport", "sqs")
        .option("queueUrl", queue_url)
        .option("region", "us-east-1")
        .option("endpointUrl", endpoint)
        .option("accessKey", os.environ.get("AWS_ACCESS_KEY_ID", "testing"))
        .option("secretKey", os.environ.get("AWS_SECRET_ACCESS_KEY", "testing"))
        .option("walDir", tempfile.mkdtemp(prefix="sqs_wal_"))
        .load()
    )
    totals = (
        stream.select(F.from_json("payload", "Id STRING, sensor STRING, v DOUBLE").alias("e"))
        .groupBy(F.col("e.sensor").alias("sensor"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("e.v").alias("total"))
    )
    return run_stream_to_upsert(
        totals, table_dir=table_dir, key_cols=["sensor"], output_mode="update"
    )


def main() -> None:
    from motorway_spark.session import get_session

    endpoint, stop = _endpoint()
    spark = get_session(f"sqs-example-{uuid.uuid4().hex[:6]}", cpus=4, shuffle_partitions=4)
    try:
        cli = _client(endpoint)
        queue_url = cli.create_queue(QueueName=f"ex{uuid.uuid4().hex[:8]}")["QueueUrl"]
        produce(
            endpoint,
            queue_url,
            [
                {"Id": f"m-{i}", "sensor": f"s{i % 3}", "v": float(i)}
                for i in range(30)
            ],
        )
        table = consume_to_table(
            spark, endpoint, queue_url, tempfile.mkdtemp(prefix="sqs_table_")
        )
        table.orderBy("sensor").show()
    finally:
        spark.stop()
        stop()


if __name__ == "__main__":
    main()
