"""The reference's Kafka example, Spark-first.

Upstream ``examples/kafka_example.py`` produces words INTO a topic with
one pipeline branch and consumes/counts them with another. Here the
same round trip runs hermetically against the ``kafkalog`` source/sink
pair (a partitioned log with consumer-group offsets, per-trigger poll
caps, and replay-id skip — the reference's Kafka invariants, see
sources/kafka.py). Against a real broker, swap
``.format("kafkalog").option("path", …)`` for Spark's built-in
``.format("kafka").option("kafka.bootstrap.servers", …)`` — the rest of
the topology is unchanged (docker-compose.yml brings up a Redpanda for
exactly that).

Run: ``python examples/kafka_pipeline.py``
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
import zlib

from pyspark.sql import functions as F

from motorway_spark.session import get_session
from motorway_spark.sources import register_sources
from motorway_spark.streaming.runner import start_and_drain


def produce(topic_dir: str, sentences: list[str]) -> None:
    """Producer branch: land words in the partitioned log (keyed by
    word so a partition owns each key, like the reference's keyed
    produce)."""
    os.makedirs(topic_dir, exist_ok=True)
    n_partitions = 3
    parts: dict[int, list[str]] = {p: [] for p in range(n_partitions)}
    for sentence in sentences:
        for word in sentence.split(" "):
            # stable hash: builtin hash() is PYTHONHASHSEED-randomized per
            # process, which would break the advertised keyed layout's
            # run-to-run reproducibility
            parts[zlib.crc32(word.encode()) % n_partitions].append(word)
    for p, words in parts.items():
        with open(f"{topic_dir}/partition-{p}.jsonl", "w") as fh:
            for word in words:
                fh.write(json.dumps({"key": word, "value": {"word": word}}) + "\n")


def consume_and_count(spark, topic_dir: str):
    """Consumer branch: stream the topic, count per word in the state
    store, drain to a memory sink."""
    stream = (
        spark.readStream.format("kafkalog")
        .option("path", topic_dir)
        .option("getRecordsLimit", "64")  # per-trigger poll cap (backpressure)
        .load()
    )
    counts = (
        stream.select(
            F.get_json_object(F.col("value"), "$.word").alias("word")
        )
        .groupBy("word")
        .count()
    )
    # FRESH queryName per factory call — start_and_drain may retry, and
    # a reused name would reattach a stale memory sink
    query = start_and_drain(
        lambda: counts.writeStream.format("memory")
        .queryName(f"kafka_wordcount_{uuid.uuid4().hex[:8]}")
        .outputMode("complete")
        .start()
    )
    name = query.name
    query.stop()
    return spark.table(name)


def main() -> None:
    spark = get_session("example-kafka")
    register_sources(spark)
    topic_dir = tempfile.mkdtemp(prefix="example_topic_")
    produce(
        topic_dir,
        ["the quick brown fox", "the lazy dog", "the quick dog"],
    )
    for row in consume_and_count(spark, topic_dir).orderBy(
        "count", ascending=False
    ).collect():
        print(f"{row['word']:>8}  {row['count']}")


if __name__ == "__main__":
    main()
