"""End-to-end exactly-once across the full topology under restart:
kafkalog source → stateful keyed aggregation (state store) → bucket-
pruned upsert sink, killed between micro-batches and resumed from the
same checkpoint.

Each component's guarantee is tested in isolation elsewhere
(test_kafka_source, test_streaming_state, test_sources_sinks); this is
the COMPOSED claim the reference makes with its XOR-ack + SQL-upsert
combo (controller ack tree + contrib/sql_alchemy upsert): after a
crash and replay, per-key results reflect every record exactly once.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from motorway_spark.sinks.upsert import UpsertParquetSink
from motorway_spark.sources import register_sources
from motorway_spark.streaming.runner import start_and_drain

from tests.test_kafka_source import _write_topic


def test_source_stateful_sink_restart_exactly_once(spark, tmp_path):
    from pyspark.sql.streaming.state import GroupStateTimeout

    register_sources(spark)
    log_dir = _write_topic(tmp_path, {0: 12, 1: 7})
    chk = str(tmp_path / "chk")
    sink = UpsertParquetSink(
        spark, str(tmp_path / "table"), key_cols=["key"], num_buckets=4
    )

    def start():
        stream = (
            spark.readStream.format("kafkalog")
            .option("path", log_dir)
            .option("getRecordsLimit", "5")  # force several micro-batches
            .load()
        )

        def update_count(key, pdf_iter, state):
            n = state.get[0] if state.exists else 0
            for pdf in pdf_iter:
                n += len(pdf)
            state.update((n,))
            yield pd.DataFrame({"key": [key[0]], "n": [n]})

        counted = stream.select("key").groupBy("key").applyInPandasWithState(
            update_count,
            outputStructType="key string, n long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        return (
            counted.writeStream.foreachBatch(sink.upsert_batch)
            .option("checkpointLocation", chk)
            .outputMode("update")
            .start()
        )

    query = start_and_drain(start)
    query.stop()
    table = {r["key"]: r["n"] for r in sink.read().collect()}
    assert table == {"k0": 12, "k1": 7}

    # Producer appends while the pipeline is DOWN; on restart the
    # committed source offsets, the recovered state store AND the
    # sink's processed-batch ledger must all line up: counts continue
    # from 12 (not restart at 0, not double-count a replayed batch).
    with open(os.path.join(log_dir, "partition-0.jsonl"), "a") as fh:
        for i in range(12, 17):
            fh.write(json.dumps({"key": "k0", "value": {"p": 0, "i": i}}) + "\n")

    query2 = start_and_drain(start)
    query2.stop()
    table = {r["key"]: r["n"] for r in sink.read().collect()}
    assert table == {"k0": 17, "k1": 7}

    # one row per key in the merged table (upsert, not append)
    assert sink.read().count() == 2
