"""Kafka-shaped sink (mocked broker, real Spark contract).

Rebuilds KafkaInsertIntersection (/root/reference/motorway/contrib/
kafka/intersections.py:15-91): batched, keyed, idempotent produce into
a partitioned topic. The broker is the same on-disk log the ``kafkalog``
source reads (``partition-N.jsonl``), so source → pipeline → sink
round-trips are testable end to end without a cluster.

Exactly-once composition, mapped 1:1:

- reference ``enable.idempotence=True`` + retry loop
  (intersections.py:28-33,55-80) → replayed micro-batch ids are
  recorded in a sidecar and skipped (same WAL pattern as
  ``UpsertParquetSink``) — a redelivered batch produces nothing;
- reference keyed produce (key → topic partition) → rows are grouped by
  ``pmod(hash(key), num_partitions)`` and each group's task appends to
  exactly its own partition file — the write fans out across executors
  (one task per topic partition per batch, Kafka's own per-partition
  ordering model) with no driver collect;
- ``@batch_process(limit=500, wait=1)`` on the reference's process
  method → the sink is driven by foreachBatch, whose batch size/cadence
  the source caps + trigger already control (see decorators.py).

At 100 TB/day the file append becomes ``Producer.produce`` +
``flush()`` per partition-task against a real broker — the structure
(group by partition, idempotent replay skip, batch drain) is unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class KafkaLogSink:
    def __init__(
        self,
        spark: SparkSession,
        log_dir: str,
        num_partitions: int = 4,
        key_col: str = "key",
        value_col: str = "value",
    ):
        self.spark = spark
        self.log_dir = log_dir
        self.num_partitions = num_partitions
        self.key_col = key_col
        self.value_col = value_col
        os.makedirs(log_dir, exist_ok=True)

    # -- replay bookkeeping (same WAL contract as UpsertParquetSink) ----
    def _batches_file(self) -> str:
        return os.path.join(self.log_dir, "_sink_batches.json")

    def _processed_batches(self) -> set[int]:
        try:
            with open(self._batches_file()) as fh:
                return set(json.load(fh))
        except (OSError, json.JSONDecodeError):
            return set()

    def _record_batch(self, batch_id: int) -> None:
        done = self._processed_batches() | {batch_id}
        tmp = self._batches_file() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(sorted(done), fh)
        os.replace(tmp, self._batches_file())

    # -- the sink -------------------------------------------------------
    def produce_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._processed_batches():
            # idempotent replay: consume (state-store commit safety,
            # see UpsertParquetSink.upsert_batch) but produce nothing
            batch_df.foreach(lambda _row: None)
            return

        log_dir = self.log_dir
        n = self.num_partitions

        def write_partition(pdf):
            import pandas as pd  # executor-side

            kpart = int(pdf["kpart"].iloc[0])
            path = os.path.join(log_dir, f"partition-{kpart}.jsonl")
            with open(path, "a") as fh:
                for key, value in zip(pdf["k"], pdf["v"]):
                    # v is a one-field JSON envelope {"v": <value>}
                    fh.write(
                        json.dumps({"key": key, "value": json.loads(value)["v"]})
                        + "\n"
                    )
                fh.flush()
                os.fsync(fh.fileno())
            return pd.DataFrame({"kpart": [kpart], "n": [len(pdf)]})

        keyed = batch_df.select(
            F.col(self.key_col).cast("string").alias("k"),
            F.to_json(F.struct(F.col(self.value_col).alias("v"))).alias("v"),
        ).withColumn("kpart", F.pmod(F.hash("k"), F.lit(n)))
        # one task per topic partition per batch: exclusive append,
        # Kafka's per-partition ordering, parallel across executors
        counts = keyed.groupBy("kpart").applyInPandas(
            write_partition, schema="kpart int, n long"
        )
        counts.collect()  # drive the write (counts: N rows, N = partitions)
        self._record_batch(batch_id)

    def foreach_batch(self):
        """The callable to hand to ``writeStream.foreachBatch``."""
        return self.produce_batch
