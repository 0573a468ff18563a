"""Keyed upsert sink (MERGE semantics) over a parquet-backed table.

Rebuilds DatabaseInsertIntersection (/root/reference/motorway/contrib/
sql_alchemy/intersections.py:7-103): batched upsert = update existing
keys, insert new ones — but as a ``foreachBatch`` MERGE that is
idempotent under micro-batch replay, which is exactly how the engine
turns at-least-once delivery into exactly-once results (the reference
instead relies on the upsert being re-runnable, intersections.py:57-98).

Against a lakehouse table this would be one ``MERGE INTO`` (Delta/
Iceberg) or JDBC MERGE; here the same algebra runs on plain parquet
with an atomic directory swap:

    merged = target.join(batch, key, "full")   -- anti+union in one pass
    new_version = coalesce(batch-side, target-side)

Replay safety: processed (epoch) batch ids are recorded in a sidecar;
a replayed batch id is a no-op — the WAL+sink contract Structured
Streaming expects from an exactly-once sink.

Scale notes: the merge is a keyed shuffle join of target × batch —
at 100 TB the target would be bucketed/partitioned by key so only
touched partitions rewrite (Delta/Iceberg give this for free; the
parquet fallback rewrites the table and is for tests/small state).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class UpsertParquetSink:
    def __init__(self, spark: SparkSession, table_dir: str, key_cols: list[str]):
        self.spark = spark
        self.table_dir = table_dir.rstrip("/")
        self.key_cols = key_cols
        self._meta = f"{self.table_dir}/_upsert_meta.json"

    # -- state ---------------------------------------------------------
    def _processed_batches(self) -> set[int]:
        try:
            with open(self._meta) as fh:
                return set(json.load(fh)["batches"])
        except (OSError, json.JSONDecodeError, KeyError):
            return set()

    def _record_batch(self, batch_id: int) -> None:
        os.makedirs(self.table_dir, exist_ok=True)
        batches = sorted(self._processed_batches() | {batch_id})
        with open(self._meta, "w") as fh:
            json.dump({"batches": batches}, fh)

    def _data_dir(self) -> str:
        return f"{self.table_dir}/data"

    def read(self) -> DataFrame | None:
        if not os.path.isdir(self._data_dir()):
            return None
        return self.spark.read.parquet(self._data_dir())

    # -- the sink ------------------------------------------------------
    def upsert_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: MERGE batch into target, idempotently."""
        if batch_id in self._processed_batches():
            # Replayed micro-batch: exactly-once no-op for the TABLE —
            # but the batch must still be fully consumed: Spark 4
            # validates that foreachBatch processes every partition of
            # an upstream stateful aggregation (state store commits
            # happen during the scan), and an early return fails the
            # query with STATE_STORE_COMMIT_VALIDATION_FAILED.
            batch_df.foreach(lambda _row: None)
            return

        # Within-batch conflict resolution must be DETERMINISTIC (a
        # replayed batch must merge to the identical table), and
        # dropDuplicates keeps an arbitrary row per key. Keep the row
        # that sorts highest on the non-key columns instead.
        value_cols = [c for c in batch_df.columns if c not in self.key_cols]
        if value_cols:
            w = Window.partitionBy(*self.key_cols).orderBy(
                *[F.desc(c) for c in value_cols]
            )
            batch = (
                batch_df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch = batch_df.dropDuplicates(self.key_cols)
        target = self.read()
        if target is None:
            merged = batch
        else:
            b = batch.alias("b")
            t = target.alias("t")
            cond = [F.col(f"b.{k}").eqNullSafe(F.col(f"t.{k}")) for k in self.key_cols]
            value_cols = [c for c in batch.columns]
            merged = t.join(b, cond, "full").select(
                *[
                    F.coalesce(F.col(f"b.{c}"), F.col(f"t.{c}")).alias(c)
                    for c in value_cols
                ]
            )

        # atomic swap: write new version beside, then rename over
        tmp = tempfile.mkdtemp(prefix="upsert_", dir=os.path.dirname(self.table_dir) or ".")
        merged.write.mode("overwrite").parquet(tmp)
        os.makedirs(self.table_dir, exist_ok=True)
        old = self._data_dir()
        bak = f"{old}.old"
        if os.path.isdir(old):
            os.rename(old, bak)
        os.rename(tmp, old)
        shutil.rmtree(bak, ignore_errors=True)
        self._record_batch(batch_id)

    def foreach_batch(self):
        """The callable to hand to ``writeStream.foreachBatch``."""
        return self.upsert_batch
