"""SQS-shaped send sink: one message file per record, idempotent.

Rebuilds the produce side of the SQS contract (/root/reference/
motorway/contrib/amazon_sqs/intersections.py: ``send_message`` per
record into a queue) against the same spool-directory queue the
``spooldir`` source consumes — so queue round-trips (produce → consume
→ delete-on-commit) are testable in-repo.

Exactly-once: the message filename is the deterministic message id, so
a replayed micro-batch re-sends byte-identical files over themselves
(atomic tmp+rename per message) — the at-least-once retry the
reference relies on (ramp.py:57-64) made idempotent, which is exactly
SQS-with-deduplication-id semantics. Writes run executor-side via
``foreachPartition``; distinct messages are distinct files, so
parallel tasks never contend.

This same contract is the Salesforce-sink twin (K5,
/root/reference/motorway/contrib/salesforce/intersections.py:13-41):
a per-record UPSERT on an external-ID field against a REST endpoint —
``id_col`` is the external id, re-sending a record replaces the
previous version (create-or-update), and replays are no-ops. Swap the
file write for an HTTP PATCH and the semantics carry over unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SpoolDirSink:
    def __init__(self, spool_dir: str, id_col: str, body_cols: list[str]):
        self.spool_dir = spool_dir
        self.id_col = id_col
        self.body_cols = body_cols
        os.makedirs(spool_dir, exist_ok=True)

    def send_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spool_dir = self.spool_dir

        def send_partition(rows):
            for row in rows:
                msg = {"id": row["_mid"], "body": json.loads(row["_body"])}
                path = os.path.join(spool_dir, f"{row['_mid']}.json")
                tmp = f"{path}.tmp-{os.getpid()}"
                with open(tmp, "w") as fh:
                    json.dump(msg, fh, sort_keys=True)
                os.replace(tmp, path)  # idempotent overwrite on replay

        out = batch_df.select(
            F.col(self.id_col).cast("string").alias("_mid"),
            F.to_json(F.struct(*self.body_cols)).alias("_body"),
        )
        out.foreachPartition(send_partition)

    def foreach_batch(self):
        return self.send_batch
