"""Watermark late-data semantics, proven end-to-end (R2 reliability).

Every windowed streaming query in the repo declares a watermark, but
the oracle fixtures arrive in one micro-batch — the drop path never
fires there. This test feeds two batches through the spool source and
asserts the contract directly: an event older than the advanced
watermark is EXCLUDED, and a window the watermark already closed never
re-emits (reference analogue: the 30-minute message timeout,
motorway's queue-time cutoff).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import functions as F

from motorway_spark.sources import register_sources


def _msg(i: int, ts: str) -> str:
    return json.dumps({"id": f"m{i}", "body": {"group": "u1", "ts": ts}})


def test_watermark_drops_late_event_and_keeps_closed_window(spark, tmp_path):
    register_sources(spark)
    spool = tmp_path / "wm_spool"
    spool.mkdir()

    # Batch 1: three events in [12:00, 12:15), one at 12:29.
    # After this batch the watermark is 12:29 - 10 min = 12:19, which
    # closes window [12:00, 12:15).
    for i, ts in enumerate(
        ["2024-05-01 12:00:00", "2024-05-01 12:05:00",
         "2024-05-01 12:14:00", "2024-05-01 12:29:00"]
    ):
        (spool / f"a{i:03d}.json").write_text(_msg(i, ts))

    df = (
        spark.readStream.format("spooldir")
        .option("path", str(spool))
        .option("deleteOnCommit", "false")
        .option("maxFilesPerTrigger", 10)
        .load()
    )
    events = df.select(
        F.get_json_object("body", "$.ts").cast("timestamp").alias("ts")
    )
    windowed = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("w_start"), "n")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    query = (
        windowed.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        query.processAllAvailable()

        # Batch 2: one event at 12:01 — INSIDE the closed [12:00, 12:15)
        # window but behind the 12:19 watermark (late -> dropped) — and
        # one fresh event at 12:45 that advances the watermark to 12:35,
        # closing [12:15, 12:30).
        (spool / "b000.json").write_text(_msg(10, "2024-05-01 12:01:00"))
        (spool / "b001.json").write_text(_msg(11, "2024-05-01 12:45:00"))
        query.processAllAvailable()
    finally:
        query.stop()

    rows = {r["w_start"]: r["n"] for r in spark.table(name).collect()}
    # The closed first window emitted exactly once with the ON-TIME
    # count: the late 12:01 event did not bump it to 4 or re-emit it.
    assert rows.get("2024-05-01 12:00:00") == 3, rows
    # Second window closed by batch 2's watermark, unaffected by the
    # late row.
    assert rows.get("2024-05-01 12:15:00") == 1, rows
    # Nothing beyond the watermark emitted (the 12:45 window is open).
    assert "2024-05-01 12:45:00" not in rows
