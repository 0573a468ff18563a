"""Streaming soak: ~500 micro-batches through the stateful path on the
PRODUCTION state backend (RocksDB), watermark eviction on.

The reference is a run-forever streaming framework (its process loop
has no end, /root/reference/motorway/ramp.py + intersection.py); the
repo's other streaming evidence drains finite fixtures in a handful of
batches. This soak drives a continuous rate source through a
watermarked windowed aggregation for hundreds of micro-batches and
asserts the two things a long-running operator must hold:

- **state plateaus**: with a 1 s window and a 2 s watermark over ~50
  keys, expired windows must be EVICTED — total state rows stay inside
  a fixed band instead of growing with stream lifetime;
- **latency stays flat**: per-batch trigger duration late in the run
  stays within noise of the early steady state (no per-batch cost that
  scales with batches-processed — the classic unbounded-state smell).

Own JVM (subprocess): the RocksDB provider must be configured before
context start. The measured curve is appended to SCALE.md by hand (see
the soak entry there); this test pins the invariants.
"""

from __future__ import annotations

import subprocess
import sys

_SOAK_SCRIPT = r"""
import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_BATCHES = int(os.environ.get("SOAK_BATCHES", "500"))
N_KEYS = 50

spark = (
    SparkSession.builder.master("local[4]")
    .appName("streaming-soak")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

rate = (
    spark.readStream.format("rate")
    .option("rowsPerSecond", "2000")
    .load()
)
agg = (
    rate.withWatermark("timestamp", "2 seconds")
    .groupBy(
        F.window("timestamp", "1 second"),
        (F.col("value") % N_KEYS).alias("k"),
    )
    .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
)
query = (
    agg.writeStream.format("noop")
    .outputMode("update")
    .start()
)

progress = {}
deadline = time.time() + 600
try:
    while time.time() < deadline:
        for p in query.recentProgress:
            b = p["batchId"]
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            progress[b] = {
                "rows": ops[0]["numRowsTotal"],
                "removed": ops[0].get("numRowsRemoved", 0),
                "ms": p["durationMs"].get("triggerExecution", 0),
            }
        last = query.lastProgress
        if last and last["batchId"] >= TARGET_BATCHES:
            break
        time.sleep(0.05)
finally:
    query.stop()

batches = sorted(progress)
assert len(batches) >= TARGET_BATCHES * 0.8, f"only {len(batches)} batches seen"

def band(lo_frac, hi_frac):
    lo = int(len(batches) * lo_frac)
    hi = int(len(batches) * hi_frac)
    return [progress[b] for b in batches[lo:hi]]

early = band(0.2, 0.4)   # past warmup, steady state established
late = band(0.8, 1.0)

early_rows = max(e["rows"] for e in early)
late_rows = max(e["rows"] for e in late)
# eviction really ran
assert sum(e["removed"] for e in late) > 0, "no state rows ever evicted"
# plateau: late-state never exceeds the early steady band by more than
# noise; absolute ceiling = keys x (window span inside watermark + slack)
assert late_rows <= max(early_rows * 1.5, N_KEYS * 10), (early_rows, late_rows)

def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]

early_ms = median([e["ms"] for e in early])
late_ms = median([e["ms"] for e in late])
assert late_ms <= max(3 * early_ms, early_ms + 200), (early_ms, late_ms)

print("SOAK_OK", json.dumps({
    "batches": len(batches),
    "early_rows_max": early_rows,
    "late_rows_max": late_rows,
    "early_ms_median": early_ms,
    "late_ms_median": late_ms,
    "total_removed": sum(p["removed"] for p in progress.values()),
}))
spark.stop()
"""


def test_stateful_soak_state_plateaus_latency_flat():
    proc = subprocess.run(
        [sys.executable, "-c", _SOAK_SCRIPT],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=str(__import__("pathlib").Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "SOAK_OK" in proc.stdout, proc.stdout[-1000:]
