"""Reliability evidence beyond unit mocks, each in its own JVM
(subprocess) because the configs must be set before context start:

- RocksDB state store: the PRODUCTION state backend (spill-to-disk,
  checkpointed — SURVEY §4.2's claimed replacement for the reference's
  in-memory per-process dicts) actually runs this engine's stateful
  streaming path and produces batch-equal results.
- Task retry: a task that CRASHES on its first attempt (real
  exception, real retry via local[N, maxFailures]) completes the job
  with correct results — the reference's crash isolation
  (ramp.py:167-168, supervised restarts) expressed as Spark task
  retry, observed end to end rather than asserted from config.
"""

from __future__ import annotations

import subprocess
import sys
import uuid

_ROCKSDB_SCRIPT = r"""
import os

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

spark = (
    SparkSession.builder.master("local[4]")
    .appName("rocksdb-state")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from motorway_spark.streaming.runner import run_stream_to_memory, stream_events

events = stream_events(spark, os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata").rstrip("/") + "/sf0.001")

def update_count(key, pdf_iter, state: GroupState):
    n = state.get[0] if state.exists else 0
    for pdf in pdf_iter:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

counted = events.select("user_id").groupBy("user_id").applyInPandasWithState(
    update_count,
    outputStructType="user_id long, n_events long",
    stateStructType="n_events long",
    outputMode="update",
    timeoutConf=GroupStateTimeout.NoTimeout,
)
sink = run_stream_to_memory(counted, output_mode="update")
from pyspark.sql import Window
w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
got = {
    r["user_id"]: r["n_events"]
    for r in sink.withColumn("rn", F.row_number().over(w))
    .filter("rn = 1").collect()
}
want = {
    r["user_id"]: r["n"]
    for r in spark.read.parquet(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata").rstrip("/") + "/sf0.001/events.parquet")
    .groupBy("user_id").agg(F.count("*").alias("n")).collect()
}
assert got == want, (len(got), len(want))
print("ROCKSDB_OK", len(got))
"""

_RETRY_SCRIPT = r"""
import os, sys
from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

marker_dir = sys.argv[1]

spark = (
    SparkSession.builder.master("local[4, 3]")  # up to 3 attempts per task
    .appName("task-retry")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

def flaky(batches):
    tc = TaskContext.get()
    if tc.partitionId() == 0 and tc.attemptNumber() == 0:
        with open(os.path.join(marker_dir, "crashed"), "w") as fh:
            fh.write("attempt0")
        raise RuntimeError("injected first-attempt crash")
    for pdf in batches:
        pdf["doubled"] = pdf["v"] * 2
        yield pdf[["v", "doubled"]]

df = spark.range(1000).repartition(4).selectExpr("id AS v")
out = df.mapInPandas(flaky, "v long, doubled long").collect()
assert os.path.exists(os.path.join(marker_dir, "crashed")), "injection never fired"
assert len(out) == 1000
assert all(r["doubled"] == 2 * r["v"] for r in out)
print("RETRY_OK", len(out))
"""


def _run(script: str, *args: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", script, *args],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(__import__("pathlib").Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


def test_rocksdb_state_store_runs_stateful_streaming():
    out = _run(_ROCKSDB_SCRIPT)
    assert "ROCKSDB_OK" in out


def test_task_retry_recovers_injected_crash(tmp_path):
    marker = str(tmp_path / uuid.uuid4().hex)
    import os

    os.makedirs(marker)
    out = _run(_RETRY_SCRIPT, marker)
    assert "RETRY_OK 1000" in out


_SPILL_SCRIPT = r"""
import os

import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("forced-spill")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    # force external spill in every sort/aggregation after 5k elements
    .config("spark.shuffle.spill.numElementsForceSpillThreshold", "5000")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from motorway_spark.queries import QUERIES, ORACLES
from motorway_spark.oracle import _duckdb_con, compare_frames

SF = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata").rstrip("/") + "/sf0.1"
con = _duckdb_con(SF)
for name in ("q1_pricing_summary", "sessionize_events", "win_running", "dedup_exact"):
    spark_pdf = QUERIES[name](spark, SF).toPandas()
    oracle_pdf = con.sql(ORACLES[name]).df()
    problems = compare_frames(spark_pdf, oracle_pdf)
    assert not problems, (name, problems[:3])
    print("SPILL_OK", name, len(spark_pdf))
"""


def test_forced_spill_keeps_results_oracle_exact():
    """With the force-spill threshold at 5k elements every sizeable
    sort/aggregation goes through the external (disk-spilling) path —
    the memory-pressure behavior a 100 TB run lives in. Four
    shuffle-heavy operators must stay ORACLE-EXACT at sf0.1 under it:
    spilling changes merge order, and the engine's decimal-sum
    determinism conventions are exactly what make the results
    insensitive to that."""
    out = _run(_SPILL_SCRIPT)
    assert out.count("SPILL_OK") == 4


_ROCKSDB_RESTART_SCRIPT = r"""
import json, os, sys
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

work = sys.argv[1]
spool = os.path.join(work, "spool"); os.makedirs(spool, exist_ok=True)
ckpt = os.path.join(work, "ckpt")

spark = (
    SparkSession.builder.master("local[4]")
    .appName("rocksdb-restart")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from motorway_spark.sources import register_sources
register_sources(spark)

def put(batch, lo, hi):
    for i in range(lo, hi):
        with open(os.path.join(spool, f"m{batch}-{i:04d}.json"), "w") as fh:
            json.dump({"id": f"{batch}-{i}", "body": {"group": f"g{i % 3}"}}, fh)

def update_count(key, pdf_iter, state: GroupState):
    n = state.get[0] if state.exists else 0
    for pdf in pdf_iter:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"grp": [key[0]], "n": [n]})

out_dir = os.path.join(work, "out"); os.makedirs(out_dir, exist_ok=True)

def run_once(tag):
    stream = (
        spark.readStream.format("spooldir")
        .option("path", spool).option("deleteOnCommit", "false")
        .load()
        .groupBy("grouping_value")
        .applyInPandasWithState(
            update_count,
            outputStructType="grp string, n long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def sink(batch_df, batch_id):
        rows = [(r["grp"], r["n"]) for r in batch_df.collect()]
        with open(os.path.join(out_dir, f"{tag}-{batch_id}.json"), "w") as fh:
            json.dump(rows, fh)

    # memory sink cannot recover from a checkpoint; foreachBatch can
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt).outputMode("update").start())
    q.processAllAvailable(); q.stop()
    latest = {}
    for name in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, name)) as fh:
            for grp, n in json.load(fh):
                latest[grp] = max(latest.get(grp, 0), n)
    return latest

put(0, 0, 30)
first = run_once("r1")
assert first == {"g0": 10, "g1": 10, "g2": 10}, first

put(1, 0, 15)  # second batch arrives while the query is DOWN
second = run_once("r2")
# counts must RESUME from RocksDB state (30 + 15 split 5/5/5), not restart
assert second == {"g0": 15, "g1": 15, "g2": 15}, second
print("ROCKSDB_RESTART_OK", second)
"""


def test_rocksdb_state_survives_restart(tmp_path):
    """Keyed state checkpointed in RocksDB must survive a full query
    stop/start: counts RESUME across the restart (30 msgs, stop, 15
    more, start => 15 per group — not a from-zero recount of only the
    new data)."""
    out = _run(_ROCKSDB_RESTART_SCRIPT, str(tmp_path))
    assert "ROCKSDB_RESTART_OK" in out
