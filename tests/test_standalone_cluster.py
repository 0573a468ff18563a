"""The rung above ``local-cluster``: a REAL Spark standalone cluster —
separate master daemon, two separate worker daemons, executors launched
by the workers, app submitted over ``spark://`` — the deployment shape
the reference demonstrably runs multi-host
(/root/reference/examples/app_slave.py:57, app_only.py:55; its master
process serves discovery exactly like the standalone master serves
resource offers).

`local-cluster` (tests/test_local_cluster.py) forks executors from the
driver; here NOTHING shares a parent: master, workers, executors and
driver are independent OS processes wired only by the network, which is
precisely the multi-machine topology minus physical distance (the same
daemons, same protocol, same ports — docker-compose's spark-master /
spark-worker services would run these classes on separate hosts).

The module-scoped fixture boots the daemons via ``spark-class`` on
ephemeral ports and tears them down; scenarios then run in their own
subprocess JVMs (configs precede context start), mirroring the
local-cluster trio: stateful streaming batch parity, executor task
retry, forced-spill oracle exactness, plus a 5-query oracle subset.
Measured timings live in SCALE.md ("standalone cluster" entry).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time
import urllib.request

import pytest

_REPO = str(__import__("pathlib").Path(__file__).resolve().parent.parent)


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


class _Standalone:
    def __init__(self, tmpdir: str):
        self.tmpdir = tmpdir
        self.procs: list[subprocess.Popen] = []
        self.master_url = ""
        self.webui_port = 0

    def _spawn(self, cls: str, *args: str, env_extra=None, log="") -> subprocess.Popen:
        env = dict(os.environ)
        env.setdefault("SPARK_HOME", _spark_home())
        env.setdefault("SPARK_LOG_DIR", self.tmpdir)
        env["SPARK_LOCAL_IP"] = "127.0.0.1"
        env.update(env_extra or {})
        fh = open(log, "w")
        proc = subprocess.Popen(
            [os.path.join(_spark_home(), "bin", "spark-class"), cls, *args],
            stdout=fh,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=self.tmpdir,
            # own process group: killing a worker must take its executor
            # children with it (the worker-loss chaos test kills the
            # whole group — a clean stand-in for losing the host)
            start_new_session=True,
        )
        return proc

    def start(self) -> None:
        mlog = os.path.join(self.tmpdir, "master.log")
        self.procs.append(
            self._spawn(
                "org.apache.spark.deploy.master.Master",
                "--host", "127.0.0.1", "--port", "0", "--webui-port", "0",
                log=mlog,
            )
        )
        # discover the ephemeral ports from the master log
        port = web = None
        for _ in range(120):
            time.sleep(0.5)
            try:
                text = open(mlog).read()
            except OSError:
                continue
            m = re.search(r"service 'sparkMaster' on port (\d+)", text)
            w = re.search(r"service 'MasterUI' on port (\d+)", text)
            if m and w:
                port, web = int(m.group(1)), int(w.group(1))
                break
        if port is None:
            raise RuntimeError("standalone master did not start:\n" + open(mlog).read()[-2000:])
        self.master_url = f"spark://127.0.0.1:{port}"
        self.webui_port = web

        for i in (1, 2):
            self.procs.append(self.spawn_worker(i))
        self.wait_alive_workers(2)

    def spawn_worker(self, i: int) -> subprocess.Popen:
        return self._spawn(
            "org.apache.spark.deploy.worker.Worker",
            self.master_url,
            "--host", "127.0.0.1", "--port", "0", "--webui-port", "0",
            "--cores", "4", "--memory", "2g",
            env_extra={"SPARK_WORKER_DIR": os.path.join(self.tmpdir, f"w{i}")},
            log=os.path.join(self.tmpdir, f"worker{i}.log"),
        )

    def wait_alive_workers(self, n: int) -> None:
        """Wait until the master /json API reports >= n ALIVE workers."""
        for _ in range(120):
            time.sleep(0.5)
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{self.webui_port}/json/", timeout=5
                ) as resp:
                    state = __import__("json").loads(resp.read().decode())
                alive = [
                    w for w in state.get("workers", []) if w.get("state") == "ALIVE"
                ]
                if len(alive) >= n:
                    return
            except OSError:
                continue
        raise RuntimeError(f"{n} workers never registered ALIVE")

    def stop(self) -> None:
        for proc in reversed(self.procs):
            proc.terminate()
        deadline = time.time() + 15
        for proc in self.procs:
            try:
                proc.wait(timeout=max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                proc.kill()


@pytest.fixture(scope="module")
def standalone(tmp_path_factory):
    cluster = _Standalone(str(tmp_path_factory.mktemp("standalone")))
    cluster.start()
    yield cluster
    cluster.stop()


_PRELUDE = r"""
import os, sys
import pyspark
os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
from pyspark.sql import SparkSession

MASTER = sys.argv[1]

def cluster_session(app, extra=()):
    b = (
        SparkSession.builder.master(MASTER)
        .appName(app)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.executor.memory", "1536m")
        .config("spark.executor.cores", "4")
        .config("spark.cores.max", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.host", "127.0.0.1")
        # executors are launched by the WORKER daemons (cwd = the
        # cluster tmpdir), so the repo package must be shipped
        # explicitly — the standalone equivalent of installing the
        # wheel on every host / --py-files. Without it, any task that
        # unpickles a motorway_spark class BY REFERENCE (the Python
        # Data Source readers) dies with ModuleNotFoundError on the
        # executor's Python workers.
        .config("spark.executorEnv.PYTHONPATH", os.getcwd())
    )
    for k, v in extra:
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()
    import time
    for _ in range(60):
        n = len(spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos())
        if n >= 3:  # driver + one executor per WORKER DAEMON
            break
        time.sleep(1)
    assert n >= 3, n
    return spark

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata").rstrip("/")
"""

_STATEFUL_SCRIPT = _PRELUDE + r"""
import pandas as pd
from pyspark.sql import functions as F, Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

spark = cluster_session(
    "sa-rocksdb",
    extra=[(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )],
)
from motorway_spark.streaming.runner import run_stream_to_memory, stream_events

events = stream_events(spark, TESTDATA + "/sf0.001")

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
w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
got = {
    r["user_id"]: r["n_events"]
    for r in sink.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
}
want = {
    r["user_id"]: r["n"]
    for r in spark.read.parquet(TESTDATA + "/sf0.001/events.parquet")
    .groupBy("user_id").agg(F.count("*").alias("n")).collect()
}
assert got == want, (len(got), len(want))
print("SA_STATEFUL_OK", len(got))
"""

_RETRY_AND_ORACLE_SCRIPT = _PRELUDE + r"""
import time
from pyspark import TaskContext

marker_dir = sys.argv[2]
spark = cluster_session("sa-retry", extra=[("spark.task.maxFailures", "3")])

# 1) injected first-attempt crash on a worker-launched executor;
#    retry completes the job (reference crash isolation, ramp.py:167-168)
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
assert len(out) == 1000 and all(r["doubled"] == 2 * r["v"] for r in out)
print("SA_RETRY_OK", len(out))

# 2) oracle-exact subset over spark:// — shuffle blocks, broadcasts and
#    Arrow batches all cross daemon boundaries; timings land in SCALE.md
from motorway_spark.queries import QUERIES, ORACLES
from motorway_spark.oracle import _duckdb_con, compare_frames

SF = TESTDATA + "/sf0.01"
con = _duckdb_con(SF)
for name in (
    "q1_pricing_summary",
    "join_broadcast_dim",
    "q3_shipping_priority",
    "dedup_chunk_global",
    "dedup_minhash_capped",
):
    t0 = time.perf_counter()
    spark_pdf = QUERIES[name](spark, SF).toPandas()
    dt = time.perf_counter() - t0
    problems = compare_frames(spark_pdf, con.sql(ORACLES[name]).df())
    assert not problems, (name, problems[:3])
    print(f"SA_ORACLE_OK {name} {len(spark_pdf)} {dt:.2f}s")
"""

_SPILL_SCRIPT = _PRELUDE + r"""
spark = cluster_session(
    "sa-spill",
    extra=[("spark.shuffle.spill.numElementsForceSpillThreshold", "5000")],
)
from motorway_spark.queries import QUERIES, ORACLES
from motorway_spark.oracle import _duckdb_con, compare_frames

SF = TESTDATA + "/sf0.01"
con = _duckdb_con(SF)
for name in ("q1_pricing_summary", "win_running", "dedup_exact"):
    spark_pdf = QUERIES[name](spark, SF).toPandas()
    problems = compare_frames(spark_pdf, con.sql(ORACLES[name]).df())
    assert not problems, (name, problems[:3])
    print("SA_SPILL_OK", name, len(spark_pdf))
"""


def _run(script: str, *args: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", script, *args],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=_REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


def test_standalone_stateful_streaming_batch_equal(standalone):
    out = _run(_STATEFUL_SCRIPT, standalone.master_url)
    assert "SA_STATEFUL_OK" in out


def test_standalone_task_retry_and_oracle_exact(standalone, tmp_path):
    out = _run(_RETRY_AND_ORACLE_SCRIPT, standalone.master_url, str(tmp_path))
    assert "SA_RETRY_OK 1000" in out
    assert out.count("SA_ORACLE_OK") == 5
    print(out)  # timings for SCALE.md


def test_standalone_forced_spill_oracle_exact(standalone):
    out = _run(_SPILL_SCRIPT, standalone.master_url)
    assert out.count("SA_SPILL_OK") == 3


_WORKER_LOSS_SCRIPT = _PRELUDE + r"""
import threading
import time as _t

spark = cluster_session(
    "sa-worker-loss",
    extra=[
        ("spark.task.maxFailures", "6"),
        ("spark.stage.maxConsecutiveAttempts", "8"),
    ],
)

def slow(batches):
    import time
    for pdf in batches:
        time.sleep(0.4)
        yield pdf

df = spark.range(320000).repartition(32).selectExpr("id AS v")
total = df.mapInPandas(slow, "v long").selectExpr("sum(v) AS s")

result = {}
def run():
    result["s"] = total.collect()[0]["s"]

t = threading.Thread(target=run)
t.start()
_t.sleep(4)  # tasks now spread across BOTH executors
print("KILL_NOW", flush=True)  # parent SIGKILLs worker 2's process group
t.join(300)
assert not t.is_alive(), "job never finished after worker loss"
expected = 320000 * (320000 - 1) // 2
assert result.get("s") == expected, result
print("SA_WORKER_LOSS_OK", result["s"], flush=True)
"""


_STREAM_LOSS_SCRIPT = _PRELUDE + r"""
import json as _json
import tempfile
import time as _t

from pyspark.sql import functions as F

spark = cluster_session(
    "sa-stream-loss",
    extra=[
        ("spark.task.maxFailures", "6"),
        ("spark.stage.maxConsecutiveAttempts", "8"),
        ("spark.sql.shuffle.partitions", "8"),
    ],
)
from motorway_spark.sources import register_sources

register_sources(spark)
spool = tempfile.mkdtemp(prefix="sa_spool_")
N = 400
for i in range(N):
    with open(f"{spool}/m{i:04d}.json", "w") as fh:
        _json.dump({"id": f"m{i}", "body": {"group": f"g{i % 7}", "v": i}}, fh)

stream = (
    spark.readStream.format("spooldir")
    .option("path", spool)
    .option("deleteOnCommit", "false")
    .option("maxFilesPerTrigger", "20")  # ~20 micro-batches
    .load()
)
counts = stream.groupBy("grouping_value").agg(F.count("*").alias("n"))
name = "sa_stream_loss"
q = (
    counts.writeStream.format("memory")
    .queryName(name)
    .outputMode("complete")
    .start()
)
print("KILL_NOW", flush=True)  # parent kills worker 2 two seconds later
q.processAllAvailable()
got = {r["grouping_value"]: r["n"] for r in spark.table(name).collect()}
want = {f"g{g}": len([i for i in range(N) if i % 7 == g]) for g in range(7)}
assert got == want, (got, want)
q.stop()
print("SA_STREAM_LOSS_OK", sum(got.values()), flush=True)
"""


def test_standalone_worker_loss_mid_stream(standalone):
    """Streaming twin of the batch chaos test: a STATEFUL streaming
    aggregation (state store instances live on executors) is draining a
    20-micro-batch source when worker 2's process group is SIGKILLed.
    The query must reload state from the checkpoint onto the surviving
    executor, retry the in-flight batch's tasks, and finish with
    bit-exact per-key counts — executor/host loss during a streaming
    job, the weekly reality of a long-lived 1000-executor stream."""
    import signal

    proc = subprocess.Popen(
        [sys.executable, "-c", _STREAM_LOSS_SCRIPT, standalone.master_url],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=_REPO,
    )
    killed = False
    out_lines: list[str] = []
    try:
        for line in proc.stdout:
            out_lines.append(line)
            if line.startswith("KILL_NOW") and not killed:
                import time as _t

                _t.sleep(2)  # let a few micro-batches land first
                worker2 = standalone.procs[2]
                os.killpg(os.getpgid(worker2.pid), signal.SIGKILL)
                killed = True
            if line.startswith("SA_STREAM_LOSS_OK"):
                break
        proc.wait(timeout=420)
    finally:
        if proc.poll() is None:
            proc.kill()
        if killed:
            standalone.procs[2] = standalone.spawn_worker(2)
            standalone.wait_alive_workers(2)
    assert killed, "KILL_NOW marker never seen:\n" + "".join(out_lines)
    assert any(l.startswith("SA_STREAM_LOSS_OK") for l in out_lines), (
        "".join(out_lines) + proc.stderr.read()[-3000:]
    )


def test_standalone_worker_loss_mid_job(standalone):
    """Chaos rung above task retry: SIGKILL an entire WORKER DAEMON (and
    its executor children — one process group) while a 32-task job is
    mid-flight across both executors. The driver must absorb the
    ExecutorLost / shuffle-fetch failures, reschedule the dead
    executor's tasks (and recompute its lost map outputs) on the
    surviving worker, and land the EXACT answer — host loss on a real
    cluster, reproduced daemon-for-daemon. The reference's equivalent
    is supervised process restart + ramp replay (pipeline.py:127-142);
    Spark's lineage recompute does it without re-ingesting."""
    import signal

    proc = subprocess.Popen(
        [sys.executable, "-c", _WORKER_LOSS_SCRIPT, standalone.master_url],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=_REPO,
    )
    killed = False
    out_lines: list[str] = []
    try:
        for line in proc.stdout:
            out_lines.append(line)
            if line.startswith("KILL_NOW") and not killed:
                worker2 = standalone.procs[2]
                os.killpg(os.getpgid(worker2.pid), signal.SIGKILL)
                killed = True
            if line.startswith("SA_WORKER_LOSS_OK"):
                break
        proc.wait(timeout=420)
    finally:
        if proc.poll() is None:
            proc.kill()
        # restore the 2-worker cluster for any later scenario
        if killed:
            standalone.procs[2] = standalone.spawn_worker(2)
            standalone.wait_alive_workers(2)
    assert killed, "KILL_NOW marker never seen:\n" + "".join(out_lines)
    assert any(l.startswith("SA_WORKER_LOSS_OK") for l in out_lines), (
        "".join(out_lines) + proc.stderr.read()[-3000:]
    )
