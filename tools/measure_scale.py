"""Scale/codec measurement for a query subset (r13 items 8-9).

Usage:
  python tools/measure_scale.py SF_DIR CPUS CODEC OUT_JSON NAME [NAME...]

Runs each named registry query best-of-2 with the noop sink on
local[CPUS] with spark.io.compression.codec=CODEC, event log enabled;
parses the event log afterwards and attributes per-query shuffle
read/write bytes and task time via the job-description label. One JSON
artifact per (cpus, codec) point; compare points for the c8/c32
scaling ratio and the lz4/zstd shuffle-codec delta.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.capture_plans import iter_event_lines  # noqa: E402


def main() -> int:
    sf_dir, cpus, codec, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    names = sys.argv[5:]
    evdir = tempfile.mkdtemp(prefix="scale_events_")

    from motorway_spark.maintenance import CACHES
    from motorway_spark.queries import QUERIES
    from motorway_spark.session import get_session

    spark = get_session(
        "measure-scale",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.io.compression.codec": codec,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(10000).count()

    wall: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"[{name}]")
        samples = []
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: ERROR {exc}", file=sys.stderr)
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
            CACHES.release_all()
            spark.catalog.clearCache()
        wall[name] = round(min(samples), 3)
        print(f"# {name}: {wall[name]:.2f}s", file=sys.stderr)
    spark.stop()

    # event-log attribution: job description -> jobId -> stageIds -> task
    # shuffle metrics
    job_of_stage: dict[int, str] = {}
    agg = defaultdict(lambda: defaultdict(float))
    for line in iter_event_lines(evdir):
        try:
            ev = json.loads(line)
        except (TypeError, ValueError):
            continue
        if not isinstance(ev, dict):
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get(
                "spark.job.description", ""
            )
            if desc.startswith("[") and desc.endswith("]"):
                qname = desc[1:-1]
                for sid in ev.get("Stage IDs", []):
                    job_of_stage[sid] = qname
        elif kind == "SparkListenerTaskEnd":
            qname = job_of_stage.get(ev.get("Stage ID"))
            if not qname:
                continue
            tm = ev.get("Task Metrics") or {}
            a = agg[qname]
            a["task_time_sec"] += (tm.get("Executor Run Time") or 0) / 1000.0
            sw = tm.get("Shuffle Write Metrics") or {}
            a["shuffle_write_bytes"] += sw.get("Shuffle Bytes Written") or 0
            sr = tm.get("Shuffle Read Metrics") or {}
            a["shuffle_read_bytes"] += (
                sr.get("Local Bytes Read") or 0
            ) + (sr.get("Remote Bytes Read") or 0)
            inp = tm.get("Input Metrics") or {}
            a["input_bytes"] += inp.get("Bytes Read") or 0

    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "codec": codec,
        "wall": wall,
        "metrics": {
            q: {k: round(v, 2) for k, v in m.items()}
            for q, m in agg.items()
        },
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
