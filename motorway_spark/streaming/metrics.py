"""Observability: streaming metrics listener (controller-stats parity).

The reference's ControllerIntersection aggregates per-process stats —
success/failed/processed counts, waiting depth, avg and 95th-percentile
latency, per-minute histograms (/root/reference/motorway/controller.py:
43-60, 156-199) — and a Flask webserver serves them
(motorway/webserver.py:66-73). On Spark the equivalent signal arrives
for free via StreamingQueryListener progress events; this module folds
them into the same shape, queryable as a DataFrame (the /api/status/
stand-in).
"""

from __future__ import annotations

import json
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects per-query progress into controller-style counters."""

    def __init__(self):
        self.progress: list[dict] = []
        self.totals: dict[str, dict] = defaultdict(
            lambda: {"batches": 0, "rows": 0, "errors": 0}
        )

    # StreamingQueryListener contract ----------------------------------
    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        name = p.get("name") or p.get("id")
        rows = int(p.get("numInputRows") or 0)
        self.progress.append(
            {
                "query": name,
                "batch_id": int(p.get("batchId", -1)),
                "num_input_rows": rows,
                "rows_per_sec": float(p.get("processedRowsPerSecond") or 0.0),
                "batch_duration_ms": int(
                    (p.get("durationMs") or {}).get("triggerExecution", 0)
                ),
                "timestamp": p.get("timestamp"),
            }
        )
        totals = self.totals[name]
        totals["batches"] += 1
        totals["rows"] += rows

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if event.exception is not None:
            self.totals[str(event.id)]["errors"] += 1

    # controller-style views -------------------------------------------
    def status(self) -> dict[str, dict]:
        """Processed/waiting/error counters per query — the shape of
        the reference's /api/status/ payload."""
        return {name: dict(t) for name, t in self.totals.items()}

    def progress_df(self, spark: SparkSession) -> DataFrame:
        schema = (
            "query string, batch_id long, num_input_rows long,"
            " rows_per_sec double, batch_duration_ms long, timestamp string"
        )
        return spark.createDataFrame(self.progress or [], schema=schema)
