"""Concurrent query execution on one SparkSession.

A shared engine serves many analysts/jobs at once; Spark sessions are
thread-safe by contract (the driver schedules concurrent jobs across
the same executors). This pins it for THIS engine's query surface:
eight representative queries — spanning aggregates, joins, windows,
dedup, text, and data-quality — run simultaneously from worker threads
and must produce exactly the rows their serial runs produce. Catches
accidental session-level mutable state in query builders (temp-view
name collisions, conf flips, cached-plan crosstalk)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from motorway_spark.queries import QUERIES

from tests.conftest import SF_SMOKE as SF

NAMES = [
    "q1_pricing_summary",
    "q5_local_supplier",
    "topk_per_group",
    "dedup_exact",
    "text_quality",
    "dq_checks",
    "events_funnel",
    "win_running",
    # exercises the temp-view path: concurrent createOrReplaceTempView of
    # the same fixture tables must be benign (same content, last wins)
    "sql_api_q7_volume",
]


def _rows(spark, name):
    df = QUERIES[name](spark, SF)
    return sorted(tuple(str(v) for v in row) for row in df.collect())


def test_concurrent_queries_match_serial(spark):
    serial = {name: _rows(spark, name) for name in NAMES}
    with ThreadPoolExecutor(max_workers=len(NAMES)) as pool:
        futures = {name: pool.submit(_rows, spark, name) for name in NAMES}
        concurrent = {name: fut.result(timeout=300) for name, fut in futures.items()}
    for name in NAMES:
        assert concurrent[name] == serial[name], name
