"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

# Fixture root is env-overridable so the suite runs anywhere: point
# SPARK_GRAFT_TESTDATA at a dir holding sf0.001/ and sf0.01/ generated
# by tools/make_fixture.py (the oracle gate is self-relative — it
# compares Spark vs DuckDB over the SAME parquet files, so any
# same-shaped fixture exercises it fully).
import os

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata").rstrip("/")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_CORRECT = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from motorway_spark.session import get_session

    session = get_session("motorway-spark-tests", cpus=8, shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
