"""motorway_spark — a PySpark-native analytics & dataflow engine.

A from-scratch rebuild of the capability surface of plecto/motorway
(a Storm-like pure-Python streaming pipeline framework; reference at
/root/reference) on idiomatic Apache Spark:

- relational surface: DataFrame / Spark SQL, optimized by Catalyst
  (the reference has no optimizer at all — SURVEY.md §4.1);
- dataflow surface: Structured Streaming with watermarks, windows and
  checkpointed exactly-once sinks (replaces motorway's XOR ack tree,
  reference ``motorway/controller.py:98-129``);
- connectors: Spark built-in sources/sinks plus the Python Data Source
  API for ramp-shaped custom sources (reference ``motorway/ramp.py``);
- topology façade: a Pipeline/Ramp/Intersection-flavoured declarative
  API that compiles to DataFrames (reference ``motorway/pipeline.py``).

Design point: 100 TB on a 1000-executor cluster. Every operator is
expressed declaratively so Catalyst/AQE pick the physical strategy;
Python appears only in Arrow-vectorized form (pandas UDFs) and never
per-row in a hot path.
"""

from motorway_spark.session import get_session, stop_session
from motorway_spark.catalog import Catalog, load_tables
from motorway_spark.decorators import batch_process
from motorway_spark.sqlapi import sql

__version__ = "0.1.0"

__all__ = [
    "get_session",
    "stop_session",
    "Catalog",
    "load_tables",
    "batch_process",
    "sql",
    "__version__",
]
