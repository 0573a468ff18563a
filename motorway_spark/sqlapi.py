"""SQL string façade — drive the engine the way its users would.

``motorway_spark.sql("SELECT ...", sf_dir)`` parses an SQL string
against the registered catalog views (the ten fixture tables) and
returns the resulting DataFrame, making the whole engine scriptable
from a single string: no DataFrame code, no manual view registration.

``tables={"name": table_dir}`` additionally registers
``UpsertParquetSink`` MANIFEST tables as catalog views — the snapshot
read is the manifest's current file list (the same pruned, healed read
path the sink itself uses), so a table built through the engine's
write path is queryable through its query language:

    motorway_spark.sql("SELECT * FROM my_table WHERE k > 5",
                       tables={"my_table": "/data/my_table"})

A ``tables`` name shadows the fixture table of the same name.

Only the fixture tables the query actually references are registered
(each registration is a driver-side parquet-footer read, so
registering all ten for a one-table query is measurable per-call
overhead — the register_temp_views contract). Reference matching is a
case-insensitive word-boundary scan (Spark SQL identifiers are
case-insensitive), which over-registers on a table name inside a
string literal — harmless, never under-registers for the fixture
names.

At 100 TB nothing changes: the fixture views are lazy
``spark.read.parquet`` scans and a manifest view is an explicit-file
parquet scan, so predicate pushdown, column pruning and partition
pruning apply to a façade query exactly as they do to the DataFrame
API (Catalyst sees the identical logical plan either way).

Reference: motorway has no query language at all (SURVEY.md §4.1);
this is the north-star surface that makes the engine usable from SQL
alone. The sql_facade_* registry queries prove the contract by running
ONE ANSI string on Spark via this façade AND on DuckDB as the oracle;
sql_facade_manifest_table closes the loop between the write path and
the query language.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from motorway_spark.catalog import Catalog, DEFAULT_SF_DIR, TABLES


def sql(
    query: str,
    sf_dir: str = DEFAULT_SF_DIR,
    spark: SparkSession | None = None,
    tables: dict[str, "str | tuple[str, int]"] | None = None,
) -> DataFrame:
    """Run ``query`` against the catalog views over ``sf_dir``, plus
    any ``tables`` manifest-table views. A ``tables`` value is the
    table directory, or ``(table_dir, as_of_seq)`` for a time-travel
    view of that commit version (``UpsertParquetSink.read_version``)."""
    if spark is None:
        from motorway_spark.session import get_session

        spark = get_session("motorway-sql")
    if tables:
        from motorway_spark.sinks.upsert import UpsertParquetSink

        for name, spec in tables.items():
            # value = table dir, or (table dir, as_of_seq) for a
            # time-travel view of that commit version
            table_dir, as_of = (
                spec if isinstance(spec, tuple) else (spec, None)
            )
            sink = UpsertParquetSink.open(spark, table_dir)
            df = sink.read() if as_of is None else sink.read_version(as_of)
            if df is None:  # empty table: zero-row view, real schema
                df = spark.createDataFrame([], sink.table_schema())
            df.createOrReplaceTempView(name)
    # IGNORECASE: Spark SQL identifiers are case-insensitive, so a
    # query written as FROM ORDERS must register the orders view too
    shadowed = {t.lower() for t in tables} if tables else set()
    refs = tuple(
        t
        for t in TABLES
        if t not in shadowed and re.search(rf"\b{t}\b", query, re.IGNORECASE)
    )
    # Empty refs means "register everything" ONLY when no manifest
    # tables were supplied: a query over manifest views alone must not
    # fall back to eagerly registering all ten fixture views (which
    # would even fail outright when sf_dir holds no fixtures — the
    # standalone --table CLI scenario).
    if refs or not tables:
        Catalog(spark, sf_dir).register_temp_views(only=refs or None)
    return spark.sql(query)
