"""Table catalog over the parquet test fixtures.

Loads the driver-generated TPC-H-ish tables (TESTDATA.md) as DataFrames.
At 100 TB these would be partitioned/ bucketed lakehouse tables; here the
catalog keeps the *access pattern* identical: always ``spark.read.parquet``
(so predicate pushdown, column pruning and partition pruning apply), never
driver-side materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins at any
# scale (region: 5 rows, nation: 25 rows — fixed-size in TPC-H regardless
# of scale factor).
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Lazy per-table DataFrame accessor rooted at one scale-factor dir."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        # Epoch arithmetic (unix_micros etc.) on NTZ fixtures must not
        # depend on the host timezone of whoever built the session.
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; have {TABLES}")
        if name == "events":
            return self._events()
        return self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")

    def _events(self) -> DataFrame:
        """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader
        rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long (legacy
        conf, runtime-settable) and truncate to microseconds with exact
        integer division — matching DuckDB's ns→µs truncation bit-for-bit
        (float division would round up ~half the time)."""
        from pyspark.sql import functions as F

        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(f"{self.sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.select("event_id", "ts", "user_id", "event_type", "value", "props")

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_temp_views(self) -> None:
        """Register every table as a temp view for spark.sql queries."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    cat = Catalog(spark, sf_dir)
    return {name: cat.table(name) for name in TABLES}
