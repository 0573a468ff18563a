"""Scan-format coverage: CSV and JSON-lines sources (SURVEY.md §2b
"Scans / sources" row).

The fixtures are parquet-only, so each query first materializes a CSV /
JSON copy under /tmp (once per scale factor, cached by marker file),
then computes its aggregate from the re-read copy with an explicit
schema. The oracle runs the same aggregate on the original parquet —
passing proves the format round-trip is value-exact (Java's
shortest-round-trip double formatting guarantees bit-exact doubles
through text).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query
from motorway_spark.queries.helpers import dec, sql_dsum

_SUPPLIER_SCHEMA = "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"


def _derived(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write supplier as fmt under /tmp once; return the path."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/motorway_scans/{tag}/supplier_{fmt}"
    marker = f"{out}/_SUCCESS"
    if not os.path.exists(marker):
        supplier = Catalog(spark, sf_dir).supplier
        writer = supplier.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            writer.option("header", "true").csv(out)
        else:
            writer.json(out)
    return out


@query(
    "scan_csv",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n, {sql_dsum('s_acctbal', 'total_bal')}
    FROM supplier GROUP BY s_nationkey
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with explicit schema + header; values must survive the
    text round-trip bit-exactly to match the parquet oracle."""
    path = _derived(spark, sf_dir, "csv")
    df = spark.read.schema(_SUPPLIER_SCHEMA).option("header", "true").csv(path)
    return df.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum(dec("s_acctbal")).cast("double"), 4).alias("total_bal"),
    )


@query(
    "scan_json",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n, {sql_dsum('s_acctbal', 'total_bal')}
    FROM supplier GROUP BY s_nationkey
    """,
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with explicit schema (schema-on-read over the
    motorway-style JSON envelope, messages.py:75-85)."""
    path = _derived(spark, sf_dir, "json")
    df = spark.read.schema(_SUPPLIER_SCHEMA).json(path)
    return df.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum(dec("s_acctbal")).cast("double"), 4).alias("total_bal"),
    )
