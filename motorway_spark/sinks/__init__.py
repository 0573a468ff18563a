"""Sinks: exactly-once-friendly writers.

The reference's sink ladder (SURVEY.md §2a K1-K5) becomes: built-in
writeStream formats (kafka/parquet/console/memory) + foreachBatch for
anything transactional. The flagship custom sink is the upsert writer —
K4's select-update-insert (contrib/sql_alchemy/intersections.py:57-98)
as an idempotent MERGE.
"""

from motorway_spark.sinks.dbapi import DbApiUpsertSink
from motorway_spark.sinks.kafka import KafkaLogSink
from motorway_spark.sinks.salesforce import (
    HttpUpsertTransport,
    SalesforceUpsertSink,
    SpoolUpsertTransport,
)
from motorway_spark.sinks.kinesis import KinesisPutRecordsSink, MockKinesisStream
from motorway_spark.sinks.spool import SpoolDirSink
from motorway_spark.sinks.upsert import UpsertParquetSink

__all__ = [
    "DbApiUpsertSink",
    "SalesforceUpsertSink",
    "HttpUpsertTransport",
    "SpoolUpsertTransport",
    "UpsertParquetSink",
    "KafkaLogSink",
    "KinesisPutRecordsSink",
    "MockKinesisStream",
    "SpoolDirSink",
]
