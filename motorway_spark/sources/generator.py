"""Finite sentence-generator source — the reference's canonical ramp.

Rebuilds WordRamp (/root/reference/examples/ramps.py:13-50 and
motorway/tests/sample_pipeline.py:8-38: a ramp emitting sentences, which
the canonical word-count topology splits and counts) as a Python Data
Source usable both batch and streaming:

    spark.dataSource.register(SentenceSource)
    spark.read.format("sentences").option("count", 10).load()
    spark.readStream.format("sentences").option("count", 10)
         .option("batchSize", 3).load()

Streaming offsets are just the emitted-count watermark {"index": n} —
replayable by construction, so checkpoint recovery re-reads any
uncommitted suffix (the ramp's failed()-retry loop, ramp.py:57-64, for
free).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

# The 10 fixed sentences of the reference fixture (public README example).
SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "a stitch in time saves nine",
    "the early bird catches the worm",
    "practice makes perfect every single day",
    "actions speak louder than words",
    "the pen is mightier than the sword",
    "a journey of a thousand miles begins with a single step",
    "fortune favors the bold and the brave",
    "all that glitters is not gold",
    "the whole is greater than the sum of its parts",
]

SCHEMA_DDL = "id BIGINT, sentence STRING"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SentenceBatchReader(DataSourceReader):
    def __init__(self, options):
        self.count = int(options.get("count", len(SENTENCES)))
        self.num_partitions = int(options.get("numPartitions", 2))

    def partitions(self):
        per = max(1, self.count // self.num_partitions)
        bounds = list(range(0, self.count, per)) + [self.count]
        return [
            _RangePartition(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, SENTENCES[i % len(SENTENCES)])


class SentenceStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.count = int(options.get("count", len(SENTENCES)))
        self.batch_size = int(options.get("batchSize", 3))
        self.advanced = 0
        self.committed = 0

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # reveal one micro-batch worth of data per trigger, up to the
        # end; advancing here (not in commit) keeps processAllAvailable
        # draining — availability checks poll latestOffset, and commit
        # timing is the engine's business, not the source's
        self.advanced = min(self.advanced + self.batch_size, self.count)
        return {"index": self.advanced}

    def partitions(self, start: dict, end: dict):
        return [_RangePartition(start["index"], end["index"])]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (i, SENTENCES[i % len(SENTENCES)])

    def commit(self, end: dict) -> None:
        # batch-level success callback (replaces Ramp.success per-record)
        self.committed = max(self.committed, end["index"])


class SentenceSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sentences"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SentenceBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return SentenceStreamReader(self.options)


def register_sources(spark) -> None:
    """Register all custom sources on a session (idempotent)."""
    from motorway_spark.sources.changefeed import ManifestChangefeedSource
    from motorway_spark.sources.kafka import KafkaLogSource
    from motorway_spark.sources.longpoll import LongPollSource
    from motorway_spark.sources.pagedapi import PagedApiSource
    from motorway_spark.sources.spool import SpoolDirSource

    spark.dataSource.register(SentenceSource)
    spark.dataSource.register(SpoolDirSource)
    spark.dataSource.register(KafkaLogSource)
    spark.dataSource.register(PagedApiSource)
    spark.dataSource.register(LongPollSource)
    spark.dataSource.register(ManifestChangefeedSource)
