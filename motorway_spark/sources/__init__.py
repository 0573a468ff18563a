"""Custom sources (motorway "ramps") on the Python Data Source API.

The reference's Ramp contract (motorway/ramp.py:15-170: ``next()``
yields messages; ``success``/``failed`` delivery callbacks) maps to
Spark's pull-based source contract: ``latestOffset/partitions/read``
replace the producer loop, and batch-level ``commit(offset)`` replaces
per-record success callbacks — strictly stronger semantics (exactly-once
from replayable offsets + checkpoint instead of at-least-once ack trees).
"""

from motorway_spark.sources.generator import SentenceSource, SENTENCES, register_sources
from motorway_spark.sources.kafka import KafkaLogSource, OffsetTracker
from motorway_spark.sources.longpoll import LongPollChannel, LongPollSource
from motorway_spark.sources.pagedapi import PagedApiSource
from motorway_spark.sources.spool import SpoolDirSource

__all__ = [
    "SentenceSource",
    "SpoolDirSource",
    "KafkaLogSource",
    "LongPollChannel",
    "LongPollSource",
    "PagedApiSource",
    "OffsetTracker",
    "SENTENCES",
    "register_sources",
]
