"""Structured Streaming layer: event-time windows, watermarks, stateful
per-key processing, and streaming-as-batch parity helpers.

Replaces the reference's reliability machinery (SURVEY.md §2a R1-R6):
XOR ack tree → checkpoint WAL; 30-min message timeout → watermarks;
per-process in-memory state → checkpointed state store.
"""

from motorway_spark.streaming.runner import run_stream_to_memory, stream_events

__all__ = ["run_stream_to_memory", "stream_events"]
