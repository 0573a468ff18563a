"""Word-count topology end-to-end — batch AND streaming.

Implements what the reference left as an empty stub
(motorway/tests/test_pipeline.py:8-9) for its canonical pipeline
(tests/sample_pipeline.py:8-63: 10 fixed sentences → split → count).
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from motorway_spark.pipeline import Pipeline
from motorway_spark.sources import SENTENCES, register_sources


EXPECTED = Counter(w for s in SENTENCES for w in s.split(" "))


def split_words(df):
    return df.select(F.explode(F.split(F.col("sentence"), " ")).alias("word"))


def count_words(df):
    return df.groupBy("word").count()


def test_wordcount_batch(spark):
    register_sources(spark)
    sentences = spark.read.format("sentences").option("count", 10).load()
    pipe = (
        Pipeline(spark)
        .add_ramp(sentences, "sentence")
        .add_intersection(split_words, "sentence", "word")
        .add_intersection(count_words, "word", "counts", grouping_key="word")
    )
    result = {r["word"]: r["count"] for r in pipe.stream("counts").collect()}
    assert result == dict(EXPECTED)


def test_wordcount_streaming(spark):
    import uuid

    name = f"wc_{uuid.uuid4().hex[:8]}"
    register_sources(spark)
    stream = (
        spark.readStream.format("sentences")
        .option("count", 10)
        .option("batchSize", 3)
        .load()
    )
    pipe = (
        Pipeline(spark)
        .add_ramp(stream, "sentence")
        .add_intersection(split_words, "sentence", "word")
        .add_intersection(count_words, "word", "counts", grouping_key="word")
    )
    counts = pipe.stream("counts")
    # Python stream sources don't support Trigger.AvailableNow (Spark
    # falls back to one batch); processAllAvailable drains the rolling
    # offsets instead.
    from motorway_spark.streaming.runner import start_and_drain

    query = start_and_drain(
        lambda: counts.writeStream.format("memory")
        .queryName(f"wc_{uuid.uuid4().hex[:8]}")
        .outputMode("complete")
        .start()
    )
    name = query.name
    query.stop()
    result = {
        r["word"]: r["count"] for r in spark.table(name).collect()
    }
    assert result == dict(EXPECTED)


def test_unresolvable_stream_raises(spark):
    pipe = Pipeline(spark).add_intersection(lambda df: df, "nope", "out")
    with pytest.raises(ValueError, match="unresolvable"):
        pipe.compile()


def test_null_grouping_key_raises(spark):
    """GroupingValueMissing parity: a null grouping_value must fail
    loudly on keyed routing (reference motorway/grouping.py:29-35)."""
    import pytest as _pytest

    df = spark.createDataFrame([("a", 1), (None, 2)], "k string, v int")
    pipe = (
        Pipeline(spark)
        .add_ramp(df, "in")
        .add_intersection(lambda d: d.groupBy("k").count(), "in", "out", grouping_key="k")
    )
    with _pytest.raises(Exception, match="GroupingValueMissing"):
        pipe.stream("out").collect()

    # strict_grouping=False routes nulls silently (Spark default behavior)
    pipe2 = (
        Pipeline(spark)
        .add_ramp(df, "in")
        .add_intersection(
            lambda d: d.groupBy("k").count(), "in", "out",
            grouping_key="k", strict_grouping=False,
        )
    )
    assert pipe2.stream("out").count() == 2
