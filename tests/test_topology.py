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


def test_batch_process_facade(spark):
    """@batch_process(wait, limit) parity (reference decorators.py:5-11,
    examples at contrib/kafka/intersections.py:35): the limit pushes
    down to the ramp's per-trigger cap, the wait sets the trigger
    cadence, and the observed micro-batches respect the cap."""
    import uuid

    from motorway_spark.decorators import batch_process
    from motorway_spark.pipeline import FormatRamp
    from motorway_spark.streaming.metrics import MetricsListener
    from motorway_spark.streaming.runner import start_and_drain

    register_sources(spark)

    @batch_process(wait=1, limit=4)
    def split_tagged(df):
        return split_words(df)

    pipe = (
        Pipeline(spark)
        .add_ramp(FormatRamp("sentences", {"count": "10"}), "sentence")
        .add_intersection(split_tagged, "sentence", "word")
        .add_intersection(count_words, "word", "counts", grouping_key="word")
    )
    assert pipe.batch_wait() == 1
    assert pipe.batch_limit() == 4
    assert pipe.trigger_kwargs() == {"processingTime": "1 seconds"}

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        counts = pipe.stream("counts")
        query = start_and_drain(
            lambda: counts.writeStream.format("memory")
            .queryName(f"bp_{uuid.uuid4().hex[:8]}")
            .outputMode("complete")
            .trigger(**pipe.trigger_kwargs())
            .start()
        )
        name = query.name
        query.stop()
        result = {r["word"]: r["count"] for r in spark.table(name).collect()}
        assert result == dict(EXPECTED)
        import time

        # Listener events are ASYNC: a fixed sleep raced the last
        # batch's progress event on a loaded host (observed once: 2 of
        # 3 events after 2 s while the memory sink already held all 10
        # rows). The drain guarantee is "all 10 input rows processed",
        # so poll until the listener has accounted for all of them.
        def _batches():
            return [
                p for p in listener.progress
                if p["query"] == name and p["num_input_rows"] > 0
            ]

        deadline = time.monotonic() + 30
        while (
            sum(p["num_input_rows"] for p in _batches()) < 10
            and time.monotonic() < deadline
        ):
            time.sleep(0.25)
        batches = _batches()
        # limit-shaped micro-batches: 10 sentences / cap 4 -> >=3
        # batches, every batch <= 4 input rows
        assert len(batches) >= 3
        assert all(p["num_input_rows"] <= 4 for p in batches)
    finally:
        spark.streams.removeListener(listener)


def test_run_passes_trigger_to_writers(spark):
    """Pipeline.run forwards trigger kwargs to two-arg sink writers."""
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    seen = {}

    def writer(frame, trigger):
        seen["trigger"] = trigger
        return frame.count()

    pipe = Pipeline(spark).add_ramp(df, "in").add_sink("in", writer)
    (n,) = pipe.run(trigger={"availableNow": True})
    assert n == 1
    assert seen["trigger"] == {"availableNow": True}


def test_post_error_to_sentry_decorator():
    """Reference decorators.py:14-31 twin: the attribute contract is
    kept, the (dead-in-reference) capture-and-reraise body works, and a
    broken reporting client never masks the original error."""
    from motorway_spark.decorators import post_error_to_sentry

    class Client:
        def __init__(self):
            self.captured = 0

        def captureException(self):  # noqa: N802 (raven SDK surface)
            self.captured += 1

    client = Client()

    @post_error_to_sentry(client)
    def work(x):
        if x < 0:
            raise ValueError("negative")
        return x * 2

    assert work.post_error_to_sentry is True  # reference attribute
    assert work(3) == 6
    assert client.captured == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="negative"):
        work(-1)
    assert client.captured == 1

    class BrokenClient:
        def captureException(self):  # noqa: N802
            raise RuntimeError("sentry down")

    @post_error_to_sentry(BrokenClient())
    def work2():
        raise ValueError("original")

    with _pytest.raises(ValueError, match="original"):
        work2()  # reporting failure must not replace the real error


def test_run_plan_guard_rejects_bad_topology(spark):
    """plan_guard=True must refuse to launch a topology whose sink plan
    degenerated into a cartesian product, and pass a clean one."""
    import pytest as _pytest

    from motorway_spark.pipeline import Pipeline
    from motorway_spark.planguard import PlanGuardError

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(1000)
        b = spark.range(1000).withColumnRenamed("id", "id2")
        bad = (
            Pipeline(spark)
            .add_ramp(a, "left")
            .add_intersection(lambda df: df.crossJoin(b), "left", "pairs")
            .add_sink("pairs", lambda df: df.count())
        )
        with _pytest.raises(PlanGuardError):
            bad.run(plan_guard=True)

        good = (
            Pipeline(spark)
            .add_ramp(a, "nums")
            .add_intersection(lambda df: df.filter("id % 2 = 0"), "nums", "evens")
            .add_sink("evens", lambda df: df.count())
        )
        assert good.run(plan_guard=True) == [500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
