"""Declarative topology façade: motorway ergonomics → DataFrame DAGs.

The reference wires topologies as
``add_ramp(WordRamp, 'sentence'); add_intersection(SentenceSplit,
'sentence', 'word', grouper_cls=HashRingGrouper)``
(/root/reference/motorway/pipeline.py:65-92, examples/app.py:48-58),
where named streams are queues and groupers route records between
processes. Here the same definition compiles to a DataFrame DAG:

- a named stream IS a DataFrame (edge in the logical plan);
- a ramp is anything producing a DataFrame (batch or streaming);
- an intersection is a DataFrame→DataFrame transform; subclasses get
  motorway-style ergonomics while staying fully declarative;
- a hash grouper is a ``repartition(key)`` — consistent-hash placement
  is unnecessary because Spark state lives in the checkpointed state
  store, not in process-local dicts (SURVEY.md §2a G1);
- ``processes=n`` parallelism hints map to shuffle partition counts.

There is deliberately NO optimizer here (the reference has none either,
pipeline.py:94-136 just starts processes): everything compiles to
Catalyst plans, which do the optimizing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class Ramp:
    """Source contract: produce the stream's DataFrame."""

    def dataframe(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class DataFrameRamp(Ramp):
    def __init__(self, df: DataFrame):
        self._df = df

    def dataframe(self, spark: SparkSession) -> DataFrame:
        return self._df


#: per-source-format option that caps records (or files) per trigger —
#: where a ``@batch_process(limit=…)`` tag lands after pushdown.
_RATE_CAP_OPTION = {
    "sentences": "batchSize",
    "spooldir": "maxFilesPerTrigger",
    "kafkalog": "getRecordsLimit",
    "kafka": "maxOffsetsPerTrigger",  # built-in connector, same idea
}


class FormatRamp(Ramp):
    """A ramp declared as (format, options), built at compile time.

    Declaring the source this way (instead of handing the Pipeline an
    already-built DataFrame) is what lets ``@batch_process(limit=…)``
    tags push their per-trigger cap down into the source options —
    the Spark location of the reference's GET_RECORDS_LIMIT-style
    intake caps (contrib/kafka/ramps.py:32,109).
    """

    def __init__(self, fmt: str, options: dict | None = None, streaming: bool = True):
        self.fmt = fmt
        self.options = dict(options or {})
        self.streaming = streaming
        self.rate_limit: int | None = None  # set by Pipeline from tags

    def dataframe(self, spark: SparkSession) -> DataFrame:
        options = dict(self.options)
        cap = _RATE_CAP_OPTION.get(self.fmt)
        if self.rate_limit is not None and cap is not None and cap not in options:
            options[cap] = str(self.rate_limit)
        reader = spark.readStream if self.streaming else spark.read
        return reader.format(self.fmt).options(**options).load()


class Intersection:
    """Transform contract: DataFrame → DataFrame (1:N row semantics are
    expressed with explode/filter/flatMap-shaped declarative ops — the
    engine equivalent of ``process(message) -> yield`` at
    intersection.py:24-47)."""

    def process(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class FnIntersection(Intersection):
    def __init__(self, fn: Callable[[DataFrame], DataFrame]):
        self._fn = fn

    def process(self, df: DataFrame) -> DataFrame:
        return self._fn(df)


class Pipeline:
    """Topology builder. Streams are named DataFrame edges; ``compile``
    resolves the DAG lazily, ``run`` materializes every sink."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._ramps: dict[str, Ramp] = {}
        self._intersections: list[
            tuple[Intersection, str, str, str | None, int | None, bool]
        ] = []
        self._sinks: list[tuple[str, Callable[[DataFrame], object]]] = []
        self._batch_tags: list[tuple[float, int]] = []  # (wait, limit)

    # -- definition API (motorway-shaped) ------------------------------
    def add_ramp(self, ramp: Ramp | DataFrame, output_stream: str) -> "Pipeline":
        if isinstance(ramp, DataFrame):
            ramp = DataFrameRamp(ramp)
        if output_stream in self._ramps:
            raise ValueError(f"stream {output_stream!r} already has a producer")
        self._ramps[output_stream] = ramp
        return self

    def add_intersection(
        self,
        intersection: Intersection | Callable[[DataFrame], DataFrame],
        input_stream: str,
        output_stream: str,
        grouping_key: str | None = None,
        processes: int | None = None,
        strict_grouping: bool = True,
    ) -> "Pipeline":
        """``grouping_key`` = the reference's grouping_value routed by
        HashRingGrouper → hash repartition before the transform;
        ``processes`` → partition count hint.

        ``strict_grouping``: a null grouping key raises at runtime —
        parity with the reference's GroupingValueMissing
        (motorway/grouping.py:29-35); pass False to route nulls to one
        partition silently instead.
        """
        if not isinstance(intersection, Intersection):
            intersection = FnIntersection(intersection)
        # honor @batch_process tags on the callable or process method
        # (reference decorators.py:5-11 attribute contract)
        for target in (
            getattr(intersection, "_fn", None),
            getattr(type(intersection), "process", None),
        ):
            if target is not None and getattr(target, "batch_process", False):
                self._batch_tags.append(
                    (float(getattr(target, "wait")), int(getattr(target, "limit")))
                )
                break
        self._intersections.append(
            (intersection, input_stream, output_stream, grouping_key, processes,
             strict_grouping)
        )
        return self

    def add_sink(self, input_stream: str, writer: Callable[[DataFrame], object]) -> "Pipeline":
        self._sinks.append((input_stream, writer))
        return self

    # -- compilation ---------------------------------------------------
    def compile(self) -> dict[str, DataFrame]:
        """Resolve every named stream to its DataFrame (the logical
        plan DAG — the analogue of the reference's _stream_consumers
        edge dict, pipeline.py:56-63)."""
        limit = self.batch_limit()
        for ramp in self._ramps.values():
            if isinstance(ramp, FormatRamp) and limit is not None:
                ramp.rate_limit = limit  # @batch_process limit pushdown
        streams: dict[str, DataFrame] = {
            name: ramp.dataframe(self.spark) for name, ramp in self._ramps.items()
        }
        pending = list(self._intersections)
        while pending:
            progressed = False
            for item in list(pending):
                intersection, in_s, out_s, key, procs, strict = item
                if in_s not in streams:
                    continue
                df = streams[in_s]
                if key is not None:
                    if strict:
                        from pyspark.sql import functions as F

                        # GroupingValueMissing parity (grouping.py:29-35)
                        df = df.withColumn(
                            key,
                            F.when(
                                F.col(key).isNull(),
                                F.raise_error(
                                    F.lit(
                                        f"GroupingValueMissing: null grouping key "
                                        f"{key!r} on stream {in_s!r}"
                                    )
                                ),
                            ).otherwise(F.col(key)),
                        )
                    df = df.repartition(procs, key) if procs else df.repartition(key)
                streams[out_s] = intersection.process(df)
                pending.remove(item)
                progressed = True
            if not progressed:
                missing = {i[1] for i in pending} - set(streams)
                raise ValueError(f"unresolvable streams (no producer): {sorted(missing)}")
        return streams

    def stream(self, name: str) -> DataFrame:
        return self.compile()[name]

    # -- micro-batching (reference @batch_process) ---------------------
    def batch_wait(self) -> float | None:
        """Smallest tagged ``wait`` — Spark micro-batching is per-query,
        so the strictest cadence across tagged intersections wins."""
        return min((w for w, _ in self._batch_tags), default=None)

    def batch_limit(self) -> int | None:
        """Smallest tagged ``limit`` (strictest intake cap wins)."""
        return min((lim for _, lim in self._batch_tags), default=None)

    def trigger_kwargs(self) -> dict:
        """The ``writeStream.trigger(**kwargs)`` implied by the tags:
        ``wait`` → ProcessingTime cadence; untagged → AvailableNow-style
        drain is the caller's choice (empty dict = engine default)."""
        wait = self.batch_wait()
        if wait is None:
            return {}
        wait = int(wait) if float(wait).is_integer() else wait
        return {"processingTime": f"{wait} seconds"}

    # -- execution -----------------------------------------------------
    def run(
        self,
        trigger: dict | None = None,
        plan_guard: bool | dict = False,
    ) -> list[object]:
        """Materialize every sink. Batch inputs → writer(df) directly;
        streaming inputs → the writer receives the streaming DataFrame
        and is expected to return a StreamingQuery.

        ``trigger``: optional ``writeStream.trigger`` kwargs (e.g.
        ``{"processingTime": "5 seconds"}`` or ``{"availableNow":
        True}``) passed to writers that accept a second argument;
        defaults to the cadence implied by ``@batch_process`` tags.

        ``plan_guard``: pre-flight EVERY sink's plan (batch and
        streaming — Spark explains unstarted streaming plans, pinned in
        tests/test_planguard.py) through
        :func:`motorway_spark.planguard.assert_plan_safe` before any
        writer runs — the topology refuses to launch if a plan
        degenerated (cartesian product, row-Python UDF, ...). Pass a
        dict to forward allowances (e.g. ``{"allow_nested_loop":
        True}``).
        """
        import inspect

        streams = self.compile()
        # An empty dict means "guard with default allowances", not "off":
        # only plan_guard=False disables the audit.
        if plan_guard or isinstance(plan_guard, dict):
            from motorway_spark.planguard import assert_plan_safe

            kwargs = plan_guard if isinstance(plan_guard, dict) else {}
            for stream_name, _writer in self._sinks:
                assert_plan_safe(streams[stream_name], **kwargs)
        trigger = trigger if trigger is not None else self.trigger_kwargs()
        results = []
        for stream_name, writer in self._sinks:
            df = streams[stream_name]
            try:
                accepts_trigger = len(inspect.signature(writer).parameters) >= 2
            except (TypeError, ValueError):
                accepts_trigger = False
            results.append(writer(df, trigger) if accepts_trigger else writer(df))
        return results
