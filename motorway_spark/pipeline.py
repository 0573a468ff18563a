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

    # -- execution -----------------------------------------------------
    def run(self) -> list[object]:
        """Materialize every sink. Batch inputs → writer(df) directly;
        streaming inputs → the writer receives the streaming DataFrame
        and is expected to return a StreamingQuery."""
        streams = self.compile()
        results = []
        for stream_name, writer in self._sinks:
            results.append(writer(streams[stream_name]))
        return results
