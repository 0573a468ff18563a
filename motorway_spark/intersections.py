"""Built-in intersections: the reference's canonical transform zoo,
declaratively.

Each class rebuilds one of the reference's example intersections
(SURVEY.md §2a T3-T6) as a DataFrame transform usable with
``Pipeline.add_intersection``:

- SplitExplode ← SentenceSplitIntersection (examples/intersections.py:12-16)
- KeyedCount ← WordCountIntersection (examples/intersections.py:19-31)
- MapEntriesToRows ← WordToDictIntersection (examples/database.py:60-67)
- FilterIntersection / ProjectIntersection ← the 1:0/1 and 1:1 cases of
  the generic process() contract (intersection.py:24-47)
- JsonParse ← the schema-free JSON envelope made schema-on-read
  (messages.py:13, 75-85)

All are stateless plan builders — Catalyst owns execution; the keyed
count in streaming mode uses the state store (bounded, checkpointed)
rather than the reference's process-local defaultdict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from motorway_spark.pipeline import Intersection


class SplitExplode(Intersection):
    """1:N tokenize: one row per separator-delimited token."""

    def __init__(self, column: str, output: str = "token", sep: str = " "):
        self.column, self.output, self.sep = column, output, sep

    def process(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.explode(F.split(F.col(self.column), self.sep)).alias(self.output)
        )


class KeyedCount(Intersection):
    """Per-key running count (batch: total; streaming: state-store
    backed with update output)."""

    def __init__(self, key: str, output: str = "count"):
        self.key, self.output = key, output

    def process(self, df: DataFrame) -> DataFrame:
        return df.groupBy(self.key).agg(F.count("*").alias(self.output))


class FilterIntersection(Intersection):
    """1:0/1 — drop rows failing the predicate (messages the reference
    would ack without emitting)."""

    def __init__(self, predicate: Column):
        self.predicate = predicate

    def process(self, df: DataFrame) -> DataFrame:
        return df.filter(self.predicate)


class ProjectIntersection(Intersection):
    """1:1 reshape — select/rename/derive columns."""

    def __init__(self, *columns: Column | str):
        self.columns = columns

    def process(self, df: DataFrame) -> DataFrame:
        return df.select(*self.columns)


class MapEntriesToRows(Intersection):
    """dict-of-values → one row per (key, value) entry."""

    def __init__(self, map_column: str, key_name: str = "key", value_name: str = "value"):
        self.map_column, self.key_name, self.value_name = map_column, key_name, value_name

    def process(self, df: DataFrame) -> DataFrame:
        other = [c for c in df.columns if c != self.map_column]
        return df.select(
            *other, F.explode(F.col(self.map_column)).alias(self.key_name, self.value_name)
        )


class JsonParse(Intersection):
    """Schema-on-read for a JSON string column (the motorway message
    content envelope): parsed struct fields are appended as columns."""

    def __init__(self, json_column: str, schema: str, prefix: str = ""):
        self.json_column, self.schema, self.prefix = json_column, schema, prefix

    def process(self, df: DataFrame) -> DataFrame:
        parsed = F.from_json(F.col(self.json_column), self.schema)
        fields = [f.strip().split()[0] for f in self.schema.split(",")]
        return df.select(
            "*",
            *[
                parsed.getField(name).alias(f"{self.prefix}{name}")
                for name in fields
            ],
        )
