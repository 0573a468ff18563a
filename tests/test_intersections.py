"""Built-in intersection zoo: declarative twins of the reference's
example intersections, wired through the Pipeline façade."""

from __future__ import annotations

from pyspark.sql import functions as F

from motorway_spark.intersections import (
    FilterIntersection,
    JsonParse,
    KeyedCount,
    MapEntriesToRows,
    ProjectIntersection,
    SplitExplode,
)
from motorway_spark.pipeline import Pipeline


def test_split_explode_and_keyed_count(spark):
    df = spark.createDataFrame([("a b a",), ("b c",)], "sentence string")
    pipe = (
        Pipeline(spark)
        .add_ramp(df, "sentence")
        .add_intersection(SplitExplode("sentence", output="word"), "sentence", "word")
        .add_intersection(KeyedCount("word"), "word", "counts", grouping_key="word")
    )
    assert {(r["word"], r["count"]) for r in pipe.stream("counts").collect()} == {
        ("a", 2),
        ("b", 2),
        ("c", 1),
    }


def test_filter_project_map_entries(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 200.0)], "id int, v double")
    pipe = (
        Pipeline(spark)
        .add_ramp(df, "in")
        .add_intersection(FilterIntersection(F.col("v") > 50), "in", "big")
        .add_intersection(
            ProjectIntersection(
                "id", F.create_map(F.lit("v"), F.col("v"), F.lit("2v"), F.col("v") * 2).alias("m")
            ),
            "big",
            "mapped",
        )
        .add_intersection(MapEntriesToRows("m", "metric", "val"), "mapped", "rows")
    )
    rows = {(r["id"], r["metric"], r["val"]) for r in pipe.stream("rows").collect()}
    assert rows == {(2, "v", 200.0), (2, "2v", 400.0)}


def test_json_parse(spark):
    df = spark.createDataFrame([('{"k": 7, "tag": "x"}',)], "props string")
    out = JsonParse("props", "k int, tag string").process(df).collect()[0]
    assert out["k"] == 7 and out["tag"] == "x"
