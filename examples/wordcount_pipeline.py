"""The reference's flagship example, Spark-first.

The upstream project's ``examples/app.py`` wires WordRamp →
SentenceSplitIntersection → WordCountIntersection(HashRingGrouper) →
aggregate consumers across worker processes. The same topology here is
a declarative ``Pipeline`` whose streams are DataFrames: the sentence
source is a Python Data Source, the split/count intersections are plan
builders, the hash grouping is a keyed repartition, and Catalyst owns
the execution — there is nothing to supervise.

Run: ``python examples/wordcount_pipeline.py``
"""

from __future__ import annotations

# allow "python examples/<name>.py" from a source checkout without install
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from motorway_spark.intersections import KeyedCount, SplitExplode
from motorway_spark.pipeline import FormatRamp, Pipeline
from motorway_spark.session import get_session
from motorway_spark.sources import register_sources


def build(spark, n_sentences: int = 50) -> Pipeline:
    register_sources(spark)  # the 'sentences' Python Data Source
    pipe = Pipeline(spark)
    # WordRamp twin: the 'sentences' Python Data Source (batch mode here;
    # streaming=True turns the same topology into a StreamingQuery).
    pipe.add_ramp(
        FormatRamp("sentences", {"count": str(n_sentences)}, streaming=False),
        "sentence",
    )
    pipe.add_intersection(SplitExplode("sentence", output="word"), "sentence", "word")
    # HashRingGrouper parity: grouping_key repartitions on the word
    pipe.add_intersection(
        KeyedCount("word", output="count"), "word", "word_count", grouping_key="word"
    )
    return pipe


def main() -> None:
    spark = get_session("example-wordcount")
    register_sources(spark)
    pipe = build(spark)
    results: list = []
    pipe.add_sink(
        "word_count",
        lambda df: results.extend(df.orderBy("count", ascending=False).collect()),
    )
    # plan_guard pre-flights every sink's physical plan before launch
    pipe.run(plan_guard={})
    for row in results[:10]:
        print(f"{row['word']:>12}  {row['count']}")


if __name__ == "__main__":
    main()
