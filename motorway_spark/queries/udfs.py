"""UDF surface: pandas (vectorized) UDF, row Python UDF, grouped
applyInPandas, and UDTF — the engine's escape hatches, ranked.

This is motorway's arbitrary ``process()`` contract
(/root/reference/motorway/intersection.py:24-47 — any Python per
message) re-based on Spark's UDF ladder. Engine policy (SCALE.md):

1. built-in functions first (everything else in this package);
2. pandas UDF / applyInPandas / mapInPandas when Python is required —
   Arrow batches, ~10-100x over row UDFs;
3. row-at-a-time Python UDF only as a last resort (kept here as a
   declared-but-discouraged surface; same logic as the pandas twin so
   the cost difference is measurable like-for-like).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query

_NORM_ORACLE = """
    SELECT doc_id,
           trim(lower(regexp_replace(text, '[0-9]+', '#', 'g'))) AS norm_text,
           length(trim(lower(regexp_replace(text, '[0-9]+', '#', 'g')))) AS norm_len
    FROM documents
"""


@query("udf_pandas_normalize", oracle=_NORM_ORACLE)
def udf_pandas_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: whole Arrow batches, pandas .str kernels."""

    @pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.replace(r"[0-9]+", "#", regex=True).str.lower().str.strip()

    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        normalize("text").alias("norm_text"),
        F.length(normalize("text")).alias("norm_len"),
    )


@query("udf_python_row_normalize", oracle=_NORM_ORACLE)
def udf_python_row_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same logic as udf_pandas_normalize but row-at-a-time — the
    declared slow path (pickled rows, one Python call per record)."""
    import re

    @udf("string")
    def normalize(s: str) -> str:
        return re.sub(r"[0-9]+", "#", s).lower().strip()

    docs = Catalog(spark, sf_dir).documents
    return docs.select(
        "doc_id",
        normalize("text").alias("norm_text"),
        F.length(normalize("text")).alias("norm_len"),
    )


@query(
    "udf_grouped_minmax",
    oracle="""
    SELECT lang, doc_id,
           FLOOR(CAST(n_chars - min_c AS DOUBLE)
                 / CAST(GREATEST(max_c - min_c, 1) AS DOUBLE)
                 * 1000000 + 0.5) / 1000000 AS scaled
    FROM (SELECT lang, doc_id, n_chars,
                 MIN(n_chars) OVER (PARTITION BY lang) AS min_c,
                 MAX(n_chars) OVER (PARTITION BY lang) AS max_c
          FROM documents)
    """,
)
def udf_grouped_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas UDAF: per-group min-max scaling — each language
    group arrives as one pandas frame (the vectorized form of the
    reference's per-key stateful intersection T4). Integer min/max keep
    it exactly reproducible cross-engine.

    Rounding is explicit half-up in pure double arithmetic
    (floor(x·1e6 + 0.5)/1e6) on BOTH engines: min-max scaling of
    integer spans produces dyadic ties exactly at the 6th decimal
    (e.g. k/128 = .4453125), where numpy rounds half-even and DuckDB
    half-away — found by the sf0.1 sweep, invisible at sf0.01."""
    import numpy as np

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = int(pdf["n_chars"].min())
        hi = int(pdf["n_chars"].max())
        span = max(hi - lo, 1)
        raw = (pdf["n_chars"] - lo) / float(span)
        return pd.DataFrame(
            {
                "lang": pdf["lang"],
                "doc_id": pdf["doc_id"],
                "scaled": np.floor(raw * 1e6 + 0.5) / 1e6,
            }
        )

    docs = Catalog(spark, sf_dir).documents
    return docs.groupBy("lang").applyInPandas(
        scale, schema="lang string, doc_id long, scaled double"
    )


@query(
    "udtf_char_histogram",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS t
      FROM documents WHERE doc_id < 50)
    SELECT doc_id, t[1] AS ch, CAST(COUNT(*) AS INTEGER) AS n
    FROM toks WHERE t <> ''
    GROUP BY doc_id, t[1]
    """,
)
def udtf_char_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) via LATERAL join: one input row →
    N output rows (first-letter histogram of the document's tokens) —
    the declarative form of an intersection yielding multiple messages
    (intersection.py:24-47)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="ch string, n int")
    class FirstLetterHistogram:
        def eval(self, text: str):
            from collections import Counter

            counts = Counter(t[0] for t in text.lower().split(" ") if t)
            for ch, n in sorted(counts.items()):
                yield ch, n

    spark.udtf.register("first_letter_hist", FirstLetterHistogram)
    Catalog(spark, sf_dir).register_temp_views(only=("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, h.ch, h.n
        FROM documents d, LATERAL first_letter_hist(d.text) h
        WHERE d.doc_id < 50
        """
    )
