"""Set operations: union / intersect / except (+ ALL forms), distinct.

SURVEY.md §2b "Set ops" row. Scale notes: union is a zero-shuffle
concatenation of inputs; INTERSECT/EXCEPT (+ALL) and distinct are
hash-based shuffles on the full row — at 100 TB prefer key-projected
forms (as these queries do) so the shuffled payload is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query


def _status_keys(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    return orders.filter(F.col("o_orderstatus") == status).select("o_custkey")


@query(
    "set_union_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _status_keys(spark, sf_dir, "O").union(_status_keys(spark, sf_dir, "F"))


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _status_keys(spark, sf_dir, "O")
        .union(_status_keys(spark, sf_dir, "F"))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _status_keys(spark, sf_dir, "O").intersect(_status_keys(spark, sf_dir, "F"))


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _status_keys(spark, sf_dir, "O").subtract(_status_keys(spark, sf_dir, "F"))


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _status_keys(spark, sf_dir, "O").intersectAll(
        _status_keys(spark, sf_dir, "F")
    )


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _status_keys(spark, sf_dir, "O").exceptAll(_status_keys(spark, sf_dir, "F"))


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "drop_duplicates_subset",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def drop_duplicates_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup with a deterministic keep-rule (earliest order per
    customer). `dropDuplicates(subset)` keeps an arbitrary row, which can
    never hash-match an oracle, so the engine's canonical keyed-dedup
    operator is the row_number()==1 form (same single shuffle + sort)."""
    from pyspark.sql import Window

    orders = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )
