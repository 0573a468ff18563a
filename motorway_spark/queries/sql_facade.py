"""SQL-façade registry queries: ONE ANSI string, TWO engines.

Each entry here is a single SQL string handed verbatim to BOTH sides
of the correctness gate — Spark executes it through
``motorway_spark.sql()`` (the string façade over the catalog views)
and DuckDB executes it as the oracle. A hash-equal result therefore
proves two things at once: the façade's parse-against-catalog contract
works end to end, and the string is genuinely portable ANSI (the
decimal-cast aggregate conventions from queries/helpers.py are what
keep float aggregates bit-identical across engines).

The five entries deliberately span the relational surface a SQL-only
user would exercise: scan+filter+aggregate (TPC-H Q1/Q6 shapes), a
correlated EXISTS semi-join, a window-rank top-k, HAVING, and a
join+aggregate — each shape already proven by a DataFrame-API twin
(q1_pricing_summary, q6_forecast_revenue, q4_order_priority,
topk_per_group, agg_having), so a façade failure isolates to the
façade, not the operator.

Reference: motorway has no query language (SURVEY.md §4.1) — this is
the north-star SQL surface, driver-verified like every operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from motorway_spark.queries.helpers import sql_davg, sql_dsum
from motorway_spark.queries.registry import query


def _register(name: str, text: str, doc: str) -> None:
    @query(name, oracle=text)
    def fn(spark: SparkSession, sf_dir: str, _text: str = text) -> DataFrame:
        from motorway_spark.sqlapi import sql as facade_sql

        return facade_sql(_text, sf_dir, spark)

    fn.__name__ = name
    fn.__doc__ = doc


_register(
    "sql_facade_q1_pricing",
    f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity', 'sum_qty')},
      {sql_dsum('l_extendedprice', 'sum_base_price')},
      {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
      {sql_davg('l_quantity', 'avg_qty')},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary through the SQL string façade — the "
    "flagship aggregate as its user-facing one-string form; twin of "
    "q1_pricing_summary (same decimal-cast conventions).",
)

_register(
    "sql_facade_q6_revenue",
    f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 tight-filter global aggregate through the façade; twin "
    "of q6_forecast_revenue. The WHERE reaches the parquet scan as "
    "pushed filters exactly as in the DataFrame form.",
)

_register(
    "sql_facade_exists_semijoin",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    "Correlated EXISTS (TPC-H Q4 shape) through the façade — Catalyst "
    "rewrites the subquery to the same left-semi join the DataFrame "
    "twin (q4_order_priority) declares explicitly.",
)

_register(
    "sql_facade_topk_window",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    "Window-rank top-3 per customer through the façade; twin of "
    "topk_per_group — Spark still plans the rank-limit pushdown "
    "(WindowGroupLimit) from the SQL form.",
)

_register(
    "sql_facade_join_agg",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'total_price')}
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
    "Two-table join + aggregate through the façade: market segment "
    "order volume — the façade registers exactly the two referenced "
    "views and Catalyst plans the join as from the DataFrame API.",
)
