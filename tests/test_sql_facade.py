"""motorway_spark.sql — the SQL string façade: parse-against-catalog,
selective view registration, and the one-string-two-engines contract
(the sql_facade_* registry entries carry the oracle halves)."""

from __future__ import annotations

from motorway_spark import sql
from motorway_spark.queries import ORACLES, QUERIES

from tests.conftest import SF_CORRECT as SF

FACADE = [
    "sql_facade_q1_pricing",
    "sql_facade_q6_revenue",
    "sql_facade_exists_semijoin",
    "sql_facade_topk_window",
    "sql_facade_join_agg",
]


def test_facade_runs_a_plain_string(spark):
    rows = sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > 1000",
        SF,
        spark,
    ).collect()
    assert len(rows) == 1 and rows[0]["n"] > 0


def test_facade_registers_only_referenced_views(spark):
    for name in ("region", "nation"):  # stale views from other tests
        spark.catalog.dropTempView(name) if spark.catalog.tableExists(
            name
        ) else None
    sql("SELECT COUNT(*) AS n FROM customer", SF, spark).collect()
    assert spark.catalog.tableExists("customer")
    assert not spark.catalog.tableExists("region")


def test_facade_queries_registered_with_identical_oracle_text(spark):
    """The one-string-two-engines contract: each façade entry's oracle
    IS the string the Spark side executes (same object in the
    registry), and it runs through the façade end to end."""
    for name in FACADE:
        assert name in QUERIES and name in ORACLES
        df = QUERIES[name](spark, SF)
        assert df.count() > 0


def test_facade_plan_keeps_pushdown(spark):
    """A façade filter must reach the parquet scan like the DataFrame
    form — the views are lazy scans, not materializations."""
    plan = sql(
        "SELECT o_orderkey FROM orders WHERE o_orderkey = 42", SF, spark
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_facade_table_scan_is_case_insensitive(spark):
    """Spark SQL identifiers are case-insensitive; the reference scan
    must register the view for FROM ORDERS / Lineitem too."""
    rows = sql("SELECT COUNT(*) AS n FROM ORDERS", SF, spark).collect()
    assert rows[0]["n"] > 0
    rows = sql(
        "SELECT COUNT(*) AS n FROM Lineitem WHERE L_QUANTITY > 0",
        SF,
        spark,
    ).collect()
    assert rows[0]["n"] > 0
