"""Bucketed co-located joins: pre-shuffled storage eliminates the
exchange on both join sides — the 100 TB pattern for repeated fact⋈fact
joins on a stable key (SCALE.md "Joins")."""

from __future__ import annotations

import uuid


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    li_tbl, od_tbl = f"li_b_{suffix}", f"od_b_{suffix}"

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(li_tbl)
    od.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(od_tbl)
    try:
        # disable broadcast so the join must pick SMJ; bucketing should
        # then satisfy the required distribution with NO exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(li_tbl).join(
            spark.table(od_tbl),
            spark.table(li_tbl).l_orderkey == spark.table(od_tbl).o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {li_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {od_tbl}")
