"""Runtime plan guardrails: the pre-flight gate must flag exactly the
cluster-hostile shapes and pass the engine's own headline plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from motorway_spark.planguard import PlanGuardError, assert_plan_safe, audit_plan
from motorway_spark.queries import QUERIES

from tests.conftest import SF_SMOKE as SF


def test_cartesian_product_is_flagged(spark):
    a = spark.range(10_000)
    b = spark.range(10_000).withColumnRenamed("id", "id2")
    # force the true cartesian: with broadcast allowed Spark downgrades
    # to BroadcastNestedLoopJoin (also flagged, but a different check)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        report = audit_plan(a.crossJoin(b))
        assert not report.ok
        assert any("O(n^2)" in v for v in report.violations)
        with pytest.raises(PlanGuardError):
            assert_plan_safe(a.crossJoin(b))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_keyless_nested_loop_flagged_but_allowable(spark):
    a = spark.range(1000).withColumnRenamed("id", "x")
    b = spark.range(5).withColumnRenamed("id", "y")
    theta = a.join(F.broadcast(b), a.x > b.y)  # non-equi -> BNLJ
    assert not audit_plan(theta).ok
    assert audit_plan(theta, allow_nested_loop=True).ok


def test_row_udf_flagged_pandas_udf_clean(spark):
    from pyspark.sql.functions import pandas_udf, udf

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))

    row_double = udf(lambda v: v * 2, "double")
    assert not audit_plan(df.select(row_double("v"))).ok
    assert audit_plan(df.select(row_double("v")), allow_row_udf=True).ok

    @pandas_udf("double")
    def vec_double(s):
        return s * 2

    assert audit_plan(df.select(vec_double("v"))).ok


def test_scan_width_budget(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    narrow = li.select("l_orderkey", "l_quantity")
    assert audit_plan(narrow, max_scan_columns=4).ok
    wide = li  # all 11 columns
    assert not audit_plan(wide.filter("l_quantity > 0"), max_scan_columns=4).ok


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q5_local_supplier", "dedup_minhash_capped", "dq_checks"],
)
def test_headline_queries_pass_guard(spark, name):
    """The engine's own headline plans must clear their guard: q1/q5
    with a 7-column scan budget; dedup/dq assemble one-row broadcast
    sides, so the nested-loop allowance applies there by design."""
    df = QUERIES[name](spark, SF)
    assert_plan_safe(df, allow_nested_loop=True, max_scan_columns=7)


def test_audit_works_on_unstarted_streaming_plans(spark, tmp_path):
    """audit_plan must inspect a STREAMING DataFrame before any query
    starts (explain works on the unstarted plan) — so streaming
    topologies get the same pre-flight as batch where Spark can plan
    them. A clean windowed aggregate passes; a row-Python-UDF stream is
    flagged."""
    from pyspark.sql.functions import udf

    from motorway_spark.sources import register_sources

    register_sources(spark)
    import os

    spool = str(tmp_path / "q")
    os.makedirs(spool)
    stream = (
        spark.readStream.format("spooldir").option("path", spool).load()
    )
    clean = stream.groupBy("grouping_value").count()
    assert audit_plan(clean).ok

    row_fn = udf(lambda s: (s or "") + "!", "string")
    flagged = stream.select(row_fn("body"))
    report = audit_plan(flagged)
    assert not report.ok and any("BatchEvalPython" in v for v in report.violations)


def test_read_schema_width_parser():
    from motorway_spark.planguard import _read_schema_widths

    plan = """
    (1) Scan parquet
    ReadSchema: struct<a:bigint,b:double,c:string>
    (2) Scan parquet
    ReadSchema: struct<x:int>
    (3) Scan parquet
    ReadSchema: struct<>
    """
    widths = [n for n, _ in _read_schema_widths(plan)]
    assert widths == [3, 1, 0]


def test_read_schema_width_parser_nested_and_truncated():
    """ADVICE r4: fields inside nested struct/array/map type arguments
    must not count toward a scan's width, and Spark's '... N more
    fields' truncation must fold back in."""
    from motorway_spark.planguard import _read_schema_widths

    plan = """
    (1) Scan parquet
    ReadSchema: struct<a:bigint,meta:struct<x:int,y:int,z:string>,b:double>
    (2) Scan parquet
    ReadSchema: struct<tags:array<struct<k:string,v:string>>,m:map<string,int>>
    (3) Scan parquet
    ReadSchema: struct<a:int,b:int,... 4 more fields>
    (4) Scan parquet
    ReadSchema: struct<meta:struct<a:int,... 30 more fields>,b:int>
    """
    widths = [n for n, _ in _read_schema_widths(plan)]
    # (4): the truncation sits INSIDE a nested struct — it must not add
    # 29 phantom top-level columns (r5 review finding)
    assert widths == [3, 2, 6, 2]


def test_empty_allowance_dict_still_enables_pipeline_guard(spark):
    """ADVICE r4: run(plan_guard={}) means 'guard with default (no)
    allowances', not 'guard off' — a degenerate plan must still refuse
    to launch."""
    from motorway_spark.pipeline import Pipeline

    a = spark.range(1000).withColumnRenamed("id", "x")
    b = spark.range(5).withColumnRenamed("id", "y")
    theta = a.join(F.broadcast(b), a.x > b.y)  # non-equi -> BNLJ, flagged
    pipe = Pipeline(spark).add_ramp(theta, "theta")
    seen = []
    pipe.add_sink("theta", lambda df: seen.append(df.count()))
    with pytest.raises(PlanGuardError):
        pipe.run(plan_guard={})
    assert seen == []  # the guard fired BEFORE any writer ran
    # and the same dict with the allowance forwards it
    pipe.run(plan_guard={"allow_nested_loop": True})
    assert seen == [sum(999 - y for y in range(5))]  # 4985 (x>y pairs)
