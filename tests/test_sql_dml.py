"""DML through the SQL façade: INSERT INTO / canonical MERGE INTO /
DELETE FROM strings routed to UpsertParquetSink (the declarative form
of the reference's K4 upsert sink — motorway builds the equivalent
statement from table_columns in contrib/sql_alchemy/intersections.py:
57-98). Non-canonical forms refuse loudly instead of half-working."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

import motorway_spark
from motorway_spark.sinks import UpsertParquetSink

SF = "/root/testdata/sf0.001"


def _mk(spark, tmp_path, name="dmltab"):
    table = str(tmp_path / name)
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b")], "k bigint, v string"
        ),
        batch_id=0,
    )
    return sink, {"t": table}


def test_insert_merge_delete_roundtrip(spark, tmp_path):
    sink, T = _mk(spark, tmp_path)
    r = motorway_spark.sql(
        "INSERT INTO t (k, v) VALUES (CAST(3 AS BIGINT), 'c'), "
        "(CAST(4 AS BIGINT), 'd')",
        SF,
        spark,
        tables=T,
    ).collect()[0]
    assert (r["op"], r["rows_affected"]) == ("insert", 2)
    r = motorway_spark.sql(
        "MERGE INTO t USING (SELECT CAST(2 AS BIGINT) AS k, 'B' AS v) s "
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        SF,
        spark,
        tables=T,
    ).collect()[0]
    assert (r["op"], r["rows_affected"]) == ("merge", 1)
    r = motorway_spark.sql(
        "DELETE FROM t WHERE k = 1", SF, spark, tables=T
    ).collect()[0]
    assert (r["op"], r["rows_affected"]) == ("delete", 1)
    got = sorted(
        tuple(r)
        for r in motorway_spark.sql(
            "SELECT * FROM t", SF, spark, tables=T
        ).collect()
    )
    assert got == [(2, "B"), (3, "c"), (4, "d")]


def test_insert_is_keyed_upsert_not_append(spark, tmp_path):
    """The reference's K4 contract: INSERT on a keyed table updates
    the existing row instead of duplicating the key."""
    sink, T = _mk(spark, tmp_path)
    motorway_spark.sql(
        "INSERT INTO t VALUES (CAST(1 AS BIGINT), 'A')",
        SF,
        spark,
        tables=T,
    )
    rows = [r for r in sink.read().collect() if r["k"] == 1]
    assert len(rows) == 1 and rows[0]["v"] == "A"
    assert sink.row_count() == 2


def test_merge_alias_forms_and_source_can_read_fixtures(spark, tmp_path):
    _sink, T = _mk(spark, tmp_path)
    motorway_spark.sql(
        """
        MERGE INTO t AS tgt USING (
          SELECT CAST(r_regionkey + 100 AS BIGINT) AS k, r_name AS v
          FROM region
        ) AS src ON tgt.k = src.k
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
        SF,
        spark,
        tables=T,
    )
    got = motorway_spark.sql(
        "SELECT COUNT(*) AS n FROM t WHERE k >= 100", SF, spark, tables=T
    ).collect()[0]
    assert got["n"] == 5


def test_noncanonical_merge_refuses(spark, tmp_path):
    _sink, T = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="canonical"):
        motorway_spark.sql(
            "MERGE INTO t USING (SELECT 1 AS k) s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = 'x'",
            SF,
            spark,
            tables=T,
        )


def test_merge_wrong_keys_refuses(spark, tmp_path):
    _sink, T = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="key"):
        motorway_spark.sql(
            "MERGE INTO t USING (SELECT 'x' AS v, CAST(1 AS BIGINT) AS k) "
            "s ON t.v = s.v WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            SF,
            spark,
            tables=T,
        )


def test_dml_target_must_be_manifest_table(spark, tmp_path):
    _sink, T = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="not in tables="):
        motorway_spark.sql(
            "INSERT INTO region SELECT * FROM region", SF, spark, tables=T
        )
    with pytest.raises(ValueError, match="time-travel"):
        motorway_spark.sql(
            "DELETE FROM t WHERE k = 1",
            SF,
            spark,
            tables={"t": (T["t"], 1)},
        )


def test_insert_column_list_mismatch_refuses(spark, tmp_path):
    _sink, T = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="counts must match"):
        motorway_spark.sql(
            "INSERT INTO t (k) VALUES (CAST(9 AS BIGINT), 'x')",
            SF,
            spark,
            tables=T,
        )


def _mk_wide(spark, tmp_path):
    """Two non-key columns so simultaneous assignment is observable."""
    table = str(tmp_path / "updtab")
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=1, a=10, b=1), Row(k=2, a=20, b=2), Row(k=3, a=30, b=3)],
            "k bigint, a bigint, b bigint",
        ),
        batch_id=0,
    )
    return sink, {"t": table}


def test_update_matched_rows_only(spark, tmp_path):
    sink, T = _mk_wide(spark, tmp_path)
    r = motorway_spark.sql(
        "UPDATE t SET a = a + 100 WHERE k >= 2", SF, spark, tables=T
    ).collect()[0]
    assert (r["op"], r["rows_affected"]) == ("update", 2)
    got = sorted(tuple(x) for x in sink.read().collect())
    assert got == [(1, 10, 1), (2, 120, 2), (3, 130, 3)]


def test_update_set_is_simultaneous_assignment(spark, tmp_path):
    """Standard SQL UPDATE: every SET expression sees the PRE-update
    row, so SET a = b, b = a swaps instead of aliasing."""
    sink, T = _mk_wide(spark, tmp_path)
    r = motorway_spark.sql(
        "UPDATE t SET a = b, b = a WHERE k = 1", SF, spark, tables=T
    ).collect()[0]
    assert r["rows_affected"] == 1
    got = {x["k"]: (x["a"], x["b"]) for x in sink.read().collect()}
    assert got[1] == (1, 10)  # swapped
    assert got[2] == (20, 2)  # untouched


def test_update_set_commas_inside_expressions(spark, tmp_path):
    """Top-level comma split: function-call / CASE commas stay inside
    their assignment."""
    sink, T = _mk_wide(spark, tmp_path)
    motorway_spark.sql(
        "UPDATE t SET a = GREATEST(a, b, CAST(25 AS BIGINT)), "
        "b = CASE WHEN k = 1 THEN b + 1 ELSE b END WHERE k <= 2",
        SF,
        spark,
        tables=T,
    )
    got = {x["k"]: (x["a"], x["b"]) for x in sink.read().collect()}
    assert got[1] == (25, 2) and got[2] == (25, 2) and got[3] == (30, 3)


def test_update_key_column_refuses(spark, tmp_path):
    _sink, T = _mk_wide(spark, tmp_path)
    with pytest.raises(ValueError, match="key column"):
        motorway_spark.sql(
            "UPDATE t SET k = k + 1 WHERE k = 1", SF, spark, tables=T
        )


def test_update_unknown_column_refuses(spark, tmp_path):
    _sink, T = _mk_wide(spark, tmp_path)
    with pytest.raises(ValueError, match="not a column"):
        motorway_spark.sql(
            "UPDATE t SET nope = 1 WHERE k = 1", SF, spark, tables=T
        )


def test_update_no_match_is_noop(spark, tmp_path):
    sink, T = _mk_wide(spark, tmp_path)
    before = sorted(tuple(x) for x in sink.read().collect())
    r = motorway_spark.sql(
        "UPDATE t SET a = 0 WHERE k > 999", SF, spark, tables=T
    ).collect()[0]
    assert (r["op"], r["rows_affected"]) == ("update", 0)
    assert sorted(tuple(x) for x in sink.read().collect()) == before
