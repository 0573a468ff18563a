"""sql() over UpsertParquetSink manifest tables: open() restores a
sink from the directory alone (num_buckets + key_cols from the
manifest), the façade registers the snapshot read as a catalog view,
empty tables register with a real schema, and a user table shadows the
fixture view of the same name."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

import motorway_spark
from motorway_spark.sinks import UpsertParquetSink

SF = "/root/testdata/sf0.001"


def _mk(spark, tmp_path, name="mtab", n=10):
    table = str(tmp_path / name)
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=i, v=f"v{i}") for i in range(n)], "k bigint, v string"
        ),
        batch_id=0,
    )
    return sink, table


def test_open_restores_params_and_supports_writes(spark, tmp_path):
    _sink, table = _mk(spark, tmp_path)
    opened = UpsertParquetSink.open(spark, table)
    assert opened.num_buckets == 4
    assert opened.key_cols == ["k"]
    assert opened.row_count() == 10
    # writable: the manifest recorded the key columns
    opened.upsert_batch(
        spark.createDataFrame([Row(k=100, v="new")], "k bigint, v string"),
        batch_id=1,
    )
    assert opened.row_count() == 11


def test_open_refuses_nonexistent_table(spark, tmp_path):
    with pytest.raises(ValueError, match="no manifest"):
        UpsertParquetSink.open(spark, str(tmp_path / "nope"))


def test_open_pre_keycol_manifest_is_read_only(spark, tmp_path):
    """Tables checkpointed before key-col recording open read-only and
    refuse writes loudly."""
    _sink, table = _mk(spark, tmp_path)
    # strip key_cols from every log record, simulating an old table
    import json
    import os

    for name in os.listdir(f"{table}/_mlog"):
        p = f"{table}/_mlog/{name}"
        with open(p) as fh:
            rec = json.load(fh)
        rec.pop("key_cols", None)
        with open(p, "w") as fh:
            json.dump(rec, fh)
    opened = UpsertParquetSink.open(spark, table)
    assert opened.key_cols == []
    assert opened.row_count() == 10  # reads fine
    with pytest.raises(ValueError, match="read-only"):
        opened.upsert_batch(
            spark.createDataFrame([Row(k=1, v="x")], "k bigint, v string"),
            batch_id=9,
        )


def test_sql_over_manifest_table(spark, tmp_path):
    _sink, table = _mk(spark, tmp_path, n=20)
    df = motorway_spark.sql(
        "SELECT COUNT(*) AS n, MAX(k) AS mx FROM mytab WHERE k >= 5",
        SF,
        spark,
        tables={"mytab": table},
    )
    row = df.collect()[0]
    assert row["n"] == 15 and row["mx"] == 19


def test_sql_empty_manifest_table_has_schema(spark, tmp_path):
    sink, table = _mk(spark, tmp_path, n=3)
    sink.delete_keys(spark.createDataFrame([(0,), (1,), (2,)], "k bigint"))
    assert sink.row_count() == 0
    df = motorway_spark.sql(
        "SELECT k, v FROM etab", SF, spark, tables={"etab": table}
    )
    assert df.columns == ["k", "v"]
    assert df.count() == 0


def test_sql_manifest_table_shadows_fixture_and_joins_it(spark, tmp_path):
    """A user table named like a fixture shadows it; other fixture
    references in the same query still resolve."""
    table = str(tmp_path / "shadow")
    sink = UpsertParquetSink(
        spark, table, key_cols=["r_regionkey"], num_buckets=2
    )
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(r_regionkey=0, tag="mine")],
            "r_regionkey bigint, tag string",
        ),
        batch_id=0,
    )
    df = motorway_spark.sql(
        """
        SELECT region.tag, COUNT(*) AS n
        FROM region JOIN nation ON n_regionkey = r_regionkey
        GROUP BY region.tag
        """,
        SF,
        spark,
        tables={"region": table},
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["tag"] == "mine" and rows[0]["n"] == 5


def test_sql_manifest_only_query_skips_fixture_registration(
    spark, tmp_path
):
    """A query referencing ONLY manifest tables must not fall back to
    registering all ten fixture views — that is measurable per-call
    overhead and fails outright when sf_dir holds no fixtures (the
    standalone --table scenario)."""
    sink, table = _mk(spark, tmp_path, name="solo")
    row = motorway_spark.sql(
        "SELECT COUNT(*) AS n FROM solo",
        str(tmp_path / "no-such-fixture-dir"),  # would crash if read
        spark,
        tables={"solo": table},
    ).collect()[0]
    assert row["n"] == 10
