"""Additive schema evolution on UpsertParquetSink (the Delta
mergeSchema contract): batches may ADD columns (older rows read NULL)
or OMIT columns (target values kept — a partial update never erases
what the batch didn't send); the recorded schema only widens; readers
pin the manifest schema so heterogeneous files coexist; same-name type
conflicts refuse loudly. Before round 11 both directions crashed the
merge with an unresolved-column AnalysisException."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import motorway_spark
from motorway_spark.sinks import UpsertParquetSink


def _mk(spark, tmp_path, name="etab", buckets=4):
    table = str(tmp_path / name)
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=buckets)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=i, v=f"v{i}") for i in range(10)], "k bigint, v string"
        ),
        batch_id=0,
    )
    return sink, table


def test_added_column_merges_and_old_rows_read_null(spark, tmp_path):
    sink, table = _mk(spark, tmp_path)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=2, v="b2", extra=9), Row(k=30, v="c", extra=7)],
            "k bigint, v string, extra bigint",
        ),
        batch_id=1,
    )
    df = sink.read()
    assert df.columns == ["k", "v", "extra"]
    got = {r["k"]: (r["v"], r["extra"]) for r in df.collect()}
    assert got[2] == ("b2", 9) and got[30] == ("c", 7)
    assert got[1] == ("v1", None)  # pre-evolution row reads NULL
    assert sink.row_count() == 11
    # once the producer carries the full schema, disjoint batches ride
    # the append path again (schema_key equality restored)
    import json
    import os

    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=1000 + i, v="a", extra=i) for i in range(5)],
            "k bigint, v string, extra bigint",
        ),
        batch_id=2,
    )
    names = sorted(
        n for n in os.listdir(f"{table}/_mlog") if n.endswith(".delta.json")
    )
    with open(f"{table}/_mlog/{names[-1]}") as fh:
        assert json.load(fh)["op"] == "append"


def test_omitted_column_is_partial_update(spark, tmp_path):
    sink, _table = _mk(spark, tmp_path)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=3, v="x", extra=5)], "k bigint, v string, extra bigint"
        ),
        batch_id=1,
    )
    # the narrow batch updates v but never sent extra: target value kept
    sink.upsert_batch(
        spark.createDataFrame([Row(k=3, v="y"), Row(k=99, v="n")],
                              "k bigint, v string"),
        batch_id=2,
    )
    got = {r["k"]: (r["v"], r["extra"]) for r in sink.read().collect()}
    assert got[3] == ("y", 5)  # updated v, KEPT extra
    assert got[99] == ("n", None)  # new row: unsent column is NULL
    assert sink.row_count() == 11  # k=3 was an update, k=99 the insert


def test_type_conflict_refuses_loudly(spark, tmp_path):
    sink, _table = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="no safe widening"):
        sink.upsert_batch(
            spark.createDataFrame([Row(k=1, v=5)], "k bigint, v bigint"),
            batch_id=1,
        )


def test_evolution_into_fresh_bucket_pads_and_never_narrows(spark, tmp_path):
    """A narrow batch whose keys land ONLY in empty buckets: the staged
    files are padded with typed NULLs so the committed schema never
    narrows below the recorded union."""
    table = str(tmp_path / "padtab")
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=8)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=1, v="a", extra=1)], "k bigint, v string, extra bigint"
        ),
        batch_id=0,
    )
    occupied = {int(b) for b in sink._load_manifest()["buckets"]}
    fresh_key = next(
        r["k"]
        for r in spark.range(2, 2000)
        .select(F.col("id").alias("k"))
        .withColumn("b", F.pmod(F.hash("k"), F.lit(8)))
        .collect()
        if r["b"] not in occupied
    )
    sink.upsert_batch(
        spark.createDataFrame([Row(k=fresh_key, v="f")], "k bigint, v string"),
        batch_id=1,
    )
    df = sink.read()
    assert df.columns == ["k", "v", "extra"]
    got = {r["k"]: (r["v"], r["extra"]) for r in df.collect()}
    assert got[fresh_key] == ("f", None) and got[1] == ("a", 1)


def test_evolved_table_delete_compact_and_facade_read(spark, tmp_path):
    sink, table = _mk(spark, tmp_path)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=50, v="w", extra=3)], "k bigint, v string, extra bigint"
        ),
        batch_id=1,
    )
    assert sink.delete_keys(spark.createDataFrame([(0,)], "k bigint")) == 1
    sink.compact(max_files_per_bucket=1)
    row = motorway_spark.sql(
        "SELECT COUNT(*) AS n, SUM(extra) AS se FROM t",
        "/root/testdata/sf0.001",
        spark,
        tables={"t": table},
    ).collect()[0]
    assert (row["n"], row["se"]) == (10, 3)


def test_delete_where_pins_manifest_schema(spark, tmp_path):
    """delete_where on an evolved table must read through the manifest-
    pinned schema: footer inference samples ONE file, so when the
    first-listed bucket holds only pre-evolution (narrow) files the
    rewrite would silently drop the evolved column's values from every
    rewritten bucket and commit the narrowed schema back into the
    manifest. Layout is pinned so bucket 0 (first in path order) is
    narrow-only and the rewritten bucket 3 holds the evolved file:
    pmod(hash(bigint k), 4) puts k=2,4,5,8 in bucket 0 and k=3,7 in
    bucket 3."""
    table = str(tmp_path / "dwevol")
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=k, v=f"v{k}") for k in (2, 4, 5, 8, 3, 7)],
            "k bigint, v string",
        ),
        batch_id=0,
    )
    sink.upsert_batch(  # evolve: bucket 3 only (k=7)
        spark.createDataFrame(
            [Row(k=7, v="b7", extra=4)], "k bigint, v string, extra bigint"
        ),
        batch_id=1,
    )
    assert sink.delete_where(F.col("k") == 3) == 1  # rewrites bucket 3
    df = sink.read()
    assert df.columns == ["k", "v", "extra"]  # schema NOT narrowed
    got = {r["k"]: (r["v"], r["extra"]) for r in df.collect()}
    assert got[7] == ("b7", 4)  # evolved value survives the rewrite
    assert got[2] == ("v2", None)
    assert sink.row_count() == 5
    # the committed manifest schema still carries the evolved column
    import json as _json

    from pyspark.sql.types import StructType

    rec = sink._load_manifest()
    names = [f.name for f in StructType.fromJson(_json.loads(rec["schema"]))]
    assert "extra" in names


def test_value_column_widens_safely(spark, tmp_path):
    """int -> bigint on a VALUE column resolves to the wider type
    (exact), the recorded schema widens, and older int files re-read
    under the widened manifest schema via parquet type promotion."""
    table = str(tmp_path / "widen")
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    sink.upsert_batch(
        spark.createDataFrame([Row(k="a", ts=1)], "k string, ts int"),
        batch_id=0,
    )
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k="a", ts=2**40), Row(k="b", ts=5)], "k string, ts bigint"
        ),
        batch_id=1,
    )
    got = {r["k"]: r["ts"] for r in sink.read().collect()}
    assert got == {"a": 2**40, "b": 5}
    assert dict(sink.read().dtypes)["ts"] == "bigint"
    # and the narrow direction afterwards: an int batch into the now-
    # bigint table is cast up, values exact
    sink.upsert_batch(
        spark.createDataFrame([Row(k="c", ts=7)], "k string, ts int"),
        batch_id=2,
    )
    got = {r["k"]: r["ts"] for r in sink.read().collect()}
    assert got["c"] == 7 and dict(sink.read().dtypes)["ts"] == "bigint"


def test_key_type_narrower_batch_casts_wider_refuses(spark, tmp_path):
    """A batch KEY narrower than the table's casts up BEFORE bucketing
    (hash() is type-sensitive); a WIDER batch key refuses loudly."""
    table = str(tmp_path / "keycast")
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=8)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=i, v=f"v{i}") for i in range(10)], "k bigint, v string"
        ),
        batch_id=0,
    )
    # int batch key into the bigint table: update routes to the RIGHT
    # bucket (no duplicate row appears)
    sink.upsert_batch(
        spark.createDataFrame([Row(k=3, v="upd")], "k int, v string"),
        batch_id=1,
    )
    rows = [r for r in sink.read().collect() if r["k"] == 3]
    assert len(rows) == 1 and rows[0]["v"] == "upd"
    assert sink.row_count() == 10
    # the wide direction refuses
    itable = str(tmp_path / "ikey")
    isink = UpsertParquetSink(spark, itable, key_cols=["k"], num_buckets=4)
    isink.upsert_batch(
        spark.createDataFrame([Row(k=1, v="a")], "k int, v string"),
        batch_id=0,
    )
    with pytest.raises(ValueError, match="keys hash by type"):
        isink.upsert_batch(
            spark.createDataFrame([Row(k=2, v="b")], "k bigint, v string"),
            batch_id=1,
        )
