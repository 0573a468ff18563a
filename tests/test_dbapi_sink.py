"""Contract tests for DbApiUpsertSink — the K4 MERGE semantics landed
in a REAL SQL database (in-process SQLite; the identical ON CONFLICT
statement runs on Postgres). Mirrors the reference's
DatabaseInsertIntersection select-update-insert outcome
(/root/reference/motorway/contrib/sql_alchemy/intersections.py:57-98)
and UpsertParquetSink's replay/byte-identity discipline."""

from __future__ import annotations

import functools
import sqlite3

import pytest
from pyspark.sql import Row

from motorway_spark.sinks.dbapi import DbApiUpsertSink


def _factory(path: str):
    # functools.partial over the stdlib builtin: picklable, so the same
    # factory works executor-side in partition mode
    return functools.partial(sqlite3.connect, path, timeout=30)


def _rows(path: str, table: str = "kv") -> dict:
    with sqlite3.connect(path) as conn:
        return dict(conn.execute(f"SELECT k, v FROM {table} ORDER BY k"))


def _dump(path: str) -> list:
    with sqlite3.connect(path) as conn:
        return list(conn.execute("SELECT * FROM kv ORDER BY k"))


@pytest.fixture(params=["driver", "partition"])
def sink_mode(request):
    return request.param


def test_dbapi_upsert_merge_update_and_insert(spark, tmp_path, sink_mode):
    """The reference contract: existing primary keys UPDATE, new keys
    INSERT — one batch does both."""
    db = str(tmp_path / "m.db")
    sink = DbApiUpsertSink(
        _factory(db), "kv", key_cols=["k"], parallelism=sink_mode
    )
    sink.upsert_batch(
        spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]), batch_id=0
    )
    sink.upsert_batch(
        spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")]), batch_id=1
    )
    assert _rows(db) == {1: "a", 2: "B", 3: "c"}


def test_dbapi_upsert_replay_is_byte_identical_noop(spark, tmp_path, sink_mode):
    """A replayed batch id is a no-op for the table EVEN IF its content
    differs (the WAL decides, not the data) — same contract as
    UpsertParquetSink."""
    db = str(tmp_path / "r.db")
    sink = DbApiUpsertSink(
        _factory(db), "kv", key_cols=["k"], parallelism=sink_mode
    )
    sink.upsert_batch(spark.createDataFrame([Row(k=1, v="a")]), batch_id=0)
    before = _dump(db)
    sink.upsert_batch(
        spark.createDataFrame([Row(k=1, v="DIFFERENT")]), batch_id=0
    )
    assert _dump(db) == before


def test_dbapi_upsert_within_batch_conflict_deterministic(spark, tmp_path):
    """Duplicate keys inside one batch resolve to the highest-sorting
    value row — deterministic, so a replay would merge identically."""
    db = str(tmp_path / "c.db")
    sink = DbApiUpsertSink(_factory(db), "kv", key_cols=["k"])
    df = spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=1, v="z"), Row(k=1, v="y")]
    ).repartition(3)
    sink.upsert_batch(df, batch_id=0)
    assert _rows(db) == {1: "z"}


def test_dbapi_upsert_streaming_end_to_end(spark, tmp_path):
    """Two real micro-batches through writeStream.foreachBatch land in
    SQLite with MERGE semantics across the batch boundary."""
    import shutil

    src = tmp_path / "stream_src"
    src.mkdir()
    b1 = [(1, 10), (2, 20)]
    b2 = [(2, 99), (3, 30)]  # k=2 updated across batches
    for i, rows in enumerate((b1, b2)):
        spark.createDataFrame(rows, "k int, v int").coalesce(1).write.parquet(
            str(tmp_path / f"sb{i}")
        )
        part = next((tmp_path / f"sb{i}").glob("part-*.parquet"))
        shutil.copy(part, src / f"{i:02d}.parquet")

    db = str(tmp_path / "s.db")
    sink = DbApiUpsertSink(_factory(db), "kv", key_cols=["k"])
    q = (
        spark.readStream.schema("k int, v int")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    assert _rows(db) == {1: 10, 2: 99, 3: 30}
    # both batch ids in the in-database ledger
    with sqlite3.connect(db) as conn:
        ids = [r[0] for r in conn.execute("SELECT batch_id FROM kv__batches")]
    assert sorted(ids) == [0, 1]


def test_dbapi_upsert_recovery_after_partial_partition_commit(spark, tmp_path):
    """Partition mode records the ledger LAST: data committed by a
    crashed attempt is re-upserted on replay and converges (fixpoint),
    never doubled."""
    db = str(tmp_path / "f.db")
    sink = DbApiUpsertSink(
        _factory(db), "kv", key_cols=["k"], parallelism="partition"
    )
    df = spark.createDataFrame([Row(k=i, v=str(i)) for i in range(10)])
    # simulate a crash AFTER the data landed but BEFORE the ledger row:
    # run the data path, then delete the ledger record
    sink.upsert_batch(df, batch_id=0)
    with sqlite3.connect(db) as conn:
        conn.execute("DELETE FROM kv__batches")
        conn.commit()
    sink.upsert_batch(df, batch_id=0)  # the replay
    assert _rows(db) == {i: str(i) for i in range(10)}


def test_dbapi_upsert_typed_ddl_and_pk_only_table(spark, tmp_path):
    """Schema-derived DDL covers the portable type lattice; a PK-only
    table upserts as DO NOTHING (the reference skips the UPDATE when
    the primary key is the only column, intersections.py:79)."""
    db = str(tmp_path / "t.db")
    sink = DbApiUpsertSink(_factory(db), "pk_only", key_cols=["k"])
    df = spark.createDataFrame([Row(k=1), Row(k=2)])
    sink.upsert_batch(df, batch_id=0)
    sink.upsert_batch(spark.createDataFrame([Row(k=2), Row(k=3)]), batch_id=1)
    with sqlite3.connect(db) as conn:
        assert [r[0] for r in conn.execute("SELECT k FROM pk_only ORDER BY k")] == [1, 2, 3]


def test_dbapi_conn_closed_when_batch_probe_fails(spark, tmp_path, sink_mode):
    """A failing _ensure_tables/_batch_done must CLOSE the connection:
    repeated failing batches would otherwise accumulate open
    connections (SQLite file locks / Postgres slots). Forced here by a
    pre-existing ledger table with an incompatible schema."""
    db = str(tmp_path / "leak.db")
    with sqlite3.connect(db) as conn:
        conn.execute("CREATE TABLE kv__batches (wrong_col TEXT)")
        conn.commit()
    opened: list[sqlite3.Connection] = []

    def factory():
        c = sqlite3.connect(db, timeout=30)
        opened.append(c)
        return c

    sink = DbApiUpsertSink(factory, "kv", key_cols=["k"], parallelism=sink_mode)
    for _ in range(3):  # repeated failing batches must not accumulate
        with pytest.raises(sqlite3.OperationalError):
            sink.upsert_batch(
                spark.createDataFrame([Row(k=1, v="a")]), batch_id=0
            )
    assert len(opened) == 3
    for c in opened:  # a closed sqlite connection refuses to operate
        with pytest.raises(sqlite3.ProgrammingError):
            c.execute("SELECT 1")


def test_dbapi_upsert_against_postgres_if_available(spark):
    """Opt-in live-Postgres path (docker compose up -d postgres;
    POSTGRES_DSN=... pytest). The same ON CONFLICT statements, the
    format paramstyle, partition-parallel connections."""
    import os

    dsn = os.environ.get("POSTGRES_DSN")
    if not dsn:
        pytest.skip("POSTGRES_DSN not set (opt-in live-DB path)")
    psycopg2 = pytest.importorskip("psycopg2")
    factory = functools.partial(psycopg2.connect, dsn)
    with factory() as conn:
        conn.cursor().execute("DROP TABLE IF EXISTS kv_pg, kv_pg__batches")
        conn.commit()
    sink = DbApiUpsertSink(
        factory,
        "kv_pg",
        key_cols=["k"],
        paramstyle="format",
        parallelism="partition",
    )
    sink.upsert_batch(
        spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]), batch_id=0
    )
    sink.upsert_batch(
        spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")]), batch_id=1
    )
    sink.upsert_batch(
        spark.createDataFrame([Row(k=1, v="REPLAY")]), batch_id=0
    )  # replayed id: no-op
    with factory() as conn:
        cur = conn.cursor()
        cur.execute("SELECT k, v FROM kv_pg ORDER BY k")
        got = dict(cur.fetchall())
    assert got == {1: "a", 2: "B", 3: "c"}
