"""Keyed upsert sink (MERGE semantics) into a REAL SQL database.

The production rung of the K4 surface: where ``UpsertParquetSink``
reproduces the reference's DatabaseInsertIntersection MERGE algebra
over bucketed parquet, this sink lands it in an actual database through
any DB-API 2.0 driver — SQLite in-process for CI, Postgres (the
reference's own docker-compose target) via psycopg2 in production.

Reference parity (/root/reference/motorway/contrib/sql_alchemy/
intersections.py:57-98): the reference upserts per batch by SELECTing
which primary keys exist, UPDATE-ing those rows and INSERT-ing the
rest — a select-update-insert that is only safe because a single
process owns the table. Here the same outcome is one atomic statement,
``INSERT ... ON CONFLICT (keys) DO UPDATE`` (SQLite ≥3.24 and Postgres
share the syntax), so concurrent writers and task retries can't race
the existence check.

Exactly-once: processed micro-batch ids live in a ledger table
(``<table>__batches``) INSIDE the same database. In driver mode the
ledger insert commits in the SAME transaction as the batch's rows, so
a replayed batch id is a no-op and a crash can never record a batch it
didn't fully land. In partition mode each partition commits its own
transaction and the driver records the ledger LAST — a crash between
partition commits replays the batch, and re-upserting identical rows
is a fixpoint (same recovery contract as UpsertParquetSink's
per-bucket swap).

Scale notes: per batch the database sees O(|batch|) upserted rows —
the table itself is never scanned. ``parallelism="partition"`` opens
one connection per Spark partition (Postgres path: concurrent
ON CONFLICT upserts are row-locked and safe); ``"driver"`` streams the
batch through ``toLocalIterator`` into a single connection (SQLite /
CI path — also the right choice when the DB caps connections). Either
way nothing is ever ``collect()``-ed into one list: memory is bounded
by ``executemany_size``.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark type -> portable SQL column type (the small lattice both
# SQLite and Postgres accept; callers with exotic types pass ddl_types)
_SQL_TYPES: list[tuple[type, str]] = [
    (T.BooleanType, "BOOLEAN"),
    (T.ByteType, "SMALLINT"),
    (T.ShortType, "SMALLINT"),
    (T.IntegerType, "INTEGER"),
    (T.LongType, "BIGINT"),
    (T.FloatType, "REAL"),
    (T.DoubleType, "DOUBLE PRECISION"),
    (T.DecimalType, "NUMERIC"),
    (T.DateType, "DATE"),
    (T.TimestampType, "TIMESTAMP"),
    (T.StringType, "TEXT"),
]


def _sql_type(dt: T.DataType) -> str:
    for spark_t, sql_t in _SQL_TYPES:
        if isinstance(dt, spark_t):
            return sql_t
    raise TypeError(
        f"no portable SQL mapping for Spark type {dt.simpleString()}; "
        "pass ddl_types={'col': 'SQLTYPE'} explicitly"
    )


class DbApiUpsertSink:
    """``foreachBatch`` MERGE into a SQL table over DB-API 2.0.

    ``connection_factory`` must be a PICKLABLE zero-arg callable
    returning a DB-API connection (module-level function or
    ``functools.partial`` — executors import it in partition mode).
    ``paramstyle`` is the driver's placeholder flavor: ``"qmark"``
    (sqlite3) or ``"format"`` (psycopg2).
    """

    def __init__(
        self,
        connection_factory: Callable[[], object],
        table: str,
        key_cols: list[str],
        *,
        paramstyle: str = "qmark",
        parallelism: str = "driver",
        executemany_size: int = 500,
        create_table: bool = True,
        ddl_types: dict[str, str] | None = None,
    ):
        if paramstyle not in ("qmark", "format"):
            raise ValueError(f"unsupported paramstyle {paramstyle!r}")
        if parallelism not in ("driver", "partition"):
            raise ValueError(f"unsupported parallelism {parallelism!r}")
        self.connection_factory = connection_factory
        self.table = table
        self.key_cols = key_cols
        self.paramstyle = paramstyle
        self.parallelism = parallelism
        self.executemany_size = executemany_size
        self.create_table = create_table
        self.ddl_types = ddl_types or {}
        self._ledger = f"{table}__batches"

    # -- SQL text ---------------------------------------------------------
    def _ph(self, n: int) -> str:
        mark = "?" if self.paramstyle == "qmark" else "%s"
        return ", ".join([mark] * n)

    def _upsert_sql(self, cols: list[str]) -> str:
        value_cols = [c for c in cols if c not in self.key_cols]
        sql = (
            f"INSERT INTO {self.table} ({', '.join(cols)}) "
            f"VALUES ({self._ph(len(cols))}) "
            f"ON CONFLICT ({', '.join(self.key_cols)}) "
        )
        if value_cols:
            sets = ", ".join(f"{c} = excluded.{c}" for c in value_cols)
            sql += f"DO UPDATE SET {sets}"
        else:
            sql += "DO NOTHING"  # PK-only table: existing row is correct
        return sql

    def _ensure_tables(self, conn, schema: T.StructType) -> None:
        cols = ", ".join(
            f"{f.name} {self.ddl_types.get(f.name) or _sql_type(f.dataType)}"
            for f in schema.fields
        )
        cur = conn.cursor()
        if self.create_table:
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS {self.table} "
                f"({cols}, PRIMARY KEY ({', '.join(self.key_cols)}))"
            )
        cur.execute(
            f"CREATE TABLE IF NOT EXISTS {self._ledger} "
            "(batch_id BIGINT PRIMARY KEY)"
        )
        conn.commit()

    def _batch_done(self, conn, batch_id: int) -> bool:
        cur = conn.cursor()
        cur.execute(
            f"SELECT 1 FROM {self._ledger} WHERE batch_id = "
            + ("?" if self.paramstyle == "qmark" else "%s"),
            (batch_id,),
        )
        return cur.fetchone() is not None

    def _record_batch(self, conn, batch_id: int) -> None:
        conn.cursor().execute(
            f"INSERT INTO {self._ledger} (batch_id) VALUES "
            + ("(?)" if self.paramstyle == "qmark" else "(%s)")
            + " ON CONFLICT (batch_id) DO NOTHING",
            (batch_id,),
        )

    # -- the sink ---------------------------------------------------------
    def _dedup_batch(self, batch_df: DataFrame) -> DataFrame:
        """Deterministic within-batch conflict resolution — the same
        highest-sorting-row rule as UpsertParquetSink, so a replayed
        batch merges to the identical table."""
        value_cols = [c for c in batch_df.columns if c not in self.key_cols]
        if not value_cols:
            return batch_df.dropDuplicates(self.key_cols)
        w = Window.partitionBy(*self.key_cols).orderBy(
            *[F.desc(c) for c in value_cols]
        )
        return (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def upsert_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        conn = self.connection_factory()
        done = False
        ok = False
        try:
            self._ensure_tables(conn, batch_df.schema)
            done = self._batch_done(conn, batch_id)
            ok = True
        finally:
            # keep conn open ONLY on the successful driver-mode
            # not-done path (it carries the single data+ledger
            # transaction below); close on every other exit —
            # including exceptions, else repeated failing batches
            # accumulate open connections (SQLite file locks /
            # Postgres connection slots)
            if not ok or done or self.parallelism == "partition":
                conn.close()
        if done:
            # replayed micro-batch: no-op for the table, but the batch
            # must still be consumed (Spark 4 validates that foreachBatch
            # scans every partition of an upstream stateful agg — state
            # commits happen during the scan)
            batch_df.foreach(lambda _row: None)
            return

        batch = self._dedup_batch(batch_df)
        cols = list(batch.columns)
        sql = self._upsert_sql(cols)
        chunk = self.executemany_size

        if self.parallelism == "partition":
            factory = self.connection_factory

            def write_partition(rows: Iterable) -> None:
                pconn = factory()
                try:
                    cur = pconn.cursor()
                    buf: list[tuple] = []
                    for row in rows:
                        buf.append(tuple(row[c] for c in cols))
                        if len(buf) >= chunk:
                            cur.executemany(sql, buf)
                            buf = []
                    if buf:
                        cur.executemany(sql, buf)
                    pconn.commit()
                finally:
                    pconn.close()

            batch.foreachPartition(write_partition)
            # ledger LAST: a crash above replays the batch; identical
            # upserts are a fixpoint, so recovery is idempotent
            conn = self.connection_factory()
            try:
                self._record_batch(conn, batch_id)
                conn.commit()
            finally:
                conn.close()
        else:
            # driver mode: rows stream through toLocalIterator (bounded
            # by chunk, never a full collect); data + ledger commit in
            # ONE transaction — atomic exactly-once
            try:
                cur = conn.cursor()
                buf = []
                for row in batch.toLocalIterator():
                    buf.append(tuple(row[c] for c in cols))
                    if len(buf) >= chunk:
                        cur.executemany(sql, buf)
                        buf = []
                if buf:
                    cur.executemany(sql, buf)
                self._record_batch(conn, batch_id)
                conn.commit()
            except Exception:
                conn.rollback()
                raise
            finally:
                conn.close()

    def foreach_batch(self):
        """The callable to hand to ``writeStream.foreachBatch``."""
        return self.upsert_batch
