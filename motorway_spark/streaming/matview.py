"""Incrementally-maintained materialized views over a changefeed.

``group_aggregate_view`` returns a ``foreachBatch`` function that
maintains per-group COUNT + SUM aggregates in an ``UpsertParquetSink``
table by consuming change rows (``_change_type`` + data columns) from
``UpsertParquetSink.read_stream()`` — the Delta-Live-Tables-shaped
composition: view maintenance cost follows the CHANGE volume, and the
base table is never rescanned after bootstrap.

The algebra is the standard signed-delta form: ``insert`` /
``update_postimage`` rows contribute ``(+1, +value)`` to their group,
``delete`` / ``update_preimage`` rows ``(-1, -value)`` — an update that
moves a row between groups debits the old group and credits the new one
within the same batch. Each micro-batch:

1. reduces its change rows to per-group deltas (a groupBy over
   O(changes), not O(table));
2. reads ONLY the touched groups' current values (left-semi prune into
   the view table's keyed read);
3. MERGEs the summed values back through ``upsert_batch`` (batch-id
   idempotent → exactly-once under Spark's checkpoint replay) and
   ``delete_keys``-es groups whose count reached zero.

Sums accumulate as ``DECIMAL(38,6)`` — decimal addition is exact and
order-free, so the incrementally-maintained total is bit-identical to a
direct aggregate over the final base-table state (the engine's
cross-engine sum convention, applied incrementally; proven by the
``stream_changefeed_matview`` oracle).

Reference: motorway's WordCount intersection (T4,
``/root/reference/motorway/examples/intersections.py``) maintains keyed
counts over a stream; this is that contract upgraded to exactly-once
over a durable table, fed by the engine's own CDC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def group_aggregate_view(
    mv_sink,
    group_cols: list[str],
    count_col: str = "n_rows",
    sum_cols: dict[str, str] | None = None,
):
    """A ``foreachBatch`` body maintaining ``mv_sink`` (keyed by
    ``group_cols``) as COUNT(+ decimal SUMs) per group from change
    rows. ``sum_cols`` maps source column -> view column."""
    sums = dict(sum_cols or {})

    def apply_delta(batch_df: DataFrame, batch_id: int) -> None:
        # Replay guard: recomputing deltas against ALREADY-updated
        # state would misclassify groups (a count-1 group whose batch
        # decremented it once reads 0 on replay — wrongly dead), so a
        # batch the view's ledger has committed is a full no-op. The
        # batch must still be consumed (Spark 4 validates foreachBatch
        # scans every partition of an upstream stateful source).
        if batch_id in mv_sink._processed_batches():
            batch_df.foreach(lambda _row: None)
            return
        sign = (
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                1,
            )
            .otherwise(-1)
            .cast("bigint")
        )
        aggs = [F.sum(sign).alias("_dc")]
        for src, dst in sums.items():
            aggs.append(
                F.sum(F.col(src).cast(_DEC) * sign)
                .cast(_DEC)
                .alias(f"_d_{dst}")
            )
        delta = batch_df.groupBy(*group_cols).agg(*aggs)
        cur = mv_sink.read()
        if cur is not None:
            # touched groups only: the read-modify-write is O(changes)
            cur = cur.join(
                delta.select(*group_cols), group_cols, "left_semi"
            )
            merged = delta.alias("d").join(
                cur.alias("c"), group_cols, "left_outer"
            )
            out_cols = [
                *[F.col(g) for g in group_cols],
                (
                    F.coalesce(F.col(f"c.{count_col}"), F.lit(0))
                    + F.col("d._dc")
                ).alias(count_col),
            ]
            for dst in sums.values():
                out_cols.append(
                    (
                        F.coalesce(F.col(f"c.{dst}"), F.lit(0).cast(_DEC))
                        + F.col(f"d._d_{dst}")
                    )
                    .cast(_DEC)
                    .alias(dst)
                )
            merged = merged.select(*out_cols)
        else:
            merged = delta.select(
                *group_cols,
                F.col("_dc").alias(count_col),
                *[
                    F.col(f"_d_{dst}").alias(dst)
                    for dst in sums.values()
                ],
            )
        # pin before the two writes below read-and-rewrite the table
        merged = merged.localCheckpoint(eager=True)
        # dead groups FIRST, ledger-marking upsert LAST: a crash
        # between them replays into the pre-upsert state (dead already
        # gone -> its recomputed count goes negative -> delete no-ops;
        # alive values recompute identically), while the reverse order
        # would skip the delete forever once the ledger marks the batch
        dead = merged.filter(F.col(count_col) <= 0).select(*group_cols)
        if dead.count():
            mv_sink.delete_keys(dead)
        mv_sink.upsert_batch(
            merged.filter(F.col(count_col) > 0), batch_id=batch_id
        )

    return apply_delta
