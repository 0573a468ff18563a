"""compact() — the maintenance counterpart of the append fast path:
appends add one file per batch per touched bucket, the compactor folds
over-fragmented buckets back to one file each through the same
optimistic commit log. Covers: file-count reduction with byte-identical
content, exact key stats carried through, the append path still taken
afterwards, threshold selectivity, concurrent-writer conflict redo, and
vacuum reclaiming the replaced fragments."""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql import Row

from motorway_spark.sinks import UpsertParquetSink

from tests.test_manifest_concurrency import RacingSink, _row_df


def _df(spark, lo, hi, tag):
    return spark.createDataFrame(
        [Row(k=i, ts=i, v=f"{tag}{i}") for i in range(lo, hi)],
        "k bigint, ts bigint, v string",
    )


def _mk_fragmented(spark, tmp_path, name="ftab", batches=6, width=40):
    """A table built from `batches` disjoint ascending batches — every
    batch rides the append path, so each touched bucket holds ~one file
    per batch."""
    table = str(tmp_path / name)
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    for b in range(batches):
        sink.upsert_batch(
            _df(spark, b * width, (b + 1) * width, "v"), batch_id=b
        )
    return sink, table, batches * width


def _ops(table):
    out = []
    for name in sorted(os.listdir(f"{table}/_mlog")):
        if name.endswith(".delta.json"):
            with open(f"{table}/_mlog/{name}") as fh:
                out.append(json.load(fh)["op"])
    return out


def test_compact_folds_fragments_and_preserves_content(spark, tmp_path):
    sink, table, n = _mk_fragmented(spark, tmp_path)
    m0 = sink._load_manifest()
    assert any(len(e["files"]) > 1 for e in m0["buckets"].values())
    before = sorted(
        (r["k"], r["ts"], r["v"]) for r in sink.read().collect()
    )
    rewritten = sink.compact(max_files_per_bucket=1)
    assert rewritten == len(m0["buckets"])
    m1 = sink._load_manifest()
    assert all(len(e["files"]) == 1 for e in m1["buckets"].values())
    assert _ops(table)[-1] == "compact"
    after = sorted((r["k"], r["ts"], r["v"]) for r in sink.read().collect())
    assert after == before and sink.row_count() == n
    # exact key stats carried through byte-for-byte
    for k, ent in m1["buckets"].items():
        assert ent["klo"] == m0["buckets"][k]["klo"]
        assert ent["khi"] == m0["buckets"][k]["khi"]
    # the next disjoint batch still rides the append path
    sink.upsert_batch(_df(spark, 10_000, 10_040, "a"), batch_id=99)
    assert _ops(table)[-1] == "append"
    assert sink.row_count() == n + 40


def test_compact_threshold_selects_only_fragmented_buckets(spark, tmp_path):
    sink, table, _n = _mk_fragmented(spark, tmp_path, batches=6)
    m0 = sink._load_manifest()
    over = [k for k, e in m0["buckets"].items() if len(e["files"]) > 4]
    under = {k: e["files"] for k, e in m0["buckets"].items()
             if len(e["files"]) <= 4}
    rewritten = sink.compact(max_files_per_bucket=4)
    assert rewritten == len(over)
    m1 = sink._load_manifest()
    for k, files in under.items():  # untouched buckets keep their files
        assert m1["buckets"][k]["files"] == files
    assert all(len(e["files"]) <= 4 for e in m1["buckets"].values())
    assert sink.compact(max_files_per_bucket=4) == 0  # idempotent


def test_compact_vacuum_reclaims_replaced_fragments(spark, tmp_path):
    sink, table, n = _mk_fragmented(spark, tmp_path)
    sink.compact(max_files_per_bucket=1)
    sink.vacuum(retention_sec=0)
    m = sink._load_manifest()
    for k, ent in m["buckets"].items():
        live = f"{table}/data/bucket={k}"
        assert sorted(
            f for f in os.listdir(live) if f.endswith(".parquet")
        ) == sorted(ent["files"])
    assert sink.row_count() == n


def test_compact_conflicts_with_concurrent_writer_and_redoes(
    spark, tmp_path
):
    """A writer commits into one of the buckets between the compactor's
    snapshot and its link: the compactor conflicts, redoes from the
    fresh snapshot, and the writer's row survives compaction."""
    _sink, table, n = _mk_fragmented(spark, tmp_path)

    class RacingCompactor(RacingSink):
        def run(self):
            self.result = self.compact(max_files_per_bucket=1)

    barrier = threading.Barrier(2)
    comp = RacingCompactor(
        spark, table, key_cols=["k"], num_buckets=4, barrier=barrier
    )
    t = threading.Thread(target=comp.run)
    t.start()
    deadline = time.time() + 180
    while barrier.n_waiting < 1:  # compactor staged, pre-link
        assert time.time() < deadline, "compactor never reached the barrier"
        time.sleep(0.01)
    w = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    w.upsert_batch(_row_df(spark, 7, 999, "racer"), batch_id=50)  # wins
    barrier.wait(timeout=60)
    t.join(timeout=300)
    assert not t.is_alive()
    assert comp.stage_calls == 2  # conflict -> rewrite redone
    viewer = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    got = {r["k"]: r["v"] for r in viewer.read().collect()}
    assert got[7] == "racer"
    assert viewer.row_count() == n
    m = viewer._load_manifest()
    assert all(len(e["files"]) == 1 for e in m["buckets"].values())


def test_chaos_writers_compactor_vacuum_converge(spark, tmp_path):
    """Unsynchronized chaos: two writers pushing disjoint append-shaped
    batches, a compactor folding fragments, and a vacuum sweeping —
    all concurrently against one table. Every batch must commit exactly
    once, the final content must be the union of all upserts, and the
    manifest must list only live files. This is the whole maintenance
    surface exercised the way a production scheduler would run it."""
    table = str(tmp_path / "chaostab")
    seed = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    seed.upsert_batch(_df(spark, 0, 40, "s"), batch_id=0)
    a = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    b = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    maint = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    errs = []

    def writer(sink, bids):
        try:
            for bid in bids:
                sink.upsert_batch(
                    _df(spark, bid * 100, bid * 100 + 30, f"w{bid}"),
                    batch_id=bid,
                )
        except Exception as exc:  # noqa: BLE001
            errs.append(("writer", exc))

    def maintainer():
        try:
            for _ in range(4):
                maint.compact(max_files_per_bucket=2)
                maint.vacuum(retention_sec=3600)  # live files protected
        except Exception as exc:  # noqa: BLE001
            errs.append(("maint", exc))

    threads = [
        threading.Thread(target=writer, args=(a, [1, 3, 5])),
        threading.Thread(target=writer, args=(b, [2, 4, 6])),
        threading.Thread(target=maintainer),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not any(t.is_alive() for t in threads), "thread hung"
    assert not errs, errs
    viewer = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=4)
    got = {r["k"]: r["v"] for r in viewer.read().collect()}
    expect = {i: f"s{i}" for i in range(40)}
    for bid in range(1, 7):
        expect.update(
            {i: f"w{bid}{i}" for i in range(bid * 100, bid * 100 + 30)}
        )
    assert got == expect
    assert viewer.row_count() == len(expect)
    # every batch id committed exactly once across all records
    bids = []
    for nm in sorted(os.listdir(f"{table}/_mlog")):
        if nm.endswith(".delta.json"):
            with open(f"{table}/_mlog/{nm}") as fh:
                d = json.load(fh)
            if d.get("batch_id") is not None:
                bids.append(d["batch_id"])
    assert sorted(bids) == [0, 1, 2, 3, 4, 5, 6]
    # manifest lists only files that exist; vacuum(0) then leaves
    # exactly the listed files on disk
    viewer.vacuum(retention_sec=0)
    m = viewer._load_manifest()
    for k, ent in m["buckets"].items():
        live = f"{table}/data/bucket={k}"
        assert sorted(
            f for f in os.listdir(live) if f.endswith(".parquet")
        ) == sorted(ent["files"])
