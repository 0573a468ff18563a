"""Append fast path for UpsertParquetSink: when footer stats prove the
batch's key range is disjoint from every touched bucket (monotone-id
ingest — new vectors, new events), upsert_batch appends one additive
file per bucket and UNIONs the manifest entries instead of the
read-old/join/rewrite MERGE. Steady-state ingest cost becomes
O(|batch|), independent of how big the touched buckets already are."""

from __future__ import annotations

import json
import os

from pyspark.sql import Row

from motorway_spark.sinks import UpsertParquetSink


def _mk(spark, tmp_path, n=40, buckets=8):
    table = str(tmp_path / "atab")
    sink = UpsertParquetSink(spark, table, key_cols=["k"], num_buckets=buckets)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=i, ts=i * 10, v=f"v{i}") for i in range(n)],
            "k bigint, ts bigint, v string",
        ),
        batch_id=0,
    )
    return sink, table


def _ops(table):
    out = []
    for name in sorted(os.listdir(f"{table}/_mlog")):
        if name.endswith(".delta.json"):
            with open(f"{table}/_mlog/{name}") as fh:
                out.append(json.load(fh)["op"])
    return out


def _df(spark, lo, hi, tag):
    return spark.createDataFrame(
        [Row(k=i, ts=i, v=f"{tag}{i}") for i in range(lo, hi)],
        "k bigint, ts bigint, v string",
    )


def test_disjoint_batch_appends_without_rewriting(spark, tmp_path):
    sink, table = _mk(spark, tmp_path)
    m0 = sink._load_manifest()

    def fingerprint():
        out = {}
        for k, ent in sink._load_manifest()["buckets"].items():
            for f in ent["files"]:
                p = f"{table}/data/bucket={k}/{f}"
                out[f"{k}/{f}"] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    before = fingerprint()
    # keys 100..119: provably above every bucket's max (39)
    sink.upsert_batch(_df(spark, 100, 120, "a"), batch_id=1)
    assert _ops(table)[-1] == "append"
    # every pre-existing file untouched on disk (no rewrite)
    after = fingerprint()
    assert all(after[f] == before[f] for f in before)
    # content + metadata exact
    got = {r["k"]: r["v"] for r in sink.read().collect()}
    assert len(got) == 60 and got[100] == "a100" and got[5] == "v5"
    assert sink.row_count() == 60
    # merged stats: per-bucket min stays old, max covers the new keys
    m1 = sink._load_manifest()
    for k, ent in m1["buckets"].items():
        old = m0["buckets"].get(k)
        if old:
            assert ent["min"]["k"] == old["min"]["k"]
            assert ent["max"]["k"] >= old["max"]["k"]


def test_overlapping_batch_falls_back_to_merge(spark, tmp_path):
    sink, table = _mk(spark, tmp_path)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=5, ts=999, v="upd"), Row(k=200, ts=1, v="new")],
            "k bigint, ts bigint, v string",
        ),
        batch_id=1,
    )
    assert _ops(table)[-1] == "merge"  # key 5 overlaps its bucket range
    got = {r["k"]: r["v"] for r in sink.read().collect()}
    assert got[5] == "upd" and got[200] == "new"
    assert sink.row_count() == 41


def test_null_key_batch_falls_back(spark, tmp_path):
    sink, table = _mk(spark, tmp_path)
    sink.upsert_batch(
        spark.createDataFrame(
            [Row(k=None, ts=1, v="n"), Row(k=500, ts=1, v="x")],
            "k bigint, ts bigint, v string",
        ),
        batch_id=1,
    )
    assert _ops(table)[-1] == "merge"  # NULL key: disjointness unprovable
    assert sink.row_count() == 42


def test_append_path_table_equals_merge_path_table(spark, tmp_path):
    """Same batches through a table whose stats allow appends and one
    whose bucket layout forces merges (interleaved key order) must
    read back identically — the fast path is an optimization, never a
    semantics change."""
    ta, tb = str(tmp_path / "fast"), str(tmp_path / "slow")
    a = UpsertParquetSink(spark, ta, key_cols=["k"], num_buckets=4)
    b = UpsertParquetSink(spark, tb, key_cols=["k"], num_buckets=4)
    # a: ascending ranges (append-eligible); b: same rows, one batch
    # arriving in overlapping order (forces merges)
    a.upsert_batch(_df(spark, 0, 30, "x"), batch_id=0)
    a.upsert_batch(_df(spark, 30, 60, "x"), batch_id=1)
    b.upsert_batch(_df(spark, 0, 60, "x").filter("k % 2 = 0"), batch_id=0)
    b.upsert_batch(_df(spark, 0, 60, "x").filter("k % 2 = 1"), batch_id=1)
    assert "append" in _ops(ta)
    rows_a = sorted((r["k"], r["ts"], r["v"]) for r in a.read().collect())
    rows_b = sorted((r["k"], r["ts"], r["v"]) for r in b.read().collect())
    assert rows_a == rows_b
    assert a.row_count() == b.row_count() == 60


def test_appended_batch_replay_noops(spark, tmp_path):
    sink, table = _mk(spark, tmp_path)
    sink.upsert_batch(_df(spark, 100, 110, "a"), batch_id=7)
    n_files = sum(
        len(e["files"]) for e in sink._load_manifest()["buckets"].values()
    )
    sink.upsert_batch(_df(spark, 100, 110, "a"), batch_id=7)  # replay
    assert sink.row_count() == 50
    assert (
        sum(len(e["files"]) for e in sink._load_manifest()["buckets"].values())
        == n_files
    )


def test_delete_after_append_prunes_correctly(spark, tmp_path):
    sink, table = _mk(spark, tmp_path)
    sink.upsert_batch(_df(spark, 100, 120, "a"), batch_id=1)
    doomed = spark.createDataFrame([(100,), (5,)], "k bigint")
    assert sink.delete_keys(doomed) == 2
    assert sink.row_count() == 58
    got = {r["k"] for r in sink.read().collect()}
    assert 100 not in got and 5 not in got and 101 in got
