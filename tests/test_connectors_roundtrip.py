"""Connector round-trips: Kafka-shaped sink, SQS-shaped send sink,
paged-API source.

Closes the reference's remaining connector rows (SURVEY.md §2a
K1/K3/S5-S7) the same way it tests them itself: mocked transport, real
delivery semantics — keyed partitioning, replay idempotence, cursor
bookmarks.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from motorway_spark.sinks import KafkaLogSink, SpoolDirSink
from motorway_spark.sources import register_sources
from motorway_spark.sources.kafka import KafkaLogReader
from motorway_spark.sources.pagedapi import PagedApiStreamReader
from motorway_spark.streaming.runner import start_and_drain


# ---------------------------------------------------------------------------
# KafkaLogSink (K1 twin of contrib/kafka/intersections.py:15-91)
# ---------------------------------------------------------------------------
def test_kafka_sink_keyed_partitioning_and_replay(spark, tmp_path):
    log_dir = str(tmp_path / "topic_out")
    sink = KafkaLogSink(spark, log_dir, num_partitions=3, key_col="k", value_col="v")

    batch = spark.createDataFrame(
        [Row(k=f"key{i % 5}", v=i) for i in range(20)]
    )
    sink.produce_batch(batch, batch_id=0)

    reader = KafkaLogReader({"path": log_dir})
    end = reader.latestOffset()
    rows = [
        r
        for p in reader.partitions({"offsets": {}}, end)
        for r in reader.read(p)
    ]
    assert len(rows) == 20
    # keyed partitioning: every copy of a key lives in ONE partition
    key_parts = {}
    for part, _off, key, _val in rows:
        key_parts.setdefault(key, set()).add(part)
    assert all(len(parts) == 1 for parts in key_parts.values())

    # replayed micro-batch (same id) produces nothing (idempotence)
    sink.produce_batch(batch, batch_id=0)
    assert sum(reader._log_end_offsets().values()) == 20
    # a NEW batch id appends
    sink.produce_batch(spark.createDataFrame([Row(k="key0", v=99)]), batch_id=1)
    assert sum(reader._log_end_offsets().values()) == 21


def test_kafka_source_to_sink_roundtrip(spark, tmp_path):
    """topic A --stream--> transform --foreachBatch--> topic B, then
    assert topic B holds the transformed records exactly once."""
    import uuid

    register_sources(spark)
    src_dir = str(tmp_path / "topic_a")
    os.makedirs(src_dir)
    with open(f"{src_dir}/partition-0.jsonl", "w") as fh:
        for i in range(12):
            fh.write(json.dumps({"key": f"u{i % 4}", "value": {"n": i}}) + "\n")

    out_dir = str(tmp_path / "topic_b")
    sink = KafkaLogSink(spark, out_dir, num_partitions=2, key_col="key", value_col="n2")

    stream = (
        spark.readStream.format("kafkalog")
        .option("path", src_dir)
        .option("getRecordsLimit", "5")  # multiple micro-batches
        .load()
    )
    doubled = stream.select(
        "key", (F.get_json_object("value", "$.n").cast("int") * 2).alias("n2")
    )
    query = start_and_drain(
        lambda: doubled.writeStream.foreachBatch(sink.foreach_batch())
        .queryName(f"rt_{uuid.uuid4().hex[:8]}")
        .start()
    )
    query.stop()

    reader = KafkaLogReader({"path": out_dir})
    end = reader.latestOffset()
    vals = sorted(
        json.loads(r[3])
        for p in reader.partitions({"offsets": {}}, end)
        for r in reader.read(p)
    )
    assert vals == sorted(i * 2 for i in range(12))


# ---------------------------------------------------------------------------
# SpoolDirSink (K3 twin: SQS send_message, idempotent by message id)
# ---------------------------------------------------------------------------
def test_spool_sink_send_and_replay(spark, tmp_path):
    spool = str(tmp_path / "queue_out")
    sink = SpoolDirSink(spool, id_col="mid", body_cols=["group", "v"])
    batch = spark.createDataFrame(
        [Row(mid=f"m{i}", group=f"g{i % 2}", v=i) for i in range(6)]
    )
    sink.send_batch(batch, batch_id=0)
    files = sorted(f for f in os.listdir(spool) if f.endswith(".json"))
    assert files == [f"m{i}.json" for i in range(6)]
    # replay: same ids overwrite byte-identically, no duplicates
    sink.send_batch(batch, batch_id=0)
    assert sorted(f for f in os.listdir(spool) if f.endswith(".json")) == files
    with open(os.path.join(spool, "m3.json")) as fh:
        assert json.load(fh) == {"id": "m3", "body": {"group": "g1", "v": 3}}


def test_spool_sink_feeds_spool_source(spark, tmp_path):
    """Full queue loop: send via sink, consume via the spooldir source."""
    import uuid

    register_sources(spark)
    spool = str(tmp_path / "queue_loop")
    sink = SpoolDirSink(spool, id_col="mid", body_cols=["group", "v"])
    sink.send_batch(
        spark.createDataFrame([Row(mid=f"m{i}", group="g0", v=i) for i in range(4)]),
        batch_id=0,
    )
    df = spark.readStream.format("spooldir").option("path", spool).load()
    query = start_and_drain(
        lambda: df.writeStream.format("memory")
        .queryName(f"ql_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    name = query.name
    query.stop()
    out = spark.table(name).collect()
    assert sorted(r["message_id"] for r in out) == [f"m{i}" for i in range(4)]


# ---------------------------------------------------------------------------
# PagedApiSource (S5-S7 twin: cursor-paginated SaaS collections)
# ---------------------------------------------------------------------------
def _write_pages(api_dir: str, n_pages: int, per_page: int, start: int = 0):
    os.makedirs(api_dir, exist_ok=True)
    for p in range(start, start + n_pages):
        nxt = f"page-{p + 1:03d}.json" if p < start + n_pages - 1 else None
        records = [
            {"id": f"rec-{p}-{i}", "amount": p * 100 + i} for i in range(per_page)
        ]
        with open(f"{api_dir}/page-{p:03d}.json", "w") as fh:
            json.dump({"records": records, "next": nxt}, fh)


def test_pagedapi_reader_walks_cursor_chain(tmp_path):
    api_dir = str(tmp_path / "api")
    _write_pages(api_dir, n_pages=5, per_page=3)
    r = PagedApiStreamReader({"path": api_dir, "maxPagesPerTrigger": "2"})
    start = r.initialOffset()
    end1 = r.latestOffset()
    assert end1["count"] == 2  # capped at 2 pages per trigger
    parts = r.partitions(start, end1)
    rows = [row for p in parts for row in r.read(p)]
    assert len(rows) == 6
    assert rows[0][0] == "rec-0-0"  # stable record ids
    end2 = r.latestOffset()
    assert end2["count"] == 4
    end3 = r.latestOffset()
    assert end3["count"] == 5
    assert end3["cursor"] == "__done__"


def test_pagedapi_bookmark_resumes(tmp_path):
    api_dir = str(tmp_path / "api_bm")
    _write_pages(api_dir, n_pages=3, per_page=2)
    r = PagedApiStreamReader({"path": api_dir, "maxPagesPerTrigger": "2"})
    end = r.latestOffset()
    r.commit(end)
    # restart: a FRESH reader resumes from the committed bookmark,
    # not from page zero (stronger than the reference's re-list loop)
    r2 = PagedApiStreamReader({"path": api_dir, "maxPagesPerTrigger": "2"})
    assert r2.initialOffset()["count"] == 2
    end2 = r2.latestOffset()
    pages = r2.partitions(end, end2)
    rows = [row for p in pages for row in r2.read(p)]
    assert [row[0] for row in rows] == ["rec-2-0", "rec-2-1"]


def test_pagedapi_streaming_end_to_end(spark, tmp_path):
    import uuid

    register_sources(spark)
    api_dir = str(tmp_path / "api_e2e")
    _write_pages(api_dir, n_pages=4, per_page=5)
    stream = (
        spark.readStream.format("pagedapi")
        .option("path", api_dir)
        .option("maxPagesPerTrigger", "1")  # one page per micro-batch
        .load()
    )
    query = start_and_drain(
        lambda: stream.writeStream.format("memory")
        .queryName(f"api_{uuid.uuid4().hex[:8]}")
        .outputMode("append")
        .start()
    )
    name = query.name
    query.stop()
    out = spark.table(name)
    assert out.count() == 20
    assert out.select("record_id").distinct().count() == 20  # exactly once
    amounts = {
        json.loads(r["payload"])["amount"] for r in out.collect()
    }
    assert amounts == {p * 100 + i for p in range(4) for i in range(5)}


def test_spool_sink_external_id_upsert(spark, tmp_path):
    """K5 twin semantics (salesforce/intersections.py:13-41): sending a
    record with an existing external id REPLACES the stored object
    (upsert-by-external-id), independent of batch replay handling."""
    spool = str(tmp_path / "sobjects")
    sink = SpoolDirSink(spool, id_col="ext_id", body_cols=["amount", "stage"])
    sink.send_batch(
        spark.createDataFrame([Row(ext_id="opp-1", amount=100, stage="new")]),
        batch_id=0,
    )
    # later batch updates the same external id with new field values
    sink.send_batch(
        spark.createDataFrame([Row(ext_id="opp-1", amount=250, stage="won")]),
        batch_id=1,
    )
    files = [f for f in os.listdir(spool) if f.endswith(".json")]
    assert files == ["opp-1.json"]  # one object per external id
    with open(os.path.join(spool, "opp-1.json")) as fh:
        assert json.load(fh)["body"] == {"amount": 250, "stage": "won"}


# ---------------------------------------------------------------------------
# SpoolStreamWriter: first-class streaming writer on the Python Data
# Source API (the writeStream.format("spooldir") half of the contract).
# ---------------------------------------------------------------------------
def test_spool_stream_writer_end_to_end(spark, tmp_path):
    """spooldir source -> transform -> writeStream.format("spooldir"):
    every record lands exactly once under its own id-named file."""
    register_sources(spark)
    src = str(tmp_path / "in_q")
    os.makedirs(src)
    for i in range(8):
        with open(f"{src}/m{i:03d}.json", "w") as fh:
            json.dump({"id": f"m{i}", "body": {"n": i, "group": f"g{i % 2}"}}, fh)
    out = str(tmp_path / "out_q")
    os.makedirs(out)

    stream = (
        spark.readStream.format("spooldir")
        .option("path", src)
        .option("deleteOnCommit", "false")
        .load()
        .withColumn("doubled", F.get_json_object("body", "$.n").cast("int") * 2)
        .select("message_id", "doubled")
    )
    query = start_and_drain(
        lambda: stream.writeStream.format("spooldir")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    query.stop()

    files = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert files == [f"m{i}.json" for i in range(8)]
    with open(os.path.join(out, "m3.json")) as fh:
        assert json.load(fh) == {"id": "m3", "body": {"doubled": 6}}
    # no staged leftovers after a clean commit
    staging = os.path.join(out, "_staging")
    assert not os.path.exists(staging) or os.listdir(staging) == []


def test_spool_stream_writer_replay_and_abort(spark, tmp_path):
    """Unit-level two-phase semantics: a replayed batch overwrites the
    same final names (no duplicates); an aborted batch leaves nothing."""
    from pyspark.sql import Row
    from pyspark.sql.types import StructType, StructField, StringType

    from motorway_spark.sources.spool import SpoolStreamWriter

    out = str(tmp_path / "q")
    os.makedirs(out)
    schema = StructType(
        [StructField("message_id", StringType()), StructField("v", StringType())]
    )
    writer = SpoolStreamWriter({"path": out}, schema)
    rows = [Row(message_id="a", v="1"), Row(message_id="b", v="2")]

    # batch 0 committed twice (replay after a checkpoint gap)
    for _ in range(2):
        msg = writer.write(iter(rows))
        writer.commit([msg], batchId=0)
    finals = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert finals == ["a.json", "b.json"]

    # aborted batch: staged files removed, spool unchanged
    msg = writer.write(iter([Row(message_id="c", v="3")]))
    writer.abort([msg], batchId=1)
    assert sorted(f for f in os.listdir(out) if f.endswith(".json")) == finals
    assert os.listdir(os.path.join(out, "_staging")) == []


# ---------------------------------------------------------------------------
# Batch quadrants: spark.read / df.write over the same "spooldir" format —
# with these the source covers all four Python Data Source API quadrants.
# ---------------------------------------------------------------------------
def test_spool_batch_read_and_write_roundtrip(spark, tmp_path):
    """Batch write stages+commits id-named files (replay overwrites, no
    dupes); batch read drains the whole spool without offsets."""
    register_sources(spark)
    out = str(tmp_path / "batch_q")
    os.makedirs(out)

    df = spark.createDataFrame(
        [(f"m{i}", json.dumps({"n": i}), f"g{i % 2}") for i in range(10)],
        "message_id string, body string, grouping_value string",
    )
    # written twice = replay: per-id overwrite keeps exactly one file each
    for _ in range(2):
        df.write.format("spooldir").mode("append").option("path", out).save()

    files = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert files == sorted(f"m{i}.json" for i in range(10))
    staging = os.path.join(out, "_staging")
    assert not os.path.exists(staging) or os.listdir(staging) == []

    back = (
        spark.read.format("spooldir")
        .option("path", out)
        .load()
        .select("message_id")
        .collect()
    )
    assert sorted(r.message_id for r in back) == sorted(f"m{i}" for i in range(10))


# ---------------------------------------------------------------------------
# SalesforceUpsertSink: the K5 external-id contract behind the dir->HTTP
# transport seam (the sink twin of sources/transports.py).
# ---------------------------------------------------------------------------
@pytest.fixture()
def sobject_server():
    """Local REST twin of the Salesforce upsert endpoint: PATCH
    /sobjects/{obj}/{field}/{ext_id} stores the JSON body under the
    external id (create-or-replace), and counts requests."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    store: dict[str, dict] = {}
    hits: list[str] = []

    class Handler(BaseHTTPRequestHandler):
        def do_PATCH(self):
            parts = self.path.strip("/").split("/")
            assert parts[0] == "sobjects" and len(parts) == 4
            ext_id = parts[3]
            created = ext_id not in store
            n = int(self.headers.get("Content-Length", 0))
            store[ext_id] = json.loads(self.rfile.read(n) or b"{}")
            hits.append(self.path)
            self.send_response(201 if created else 204)
            self.end_headers()

        def log_message(self, *args):  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}", store, hits
    server.shutdown()


def test_salesforce_sink_external_id_contract_over_http(spark, sobject_server):
    """The SAME external-id contract test_spool_sink_external_id_upsert
    pins, run over the HTTP transport: later batch REPLACES the stored
    object; a replayed batch leaves final state unchanged (no-op)."""
    from motorway_spark.sinks.salesforce import (
        HttpUpsertTransport,
        SalesforceUpsertSink,
    )

    base_url, store, hits = sobject_server
    sink = SalesforceUpsertSink(
        HttpUpsertTransport(base_url, "Opportunity", "ext_id"),
        ext_id_col="ext_id",
    )
    sink.send_batch(
        spark.createDataFrame(
            [Row(ext_id="opp-1", amount=100, stage="new"),
             Row(ext_id="opp-2", amount=50, stage="new")]
        ),
        batch_id=0,
    )
    assert store["opp-1"] == {"amount": 100, "stage": "new"}
    # later batch updates opp-1 (create-or-REPLACE by external id)
    sink.send_batch(
        spark.createDataFrame([Row(ext_id="opp-1", amount=250, stage="won")]),
        batch_id=1,
    )
    assert store["opp-1"] == {"amount": 250, "stage": "won"}
    assert store["opp-2"] == {"amount": 50, "stage": "new"}
    # replayed batch: byte-identical PATCH -> final state unchanged
    before = dict(store)
    sink.send_batch(
        spark.createDataFrame([Row(ext_id="opp-1", amount=250, stage="won")]),
        batch_id=1,
    )
    assert store == before
    # the URL shape is the reference's SFType.upsert REST path
    assert all(h.startswith("/sobjects/Opportunity/ext_id/") for h in hits)


def test_salesforce_sink_null_field_clears_remote_value(spark, sobject_server):
    """K5 replace-if-present contract for nullable columns: the
    reference's SFType.upsert sends the full record dict NULLS
    INCLUDED, so a NULL column must appear as an explicit null in the
    PATCH body (clearing the remote field) — not be dropped from the
    JSON (which would silently preserve the stale remote value)."""
    from motorway_spark.sinks.salesforce import (
        HttpUpsertTransport,
        SalesforceUpsertSink,
    )
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    base_url, store, _hits = sobject_server
    sink = SalesforceUpsertSink(
        HttpUpsertTransport(base_url, "Opportunity", "ext_id"),
        ext_id_col="ext_id",
    )
    schema = StructType(
        [
            StructField("ext_id", StringType()),
            StructField("amount", IntegerType()),
            StructField("stage", StringType()),
        ]
    )
    sink.send_batch(
        spark.createDataFrame([("opp-n", 100, "new")], schema), batch_id=0
    )
    assert store["opp-n"] == {"amount": 100, "stage": "new"}
    # stage goes NULL: the PATCH body must carry {"stage": null}
    sink.send_batch(
        spark.createDataFrame([("opp-n", 250, None)], schema), batch_id=1
    )
    assert store["opp-n"] == {"amount": 250, "stage": None}


def test_salesforce_sink_same_contract_over_spool_transport(spark, tmp_path):
    """Transport swap is behavior-preserving: the spool transport
    passes the identical contract (one file per external id, replace
    on re-send, deterministic within-batch winner)."""
    from motorway_spark.sinks.salesforce import (
        SalesforceUpsertSink,
        SpoolUpsertTransport,
    )

    spool = str(tmp_path / "sobjects2")
    sink = SalesforceUpsertSink(
        SpoolUpsertTransport(spool), ext_id_col="ext_id"
    )
    # duplicate external id WITHIN one batch: highest-sorting row wins
    sink.send_batch(
        spark.createDataFrame(
            [Row(ext_id="opp-9", amount=1, stage="a"),
             Row(ext_id="opp-9", amount=7, stage="z")]
        ).repartition(2),
        batch_id=0,
    )
    files = sorted(f for f in os.listdir(spool) if f.endswith(".json"))
    assert files == ["opp-9.json"]
    with open(os.path.join(spool, "opp-9.json")) as fh:
        assert json.load(fh)["body"] == {"amount": 7, "stage": "z"}


# ---------------------------------------------------------------------------
# OAuthSession: the login/expiry lifecycle the reference delegates to
# simple_salesforce (contrib/salesforce/ramps.py:24-36) — token flow,
# instance discovery, 401 re-login retry, pickle-into-worker semantics.
# ---------------------------------------------------------------------------
@pytest.fixture()
def oauth_sobject_server():
    """Salesforce-shaped OAuth twin: POST /services/oauth2/token issues
    a fresh bearer token (and advertises instance_url); every PATCH
    under /services/data/v59.0/sobjects/... must carry the CURRENT
    token — stale/missing tokens get 401 (INVALID_SESSION_ID), the
    server-side expiry edge a real org produces."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    state = {
        "logins": 0,          # token POSTs served
        "current": None,      # the one valid token
        "store": {},          # ext_id -> body
        "always_401": False,  # simulate a hard auth failure
    }

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            assert self.path == "/services/oauth2/token"
            n = int(self.headers.get("Content-Length", 0))
            form = self.rfile.read(n).decode()
            assert "grant_type=password" in form
            state["logins"] += 1
            state["current"] = f"tok-{state['logins']}"
            body = json.dumps(
                {
                    "access_token": state["current"],
                    "instance_url": f"http://127.0.0.1:{server.server_address[1]}",
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_PATCH(self):
            auth = self.headers.get("Authorization", "")
            if state["always_401"] or auth != f"Bearer {state['current']}":
                self.send_response(401)
                self.end_headers()
                return
            parts = self.path.strip("/").split("/")
            # instance-rooted API path: services/data/v59.0/sobjects/...
            assert parts[:3] == ["services", "data", "v59.0"]
            assert parts[3] == "sobjects" and len(parts) == 7
            n = int(self.headers.get("Content-Length", 0))
            state["store"][parts[6]] = json.loads(self.rfile.read(n) or b"{}")
            self.send_response(204)
            self.end_headers()

        def log_message(self, *args):  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}", state
    server.shutdown()


def test_oauth_session_lazy_login_and_bearer_patch(spark, oauth_sobject_server):
    """Constructing the session does NOT log in (workers each hold a
    pickled copy; eager login would hit the org once per serialization,
    not per use); the first upsert performs exactly one token POST,
    discovers instance_url, and PATCHes under Bearer <token>."""
    from motorway_spark.sinks.salesforce import (
        HttpUpsertTransport,
        OAuthSession,
        SalesforceUpsertSink,
    )

    login_url, state = oauth_sobject_server
    session = OAuthSession(
        login_url, "cid", "csecret", "user@example.com", "pw+token"
    )
    assert state["logins"] == 0  # lazy: no login at construction
    sink = SalesforceUpsertSink(
        HttpUpsertTransport(
            object_name="Opportunity", ext_id_field="ext_id", session=session
        ),
        ext_id_col="ext_id",
    )
    sink.send_batch(
        spark.createDataFrame(
            [Row(ext_id="opp-1", amount=100), Row(ext_id="opp-2", amount=50)]
        ).coalesce(1),
        batch_id=0,
    )
    assert state["store"] == {"opp-1": {"amount": 100}, "opp-2": {"amount": 50}}
    # one partition -> the worker's session logged in exactly once
    assert state["logins"] == 1


def test_oauth_expired_token_relogin_retry_once(oauth_sobject_server):
    """Server-side expiry (the INVALID_SESSION_ID edge): a 401 on PATCH
    invalidates the cached token, re-logins, and retries ONCE; a second
    401 under the fresh token is a real auth problem and propagates."""
    import urllib.error

    from motorway_spark.sinks.salesforce import (
        HttpUpsertTransport,
        OAuthSession,
    )

    login_url, state = oauth_sobject_server
    session = OAuthSession(
        login_url, "cid", "csecret", "user@example.com", "pw+token"
    )
    t = HttpUpsertTransport(
        object_name="Opportunity", ext_id_field="ext_id", session=session
    )
    t.upsert("opp-1", {"amount": 1})
    assert state["logins"] == 1
    # org invalidates the session server-side; next call must re-login
    state["current"] = "revoked"
    t.upsert("opp-1", {"amount": 2})
    assert state["logins"] == 2
    assert state["store"]["opp-1"] == {"amount": 2}
    # hard auth failure: retry once, then the 401 surfaces (no loop)
    logins_before = state["logins"]
    state["always_401"] = True
    with pytest.raises(urllib.error.HTTPError) as exc:
        t.upsert("opp-1", {"amount": 3})
    assert exc.value.code == 401
    assert state["logins"] == logins_before + 1  # exactly one re-login


def test_oauth_session_pickle_drops_token(oauth_sobject_server):
    """Pickling (the foreachPartition ship) carries only credentials:
    the token and instance_url reset to None so every worker logs in
    itself — a driver-fetched token never leaks into executors where
    it would expire mid-job with no owner to refresh it."""
    import pickle

    from motorway_spark.sinks.salesforce import OAuthSession

    login_url, state = oauth_sobject_server
    session = OAuthSession(
        login_url, "cid", "csecret", "user@example.com", "pw+token"
    )
    session.auth_header()  # driver-side login
    assert session._token is not None
    clone = pickle.loads(pickle.dumps(session))
    assert clone._token is None and clone._instance_url is None
    # the clone logs in on first use, independently of the driver token
    assert clone.auth_header() == f"Bearer tok-{state['logins']}"
    assert clone.login_url == session.login_url
