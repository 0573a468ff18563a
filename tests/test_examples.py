"""The examples/ directory is the user-facing API documentation (the
reference ships runnable examples/ the same way) — each must keep
running against the engine as shipped."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_wordcount_pipeline_example(spark):
    from examples.wordcount_pipeline import build

    pipe = build(spark, n_sentences=20)
    results: list = []
    pipe.add_sink("word_count", lambda df: results.extend(df.collect()))
    pipe.run(plan_guard={})
    assert results and all(r["count"] >= 1 for r in results)
    # the topology really split sentences: more words than sentences
    assert sum(r["count"] for r in results) > 20


def test_kafka_pipeline_example(spark, tmp_path):
    from examples.kafka_pipeline import consume_and_count, produce

    from motorway_spark.sources import register_sources

    register_sources(spark)
    topic = str(tmp_path / "topic")
    produce(topic, ["a b a", "b a"])
    got = {r["word"]: r["count"] for r in consume_and_count(spark, topic).collect()}
    assert got == {"a": 3, "b": 2}


def test_training_data_prep_example_queries_run(spark):
    """The example chains registry operators; pin that the exact set it
    names stays registered and runnable at the smoke SF."""
    from motorway_spark.queries import QUERIES

    for name in (
        "dedup_exact",
        "dedup_url_canonical",
        "decontam_ngram_overlap",
        "dedup_chunk_global",
        "dedup_semantic_semdedup",
        "embedding_quality_stats",
        "pipeline_pretraining_mix",
        "pipeline_corpus_curation",
        "sample_importance_weighted",
    ):
        assert QUERIES[name](spark, SF_SMOKE).count() >= 0


def test_sqs_pipeline_example(spark):
    """Queue -> stream -> upsert-table round trip over real boto3
    against an in-process moto server (the AWS example twin of the
    kafka round trip)."""
    import pytest

    pytest.importorskip("boto3")
    pytest.importorskip("moto")
    import tempfile
    import uuid

    from examples.sqs_pipeline import _client, _endpoint, consume_to_table, produce

    endpoint, stop = _endpoint()
    try:
        cli = _client(endpoint)
        q = cli.create_queue(QueueName=f"ex{uuid.uuid4().hex[:8]}")["QueueUrl"]
        produce(
            endpoint,
            q,
            [{"Id": f"m-{i}", "sensor": f"s{i % 3}", "v": float(i)} for i in range(30)],
        )
        table = consume_to_table(
            spark, endpoint, q, tempfile.mkdtemp(prefix="sqs_table_")
        )
        got = {r["sensor"]: (r["n"], r["total"]) for r in table.collect()}
        assert got == {
            "s0": (10, sum(float(i) for i in range(0, 30, 3))),
            "s1": (10, sum(float(i) for i in range(1, 30, 3))),
            "s2": (10, sum(float(i) for i in range(2, 30, 3))),
        }
    finally:
        stop()


def test_database_pipeline_example(spark, tmp_path):
    """The reference's database example shape (examples/database.py:
    WordRamp -> count -> SQL upsert by primary key) lands real rows
    in SQLite with MERGE semantics."""
    import sqlite3

    from examples.database_pipeline import count_words_into_db

    db = str(tmp_path / "wc.db")
    count_words_into_db(spark, db, n_sentences=20)
    with sqlite3.connect(db) as conn:
        rows = dict(conn.execute("SELECT word, count FROM word_counts"))
    assert rows  # every distinct word exactly once, counts positive
    assert all(c >= 1 for c in rows.values())
    assert len(rows) == len(set(rows))
