"""Degenerate-input crash safety: NULL values, empty text, NULL vectors.

The oracle gate proves correctness on well-formed fixtures; production
data carries NULLs, empty documents, and missing embeddings. Every
operator must at minimum EXECUTE on such data (abstain/skip semantics
are each operator's documented choice). This file regression-pins the
13 operators the round-5 degenerate-input smoke found crashing:
three classes — Spark's sequence(1,0) yielding [1,0] in the shingle
builders, np.array(...) on NULL embedding rows in the vector kernels,
and ANSI DIVIDE_BY_ZERO on empty text — all fixed with oracle parity.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from motorway_spark.queries import QUERIES

from tests.conftest import SF_SMOKE

FORMER_CRASHERS = [
    "dedup_ngram_jaccard",        # shingle slice on short/empty text
    "dedup_containment",
    "decontam_ngram_overlap",
    "dedup_semantic_semdedup",    # NULL embedding into numpy kernel
    "sim_ann_lsh",
    "sim_knn_matmul",
    "sim_ann_ivf_fixed",
    "sim_ann_ivf",                # NULL vector into MLlib fit
    "pipeline_corpus_curation",
    "text_quality",               # empty text -> length 0 division
    "pipeline_training_prep",
    "pipeline_pretraining_mix",
    "multimodal_decode_features", # empty payload -> dead-letter flag
]


@pytest.fixture(scope="module")
def null_sf(spark, tmp_path_factory):
    """sf0.001 with NULL/empty injected into non-key columns: every ~41st
    event value NULL, every ~47th document empty, every ~59th lang NULL,
    every ~61st non-codebook embedding NULL."""
    d = tmp_path_factory.mktemp("nullfix")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ev.withColumn(
        "value", F.when(F.col("event_id") % 41 == 0, None).otherwise(F.col("value"))
    ).withColumn(
        "props", F.when(F.col("event_id") % 53 == 0, None).otherwise(F.col("props"))
    ).write.parquet(str(d / "events.parquet"))
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 47 == 0, F.lit(""))
        .when(F.col("doc_id") % 83 == 1, None)  # NULL text: the chunker trap
        .otherwise(F.col("text")),
    ).withColumn(
        "lang", F.when(F.col("doc_id") % 59 == 0, None).otherwise(F.col("lang"))
    ).write.parquet(str(d / "documents.parquet"))
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    emb.withColumn(
        "embedding",
        F.when(
            (F.col("vec_id") % 61 == 0)
            & ~F.col("vec_id").between(100, 107)
            & (F.col("vec_id") >= 20),
            None,
        ).otherwise(F.col("embedding")),
    ).write.parquet(str(d / "embeddings.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        spark.read.parquet(f"{SF_SMOKE}/{t}.parquet").write.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", FORMER_CRASHERS)
def test_former_crashers_execute_on_degenerate_data(spark, null_sf, name):
    rows = QUERIES[name](spark, null_sf).collect()
    assert rows is not None
    spark.catalog.clearCache()


def test_decode_features_dead_letters_empty_payloads(spark, null_sf):
    """Empty payloads must land as decode_ok=false NULL-feature rows —
    the in-band dead-letter route — never kill the job."""
    out = {r["doc_id"]: r for r in QUERIES["multimodal_decode_features"](spark, null_sf).collect()}
    bad = [r for r in out.values() if not r["decode_ok"]]
    assert bad and all(r["pixel_mean"] is None and r["n_frames"] is None for r in bad)
    good = [r for r in out.values() if r["decode_ok"]]
    assert good and all(r["pixel_mean"] is not None for r in good)


def test_shingles_empty_and_short_text_cross_engine():
    """_word_shingles/_char_shingles on sub-k inputs must yield [] —
    matching DuckDB's range(1,1)=[] — not crash or phantom-shingle
    (Spark's sequence(1,0) is [1,0], the round-5 trap)."""
    from motorway_spark.session import get_session
    from motorway_spark.queries.dedup import _char_shingles, _word_shingles

    spark = get_session("shingle-edge", cpus=2, shuffle_partitions=2)
    df = spark.createDataFrame(
        [("",), ("ab",), ("one two",), ("one two three four",)], "text string"
    )
    rows = df.select(
        _word_shingles(F.col("text")).alias("w"),
        _char_shingles(F.col("text")).alias("c"),
    ).collect()
    assert rows[0]["w"] == [] and rows[0]["c"] == []          # empty
    assert rows[1]["w"] == [] and rows[1]["c"] == []          # sub-k both
    assert rows[2]["w"] == [] and rows[2]["c"] != []          # 2 words
    assert rows[3]["w"] == ["one two three", "two three four"]


NULL_PARITY = [
    # queries whose NULL-input semantics diverged between engines until
    # round 5 aligned them (json_valid(NULL)=NULL, array_to_string([])
    # = NULL vs '', NaN poisoning the stateful micro-sum)
    "fn_json",
    "fn_regex_extract_all",
    "stream_stateful_user_totals",
    # round-6 operators with NULL-exposed inputs, parity-verified on
    # the null fixture at introduction and pinned here: the radius
    # search's valid-vector abstain and the FD audit's NULL-lang
    # grouping/COUNT-DISTINCT semantics
    "sim_range_search",
    "dq_functional_dependency",
    # round-6 batch-3 operators: NULL/empty text must drop out of the
    # bigram LM, the span shingler, and the streaming band state with
    # the SAME WHERE on both engines (parity-verified at introduction)
    "text_surprisal_lm",
    "dedup_exact_substring_spans",
    "stream_dedup_minhash",
    # round-6 batch-4: NULL text makes size(tokens) = -1 and
    # sequence(0,-1) step-infer to [0,-1] — two phantom chunks per NULL
    # doc that DuckDB's unnest(NULL) never emits; both chunkers filter
    # NULL text explicitly and must stay oracle-exact on it
    "dedup_chunk_global",
    "text_boilerplate_chunks",
    "pipeline_dedup_funnel",
    # round-6 batch-5: BM25's dl/avgdl statistics must see the same
    # document set on both engines when text is NULL (explode/unnest
    # drop) or empty ([''] counts one token on both)
    "text_bm25_topk",
    # round-6 batch-6: the streaming ingest gate coalesces NULL text to
    # '' on both engines (gate fails, fingerprint = md5('')) — NULL and
    # empty docs must produce identical verdict rows
    "stream_corpus_ingest",
    # the posting fingerprints must agree when NULL/empty text shrinks
    # the token stream (NULL drops, '' contributes one [''] token)
    "text_inverted_index",
    # round-6 batch-9: both coalesce NULL text (bucket 0 / md5('')) so
    # NULL and empty docs land identically on both engines
    "dq_split_drift_chi2",
    "dedup_cross_source_matrix",
    # round-7 operators with NULL-exposed inputs: EWMA and TWAP filter
    # NULL measurements up front (identical frames both engines, the
    # win_moving_median lesson); the kmeans pair abstains on NULL
    # vectors via the shared valid-vector predicate; the equi-depth
    # histogram and Benford filter their NULL measures explicitly
    "win_ewma_finite",
    "events_twap_daily",
    "cluster_kmeans_lloyd",
    "sim_ann_ivf_lloyd",
    "agg_histogram_equidepth",
    "dq_benford_first_digit",
    "events_forecast_seasonal_naive",
    # round-8 operators: both grid sketches filter NULL measures with
    # the same WHERE before bucketing (a NULL price/value never lands
    # in a grid bucket on either engine)
    "agg_percentile_grid_sketch",
    "stream_percentile_grid",
    # PQ abstains on NULL/ragged vectors via the shared valid-vector
    # predicate (encode kernel + both oracle CTEs filter identically)
    "sim_ann_pq_adc",
    "sim_ann_pq_lloyd",
    # round-9: the convergence loop runs over the same valid-vector
    # corpus; NULL vectors never reach an assignment pass
    "cluster_kmeans_converged",
    # round-9: the streaming ingest filters each micro-batch with the
    # same valid-vector predicate before encoding; the fusion's
    # branches abstain identically so fused ranks agree
    "stream_ann_ingest",
    "sim_rank_fusion_rrf",
    # round-9: the reservoir tags doc_id (never NULL in the fixture
    # contract) and the drift monitor filters NULL vectors AND NULL
    # labels up front, both engines identically
    "stream_sample_reservoir",
    "dq_embedding_drift",
    "sim_ann_ivfpq",
    # attribution: NULL purchase values still count as conversions
    # (COUNT(*)) and drop out of both decimal revenue sums; explicit
    # NULLS LAST keeps the credit pick aligned with Spark's struct max
    "events_attribution_touch",
    # round-10: the residual chain runs entirely over the shared
    # valid-vector predicate (NULL vectors never reach an assignment,
    # residual, or encode pass — both engines filter identically)
    "sim_ann_ivfpq_residual",
    # round-10: the façade queries read lineitem/orders/customer whose
    # NULL injection doesn't touch their filter/agg columns — parity
    # pins that the one-string-two-engines contract holds on the
    # null fixture too
    "sql_facade_q1_pricing",
    "sql_facade_exists_semijoin",
    "sql_facade_join_agg",
    # round-11: the write-through-sink-query-back loop on the null
    # fixture — the sink's within-batch dedup, MERGE coalesce, and the
    # oracle's UNION-of-CTEs merge algebra must stay hash-identical
    # (orders is copied verbatim here, so this pins the loop's
    # determinism rather than a NULL edge; the sink's own NULL-key
    # handling is pinned in tests/test_append_fastpath_string.py)
    "sql_facade_manifest_table",
]


@pytest.mark.parametrize("name", NULL_PARITY)
def test_null_semantics_oracle_parity(spark, null_sf, name):
    """Not just crash safety: these queries must stay ORACLE-EXACT on
    NULL-injected data (the full null-fixture sweep is 195/195; this
    pins the three that ever diverged)."""
    from motorway_spark.oracle import _duckdb_con, compare_frames
    from motorway_spark.queries import ORACLES

    con = _duckdb_con(null_sf)
    try:
        spark_pdf = QUERIES[name](spark, null_sf).toPandas()
        problems = compare_frames(spark_pdf, con.sql(ORACLES[name]).df())
        assert not problems, problems[:3]
    finally:
        con.close()
        spark.catalog.clearCache()
