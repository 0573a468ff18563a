"""Multimodal column conventions: opaque binary payloads + typed
metadata, with decode/feature/frame-sample as Arrow-batched Python.

North-star extension (BASELINE.json). The engine convention for
image/audio/video at 100 TB:

- payload: a `binary` column (or a path column into object storage for
  payloads > a few MB — small blobs inline, big blobs by reference);
- metadata: typed sibling columns (modality, byte size, content hash,
  decoded dims), derived ONCE at ingest and used for pruning/routing so
  the heavy payload column is only scanned by operators that decode;
- decode / feature-extract / resize / frame-sample: `mapInPandas`
  (Arrow batches in, Arrow batches out — never per-row Python). The
  actual codec call is STUBBED here (no image/audio libs in this
  container): `_decode_stub` produces deterministic fake pixels from
  the bytes; the Spark-side plumbing — schema, batch iteration, column
  pruning, partition parallelism — is real and tested.

The fixtures have no binary table, so payloads are synthesized
deterministically from `documents.text` (UTF-8 bytes), which keeps
every query oracle-checkable where the logic is SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query


def _with_payload(docs: DataFrame) -> DataFrame:
    """documents + synthesized binary payload and typed metadata."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/fake").alias("modality"),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
    )


@query(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           'image/fake' AS modality,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash,
           1 + octet_length(encode(text)) % 1920 AS width,
           1 + octet_length(encode(text)) % 1080 AS height
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time metadata derivation: size, hash, (synthetic) decoded
    dimensions — all computed without ever shipping payload bytes to
    Python. Downstream pruning filters on these columns only."""
    docs = Catalog(spark, sf_dir).documents
    mm = _with_payload(docs)
    return mm.select(
        "doc_id",
        "modality",
        "n_bytes",
        "content_hash",
        (1 + F.col("n_bytes") % 1920).alias("width"),
        (1 + F.col("n_bytes") % 1080).alias("height"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB for the real codec (PIL/ffmpeg not in this container).
    Deterministic fake decode: 'pixel mean' = mean byte value, 'frames'
    from payload length. A real deployment swaps ONLY this function;
    the mapInPandas plumbing is unchanged."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty payload: real decoder would raise/route to DLQ")
    n = len(payload)
    return {
        "pixel_mean": sum(payload) / n,
        "n_frames": 1 + n % 100,
    }


@query("multimodal_decode_features")  # rows-only: byte-level decode isn't 1 SQL stmt
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature extraction via mapInPandas: payloads cross to
    Python in Arrow batches; each batch yields a features frame. The
    payload column is pruned away after this stage."""
    mm = _with_payload(Catalog(spark, sf_dir).documents)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, frames, ok = [], [], []
            for payload in pdf["payload"]:
                # dead-letter semantics IN-BAND: an undecodable payload
                # (the stub raises, like a real codec would) yields a
                # NULL-feature row flagged decode_ok=false instead of
                # killing the whole job — the crash-isolation contract
                # scan_csv_dead_letter already implements for scans
                try:
                    f = _decode_stub(payload)
                    means.append(round(f["pixel_mean"], 6))
                    frames.append(f["n_frames"])
                    ok.append(True)
                except NotImplementedError:
                    means.append(None)
                    frames.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pixel_mean": pd.array(means, dtype="float64"),
                    "n_frames": pd.array(frames, dtype="Int32"),
                    "decode_ok": ok,
                }
            )

    return mm.mapInPandas(
        decode_batches,
        schema="doc_id long, pixel_mean double, n_frames int, decode_ok boolean",
    ).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, UNNEST(range(0, 1 + octet_length(encode(text)) % 100, 10)) AS frame_idx
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: each payload fans out to every 10th
    frame index of its (synthetic) frame count — the explode shape of
    real video frame extraction, where the decode of each sampled frame
    would then run in mapInPandas like multimodal_decode_features."""
    mm = _with_payload(Catalog(spark, sf_dir).documents)
    n_frames = 1 + F.col("n_bytes") % 100
    return mm.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(10))
        ).alias("frame_idx"),
    )


@query(
    "multimodal_resize",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             1 + octet_length(encode(text)) % 1920 AS width,
             1 + octet_length(encode(text)) % 1080 AS height
      FROM documents)
    SELECT doc_id, width, height,
           CAST(CASE WHEN width >= height
                THEN 256 ELSE FLOOR(256.0 * width / height) END AS INT) AS out_w,
           CAST(CASE WHEN width >= height
                THEN FLOOR(256.0 * height / width) ELSE 256 END AS INT) AS out_h
    FROM meta
    WHERE width > 256 OR height > 256
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning + (stubbed) execution: the aspect-preserving
    target geometry (long edge → 256) is pure metadata math — computed
    JVM-side and oracle-checked, and the pruning predicate (only
    images larger than the target ever decode) keeps the payload
    column unscanned for the rest. The actual pixel resample belongs in
    the same mapInPandas stage as _decode_stub and is stubbed with it
    (no PIL in this container); the plumbing that matters at 100 TB —
    metadata pruning before decode, Arrow batching after — is real."""
    mm = _with_payload(Catalog(spark, sf_dir).documents)
    meta = mm.select(
        "doc_id",
        (1 + F.col("n_bytes") % 1920).alias("width"),
        (1 + F.col("n_bytes") % 1080).alias("height"),
    )
    long_edge = F.lit(256.0)
    return (
        meta.filter((F.col("width") > 256) | (F.col("height") > 256))
        .select(
            "doc_id",
            "width",
            "height",
            F.when(
                F.col("width") >= F.col("height"), F.lit(256)
            ).otherwise(
                F.floor(long_edge * F.col("width") / F.col("height")).cast("int")
            ).alias("out_w"),
            F.when(
                F.col("width") >= F.col("height"),
                F.floor(long_edge * F.col("height") / F.col("width")).cast("int"),
            ).otherwise(F.lit(256)).alias("out_h"),
        )
    )


@query(
    "multimodal_dedup_hash",
    oracle="""
    WITH mm AS (
      SELECT doc_id, md5(text) AS content_hash,
             octet_length(encode(text)) AS n_bytes, source
      FROM documents)
    SELECT content_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS keeper_doc_id,
           CAST(MIN(n_bytes) AS BIGINT) AS n_bytes,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM mm GROUP BY content_hash
    HAVING COUNT(*) > 1
    """,
)
def multimodal_dedup_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload exact dedup — the first hygiene pass of any
    image/audio corpus (byte-identical downloads of the same asset from
    different sources). Groups on the ingest-time ``content_hash``
    metadata column, so NO payload bytes move through the shuffle (the
    16-byte hash does) and no decode happens at all — the
    prune-before-decode rule applied to dedup. Reports only duplicated
    hashes, with the keeper id, payload size, and how many distinct
    sources the copies came from (cross-source dup detection)."""
    docs = Catalog(spark, sf_dir).documents
    mm = _with_payload(docs).join(
        Catalog(spark, sf_dir).documents.select("doc_id", "source"), "doc_id"
    )
    return (
        mm.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.min("n_bytes").cast("bigint").alias("n_bytes"),
            F.count_distinct("source").alias("n_sources"),
        )
        .where(F.col("n_copies") > 1)
    )
