"""Scan-format coverage: CSV and JSON-lines sources (SURVEY.md §2b
"Scans / sources" row).

The fixtures are parquet-only, so each query first materializes a CSV /
JSON copy under /tmp (once per scale factor, cached by marker file),
then computes its aggregate from the re-read copy with an explicit
schema. The oracle runs the same aggregate on the original parquet —
passing proves the format round-trip is value-exact (Java's
shortest-round-trip double formatting guarantees bit-exact doubles
through text).
"""

from __future__ import annotations

import csv
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query
from motorway_spark.queries.helpers import dec, sql_dsum

_SUPPLIER_SCHEMA = "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"
_SUPPLIER_COLS = ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]


from motorway_spark.catalog import sf_tag as _sf_tag  # noqa: E402 — shared staging key


def _derived(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Materialize a CSV/JSON copy of supplier once per SF; return the path.

    Written driver-side via pyarrow + the stdlib writers rather than a
    Spark ``coalesce(1)`` job: supplier is a dimension table (100 rows at
    sf0.01), so a Spark job here only adds ~seconds of fixed cost to the
    driver's timed correctness sweep.  Python's ``repr``/``json.dumps``
    float formatting is shortest-round-trip, so doubles survive the text
    hop bit-exactly — the same guarantee Spark's writer gave.
    """
    import pyarrow.parquet as pq

    tag = _sf_tag(sf_dir)
    out_dir = f"/tmp/motorway_scans/{tag}"
    out = f"{out_dir}/supplier.{'csv' if fmt == 'csv' else 'jsonl'}"
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        tbl = pq.read_table(os.path.join(sf_dir, "supplier.parquet"), columns=_SUPPLIER_COLS)
        rows = tbl.to_pylist()
        tmp = out + ".tmp"
        with open(tmp, "w", newline="") as f:
            if fmt == "csv":
                w = csv.writer(f)
                w.writerow(_SUPPLIER_COLS)
                for r in rows:
                    w.writerow([repr(r[c]) if isinstance(r[c], float) else r[c] for c in _SUPPLIER_COLS])
            else:
                for r in rows:
                    f.write(json.dumps({c: r[c] for c in _SUPPLIER_COLS}) + "\n")
        os.replace(tmp, out)
    return out


@query(
    "scan_csv",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n, {sql_dsum('s_acctbal', 'total_bal')}
    FROM supplier GROUP BY s_nationkey
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with explicit schema + header; values must survive the
    text round-trip bit-exactly to match the parquet oracle."""
    path = _derived(spark, sf_dir, "csv")
    df = spark.read.schema(_SUPPLIER_SCHEMA).option("header", "true").csv(path)
    return df.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum(dec("s_acctbal")).cast("double"), 4).alias("total_bal"),
    )


@query(
    "scan_json",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n, {sql_dsum('s_acctbal', 'total_bal')}
    FROM supplier GROUP BY s_nationkey
    """,
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with explicit schema (schema-on-read over the
    motorway-style JSON envelope, messages.py:75-85)."""
    path = _derived(spark, sf_dir, "json")
    df = spark.read.schema(_SUPPLIER_SCHEMA).json(path)
    return df.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum(dec("s_acctbal")).cast("double"), 4).alias("total_bal"),
    )


@query(
    "scan_orc",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n, {sql_dsum('s_acctbal', 'total_bal')}
    FROM supplier GROUP BY s_nationkey
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source (Spark's second first-class columnar format). The
    derived copy is written driver-side via pyarrow.orc (binary format,
    so doubles are trivially bit-exact); the oracle reads the original
    parquet — passing proves the columnar round-trip is value-exact.
    DuckDB cannot read ORC, so the oracle compares CONTENT via parquet
    rather than re-scanning the ORC file."""
    import pyarrow.orc as orc
    import pyarrow.parquet as pq

    tag = _sf_tag(sf_dir)
    out_dir = f"/tmp/motorway_scans/{tag}"
    out = f"{out_dir}/supplier.orc"
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        tbl = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=_SUPPLIER_COLS
        )
        tmp = out + ".tmp"
        orc.write_table(tbl, tmp)
        os.replace(tmp, out)
    df = spark.read.orc(out)
    return df.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum(dec("s_acctbal")).cast("double"), 4).alias("total_bal"),
    )


@query(
    "scan_csv_corrupt",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n, {sql_dsum('s_acctbal', 'total_bal')}
    FROM supplier WHERE s_suppkey % 10 <> 3 GROUP BY s_nationkey
    """,
)
def scan_csv_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record error isolation at the scan (reference semantics:
    swallow the bad record, keep the stream alive — ramp.py failed()/
    intersection error handling). The derived CSV corrupts s_acctbal to
    'N/A' on every s_suppkey % 10 == 3 row; DROPMALFORMED discards
    exactly those rows at parse time, and the oracle applies the same
    predicate to the clean parquet — passing proves the engine drops
    ONLY the malformed records, bit-exact on the survivors."""
    tag = _sf_tag(sf_dir)
    out_dir = f"/tmp/motorway_scans/{tag}"
    out = f"{out_dir}/supplier_corrupt.csv"
    if not os.path.exists(out):
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        tbl = pq.read_table(
            os.path.join(sf_dir, "supplier.parquet"), columns=_SUPPLIER_COLS
        )
        tmp = out + ".tmp"
        with open(tmp, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(_SUPPLIER_COLS)
            for r in tbl.to_pylist():
                if r["s_suppkey"] % 10 == 3:
                    r = {**r, "s_acctbal": "N/A"}  # unparseable double
                w.writerow(
                    [
                        repr(r[c]) if isinstance(r[c], float) else r[c]
                        for c in _SUPPLIER_COLS
                    ]
                )
        os.replace(tmp, out)
    df = (
        spark.read.schema(_SUPPLIER_SCHEMA)
        .option("header", "true")
        .option("mode", "DROPMALFORMED")
        .csv(out)
    )
    return df.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum(dec("s_acctbal")).cast("double"), 4).alias("total_bal"),
    )


@query(
    "scan_text",
    oracle="""
    SELECT string_split(text, ' ')[1] AS first_token,
           COUNT(*) AS n_lines,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw line-oriented text source (``spark.read.text``) — the native
    shape of a pretraining corpus before any schema exists: one document
    per line, schema imposed AFTER the scan (here: group lines by their
    first token). The derived .txt copy holds the documents fixture's
    text column verbatim (the fixture has no embedded newlines); the
    oracle computes the same aggregate from the original parquet, so
    passing proves the text round-trip and the line scan are value-exact.
    """
    tag = _sf_tag(sf_dir)
    out_dir = f"/tmp/motorway_scans/{tag}"
    out = f"{out_dir}/documents.txt"
    if not os.path.exists(out):
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        texts = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).to_pylist()
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            for r in sorted(texts, key=lambda r: r["doc_id"]):
                f.write(r["text"] + "\n")
        os.replace(tmp, out)
    lines = spark.read.text(out)
    return lines.groupBy(
        F.split(F.col("value"), " ").getItem(0).alias("first_token")
    ).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("value")).cast("bigint").alias("total_chars"),
    )


@query(
    "scan_schema_evolution",
    oracle=f"""
    WITH unioned AS (
      SELECT l_orderkey, l_quantity, CAST(NULL AS DOUBLE) AS l_extendedprice
      FROM lineitem WHERE l_orderkey % 7 = 0
      UNION ALL
      SELECT l_orderkey, CAST(NULL AS DOUBLE) AS l_quantity, l_extendedprice
      FROM lineitem WHERE l_orderkey % 7 = 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_qty,
           CAST(COUNT(l_extendedprice) AS BIGINT) AS n_price,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_checksum,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_price')}
    FROM unioned
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan (``mergeSchema``): two parquet generations
    of the same table — v1 carries ``l_quantity``, v2 replaces it with
    ``l_extendedprice`` — read in ONE scan that unions the schemas and
    null-fills the columns each file lacks. This is how a 100 TB
    lakehouse table absorbs column adds/drops without rewriting old
    files; the footer-driven merge keeps per-file column pruning and
    pushdown intact. The generations are materialized once per SF under
    /tmp (disjoint ``l_orderkey % 7`` slices, so the expected union is
    derivable from the original fixture); the oracle replays the union
    with explicit NULL columns — passing proves the merged read is
    value-exact, null-pattern included."""
    tag = _sf_tag(sf_dir)
    base = f"/tmp/motorway_scans/{tag}/lineitem_evo"
    v1, v2 = f"{base}/v1", f"{base}/v2"
    marker = f"{base}/.ready"
    if not os.path.exists(marker):
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        li.where("l_orderkey % 7 = 0").select("l_orderkey", "l_quantity").write.mode(
            "overwrite"
        ).parquet(v1)
        li.where("l_orderkey % 7 = 1").select(
            "l_orderkey", "l_extendedprice"
        ).write.mode("overwrite").parquet(v2)
        with open(marker, "w") as fh:
            fh.write("ok")
    merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.count("l_extendedprice").alias("n_price"),
        F.sum("l_orderkey").alias("key_checksum"),
        F.round(F.sum(dec("l_quantity")).cast("double"), 4).alias("sum_qty"),
        F.round(F.sum(dec("l_extendedprice")).cast("double"), 4).alias("sum_price"),
    )


@query(
    "scan_hive_partitioned",
    oracle=f"""
    SELECT event_type, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type, user_id
    """,
)
def scan_hive_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition-pruned scan: the
    events fixture is rewritten once per SF as
    ``event_type=<v>/part-*.parquet`` (the directory layout every
    100 TB event table uses), then read back with a predicate on the
    partition column. The filter becomes a PartitionFilter — pruned
    directories are never LISTED, let alone read (asserted in
    tests/test_plan_audit.py) — and the partition column itself is
    directory metadata, not file bytes. Oracle computes the same
    aggregate from the original unpartitioned parquet: passing proves
    the partitioned round-trip and pruned read are value-exact."""
    import os

    tag = _sf_tag(sf_dir)
    out = f"/tmp/motorway_scans/{tag}/events_by_type"
    marker = f"{out}/.ready"
    if not os.path.exists(marker):
        ev = Catalog(spark, sf_dir).events
        ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
        with open(marker, "w") as fh:
            fh.write("ok")
    part = spark.read.parquet(out)
    return (
        part.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")).cast("double"), 4).alias("sum_value"),
        )
    )


@query(
    "scan_csv_dead_letter",
    oracle="""
    SELECT CASE WHEN s_suppkey % 10 = 3 THEN 'dead_letter' ELSE 'clean' END AS route,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CASE WHEN s_suppkey % 10 <> 3
                     THEN CAST(s_acctbal AS DECIMAL(38,6)) END) AS DOUBLE), 4)
             AS clean_bal
    FROM supplier
    GROUP BY 1
    """,
)
def scan_csv_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE twin of ``scan_csv_corrupt``: instead of dropping
    malformed records, the scan RETAINS them with the raw line captured
    in ``_corrupt_record`` — the dead-letter pattern (route bad records
    to a quarantine sink for replay after a fix, the other half of the
    reference's failed()/retry contract, ramp.py:57-64). One scan
    routes every record: clean rows keep their parse, malformed rows
    carry their original text and NULL data columns. The oracle derives
    both route counts and a clean-side checksum from the uncorrupted
    parquet — passing proves the split captures EXACTLY the malformed
    rows and parses the rest bit-exact.

    Pruning pitfall, documented by construction: ``_corrupt_record`` is
    populated only for fields the scan actually PARSES — an aggregate
    that never touches the corruptible column lets column pruning skip
    its parse and every record reads as clean. The query therefore
    aggregates ``s_acctbal`` (the corrupted field) on the clean side,
    which both forces the full parse and checksums the survivors."""
    tag = _sf_tag(sf_dir)
    out = f"/tmp/motorway_scans/{tag}/supplier_corrupt.csv"
    if not os.path.exists(out):
        # materialize via the DROPMALFORMED twin's writer
        scan_csv_corrupt(spark, sf_dir)
    df = (
        spark.read.schema(_SUPPLIER_SCHEMA + ", _corrupt_record string")
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    return (
        df.withColumn(
            "route",
            F.when(F.col("_corrupt_record").isNotNull(), "dead_letter").otherwise(
                "clean"
            ),
        )
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(
                    F.when(F.col("_corrupt_record").isNull(), dec("s_acctbal"))
                ).cast("double"),
                4,
            ).alias("clean_bal"),
        )
    )
