"""Run Structured Streaming queries to completion over finite fixtures.

``stream_events`` exposes the events fixture as a *streaming* DataFrame
(file-stream source with an explicit schema — streaming scans can't
infer). ``run_stream_to_memory`` drives any streaming DataFrame through
a real StreamingQuery into a memory sink with ``Trigger.AvailableNow``
and returns the materialized result. This is how the engine's streaming
operators get the same DuckDB-oracle treatment as batch ones: the
streaming plan executes for real (state store, incremental execution),
the finite source drains, and the sink table is compared to batch SQL.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from motorway_spark.catalog import normalize_events_ts


def _staging_root() -> str:
    """Per-user staging root: multi-user hosts must not collide on the
    ownership (or contents) of a world-shared /tmp path."""
    import getpass
    import os

    try:
        user = getpass.getuser()
    except Exception:  # noqa: BLE001 - no passwd entry in some containers
        user = str(os.getuid()) if hasattr(os, "getuid") else "anon"
    return f"/tmp/motorway_stream_{user}"


def _staging_dir(sf_dir: str, table: str = "events") -> str:
    """File-stream sources require a *directory*; the fixtures are bare
    files. Stage a directory with a symlink to the table's parquet
    (read-only fixtures stay untouched). The stage path hashes the full
    sf_dir so two fixture dirs with the same basename never share (or
    inherit a stale) symlink."""
    import os

    from motorway_spark.catalog import sf_tag

    stage = f"{_staging_root()}/{sf_tag(sf_dir)}/{table}"
    os.makedirs(stage, exist_ok=True)
    target = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(target):
        # Spark-written fixture: a DIRECTORY of part files. The file
        # stream source lists the load path non-recursively, so a
        # single symlink to the dir yields zero rows — symlink each
        # part file into the stage instead (degenerate-input smoke).
        parts = sorted(
            p for p in os.listdir(target) if p.endswith(".parquet")
        )
        targets = {f"part{i}.parquet": f"{target}/{p}" for i, p in enumerate(parts)}
    else:
        targets = {f"{table}.parquet": target}
    for name, tgt in targets.items():
        link = f"{stage}/{name}"
        if os.path.islink(link) and os.readlink(link) != tgt:
            os.remove(link)
        if not os.path.exists(link):
            os.symlink(tgt, link)
    return stage


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture as a streaming DataFrame with ``ts`` normalized to
    TIMESTAMP exactly like the batch catalog (shared
    :func:`normalize_events_ts`), so stream and batch plans see identical
    values and types whatever parquet flavor the fixture was written
    with. Streaming scans can't infer a schema, so the declared schema is
    taken from a batch read of the same file — that way it tracks the
    fixture flavor (bigint for nanos-as-long, timestamp_ntz for µs NTZ)
    instead of hardcoding one."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_staging_dir(sf_dir))
    )
    return normalize_events_ts(raw)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents fixture as a streaming DataFrame — the ingest shape of
    a streaming corpus pipeline (each file drop = one micro-batch of new
    documents). Schema is taken from a batch read so it tracks the
    fixture flavor, exactly like :func:`stream_events`."""
    schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_staging_dir(sf_dir, table="documents"))
    )


def stream_embeddings(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """embeddings fixture as a streaming DataFrame SPLIT into
    ``n_files`` parquet files with ``maxFilesPerTrigger=1``, so the
    drain runs ``n_files`` real micro-batches — the ingest shape of an
    embedding pipeline (each arriving shard = one incremental index
    MERGE), not a single-batch replay. The split is RANGE-partitioned
    on vec_id — shards arrive as id ranges, how production embedding
    shards actually land — which lets a manifest-sink consumer prove
    per-shard key-disjointness from footer stats and ride the append
    fast path after the first shard. The split is staged once per
    (fixture, n_files) under /tmp and reused; HOW rows split across
    batches is irrelevant to consumers' RESULTS by design (keyed
    MERGEs of deterministic per-row values converge to the same table
    under any batching — only the ingest COST changes)."""
    import os

    from pyspark.sql import functions as F

    from motorway_spark.catalog import sf_tag

    import uuid

    src = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    stage = f"{_staging_root()}/{sf_tag(sf_dir)}/embeddings_rsplit{n_files}"
    if not os.path.isdir(stage):
        # Stage into a unique temp dir, then atomically rename into
        # place: a second session racing this one either wins the
        # rename (first mover) or sees the complete staged dir — never
        # a half-written split, and never part files mutating under an
        # ACTIVE reader (the overwrite-in-place it replaces could
        # delete files while another session's stream was mid-drain).
        tmp = f"{stage}.tmp.{uuid.uuid4().hex[:12]}"
        (
            spark.read.parquet(src)
            .repartitionByRange(n_files, F.col("vec_id"))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, stage)
        except OSError:
            # lost the race to a concurrent stager: theirs is complete
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(stage)
    )


def start_and_drain(start_query, attempts: int = 2):
    """Start a StreamingQuery via ``start_query()`` (a zero-arg factory
    that must generate a FRESH sink/query name per call) and drain it
    with ``processAllAvailable``; one retry on the hardcoded-10 s
    Python-worker connect flake. Returns the drained, still-running
    query (caller stops it)."""
    for attempt in range(1, attempts + 1):
        query = start_query()
        try:
            query.processAllAvailable()
            return query
        except Exception as exc:  # noqa: BLE001
            query.stop()
            if attempt < attempts and "Python worker" in str(exc):
                continue
            raise


def run_stream_to_memory(
    streaming_df: DataFrame,
    output_mode: str = "complete",
    timeout_sec: int = 120,
    shuffle_partitions: int = 8,
    drain: str = "available_now",
) -> DataFrame:
    """Execute a streaming DataFrame to a memory sink until the finite
    source drains; return the sink contents.

    ``drain``: "available_now" (default) uses Trigger.AvailableNow —
    correct for built-in sources. Python Data Sources do NOT support
    AvailableNow (Spark silently falls back to ONE micro-batch, so a
    source with per-trigger/in-flight caps surfaces only its first
    batch — the sf0.1 sweep caught exactly this truncation); for those
    pass "process_all", which runs the default micro-batch trigger and
    drains with ``processAllAvailable()`` so commits release the caps
    batch by batch.

    Shuffle partitions are dialled down for the run (and restored after):
    each stateful streaming query materializes one state-store instance
    per shuffle partition per trigger, so at oracle scale (sf0.01) the
    default 32+ partitions are pure fixed overhead. Results are
    partition-count-independent. At production scale callers pass a
    larger value sized to key cardinality."""
    spark = streaming_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        # One retry on the Python-worker connect flake: Spark's
        # PROCESS_WAIT_TIMEOUT_MS is a hardcoded 10 s, and under heavy
        # machine load a freshly forked planner worker can miss it.
        # The query is deterministic over a finite source, so a clean
        # restart is safe (fresh name + temp checkpoint, same result —
        # a fresh name so a partially-filled append sink isn't reused).
        for attempt in (1, 2):
            name = f"mem_{uuid.uuid4().hex[:12]}"
            writer = (
                streaming_df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
            )
            if drain == "available_now":
                writer = writer.trigger(availableNow=True)
            query = writer.start()
            try:
                if drain == "available_now":
                    # awaitTermination returns False on TIMEOUT without
                    # raising — treating that as success would hand the
                    # caller a silently PARTIAL sink table
                    if not query.awaitTermination(timeout_sec):
                        raise TimeoutError(
                            f"stream did not drain within {timeout_sec}s"
                        )
                else:
                    query.processAllAvailable()
                break
            except Exception as exc:  # noqa: BLE001
                if attempt == 1 and "Python worker" in str(exc):
                    continue
                raise
            finally:
                if query.isActive:
                    query.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        else:
            spark.conf.unset("spark.sql.shuffle.partitions")
    return spark.table(name)


def run_stream_to_upsert(
    streaming_df: DataFrame,
    table_dir: str,
    key_cols: list[str],
    output_mode: str = "update",
    timeout_sec: int = 120,
    shuffle_partitions: int = 8,
    num_buckets: int = 16,
) -> DataFrame:
    """Drive a streaming DataFrame through a keyed ``UpsertParquetSink``
    (``foreachBatch`` MERGE) until the finite source drains; return the
    parquet-backed table.

    This is the PRODUCTION stream-to-serving split: the sink is a real
    table (hash-bucketed parquet), so downstream batch passes can
    self-join / re-aggregate it freely — the memory sink can't be
    self-joined (MemoryPlan breaks DeduplicateRelations) and is
    driver-resident anyway. Update-mode emissions are safe because the
    upsert keys on ``key_cols`` and its within-/across-batch conflict
    resolution keeps the latest (highest-sorting) value per key, so a
    window re-emitted with a larger count converges to the final one.
    Replayed micro-batches are exactly-once no-ops via the sink's batch
    WAL (sinks/upsert.py)."""
    import os
    import shutil

    from motorway_spark.sinks.upsert import UpsertParquetSink

    spark = streaming_df.sparkSession
    sink = UpsertParquetSink(spark, table_dir, key_cols=key_cols, num_buckets=num_buckets)
    # The flake retry below wipes table_dir — destructive-only for state
    # THIS call created. A pre-existing non-empty table (a standing
    # serving table, or data from a non-replayable source whose commits
    # already fired) must never be rmtree'd by a retry: record it now
    # and refuse the wipe later.
    preexisting = os.path.isdir(table_dir) and bool(os.listdir(table_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        # same Python-worker connect-flake retry as run_stream_to_memory.
        # The retry starts a BRAND-NEW query whose batch ids restart at 0,
        # but the sink's batch-id WAL is per-TABLE — batches committed by
        # the failed first attempt would suppress the new query's
        # same-numbered batches even if their composition differs, so the
        # table dir (data + WAL) is wiped before the restart and the
        # deterministic finite source rebuilds it from scratch. If the
        # table pre-existed this call, that wipe would destroy data the
        # runner doesn't own (turning exactly-once into at-most-once for
        # a non-replayable source) — re-raise the flake instead and let
        # the caller decide.
        for attempt in (1, 2):
            if attempt > 1:
                if preexisting:
                    raise RuntimeError(
                        f"retry would wipe pre-existing table {table_dir}; "
                        "refusing — restart the query with its own "
                        "checkpointLocation to resume batch ids instead"
                    )
                shutil.rmtree(table_dir, ignore_errors=True)
            query = (
                streaming_df.writeStream.outputMode(output_mode)
                .trigger(availableNow=True)
                .foreachBatch(sink.foreach_batch())
                .start()
            )
            try:
                # False = timed out (no exception): a partial MERGE must
                # be an error, not a silently short table
                if not query.awaitTermination(timeout_sec):
                    raise TimeoutError(
                        f"stream did not drain within {timeout_sec}s"
                    )
                break
            except Exception as exc:  # noqa: BLE001
                if attempt == 1 and "Python worker" in str(exc):
                    continue
                raise
            finally:
                if query.isActive:
                    query.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        else:
            spark.conf.unset("spark.sql.shuffle.partitions")
    out = sink.read()
    if out is None:
        raise RuntimeError(f"stream produced no batches into {table_dir}")
    return out
