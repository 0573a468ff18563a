"""Shared helpers for oracle-matched queries.

Float determinism convention
----------------------------
DuckDB and Spark sum doubles in different orders, so raw ``SUM(double)``
is not bit-reproducible across engines. Every aggregated double in an
oracle-matched query therefore follows this convention, in BOTH the Spark
expression and the oracle SQL:

1. cast the input to ``DECIMAL(38,6)`` (exact, order-independent sums),
2. aggregate in decimal (exact in both engines),
3. cast the exact result to double and ``round(…, N)``.

The double produced from the same exact decimal is bit-identical in both
engines, and a tie at the rounding digit is impossible for binary doubles
at scale ≥ 1 (k.5·10⁻ⁿ is not a dyadic rational for n ≥ 1), so rounding is
also bit-identical. The decimal cast is a correctness-harness convention
only — it costs one extra codegen'd cast per row and does not change the
shuffle/aggregation structure Catalyst picks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dec(col) -> Column:
    """Exact-decimal view of a double column (order-independent sums)."""
    return F.col(col).cast(DEC) if isinstance(col, str) else col.cast(DEC)


def dsum(col, alias: str, ndigits: int = 4) -> Column:
    """Deterministic cross-engine SUM over a double column."""
    return F.round(F.sum(dec(col)).cast("double"), ndigits).alias(alias)


def davg(col, alias: str, ndigits: int = 6) -> Column:
    """Deterministic cross-engine AVG: exact decimal sum / count, in doubles."""
    c = dec(col)
    return F.round(
        F.sum(c).cast("double") / F.count(c).cast("double"), ndigits
    ).alias(alias)


# SQL-side equivalents (DuckDB dialect == ANSI here).
def sql_dsum(expr: str, alias: str, ndigits: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE), {ndigits}) AS {alias}"


def sql_davg(expr: str, alias: str, ndigits: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE), {ndigits}) AS {alias}"
    )


def distributed_ntile(df, n_tiles: int, sort_cols: list, out_col: str):
    """Exact SQL-standard ``ntile(n) OVER (ORDER BY sort_cols)`` WITHOUT
    the global window's single-partition sort — the two-pass
    range-partitioned rank (measured on the equi-depth histogram:
    139 s with the global ntile -> 9.5 s at sf10).

    Shape: repartitionByRange + sortWithinPartitions on the caller's
    TOTAL order gives every partition a contiguous sorted run; the
    in-partition position is the low 33 bits of
    ``monotonically_increasing_id()`` (consecutive record numbers per
    partition by contract); the partition's global offset is a running
    sum over the per-partition counts — computed IN-PLAN (an
    ``npart``-row aggregate + window, broadcast-joined back on the
    partition id), so the whole rank derivation happens in ONE
    execution of ONE range exchange. That single-execution property is
    what makes it correct: RangePartitioner SAMPLES its boundaries per
    exchange execution, so offsets collected in a separate job (or
    against an evicted-and-recomputed cache) can silently mismatch the
    partitioning — here both consumers read the SAME exchange
    (ReusedExchange, pinned by a plan audit), and nothing is
    materialized or collected at all. The ntile bucket is pure integer
    arithmetic on (rank, total) — whole-stage codegen, no Python.

    The reuse invariant is ALSO guarded at runtime, in-plan: each row
    checks ``__pos < __c`` (its in-partition position against the
    counts-side row count for its partition) and raises if violated.
    This check is complete for the hazard: ``__pid``/``__pos`` come
    from the s-side execution and ``__off``/``__total``/``__c`` from
    the counts-side execution; if the two executions sampled different
    range boundaries, either (a) some partition's counts differ — and
    since totals are equal, some partition has counts-side ``__c`` <
    s-side size, whose last row trips the guard — or (b) every
    partition's count is identical, in which case the offsets are
    exactly what the s-side's own counts would give and every rank is
    correct. The join with the counts side is a LEFT join: an s-side
    row in a partition the counts-side execution never saw (no counts
    row at all — the one shape an inner join would silently DROP,
    shifting other partitions' ranks without tripping the compare)
    surfaces as ``__c IS NULL``, and ``__pos < NULL`` is NULL, so the
    same ``otherwise`` branch raises. Every s-side row is therefore
    either guarded or errors — a silent wrong bucket is impossible:
    any divergent re-execution either changes no answer or raises.
    Cost: one codegen'd integer compare per row. New call sites should still add
    a ReusedExchange plan audit (tests/test_plan_audit.py) so the
    single-execution FAST path is pinned, not just the safety net.

    Returns ``df``'s rows (original columns) plus ``out_col`` (int
    bucket, 1-based). Row order is not defined. The rank formula is
    property-tested against Spark's own ntile at every size regime
    (tests/test_properties.py)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    npart = spark.sparkContext.defaultParallelism
    pos_mask = (1 << 33) - 1
    s = (
        df.repartitionByRange(npart, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__pos", F.monotonically_increasing_id().bitwiseAND(F.lit(pos_mask))
        )
    )
    counts = s.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        "__c",
        F.coalesce(F.sum("__c").over(w), F.lit(0)).alias("__off"),
        F.sum("__c").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__total"),
    )
    # LEFT join (not inner): an s-side partition absent from the counts
    # side must RAISE via the null-__c guard below, never be dropped.
    ranked = s.join(F.broadcast(offsets), "__pid", "left")
    # runtime reuse guard (see docstring): a divergent re-execution of
    # the range exchange that could change any bucket necessarily puts
    # some row's position at or past its partition's counts-side size —
    # or leaves the row with no counts row at all (__c null; the
    # comparison is then NULL and falls through to the same raise).
    pos_guarded = F.when(
        F.col("__c").isNull() | (F.col("__pos") >= F.col("__c")),
        F.raise_error(
            F.lit(
                "distributed_ntile: range exchange re-executed with "
                "divergent boundaries (in-partition position >= counted "
                "partition size, or the partition is missing from the "
                "counts side); offsets are unsafe"
            )
        ),
    ).otherwise(F.col("__pos"))
    # pos_guarded LEFTMOST: binary-op codegen evaluates the left operand
    # first and skips the right when it is NULL, so `__off + guard`
    # would never evaluate the guard on a missing counts row.
    rank = pos_guarded + F.col("__off") + 1
    # SQL-standard ntile from (rank, total): q = total div n, m = total
    # mod n; the first m buckets carry q+1 rows. Guard q = 0 (fewer
    # rows than tiles: one bucket per row) inside the expression.
    q = F.floor(F.col("__total") / n_tiles)
    m = F.col("__total") % n_tiles
    split = m * (q + 1)
    bucket = F.when(F.col("__total") < n_tiles, rank).otherwise(
        F.when(rank <= split, F.floor((rank + q) / (q + 1))).otherwise(
            F.floor((rank - split + q - 1) / q) + m
        )
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        "__pid", "__pos", "__off", "__total", "__c"
    )


def scale_partitions(
    spark,
    sf_dir: str,
    table: str,
    floor_bytes: int = 4 << 20,
    target_bytes: int = 128 << 20,
) -> int:
    """Fan-out width for a repartition feeding a PYTHON pass, derived
    from the input's on-disk size instead of the fixed
    ``defaultParallelism`` constant (guide §2: partitioning must be
    scale-adaptive, not tuned to either local mode or the cluster).

    Every mapInPandas task costs a Python-worker round trip (~0.1 s
    floor locally), so 32 tasks over the 0.8 MB sf0.1 embeddings file
    waste ~30 round trips per pass — while at 100 TB the same constant
    would under-split. This returns ~one partition per ``floor_bytes``
    of parquet for small inputs (capped at the core count) and ~one
    per ``target_bytes`` for large inputs (the guide's 128 MB-1 GB
    shuffle-partition band), so the SAME call site is right at sf0.001
    and at cluster scale. Falls back to defaultParallelism when the
    path cannot be stat'ed (non-filesystem sources)."""
    import math
    import os

    par = spark.sparkContext.defaultParallelism
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(path):
            nbytes = sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
        else:
            nbytes = os.path.getsize(path)
    except OSError:
        return par
    return max(
        math.ceil(nbytes / target_bytes),
        min(par, max(1, math.ceil(nbytes / floor_bytes))),
    )


def scale_partitions_df(
    df,
    floor_bytes: int = 4 << 20,
    target_bytes: int = 128 << 20,
) -> int:
    """scale_partitions for a DataFrame whose source path isn't in
    scope: sums the scan's input files (``df.inputFiles()``, a driver
    metadata call). Falls back to defaultParallelism when the plan has
    no file scan or the files can't be stat'ed."""
    import math
    import os
    from urllib.parse import unquote, urlparse

    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
        if not files:
            return par
        nbytes = 0
        for f in files:
            p = urlparse(f)
            local = unquote(p.path) if p.scheme in ("file", "") else None
            if local is None:
                return par  # non-local FS: size unknown, keep default
            nbytes += os.path.getsize(local)
    except Exception:  # noqa: BLE001 — any failure keeps old behavior
        return par
    return max(
        math.ceil(nbytes / target_bytes),
        min(par, max(1, math.ceil(nbytes / floor_bytes))),
    )
