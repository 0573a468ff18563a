"""Window-function coverage: ranking, offsets, running frames, top-k.

SURVEY.md §2b "Window functions" + "Sort / limit / top-k" rows.

Scale notes: a window = one hash exchange on the partition key + one
in-partition sort. Every query here partitions on a real key (custkey /
user_id / status) so state per partition stays bounded; none uses a
global (empty-partition) window, which would serialize on one task at
100 TB. Top-k per group uses row_number + filter, which Spark executes
without materializing full per-group sorts beyond the shuffle sort.
All orderings carry a unique tiebreaker column so results are fully
deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query
from motorway_spark.queries.helpers import dec


@query(
    "win_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders.filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
    )


@query(
    "win_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                 OVER w AS DOUBLE), 4) AS running_total,
           MIN(o_totalprice) OVER w AS running_min,
           MAX(o_totalprice) OVER w AS running_max,
           COUNT(*) OVER w AS n_so_far
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders.filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(w).cast("double"), 4).alias("running_total"),
        F.min("o_totalprice").over(w).alias("running_min"),
        F.max("o_totalprice").over(w).alias("running_max"),
        F.count("*").over(w).alias("n_so_far"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM orders
    WHERE o_orderkey <= 5000
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering (value-based neighborhood)."""
    orders = Catalog(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 5000)
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, Window.currentRow)
    )
    return orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.count("*").over(w).alias("n_in_band")
    )


@query(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders.filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. The row_number+filter formulation lets
    Spark push the rank limit into the sort (WindowGroupLimit) instead of
    fully ranking each group."""
    orders = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "order_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           NULLIF(o_orderstatus, 'P') AS status_or_null
    FROM orders
    ORDER BY status_or_null DESC NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with explicit null placement + limit →
    TakeOrderedAndProject (no full sort materialization)."""
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.select(
            "o_orderkey",
            "o_totalprice",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        )
        .orderBy(
            F.col("status_or_null").desc_nulls_first(),
            F.desc("o_totalprice"),
            "o_orderkey",
        )
        .limit(50)
    )


@query(
    "win_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_best
    FROM orders
    WHERE o_custkey <= 150
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics: percent_rank / cume_dist / nth_value."""
    orders = Catalog(spark, sf_dir).orders.filter(F.col("o_custkey") <= 150)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_best"),
    )


@query(
    "win_time_interval_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_prev_hour,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE), 4)
             AS sum_prev_hour
    FROM events
    WHERE user_id <= 30
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing TIME-interval frame: per user, count and sum of events
    in the preceding hour (inclusive) — the sliding-lookback aggregate
    behind rate limits, rolling MAU, and trailing revenue. Spark's
    ``rangeBetween`` takes numeric offsets only, so the event-time
    ordering is expressed in epoch MICROSECONDS (``unix_micros``; exact
    integers — no float epoch ambiguity) with a -3.6e9 lower bound; the
    oracle uses DuckDB's ``epoch_us`` with the identical frame. RANGE
    peers (same timestamp) aggregate identically in both engines by the
    SQL standard, so no artificial tiebreak column is needed. Scale:
    one hash shuffle on user_id; per-partition state is the one-hour
    sliding buffer, bounded by event rate x horizon, not stream
    length."""
    events = Catalog(spark, sf_dir).events.filter(F.col("user_id") <= 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_prev_hour"),
        F.round(F.sum(dec("value")).over(w).cast("double"), 4).alias("sum_prev_hour"),
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH flags AS (
      SELECT event_id, user_id, ts,
             CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS is_first
      FROM events WHERE user_id <= 20)
    SELECT event_id, user_id,
           CAST(SUM(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_types_so_far
    FROM flags
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per key over event time — the windowed
    distinct that no frame aggregate supports directly (COUNT(DISTINCT)
    OVER is unsupported/exploding in every engine). Formulation: mark
    each value's FIRST occurrence per (user, type) with one ranked
    window, then a plain running SUM of the flags gives distinct-so-far
    — two window passes that share the user_id exchange, integer-exact,
    deterministic via the event_id tiebreak. The same trick computes
    any windowed distinct at 100 TB (first-occurrence flag + running
    sum), where a naive set-per-frame would hold unbounded state."""
    from pyspark.sql import Window as W

    events = Catalog(spark, sf_dir).events.filter(F.col("user_id") <= 20)
    w_first = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        events.withColumn(
            "is_first",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("is_first").over(w_run).alias("distinct_types_so_far"),
        )
    )


@query(
    "win_moving_median",
    oracle="""
    WITH windowed AS (
      SELECT event_id, user_id, value,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
               AS vals
      FROM events WHERE value IS NOT NULL)
    SELECT event_id, user_id, value,
           len(vals) AS frame_n,
           list_sort(vals)[CAST(floor((len(vals) + 1) / 2) AS INT)]
             AS moving_median
    FROM windowed
    """,
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact moving median over the trailing 5-event frame per user —
    the robust-smoothing primitive Spark has no native window function
    for. Implemented as collect-sort-select inside the frame:
    ``element_at(array_sort(collect_list(value) OVER frame), (n+1)//2)``
    with the LOWER-middle rule for even frames, so the result is always
    an actual input value — no interpolation, no cross-engine float
    arithmetic at all, hence bit-exact against the oracle.

    Scale shape: one hash exchange on user_id + in-partition sort (the
    standard window economics); per-row state is the 5-element frame
    buffer, constant regardless of corpus size. A growing frame would
    make this O(frame log frame) per row — for large frames the
    production form switches to the two-heap / order-statistic-tree
    pattern inside applyInPandas; at frame=5 the array sort is cheaper
    than any such machinery."""
    # NULL measurements are excluded up front: Spark's collect_list
    # silently drops NULLs from the frame while DuckDB's list() keeps
    # them (and sorts them FIRST), so a NULL row would shift both
    # frame_n and the middle index between engines. Filtering first
    # gives both engines the identical frame contents by construction.
    events = Catalog(spark, sf_dir).events.filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    return events.select(
        "event_id",
        "user_id",
        "value",
        n.cast("long").alias("frame_n"),
        F.element_at(vals, F.floor((n + 1) / 2).cast("int")).alias("moving_median"),
    )


# ---------------------------------------------------------------------------
# Finite-window EWMA (exponentially weighted moving average).
# ---------------------------------------------------------------------------
# alpha = 0.5: weights 2^-1 .. 2^-5 are DYADIC rationals — exactly
# representable doubles, so every product/sum below is the same IEEE
# value in both engines (the reason alpha is not, say, 0.3).
_EWMA_LAGS = 5


def _ewma_expr(lag_name) -> str:
    """num/den over the present lags, fixed left-to-right fold; both
    engines parse the identical expression string."""
    num = " + ".join(
        f"COALESCE({lag_name(k)}, 0.0) * {0.5 ** (k + 1)!r}"
        for k in range(_EWMA_LAGS)
    )
    den = " + ".join(
        f"(CASE WHEN {lag_name(k)} IS NOT NULL THEN {0.5 ** (k + 1)!r}"
        " ELSE 0.0 END)"
        for k in range(_EWMA_LAGS)
    )
    # floor-grid output quantization: inputs are bit-identical in both
    # engines, so FLOOR agrees; ROUND(double) would not (DuckDB rounds
    # by scaled multiply, Spark by exact BigDecimal)
    return (
        f"CAST(FLOOR((({num}) / ({den})) * 1000000.0 + 0.5) AS DOUBLE)"
        " / 1000000.0"
    )


@query(
    "win_ewma_finite",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE value IS NOT NULL)
    SELECT event_id, user_id, value,
           {_ewma_expr(lambda k: f"lag(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)")}
             AS ewma
    FROM e
    """,
)
def win_ewma_finite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over the trailing
    {_EWMA_LAGS}-event frame per user — the standard smoothing
    primitive between the plain moving average (win_running) and the
    moving median (win_moving_median). The infinite-history EWMA is a
    recurrence (not window-expressible); the finite-window form is a
    fixed weighted sum of lags, which IS — and at alpha=0.5 the weights
    are dyadic rationals, so the arithmetic is bit-identical
    cross-engine with no decimal machinery. Weights renormalize over
    the PRESENT lags (sequence heads average over what exists rather
    than decaying toward zero).

    Scale shape: one hash exchange on user_id + in-partition sort, then
    {_EWMA_LAGS} lag reads per row — constant state, the same window
    economics as win_lag_lead. NULL measurements are filtered up front
    so both engines see identical frames (the win_moving_median
    lesson)."""
    events = Catalog(spark, sf_dir).events.filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = events.select(
        "event_id",
        "user_id",
        "value",
        *[F.lag("value", k).over(w).alias(f"l{k}") for k in range(_EWMA_LAGS)],
    )
    return lagged.select(
        "event_id",
        "user_id",
        "value",
        F.expr(_ewma_expr(lambda k: f"l{k}")).alias("ewma"),
    )
