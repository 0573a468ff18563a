"""Dataset introspection at scale: column profiling + heavy hitters.

North-star extensions: before any 100 TB training-data run you profile
the input (null rates, cardinalities, ranges) and find dominating keys
(skew detection — the thing that melts shuffles). Reference analogue:
motorway only exposes per-queue message counters (/root/reference/
motorway/controller.py:43-60 process_statistics: success/processed
counts, frequency dict); these are the set-oriented, data-aware
versions of that introspection.

Scale notes:

- ``profile_columns``: ONE scan computes every per-column statistic as
  a single wide aggregate row (count/nulls/approx-free distinct/min/
  max per column, all codegen'd), then a driver-free ``stack`` unpivots
  it to one row per column. No per-column scans, no collect.
- ``topk_heavy_hitters``: the two-pass candidate/verify pattern used
  everywhere in this repo for scale (cf. LSH → exact rerank): pass 1
  runs Misra-Gries summaries per partition inside Arrow batches —
  by the averaging argument, any key with global count > n/CAPACITY
  survives in at least one partition's summary, so the union of
  per-partition candidates is a superset of every true heavy hitter.
  Pass 2 exactly recounts ONLY the candidates (broadcast semi join —
  no full-cardinality shuffle) and takes the deterministic top-k.
  The result is EXACT (oracle-paired), while shuffle width is bounded
  by n_partitions x CAPACITY instead of key cardinality. Capacity
  scales with 1/skew: the fixture user distribution is near-uniform
  (the adversarial case), so CAPACITY=4096 here; a production Zipf
  workload needs far less.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query

TOP_K = 10
MG_CAPACITY = 4096  # > n/min(top-k count) at every fixture SF (uniform keys)

# (column, kind) pairs for the orders table; kind drives the min/max
# string rendering so both engines format identically.
_ORDER_COLS = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "double"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _render(kind: str, inner_sql: str) -> str:
    """Engine-portable string rendering of a min/max value (computed
    natively first — string min/max would order '100' < '99')."""
    if kind == "double":
        return f"printf('%.4f', {inner_sql})"
    # STRING is valid in both Spark SQL and DuckDB (VARCHAR is not a
    # bare type in Spark); timestamps at midnight render identically.
    return f"CAST({inner_sql} AS STRING)"


def _oracle_profile() -> str:
    parts = []
    for col, kind in _ORDER_COLS:
        parts.append(
            f"""
    SELECT '{col}' AS col_name,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           {_render(kind, f'MIN({col})')} AS min_repr,
           {_render(kind, f'MAX({col})')} AS max_repr
    FROM orders"""
        )
    return " UNION ALL ".join(parts)


@query("profile_columns", oracle=_oracle_profile())
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over orders: per column, row/null/distinct counts
    and min/max rendered as strings, unpivoted via ``stack`` to one row
    per column — vs the oracle's N-scans-per-table UNION.

    Plan shape (measured, sf0.1): ONE aggregate mixing the six exact
    ``count_distinct`` with the plain aggs forces the
    RewriteDistinctAggregates Expand — every input row becomes 7
    null-padded copies carrying all plain-agg buffers, 2.7 s vs the
    split below at 0.79 s (3.4x). So the wide row is built from TWO
    single-purpose 1-row aggregates cross-joined: the distinct pass
    (Expand over just the group keys, no extra buffers) and the
    plain count/min/max pass (pure codegen). Both feed from their own
    FileScan stage with no dependency between them, so a cluster runs
    them concurrently — wall-clock ~ one scan when capacity allows, and
    still 3x fewer scans than the oracle shape at 100 TB."""
    orders = Catalog(spark, sf_dir).orders
    distinct_aggs = [
        F.count_distinct(col).alias(f"{col}__distinct") for col, _ in _ORDER_COLS
    ]
    plain_aggs = []
    for col, kind in _ORDER_COLS:
        plain_aggs += [
            F.count(F.lit(1)).alias(f"{col}__rows"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"),
            F.expr(_render(kind, f"MIN({col})")).alias(f"{col}__min"),
            F.expr(_render(kind, f"MAX({col})")).alias(f"{col}__max"),
        ]
    # both sides are exactly one row: the cross join is a no-shuffle
    # broadcast of a single row, not a data-sized cartesian
    wide = orders.agg(*distinct_aggs).crossJoin(orders.agg(*plain_aggs))
    stack_args = ", ".join(
        f"'{col}', {col}__rows, {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        for col, _ in _ORDER_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_ORDER_COLS)}, {stack_args}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_repr, max_repr)"
        )
    )


def _mg_summarize(batches, key_col: str, capacity: int):
    """Misra-Gries summary over one partition's Arrow batches: yields the
    surviving candidate keys. Vectorized value_counts per batch, then a
    counter-merge; on overflow every counter drops by the
    (capacity+1)-th largest value (``cut``), so at most ``capacity``
    survive. Guarantee: each overflow removes >= (capacity+1)*cut total
    mass, so any key's undercount is <= n/(capacity+1) — every key with
    true count > n/(capacity+1) survives in the summary.
    """
    import pandas as pd

    counters: dict = {}
    for pdf in batches:
        for key, cnt in pdf[key_col].value_counts().items():
            counters[key] = counters.get(key, 0) + int(cnt)
        if len(counters) > capacity:
            cut = sorted(counters.values(), reverse=True)[capacity]
            counters = {k: v - cut for k, v in counters.items() if v - cut > 0}
    yield pd.DataFrame({key_col: pd.array(list(counters.keys()), dtype="int64")})


@query(
    "topk_heavy_hitters",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events
    FROM events GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT {TOP_K}
    """,
)
def topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k dominating keys via Misra-Gries candidates + exact
    recount (see module docstring for the scale argument). Ties at the
    k-th count break on user_id, so the result is deterministic."""
    events = Catalog(spark, sf_dir).events.select("user_id")
    candidates = (
        events.repartition(8)  # fixtures are one row group = one task
        .mapInPandas(
            lambda batches: _mg_summarize(batches, "user_id", MG_CAPACITY),
            "user_id bigint",
        )
        .distinct()
    )
    return (
        events.join(F.broadcast(candidates), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), "user_id")
        .limit(TOP_K)
    )


Z_BITS = 16  # bits per dimension; 32-bit z-values cover keys < 65536


def _z_expr(a: str, b: str) -> str:
    """Bit-interleaved Morton (Z-order) value of two int columns as ONE
    SQL expression string (one driver call, codegen'd — SCALE.md expr
    rule)."""
    terms = []
    for j in range(Z_BITS):
        terms.append(f"(shiftleft(({a} >> {j}) & 1, {2 * j}))")
        terms.append(f"(shiftleft(({b} >> {j}) & 1, {2 * j + 1}))")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


_SQL_Z = (
    lambda a, b: "CAST("
    + " + ".join(
        f"((({a} >> {j}) & 1) << {2 * j}) + ((({b} >> {j}) & 1) << {2 * j + 1})"
        for j in range(Z_BITS)
    )
    + " AS BIGINT)"
)


@query(
    "zorder_clustering",
    oracle=f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey,
             {_SQL_Z('l_partkey', 'l_suppkey')} AS zval
      FROM lineitem)
    SELECT zval >> 26 AS zbucket, COUNT(*) AS n_rows,
           MIN(l_partkey) AS p_min, MAX(l_partkey) AS p_max,
           MIN(l_suppkey) AS s_min, MAX(l_suppkey) AS s_max
    FROM z GROUP BY zval >> 26
    """,
)
def zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering over (l_partkey, l_suppkey): the
    space-filling-curve layout trick behind Delta/Iceberg OPTIMIZE
    ZORDER. Interleaving the key bits makes each coarse z-bucket a
    RECTANGLE in key space — the per-bucket (min, max) of BOTH columns
    is tight, so a file written per bucket can be pruned by predicates
    on EITHER key. The query materializes exactly that property: per
    64-cell bucket, row count and both key ranges (at 100 TB these are
    the file-level min/max stats the scan planner prunes on). Pure
    integer bit math — bit-identical cross-engine.
    """
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.expr(_z_expr("l_partkey", "l_suppkey")).alias("zval"),
        )
        .groupBy(F.expr("zval >> 26").alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("p_min"),
            F.max("l_partkey").alias("p_max"),
            F.min("l_suppkey").alias("s_min"),
            F.max("l_suppkey").alias("s_max"),
        )
    )


# One fixed IEEE expression over doubles that were cast from EXACT
# decimal sums — identical op tree => bit-identical results in both
# engines (stddev/corr built-ins are NOT reproducible cross-engine:
# their float accumulation order differs).
_CORR_NUM = "(CAST(n AS DOUBLE) * sxy - sx * sy)"
_CORR_EXPR = (
    f"{_CORR_NUM} / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)"
    " * sqrt(CAST(n AS DOUBLE) * syy - sy * sy))"
)
_SLOPE_EXPR = f"{_CORR_NUM} / (CAST(n AS DOUBLE) * sxx - sx * sx)"
_ICEPT_EXPR = f"(sy - ({_SLOPE_EXPR}) * sx) / CAST(n AS DOUBLE)"

# Inputs are 2-dp money/quantity values: DECIMAL(18,2) holds them
# exactly and the PRODUCT type (precision 37, scale 4) stays inside
# both engines' 38-digit cap with NO scale adjustment — wider input
# decimals would push products past 38 digits, where Spark and DuckDB
# diverge (scale-reduction vs promotion).
_CORR_SUMS_SQL = """
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
"""


@query(
    "agg_corr_regression",
    oracle=f"""
    WITH sums AS ({_CORR_SUMS_SQL})
    SELECT l_returnflag, n,
           ROUND({_CORR_EXPR}, 6) AS corr_qty_price,
           ROUND({_SLOPE_EXPR}, 6) AS slope,
           ROUND({_ICEPT_EXPR}, 4) AS intercept
    FROM sums
    """,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation + least-squares regression (price ~ quantity per
    return flag) with CROSS-ENGINE-DETERMINISTIC results: the five
    moment sums accumulate as exact DECIMAL(38,6) (order-independent),
    are cast once to double, and corr/slope/intercept evaluate as one
    fixed IEEE expression — the same discipline as the anomaly
    z-score, extended to second moments. The built-in ``corr``/
    ``regr_slope`` aggregate in float and is NOT reproducible across
    engines (or even across partitionings of the same engine).

    Scale: a single scan with map-side partial aggregation — the moment
    sums are the mergeable sufficient statistic, so this is the
    shuffle-one-row-per-group shape at any data size."""
    li = Catalog(spark, sf_dir).lineitem
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qty).cast("double").alias("sx"),
        F.sum(price).cast("double").alias("sy"),
        F.sum(qty * qty).cast("double").alias("sxx"),
        F.sum(price * price).cast("double").alias("syy"),
        F.sum(qty * price).cast("double").alias("sxy"),
    )
    return sums.select(
        "l_returnflag",
        "n",
        F.expr(f"ROUND({_CORR_EXPR}, 6)").alias("corr_qty_price"),
        F.expr(f"ROUND({_SLOPE_EXPR}, 6)").alias("slope"),
        F.expr(f"ROUND({_ICEPT_EXPR}, 4)").alias("intercept"),
    )


# Standardized 3rd/4th moments from EXACT integer power sums.
# l_quantity is integer-valued (1..50), so qty^k sums are exact BIGINTs
# (50^4 * 6e5 rows ~ 4e12 << 2^63); the moment formulas then evaluate
# as one fixed IEEE expression — same discipline as corr above, pushed
# to higher moments. (Non-integer columns would need decimal powers,
# whose >38-digit products diverge between engines — that is WHY this
# operator contracts on an integer measure.)
_MOM = {
    "m": "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)",
}
_MOM["v"] = f"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - ({_MOM['m']}) * ({_MOM['m']}))"
_SKEW_EXPR = (
    f"((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3.0 * ({_MOM['m']}) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 2.0 * ({_MOM['m']}) * ({_MOM['m']}) * ({_MOM['m']}))"
    f" / pow({_MOM['v']}, 1.5))"
)
_KURT_EXPR = (
    f"((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 4.0 * ({_MOM['m']}) * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 6.0 * ({_MOM['m']}) * ({_MOM['m']}) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" - 3.0 * ({_MOM['m']}) * ({_MOM['m']}) * ({_MOM['m']}) * ({_MOM['m']}))"
    f" / (({_MOM['v']}) * ({_MOM['v']})) - 3.0)"
)

_POWER_SUMS_SQL = """
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
      FROM lineitem GROUP BY l_returnflag
"""


@query(
    "agg_skew_kurtosis",
    oracle=f"""
    WITH sums AS ({_POWER_SUMS_SQL})
    SELECT l_returnflag, n,
           ROUND({_SKEW_EXPR}, 6) AS skewness,
           ROUND({_KURT_EXPR}, 6) AS excess_kurtosis
    FROM sums
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness + excess kurtosis of ``l_quantity`` per
    return flag, CROSS-ENGINE-DETERMINISTIC: the four power sums
    accumulate as exact BIGINTs (the measure is integer-valued — the
    operator's stated contract), then each moment evaluates as one
    fixed IEEE expression. Spark's built-in ``skewness``/``kurtosis``
    aggregate in floats with engine-specific merge order and is not
    reproducible; this is the mergeable-sufficient-statistic form
    (same map-side-combine shape as any sum)."""
    li = Catalog(spark, sf_dir).lineitem
    q = F.col("l_quantity").cast("bigint")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    return sums.select(
        "l_returnflag",
        "n",
        F.expr(f"ROUND({_SKEW_EXPR}, 6)").alias("skewness"),
        F.expr(f"ROUND({_KURT_EXPR}, 6)").alias("excess_kurtosis"),
    )


@query(
    "agg_gini",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(o_totalprice AS DECIMAL(18,2)) AS x,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey) AS DECIMAL(18,0)) AS i
      FROM orders),
    sums AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(i * x) AS DOUBLE) AS sum_ix,
             CAST(SUM(x) AS DOUBLE) AS sum_x
      FROM ranked GROUP BY o_orderpriority)
    SELECT o_orderpriority, n,
           ROUND(2e0 * sum_ix / (CAST(n AS DOUBLE) * sum_x)
                 - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
    FROM sums
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per priority class — the
    standard inequality/concentration metric for revenue profiling
    (how top-heavy is each segment). Formulation: rank-weighted sum
    over ascending values, G = 2·Σi·x_i/(n·Σx) − (n+1)/n. Rank-value
    products and both sums accumulate as EXACT decimals (ties in x
    leave Σi·x_i invariant, so the rank tiebreak cannot change the
    result), then one fixed IEEE expression — the same determinism
    discipline as corr/skewness above, extended to an order-statistic
    metric. Cost: one window sort per group + one aggregate."""
    from pyspark.sql import Window

    orders = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        F.row_number().over(w).cast("decimal(18,0)").alias("i"),
    )
    sums = ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("i") * F.col("x")).cast("double").alias("sum_ix"),
        F.sum("x").cast("double").alias("sum_x"),
    )
    return sums.select(
        "o_orderpriority",
        "n",
        F.round(
            F.lit(2.0) * F.col("sum_ix") / (F.col("n").cast("double") * F.col("sum_x"))
            - (F.col("n") + 1).cast("double") / F.col("n").cast("double"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Equi-depth (quantile-bucket) histogram.
# ---------------------------------------------------------------------------
@query(
    "agg_histogram_equidepth",
    oracle="""
    WITH ranked AS (
      SELECT l_extendedprice AS v,
             ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                             l_linenumber) AS bucket
      FROM lineitem WHERE l_extendedprice IS NOT NULL)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(v) AS lo, MAX(v) AS hi
    FROM ranked GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (quantile buckets) over line prices — the
    profiler's complement to agg_histogram's fixed-edge equi-width
    bins: each of the 10 buckets holds (as near as possible) the same
    row count, and the [lo, hi] boundaries ARE the deciles. This is the
    statistic a cost-based optimizer keeps per column and the binning a
    skewed distribution needs (equi-width collapses skew into one hot
    bin).

    Exact global ranks WITHOUT a global ntile: the first cut used
    `ntile(10) OVER (ORDER BY ...)` — a single-partition sort that
    measured 1.1 / 9.8 / 139 s at sf0.1/1/10 (14x per decade, a wall).
    The two-pass range-partitioned rank (helpers.distributed_ntile:
    checkpoint-frozen range partitioning, prefix offsets, rank from
    monotonic-id record numbers, ntile in integer arithmetic, all
    codegen) brings it to 2.1 / 2.4 / 9.5 s — 4.0x top decade. Sort
    cost is per-partition (N/P log N/P), nothing single-node.

    Determinism: ranks over a TOTAL order are partitioning-independent;
    the ntile formula (first N mod k buckets get one extra row) is the
    same integer arithmetic the oracle's ntile(10) applies; min/max per
    bucket are order-insensitive. No floats anywhere."""
    from motorway_spark.queries.helpers import distributed_ntile

    li = Catalog(spark, sf_dir).lineitem.filter(
        F.col("l_extendedprice").isNotNull()
    ).select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    return (
        distributed_ntile(
            li, 10, ["v", "l_orderkey", "l_linenumber"], "bucket"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — oracle-exact.
# ---------------------------------------------------------------------------
_KMV_K = 256
_KMV_SPACE = 1152921504606846976.0  # 2^60 — exact as a double


@query(
    "agg_distinct_kmv",
    oracle=f"""
    WITH u AS MATERIALIZED (
      SELECT DISTINCT
             ('0x' || substr(md5(coalesce(text, '')), 1, 15))::BIGINT AS u
      FROM documents),
    kth AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_used, MAX(u) AS u_k
      FROM (SELECT u FROM u ORDER BY u LIMIT {_KMV_K})),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM u)
    SELECT k_used, u_k, n_exact,
           CASE WHEN k_used < {_KMV_K} THEN n_exact
                ELSE CAST(FLOOR(CAST(k_used - 1 AS DOUBLE) * {_KMV_SPACE!r}
                                / CAST(u_k AS DOUBLE)) AS BIGINT) END
             AS kmv_estimate,
           CAST(FLOOR(CAST(2 * ABS((CASE WHEN k_used < {_KMV_K} THEN n_exact
                ELSE CAST(FLOOR(CAST(k_used - 1 AS DOUBLE) * {_KMV_SPACE!r}
                                / CAST(u_k AS DOUBLE)) AS BIGINT) END)
                - n_exact) * 1000000 + n_exact AS DOUBLE)
                / CAST(2 * n_exact AS DOUBLE)) AS DOUBLE) / 1000000.0
             AS rel_err
    FROM kth CROSS JOIN ex
    """,
)
def agg_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count estimation via a KMV (k-minimum-values) sketch —
    the DETERMINISTIC mergeable sketch, oracle-exact where
    agg_approx_distinct (HLL) is necessarily rows-only: HLL's register
    layout is engine-internal, but KMV is pure order statistics over a
    shared hash — the k smallest md5-derived 60-bit values of the
    distinct texts, estimate = (k-1) * 2^60 / u_k. Both engines compute
    identical hashes, take the identical k-th order statistic, and the
    one double division is bit-identical. The output row carries the
    estimate NEXT TO the exact count with the measured relative error
    (integer-exact half-up grid) — the sketch-accuracy audit built in.

    Mergeability (the production point): KMV sketches union by "merge
    and keep the k smallest" — an algebraic min-k aggregate, so
    per-partition sketches combine map-side exactly like the partial
    aggregates Spark already does; the DISTINCT + TakeOrdered plan
    here IS that two-phase shape. At 100 TB the sketch is k values per
    partition crossing the shuffle, never the distinct set itself.

    Reference: extends the profiling family (SURVEY.md §2b) the same
    way topk_heavy_hitters did — an exact-checkable form of a
    classically-approximate operator."""
    from motorway_spark.queries.dedup import _h64

    docs = Catalog(spark, sf_dir).documents
    us = docs.select(
        _h64(F.coalesce(F.col("text"), F.lit(""))).alias("u")
    ).distinct()
    kth = (
        us.orderBy("u")
        .limit(_KMV_K)
        .agg(F.count(F.lit(1)).alias("k_used"), F.max("u").alias("u_k"))
    )
    ex = us.agg(F.count(F.lit(1)).alias("n_exact"))
    est = (
        f"CASE WHEN k_used < {_KMV_K} THEN n_exact "
        f"ELSE CAST(FLOOR(CAST(k_used - 1 AS DOUBLE) * {_KMV_SPACE!r} "
        f"/ CAST(u_k AS DOUBLE)) AS BIGINT) END"
    )
    return kth.crossJoin(F.broadcast(ex)).select(
        "k_used",
        "u_k",
        "n_exact",
        F.expr(est).alias("kmv_estimate"),
        F.expr(
            f"CAST(FLOOR(CAST(2 * ABS(({est}) - n_exact) * 1000000 + n_exact"
            " AS DOUBLE) / CAST(2 * n_exact AS DOUBLE)) AS DOUBLE) / 1000000.0"
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# Fixed-grid quantile sketch — the deterministic mergeable percentile
# sketch, oracle-exact (the KMV/equidepth playbook applied to quantiles).
# ---------------------------------------------------------------------------
_GRID_W_CENTS = 10_400  # bucket width in cents: value error <= $52
_GRID_B = 1024          # buckets cover [0, $106,496) — the TPC-H price domain


@query(
    "agg_percentile_grid_sketch",
    oracle=f"""
    WITH b AS (
      SELECT l_returnflag,
             LEAST({_GRID_B - 1},
                   CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                     // {_GRID_W_CENTS}) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
      GROUP BY 1, 2),
    cum AS (
      SELECT l_returnflag, bucket, c,
             CAST(SUM(c) OVER (PARTITION BY l_returnflag
                               ORDER BY bucket) AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      FROM b)
    SELECT l_returnflag,
           MAX(n) AS n_rows,
           CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN bucket END)
                * {_GRID_W_CENTS} + {_GRID_W_CENTS // 2} AS DOUBLE) / 100.0
             AS p50_est,
           CAST(MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN bucket END)
                * {_GRID_W_CENTS} + {_GRID_W_CENTS // 2} AS DOUBLE) / 100.0
             AS p90_est,
           CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bucket END)
                * {_GRID_W_CENTS} + {_GRID_W_CENTS // 2} AS DOUBLE) / 100.0
             AS p99_est
    FROM cum
    GROUP BY l_returnflag
    """,
)
def agg_percentile_grid_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles from a FIXED-GRID histogram sketch — the
    deterministic, mergeable, oracle-exact form of the quantile-sketch
    capability that agg_percentile_approx (Spark's GK/KLL summary) can
    only offer rows-only: GK summaries are engine-internal, but a fixed
    grid is pure integer arithmetic both engines replay bit-for-bit.

    Sketch: prices land in 1024 fixed $104 buckets (integer cents,
    half-up to dodge binary-double cent drift); the sketch state is the
    per-bucket count vector — it MERGES BY ADDITION, so per-partition
    sketches combine map-side exactly like any partial hash aggregate,
    and at 100 TB only groups x 1024 counter rows ever cross the
    shuffle (never values). Quantile answer = midpoint of the first
    bucket whose cumulative count reaches ceil(q*n) (integer rank
    arithmetic); the declared error bound is VALUE error <= half a
    bucket width ($52 here), the classic equi-width-histogram
    guarantee — tune width to the accuracy you need, memory stays O(B).

    This is what a percentile monitor over a 100 TB stream actually
    runs: bounded state, exact merges, reproducible answers. The
    engine-native sketch (percentile_approx) remains covered by
    agg_percentile_approx + its rank-error invariant test; the exact
    order statistics remain covered by agg_percentile /
    agg_histogram_equidepth.

    Reference: sketch family parity (SURVEY.md §2b aggregations) beside
    agg_distinct_kmv — same playbook: replace an engine-internal
    summary with order/grid statistics over shared integers."""
    li = Catalog(spark, sf_dir).lineitem.filter(
        F.col("l_extendedprice").isNotNull()
    )
    counts = (
        li.select(
            "l_returnflag",
            F.expr(
                f"LEAST({_GRID_B - 1}, "
                f"CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
                f" DIV {_GRID_W_CENTS})"
            ).alias("bucket"),
        )
        .groupBy("l_returnflag", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "l_returnflag",
        "bucket",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )

    def pick(t_expr: str, alias: str):
        est_cents = (
            F.min(F.when(F.expr(f"cum >= {t_expr}"), F.col("bucket")))
            * _GRID_W_CENTS
            + _GRID_W_CENTS // 2
        )
        return (est_cents.cast("double") / F.lit(100.0)).alias(alias)

    return cum.groupBy("l_returnflag").agg(
        F.max("n").alias("n_rows"),
        pick("(n + 1) DIV 2", "p50_est"),
        pick("(9 * n + 9) DIV 10", "p90_est"),
        pick("(99 * n + 99) DIV 100", "p99_est"),
    )
