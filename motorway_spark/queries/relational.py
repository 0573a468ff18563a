"""Core relational queries: scan → filter → project → aggregate.

Covers SURVEY.md §2b rows "Projection / filter" and "Aggregations", plus
the reference's canonical word-count pipeline
(/root/reference/motorway/tests/sample_pipeline.py:41-56: sentence →
split → per-word count) re-expressed as explode/split/groupBy over the
``documents`` fixture.

Scale notes: every query here is a single scan + single hash aggregate —
partial (map-side) aggregation is automatic in Catalyst, so the shuffle
carries only group keys × partial states, not rows. Filters are plain
column predicates → pushed to the parquet reader (PushedFilters), and
only referenced columns are read (ReadSchema pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query
from motorway_spark.queries.helpers import dec, dsum, davg, sql_dsum, sql_davg


# ---------------------------------------------------------------------------
# Word count — the reference's canonical pipeline (batch form).
# ---------------------------------------------------------------------------
@query(
    "wordcount",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sentence → split → groupBy(word).count().

    Reference: motorway/tests/sample_pipeline.py:41-56 (SentenceSplit +
    WordCount intersections with HashRingGrouper). The grouper's
    consistent-hash routing becomes the hash exchange under groupBy.
    """
    docs = Catalog(spark, sf_dir).documents
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H-style pricing summary (Q1 shape) — flagship aggregate query.
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity', 'sum_qty')},
      {sql_dsum('l_extendedprice', 'sum_base_price')},
      {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
      {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
      {sql_davg('l_quantity', 'avg_qty')},
      {sql_davg('l_extendedprice', 'avg_price')},
      {sql_davg('l_discount', 'avg_disc')},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    disc_price = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 4).alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: tight filter + single global aggregate.
# ---------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}, COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(dec(F.col("l_extendedprice") * F.col("l_discount"))).cast("double"), 4
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / filter coverage: comparison, isin, like, null-safe, between.
# ---------------------------------------------------------------------------
@query(
    "filter_project",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           o_totalprice,
           upper(o_orderpriority) AS priority_uc,
           o_totalprice > 100000 AS is_big
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '1-%'
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_custkey IS NOT NULL
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    return (
        orders.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_orderpriority").like("1-%")
            & F.col("o_totalprice").between(1000, 200000)
            & F.col("o_custkey").isNotNull()
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.upper("o_orderpriority").alias("priority_uc"),
            (F.col("o_totalprice") > 100000).alias("is_big"),
        )
    )


# ---------------------------------------------------------------------------
# Conditional expressions: CASE WHEN / coalesce / nullif.
# ---------------------------------------------------------------------------
@query(
    "case_when",
    oracle="""
    SELECT
      o_orderkey,
      CASE WHEN o_totalprice < 50000 THEN 'small'
           WHEN o_totalprice < 150000 THEN 'medium'
           ELSE 'large' END AS bucket,
      COALESCE(NULLIF(o_orderstatus, 'P'), 'pending-like') AS status_norm
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending-like")).alias(
            "status_norm"
        ),
    )


# ---------------------------------------------------------------------------
# Aggregation coverage.
# ---------------------------------------------------------------------------
@query(
    "agg_basic",
    oracle=f"""
    SELECT
      l_returnflag,
      COUNT(*) AS n_rows,
      COUNT(DISTINCT l_suppkey) AS n_supp,
      MIN(l_quantity) AS min_qty,
      MAX(l_quantity) AS max_qty,
      {sql_dsum('l_extendedprice', 'sum_price')},
      {sql_davg('l_discount', 'avg_disc')}
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_extendedprice", "sum_price"),
        davg("l_discount", "avg_disc"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT
      o_orderstatus,
      ROUND(stddev_samp(o_totalprice), 4) AS sd_price,
      ROUND(var_samp(o_totalprice), 2) AS var_price,
      ROUND(stddev_pop(o_totalprice), 4) AS sdp_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance; sample + population forms.

    Rounded: Welford vs naive accumulation differ in the last ulps, and
    these are second-moment statistics where exact decimal tricks don't
    apply — rounding to 4dp is the cross-engine contract here.
    """
    orders = Catalog(spark, sf_dir).orders
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
        F.round(F.stddev_pop("o_totalprice"), 4).alias("sdp_price"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations_set
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set, canonicalized by sorting + joining
    (collection order is nondeterministic in any parallel engine)."""
    nation = Catalog(spark, sf_dir).nation
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations_set"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup via pre-aggregation: the full table first collapses to the
    finest grain (one plain groupBy — partial/final hash agg), and the
    rollup's Expand runs over those few partial rows, not the raw table.
    A direct ``rollup`` Expands every input row x3 through the (decimal)
    aggregate — measured 3x slower at sf0.1, and the gap grows with
    table size since Expand cost is O(rows x sets) while this is
    O(rows + groups x sets). Decimal partial sums re-aggregate exactly,
    and NULL group keys land in the same cells either way (grouping
    treats NULL as a value at both levels), so results are identical."""
    li = Catalog(spark, sf_dir).lineitem
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_n"), F.sum(dec("l_quantity")).alias("_s")
    )
    return base.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_s").cast("double"), 4).alias("sum_qty"),
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube via pre-aggregation (see agg_rollup): collapse to the finest
    grain once, cube the partials — Expand x4 over ~8 rows instead of
    the whole table."""
    li = Catalog(spark, sf_dir).lineitem
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_n"), F.sum(dec("l_extendedprice")).alias("_s")
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.sum("_n").alias("n"),
        F.round(F.sum("_s").cast("double"), 4).alias("sum_price"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, l_linenumber,
           COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')},
           CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
                + GROUPING(l_linenumber) AS INT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linenumber), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube sugar over;
    SURVEY.md §2b). Expressed through the SQL surface — Spark's
    DataFrame API exposes only rollup/cube, GROUPING SETS is SQL-only —
    and disambiguated by GROUPING() bits: (flag,status) totals, per-
    linenumber totals, and the grand total. Pre-aggregated to the union
    grain of the sets first (see agg_rollup): the Expand x3 runs over
    ~50 partial rows, not the raw table, in the same single logical
    pass — not three scans unioned."""
    Catalog(spark, sf_dir).register_temp_views(only=("lineitem",))
    return spark.sql(
        """
        WITH base AS (
          SELECT l_returnflag, l_linestatus, l_linenumber,
                 COUNT(*) AS _n,
                 SUM(CAST(l_quantity AS DECIMAL(38,6))) AS _s
          FROM lineitem
          GROUP BY l_returnflag, l_linestatus, l_linenumber
        )
        SELECT l_returnflag, l_linestatus, l_linenumber,
               SUM(_n) AS n,
               ROUND(CAST(SUM(_s) AS DOUBLE), 4) AS sum_qty,
               CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
                    + GROUPING(l_linenumber) AS INT) AS gid
        FROM base
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linenumber), ())
        """
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentile (both engines use linear interpolation)."""
    orders = Catalog(spark, sf_dir).orders
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@query("agg_approx_distinct")  # no oracle: HLL sketches differ per engine by design
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the scale path for
    distinct-counting 100 TB; rows-only check (sketch estimates are
    engine-specific, so no cross-engine value oracle is possible)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders")
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS status_O,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS status_F,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts per priority × status. The pivot
    value list is declared explicitly — at 100 TB an implicit pivot
    would first run a distinct scan to discover values."""
    orders = Catalog(spark, sf_dir).orders
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


@query(
    "unpivot_metrics",
    oracle="""
    SELECT s_suppkey, metric, val FROM (
      SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS val FROM supplier
      UNION ALL
      SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE) FROM supplier)
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): columns to (metric, value) rows."""
    supplier = Catalog(spark, sf_dir).supplier
    return (
        supplier.select(
            "s_suppkey",
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot(
            ids=["s_suppkey"],
            values=["acctbal", "nationkey"],
            variableColumnName="metric",
            valueColumnName="val",
        )
    )


@query("sample_fraction")  # rows-only: sampling is seeded but partitioning-dependent
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed — reproducible within one
    engine/partitioning, not across engines (hence rows-only)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")


@query(
    "agg_salted_skew",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: phase 1 groups by
    (key, salt) spreading each hot key over 16 reducers; phase 2 merges
    partials per key. Result is identical to the direct groupBy (decimal
    sums are exact ⇒ associative), and the oracle proves it. This is the
    manual pattern for when AQE skew handling isn't available (e.g.
    streaming aggs); batch plans normally just rely on AQE."""
    li = Catalog(spark, sf_dir).lineitem
    salted = li.withColumn("_salt", F.crc32(F.col("l_orderkey").cast("string")) % 16)
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum(dec("l_quantity")).alias("pq"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pq").cast("double"), 4).alias("sum_qty"),
    )


@query("agg_percentile_approx")  # no oracle: quantile sketches differ per engine
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (quantile sketch) — the scale path for
    percentiles over 100 TB: a bounded-memory mergeable sketch per
    partition instead of a full sort. Rows-only check (sketch results
    are engine-specific); agg_percentile is the exact twin the oracle
    verifies. Returned as three scalar columns (not array<double>) so
    the rows-only checker can hash the rows."""
    li = Catalog(spark, sf_dir).lineitem
    pcts = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10_000).cast(
        "array<double>"
    )
    return li.groupBy("l_returnflag").agg(
        F.element_at(pcts, 1).alias("p50"),
        F.element_at(pcts, 2).alias("p90"),
        F.element_at(pcts, 3).alias("p99"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2)
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY n DESC, o_orderpriority DESC) AS rn
          FROM c)
    WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: most frequent order priority per status,
    ties broken toward the lexicographically LARGEST value. Spark's
    built-in ``mode()``/``max_by`` leave ties engine- and
    partitioning-dependent; aggregating ``MAX(struct(count, value))``
    states the tiebreak in the aggregate itself (struct ordering is
    lexicographic), stays a two-level hash aggregate with map-side
    combine, and needs no window sort."""
    orders = Catalog(spark, sf_dir).orders
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    best = counts.groupBy("o_orderstatus").agg(
        F.max(F.struct(F.col("n"), F.col("o_orderpriority"))).alias("best")
    )
    return best.select(
        "o_orderstatus",
        F.col("best.o_orderpriority").alias("mode_priority"),
        F.col("best.n").alias("n"),
    )


@query(
    "agg_bool_logic",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity <= 50) AS all_qty_in_range,
           bool_or(l_discount > 0.08) AS any_deep_discount,
           bool_and(l_shipdate IS NOT NULL) AS all_dated,
           CAST(COUNT(*) FILTER (WHERE l_tax > l_discount) AS BIGINT) AS n_tax_gt_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bool_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: ``bool_and``/``bool_or`` (ANSI
    EVERY/ANY) + filtered counts — the predicates-over-groups form every
    validation rollup uses (dq_checks is the table-level version; this
    is per-group). Pure codegen, partial+final hash agg."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") <= 50).alias("all_qty_in_range"),
        F.bool_or(F.col("l_discount") > 0.08).alias("any_deep_discount"),
        F.bool_and(F.col("l_shipdate").isNotNull()).alias("all_dated"),
        F.expr("count_if(l_tax > l_discount)").alias("n_tax_gt_disc"),
    )


@query(
    "agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))
                          * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
                 6) AS wavg_discount,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted average discount per return flag — the weighted
    mean every finance rollup needs (a plain AVG over-weights small
    orders). Weight products and both sums accumulate as exact
    decimals sized so products stay inside 38 digits (the
    agg_corr_regression rule), then ONE double division — deterministic
    cross-engine, single scan, map-side combinable."""
    li = Catalog(spark, sf_dir).lineitem
    disc = F.col("l_discount").cast("decimal(18,4)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(disc * price).cast("double") / F.sum(price).cast("double"), 6
        ).alias("wavg_discount"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "basket_brand_affinity",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS o, p_brand AS b
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    totals AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM ob),
    brand_n AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM ob GROUP BY b),
    pairs AS (
      SELECT a.b AS brand_a, c.b AS brand_b, CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ob a JOIN ob c ON a.o = c.o AND a.b < c.b
      GROUP BY a.b, c.b)
    SELECT brand_a, brand_b, n_both,
           CAST(n_both AS DOUBLE) / CAST(t.n AS DOUBLE) AS support,
           CAST(n_both AS DOUBLE) * CAST(t.n AS DOUBLE)
             / (CAST(na.nb AS DOUBLE) * CAST(nc.nb AS DOUBLE)) AS lift
    FROM pairs
    JOIN brand_n na ON brand_a = na.b
    JOIN brand_n nc ON brand_b = nc.b
    CROSS JOIN totals t
    """,
)
def basket_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over orders: for every unordered brand
    pair, co-purchase support and LIFT (observed co-occurrence vs the
    independence expectation) — the association-rule statistic behind
    recommendation/bundling analysis. The self-join runs on the
    DEDUPLICATED (order, brand) table (fan-out bounded by brands per
    order, ~line count), brand marginals joined back WITHOUT a forced
    broadcast hint — the marginal table is vocabulary-sized (25 TPC-H
    brands) but a hint would bake in the assumption that the catalog
    fits in executor memory; AQE broadcasts it at runtime when the
    measured size allows (plan-audited at fixture scale). Output is
    C(|brands|, 2) rows at any data size. Support and lift are single
    fixed IEEE expressions over exact integer counts."""
    cat = Catalog(spark, sf_dir)
    # ob feeds four plan branches — deliberately NOT persisted: the
    # same-session interleaved A/B at sf0.1 read 3.66 s original vs
    # 4.26 s with the ob persist (the branches execute concurrently
    # inside one job on idle cores; the eager fill serializes — guide
    # §5/§1.3: cache only when recompute is measurably dearer).
    ob = (
        cat.lineitem.join(
            cat.part, F.col("l_partkey") == F.col("p_partkey")
        )
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    totals = ob.agg(F.count_distinct("o").alias("n"))
    brand_n = ob.groupBy("b").agg(F.count(F.lit(1)).alias("nb"))
    pairs = (
        ob.select(F.col("o"), F.col("b").alias("brand_a"))
        .join(ob.select(F.col("o"), F.col("b").alias("brand_b")), "o")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            brand_n.select(F.col("b").alias("brand_a"), F.col("nb").alias("na")),
            "brand_a",
        )
        .join(
            brand_n.select(F.col("b").alias("brand_b"), F.col("nb").alias("nc")),
            "brand_b",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            (F.col("n_both").cast("double") / F.col("n").cast("double")).alias("support"),
            (
                F.col("n_both").cast("double") * F.col("n").cast("double")
                / (F.col("na").cast("double") * F.col("nc").cast("double"))
            ).alias("lift"),
        )
    )


@query(
    "nation_revenue_yoy",
    oracle="""
    WITH yearly AS (
      SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, year(o_orderdate))
    SELECT n_name, yr,
           ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
           CAST(lag(rev) OVER w AS DOUBLE) / CAST(rev AS DOUBLE) AS prev_ratio_inv,
           CASE WHEN lag(rev) OVER w IS NULL THEN NULL
                ELSE CAST(rev AS DOUBLE) / CAST(lag(rev) OVER w AS DOUBLE) - 1e0
           END AS yoy_growth
    FROM yearly
    WINDOW w AS (PARTITION BY n_name ORDER BY yr)
    """,
)
def nation_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation — the standard BI trend
    metric: yearly exact-decimal revenue, then a lag window per nation
    and one IEEE division for the growth rate (NULL for each nation's
    first year). Windows order |nations| x |years| aggregate rows,
    never raw orders; dims broadcast into the yearly rollup."""
    from pyspark.sql import Window as W

    cat = Catalog(spark, sf_dir)
    yearly = (
        cat.orders.join(
            cat.customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = W.partitionBy("n_name").orderBy("yr")
    prev = F.lag("rev").over(w)
    return yearly.select(
        "n_name",
        "yr",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        (prev.cast("double") / F.col("rev").cast("double")).alias("prev_ratio_inv"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(F.col("rev").cast("double") / prev.cast("double") - 1.0)
        .alias("yoy_growth"),
    )


@query(
    "agg_median_mad",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS priority,
             CAST(o_totalprice AS DOUBLE) AS v
      FROM orders),
    med AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n, median(v) AS med
      FROM base GROUP BY priority)
    SELECT m.priority, m.n, ROUND(m.med, 6) AS median_price,
           ROUND(median(ABS(b.v - m.med)), 6) AS mad_price
    FROM base b JOIN med m ON b.priority = m.priority
    GROUP BY m.priority, m.n, m.med
    """,
)
def agg_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/spread per order priority: exact median order
    value and the median absolute deviation around it — the outlier-
    immune (50% breakdown point) twin of mean/stddev that monitoring
    and data-quality gates prefer on heavy-tailed value columns.

    Two-pass shape: medians are EXACT order statistics (both engines
    interpolate even-count medians as the mean of the two middle
    values — identical IEEE (a+b)/2 over doubles cast from exact
    decimals), so pass 1 computes each group's median, pass 2 joins it
    back (broadcast — one row per group) and takes the median of
    absolute deviations. Scale shape: exact medians need a per-group
    sort — two shuffles of (group, value) pairs, never wider; at
    100 TB the drop-in approximation is percentile_approx (see
    agg_percentile_approx + ROWS_ONLY.md for why the exact form is the
    oracle-able one)."""
    base = (
        Catalog(spark, sf_dir)
        .orders.select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").cast("double").alias("v"),
        )
    )
    med = base.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"), F.expr("median(v)").alias("med")
    )
    return (
        base.join(F.broadcast(med), "priority")
        .groupBy("priority", "n", "med")
        .agg(F.round(F.expr("median(ABS(v - med))"), 6).alias("mad_price"))
        .select(
            "priority",
            "n",
            F.round("med", 6).alias("median_price"),
            "mad_price",
        )
    )
