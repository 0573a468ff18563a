"""Join operator coverage: all join types + TPC-H-shaped multi-way joins.

SURVEY.md §2b "Joins" row. The reference has no joins at all (its users
would hand-roll them inside intersections); this module declares the full
relational join surface as first-class engine operators.

Scale notes (100 TB design point):
- fact⋈fact (lineitem⋈orders) is a shuffled sort-merge/hash join on the
  key — AQE picks the strategy and splits skewed partitions.
- fixed-size dims (region: 5, nation: 25 rows at ANY scale factor) are
  explicitly ``broadcast()`` so a 6-way TPC-H join plan shuffles only the
  fact tables, never the dims.
- semi/anti joins are declared as such (left_semi/left_anti) rather than
  join+distinct, so Spark can stop probing per key at first match and
  never materializes the right side's payload columns.
- the as-of join is NOT a self-join: it is one shuffle by user + one
  in-partition sort with a range-frame window (strictly-prior carry-
  forward), which is the scalable formulation for billions of events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query
from motorway_spark.queries.helpers import dec, dsum, sql_dsum


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way join + agg + deterministic top-10.
# ---------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           o_orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    cust = cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = cat.orders.filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = cat.lineitem.filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way join with broadcast dims.
# ---------------------------------------------------------------------------
@query(
    "q5_local_supplier",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    # dims: fixed-size at any SF -> broadcast (no shuffle of the fact side
    # for these joins; only lineitem⋈orders⋈customer shuffle on keys).
    nation = F.broadcast(cat.nation)
    region = F.broadcast(cat.region.filter(F.col("r_name") == "ASIA"))
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    return (
        cat.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            cat.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-items ranking (join + agg + top-20).
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = cat.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Outer joins (TPC-H Q13 shape for left outer).
# ---------------------------------------------------------------------------
@query(
    "join_left_outer",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority LIKE '1-%'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(F.col("o_orderpriority").like("1-%"))
    per_cust = (
        cat.customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, c_name
    FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey AND o_totalprice > 450000
    WHERE c_custkey <= 100
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.join(
            cat.customer,
            (F.col("o_custkey") == F.col("c_custkey")) & (F.col("o_totalprice") > 450000),
            "right",
        )
        .filter(F.col("c_custkey") <= 100)
        .select("o_orderkey", "c_name")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1),
         c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY 1)
    SELECT COALESCE(s.nk, c.nk) AS nationkey,
           COALESCE(n_supp, 0) AS n_supp,
           COALESCE(n_cust, 0) AS n_cust
    FROM s FULL OUTER JOIN c ON s.nk = c.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    s = cat.supplier.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count("*").alias("n_supp")
    )
    c = (
        cat.customer.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    return s.join(c, s.nk == c.nk, "full").select(
        F.coalesce(s.nk, c.nk).alias("nationkey"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
    )


# ---------------------------------------------------------------------------
# Semi / anti joins.
# ---------------------------------------------------------------------------
@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: probe stops at first match, right payload never read."""
    cat = Catalog(spark, sf_dir)
    f_orders = cat.orders.filter(F.col("o_orderstatus") == "F")
    return cat.customer.join(
        f_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti: customers with no pending ('P') order. The status
    filter keeps the result nonempty on the fixtures (every customer has
    *some* order), so the anti path is actually exercised."""
    cat = Catalog(spark, sf_dir)
    p_orders = cat.orders.filter(F.col("o_orderstatus") == "P")
    return cat.customer.join(
        p_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_acctbal")


# ---------------------------------------------------------------------------
# Theta join via inline bucket dimension (broadcast nested-loop).
# ---------------------------------------------------------------------------
_BUCKETS = [
    ("tiny", 0.0, 50_000.0),
    ("small", 50_000.0, 150_000.0),
    ("medium", 150_000.0, 300_000.0),
    ("large", 300_000.0, 1e12),
]


@query(
    "join_theta_buckets",
    oracle=f"""
    WITH buckets(bucket, lo, hi) AS (VALUES
      ('tiny', 0.0, 50000.0), ('small', 50000.0, 150000.0),
      ('medium', 150000.0, 300000.0), ('large', 300000.0, 1e12))
    SELECT bucket, COUNT(*) AS n, {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders JOIN buckets ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY bucket
    """,
)
def join_theta_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range-predicate) join against a broadcast inline dim —
    Catalyst plans BroadcastNestedLoopJoin; at 100 TB the fact side
    streams through without any shuffle."""
    cat = Catalog(spark, sf_dir)
    buckets = F.broadcast(
        spark.createDataFrame(_BUCKETS, "bucket string, lo double, hi double")
    )
    return (
        cat.orders.join(
            buckets,
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "sum_price"))
    )


# ---------------------------------------------------------------------------
# As-of join (event-time point-in-time lookup).
# ---------------------------------------------------------------------------
@query(
    "asof_join",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           (SELECT MAX(p.ts) FROM events p
            WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
              AND p.ts < c.ts) AS last_purchase_ts
    FROM events c
    WHERE c.event_type = 'click'
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the most recent strictly-prior purchase
    time for the same user.

    Spark-first formulation: NOT a self-join. One hash exchange on
    user_id + one in-partition sort, then a range-frame window carries the
    last purchase timestamp forward in event time (frame end -1 µs makes
    'strictly prior' exact). O(n log n/partition), no join explosion —
    this survives billions of events per user-day at 100 TB.
    """
    events = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return (
        events.withColumn("last_purchase_ts", F.last(purchase_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_purchase_ts")
    )


# ---------------------------------------------------------------------------
# Broadcast-hint equi join (explicit small-dim broadcast).
# ---------------------------------------------------------------------------
@query(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n_items, {sql_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 10
    GROUP BY p_brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    small_parts = cat.part.filter(F.col("p_size") <= 10)
    return (
        cat.lineitem.join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice", "sum_price"))
    )


# ---------------------------------------------------------------------------
# Correlated-predicate semi join (TPC-H Q4 shape).
# ---------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
    )
    big_lines = cat.lineitem.filter(F.col("l_quantity") > 45)
    return (
        orders.join(big_lines, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Salted join (skew mitigation; exact by construction).
# ---------------------------------------------------------------------------
@query(
    "join_salted_skew",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice', 'revenue')}
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manually salted equi join — the skew lever for when AQE's
    skew-join split isn't available (e.g. a stream-static join) or a
    single key dominates beyond what splitting fixes.

    Fact rows get a deterministic salt in [0, 8); the (smaller) build
    side explodes x8 so every (key, salt) pair exists; the join runs on
    (key, salt), spreading one hot key over 8 reducers. Join output is
    IDENTICAL to the unsalted join (the oracle runs the plain join), so
    correctness never depends on the salt — only shuffle balance does.
    agg_salted_skew (relational.py) is the aggregation-side twin.
    """
    cat = Catalog(spark, sf_dir)
    n_salt = 8
    li = cat.lineitem.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt))
    )
    orders_exp = cat.orders.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        li.join(
            orders_exp,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li["salt"] == orders_exp["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice", "revenue"))
    )


@query(
    "asof_join_nearest",
    oracle="""
    SELECT c.event_id, c.user_id, c.ts,
           (SELECT p.ts FROM events p
            WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
            ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)), p.ts
            LIMIT 1) AS nearest_purchase_ts
    FROM events c
    WHERE c.event_type = 'click'
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof
    direction='nearest'``): for each click, the same user's purchase
    with the smallest |Δt|; ties (equidistant prior/next) take the
    EARLIER purchase — stated in both engines (the oracle's tiebreak is
    ``ORDER BY abs(Δt), p.ts``).

    Spark-first: still not a self-join — the backward and forward
    candidates come from two window frames over the SAME user_id
    exchange and event-time sort (last prior / first following
    purchase, range frames inclusive of the current instant), then one
    CASE picks the closer side. Exact-integer microsecond arithmetic
    throughout; one shuffle, no join explosion, same 100 TB shape as
    ``asof_join``."""
    events = Catalog(spark, sf_dir).events
    us = F.unix_micros("ts")
    w_b = Window.partitionBy("user_id").orderBy(us).rangeBetween(
        Window.unboundedPreceding, 0
    )
    w_f = Window.partitionBy("user_id").orderBy(us).rangeBetween(
        0, Window.unboundedFollowing
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    prior = F.last(purchase_ts, ignorenulls=True).over(w_b)
    nxt = F.first(purchase_ts, ignorenulls=True).over(w_f)
    c_us = F.unix_micros(F.col("ts"))
    p_us = F.unix_micros(prior)
    n_us = F.unix_micros(nxt)
    nearest = (
        F.when(prior.isNull(), nxt)
        .when(nxt.isNull(), prior)
        .when((c_us - p_us) <= (n_us - c_us), prior)
        .otherwise(nxt)
    )
    return (
        events.withColumn("nearest_purchase_ts", nearest)
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "nearest_purchase_ts")
    )


@query(
    "join_null_safe",
    oracle="""
    WITH o AS (
      SELECT NULLIF(o_custkey % 7, 3) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1),
    c AS (
      SELECT NULLIF(c_custkey % 7, 3) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM customer GROUP BY 1)
    SELECT o.bucket, n_orders, n_customers
    FROM o JOIN c ON o.bucket IS NOT DISTINCT FROM c.bucket
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>``): NULL keys match each other
    instead of vanishing — the semantics behind joining on nullable
    business keys (unknown region, missing account) without an
    upstream sentinel rewrite. Catalyst plans ``<=>`` as a HASH join
    key (EqualNullSafe is an equi-key), so this stays a hash/broadcast
    join, not a nested loop — asserted in the plan audit. Oracle: the
    ANSI spelling ``IS NOT DISTINCT FROM``."""
    cat = Catalog(spark, sf_dir)
    o = (
        cat.orders.groupBy(
            F.expr("NULLIF(o_custkey % 7, 3)").alias("bucket")
        ).agg(F.count(F.lit(1)).alias("n_orders"))
    )
    c = (
        cat.customer.groupBy(
            F.expr("NULLIF(c_custkey % 7, 3)").alias("cbucket")
        ).agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return o.join(c, o.bucket.eqNullSafe(c.cbucket)).select(
        "bucket", "n_orders", "n_customers"
    )
