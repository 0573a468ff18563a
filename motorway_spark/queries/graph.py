"""Iterative graph analytics over the TPC-H trade graph.

The engine's iterative-algorithm family: dedup.label_propagation covers
connected components (recursive-CTE oracle); this module adds the other
canonical fixed-point computation — PageRank — in a DETERMINISTIC
integer formulation so the full iteration replays bit-for-bit in the
DuckDB oracle (float PageRank sums contributions in engine-dependent
order; integer "surfer counts" with floor division are order-free).

Graph: the customer<->supplier bipartite graph induced by line items
(who trades with whom), symmetrized — node ids are custkey*2 /
suppkey*2+1 so the two key spaces cannot collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query


PR_ITERS = 3
PR_INIT = 1_000_000  # initial surfers per node
PR_BASE = 150_000    # (1-d) * PR_INIT with d = 0.85
PR_TOP = 20


def _pr_iter_sql(prev: str, cur: str) -> str:
    """One integer-PageRank iteration as SQL (DuckDB // = floor div)."""
    return f"""{cur} AS (
      SELECT e.dst AS node,
             CAST({PR_BASE} + (85 * CAST(SUM(c.cnt // d.deg) AS BIGINT)) // 100
                  AS BIGINT) AS cnt
      FROM edges e
      JOIN {prev} c ON c.node = e.src
      JOIN deg d ON d.node = e.src
      GROUP BY e.dst)"""


# iteration CTE chain generated from PR_ITERS so oracle and Spark loop
# can never drift apart
_PR_ITER_CTES = ",\n    ".join(
    _pr_iter_sql(f"c{i}", f"c{i + 1}") for i in range(PR_ITERS)
)


@query(
    "graph_pagerank_bipartite",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT c_node AS src, s_node AS dst FROM pairs
      UNION ALL
      SELECT s_node AS src, c_node AS dst FROM pairs),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    c0 AS (SELECT node, CAST({PR_INIT} AS BIGINT) AS cnt FROM deg),
    {_PR_ITER_CTES}
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           node // 2 AS key,
           cnt AS score
    FROM c{PR_ITERS}
    ORDER BY cnt DESC, node LIMIT {PR_TOP}
    """,
)
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer<->supplier trade graph, PR_ITERS(=3)
    fixed iterations, INTEGER surfer-count formulation: every node
    starts with 1e6 surfers; each iteration a node sends
    floor(count/degree) along every edge and receives
    150000 + floor(0.85 * sum(incoming)). Floor division and integer
    sums make the fixed point path-independent — no float accumulation
    order to disagree on — so the ENTIRE iteration replays exactly in
    the oracle's unrolled CTE chain. Output: top-PR_TOP(=20) most central
    trade partners (deterministic tie-break on node id).

    Scale shape: one distinct-pair aggregation builds the edge list
    (narrow int keys); degree rides a COUNT window over the same
    src-shuffle (one exchange for edge+degree together, r11 — the
    groupBy+re-join form paid a second edge-sized exchange for the
    same layout); each iteration is an src-keyed join + dst-keyed
    aggregate over the cached, src-partitioned edges. Fixed iteration
    count keeps plan depth bounded; an until-convergence variant would
    localCheckpoint per iteration like dedup.label_propagation does.
    Top-k is TakeOrderedAndProject — no global sort."""
    cat = Catalog(spark, sf_dir)
    pairs = (
        cat.orders.join(
            cat.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionAll(pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst")))
    # Degree as a COUNT window over the src shuffle: ONE edge-sized
    # exchange produces edges+degree already hash-partitioned on src
    # (the groupBy + re-join form paid a second edge-sized exchange —
    # plus an explicit repartition — for the identical layout; r11
    # A/B at sf0.1: 3.4 s -> 2.7 s warm). Every iteration's join then
    # reuses this cached layout and only the (node-sized) counts side
    # shuffles.
    from pyspark.sql import Window

    edges_deg_df = edges.withColumn(
        "deg", F.count("*").over(Window.partitionBy("src"))
    )
    # The edge list (with degree) feeds every iteration AND the init
    # computation — without a persist the expensive orders x lineitem
    # distinct-pair scan re-executes once per plan branch (measured
    # 16.5 s -> 4.0 s at sf1). Registered via the shared CacheRegistry
    # (one live frame per operator; other operators' leftover caches
    # released first — SCALE.md sf10 lesson). LAZY fill (r11): every
    # consumer lives in the caller's ONE collect job, whose first
    # stage over the cache fills it for the rest — the eager count()
    # was a whole extra materialization pass of the edge list.
    from motorway_spark.maintenance import CACHES

    edges_deg = CACHES.persist_swap(
        "pagerank.edges", edges_deg_df, eager=False
    )
    counts = (
        edges_deg.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.lit(PR_INIT).cast("bigint").alias("cnt"))
    )
    for _ in range(PR_ITERS):
        msgs = edges_deg.join(counts, edges_deg.src == counts.node).select(
            "dst", F.expr("cnt div deg").alias("contrib")
        )
        counts = (
            msgs.groupBy("dst")
            .agg(
                (F.lit(PR_BASE) + F.expr("(85 * sum(contrib)) div 100")).alias("cnt")
            )
            .withColumnRenamed("dst", "node")
        )
    top = counts.orderBy(F.desc("cnt"), "node").limit(PR_TOP)
    return top.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.expr("node div 2").alias("key"),
        F.col("cnt").alias("score"),
    )


@query(
    "graph_degree_distribution",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c_node, l_suppkey * 2 + 1 AS s_node
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT c_node AS src, s_node AS dst FROM pairs
      UNION ALL
      SELECT s_node AS src, c_node AS dst FROM pairs),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY src)
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           deg,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1, 2
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer<->supplier trade graph (same
    edge construction as graph_pagerank_bipartite): how many customers
    trade with exactly k suppliers and vice versa — the first diagnostic
    run on any graph (hub detection, skew sizing for the iterative
    algorithms, the power-law check that says whether pagerank-style
    propagation will have hot keys).

    Scale shape: distinct-pair aggregation -> per-node count -> a
    histogram over at most max-degree rows; every shuffle carries narrow
    int keys and both aggregations are map-side combinable. Integer
    counts end to end — exact cross-engine by construction."""
    cat = Catalog(spark, sf_dir)
    pairs = (
        cat.orders.join(cat.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c_node").alias("src")).unionAll(
        pairs.select(F.col("s_node").alias("src"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.groupBy(
            F.when(F.col("src") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            "deg",
        )
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation).
# ---------------------------------------------------------------------------
# Co-purchase support threshold: two parts are connected iff they
# co-occur in at least this many distinct orders. This is the standard
# frequent-pair gate from market-basket mining, and it is also what
# keeps the graph SPARSE at every scale: candidate pairs grow ~sf while
# the pair space grows ~sf^2, so the >=2 support edge count stays
# roughly constant as the corpus scales (measured, SCALE.md) — the
# graph thins rather than densifies.
TRI_MIN_SUPPORT = 2


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH li AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    e AS MATERIALIZED (
      SELECT a.pk AS u, b.pk AS v
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
      HAVING COUNT(*) >= {TRI_MIN_SUPPORT}),
    deg AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node),
    tri AS (
      SELECT COUNT(*) AS t
      FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
    wed AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS w FROM deg)
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           w AS n_wedges,
           t AS n_triangles,
           CASE WHEN w = 0 THEN NULL
                ELSE ROUND(CAST(3 * t AS DOUBLE) / CAST(w AS DOUBLE), 6)
           END AS global_clustering
    FROM tri, wed
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    co-purchase graph (parts connected when they appear together in
    >= TRI_MIN_SUPPORT orders) — the third canonical graph kernel next
    to PageRank and connected components, and the standard
    community-structure diagnostic (transitivity) run before any
    clustering/partitioning decision.

    Spark side uses the DEGREE-ORDERED ORIENTATION algorithm
    (Suri & Vassilvitskii, WWW'11 / Cohen's MapReduce curriculum):
    orient every undirected edge from its lower-(degree, id) endpoint
    to the higher one, producing a DAG whose out-degree is O(sqrt(m));
    then wedges = o1 join o2 on shared source and a triangle closes
    when the third side exists as a DAG edge. Each triangle has exactly
    one 2-out-degree apex in the DAG, so COUNT(*) is exact with no /3
    or /6 correction. The oracle counts the same triangles on the
    id-ordered form (u<v<w chain join) — orientation changes the join
    cost, never the triangle set. The clustering coefficient
    3T / wedges is one integer division rounded at 6 (wedge counts are
    exact integers from the undirected degree table).

    Scale shape (100 TB): the per-order self-join is bounded by
    orders' line counts (<= 7 items -> <= 21 pairs per order, a pure
    map-side expansion); the support gate is one map-side-combinable
    hash agg on (u,v); orientation joins the edge list to the
    node-sized degree table twice (AQE broadcasts it when it fits);
    the wedge join's fan-out is capped by the sqrt(m) out-degree bound
    — the whole point of orienting — instead of the unbounded hub
    degrees of the naive id-ordering. No driver-side state, no
    iteration.
    """
    cat = Catalog(spark, sf_dir)
    li = (
        cat.lineitem.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
    )
    # Per-order pair expansion as a MAP, not a self-join: one shuffle
    # groups each order's distinct parts into a sorted basket
    # (collect_set dedups in-row, so no distinct() pre-shuffle), then
    # nested higher-order transforms emit the i<j pairs in-row — the
    # dedup_chunk_global trick applied to pair generation. Warm
    # wall-clock matches the self-join form at sf0.1 (both bounded by
    # the (u,v) support shuffle) but this shape shuffles lineitem ONCE
    # instead of three times (distinct + both join sides) — the term
    # that matters at 100 TB, where lineitem is the 100-TB table.
    baskets = li.groupBy("ok").agg(F.sort_array(F.collect_set("pk")).alias("pks"))
    pair_arr = F.flatten(
        F.transform(
            F.col("pks"),
            lambda x, i: F.transform(
                F.slice(F.col("pks"), i + 2, F.size(F.col("pks"))),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    e = (
        baskets.select(F.inline(pair_arr))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= TRI_MIN_SUPPORT)
        .select("u", "v")
    )
    # Every downstream frame fans out from e (degree, orientation,
    # wedge, closing) and from deg / the oriented DAG in turn — persist
    # all three through the shared registry (exclusive only on the
    # first: the later two must not release the earlier). All three are
    # edge-/node-sized, the narrowest frames in the plan; without the
    # deg and o persists the union-groupBy degree pass and the two
    # orientation joins re-ran once per output branch (measured 4.7 ->
    # 2.6 s at sf0.1).
    from motorway_spark.maintenance import CACHES

    e = CACHES.persist_swap("triangles.edges", e)
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    deg = CACHES.persist_swap("triangles.deg", deg, exclusive=False)
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    o = CACHES.persist_swap("triangles.oriented", o, exclusive=False)
    o1 = o.select(F.col("src").alias("s"), F.col("dst").alias("a"))
    o2 = o.select(F.col("src").alias("s"), F.col("dst").alias("b"))
    wedges = o1.join(o2, "s").filter(F.col("a") != F.col("b"))
    closing = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    tri = wedges.join(closing, ["a", "b"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    # node count, edge count (sum(deg)/2) and wedge count in ONE pass
    # over the cached node-sized degree table
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.expr("sum(deg) div 2").cast("bigint").alias("n_edges"),
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("bigint").alias("n_wedges"),
    )
    return (
        stats.crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") == 0, F.lit(None).cast("double")
            )
            .otherwise(
                F.round(
                    (F.lit(3) * F.col("n_triangles")).cast("double")
                    / F.col("n_wedges").cast("double"),
                    6,
                )
            )
            .alias("global_clustering"),
        )
    )
