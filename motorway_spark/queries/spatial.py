"""Spatial operators: grid-blocked radius join.

North-star extension: location dedup/linkage ("find records within
distance r") is the spatial instance of the repo's standard
candidate/verify pattern — block into grid cells sized to the radius,
join only neighboring cells, verify exact distance on candidates. The
all-pairs form exists only in the oracle. Reference analogue: none
(motorway has no spatial surface); the blocking shape is the same as
the minhash bucket join and PassJoin segments.

The fixtures carry no coordinates, so points are SYNTHESIZED
deterministically from ``c_custkey`` via the cross-engine md5→int
construction used throughout dedup.py — both engines derive identical
doubles, so even the raw squared distances compare bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query

GEO_WORLD = 100.0  # coordinate range [0, 100) in both axes
GEO_R = 1.0  # join radius == grid cell size: 3x3 neighborhood is complete

# deterministic synthetic coordinate, identical in both engines:
# md5 of a salted key -> 60-bit int -> [0, 1e6) -> scaled double
# NOTE the scientific-notation literals: `1e6` parses as DOUBLE in
# both engines, while `1000000.0` parses as DECIMAL in both — which
# would silently turn the whole coordinate pipeline (and the squared
# distances) into decimal arithmetic with engine-specific scales.
_SPARK_COORD = (
    "CAST(conv(substring(md5(concat('{salt}:', CAST(c_custkey AS STRING))), 1, 15),"
    " 16, 10) AS BIGINT) % 1000000 / 1e6 * 1e2"
)
_SQL_COORD = (
    "(('0x' || substr(md5('{salt}:' || c_custkey), 1, 15))::BIGINT % 1000000)"
    " / 1e6 * 1e2"
)


@query(
    "geo_radius_join",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k,
             {_SQL_COORD.format(salt='lat')} AS lat,
             {_SQL_COORD.format(salt='lon')} AS lon
      FROM customer)
    SELECT a.k AS cust_a, b.k AS cust_b,
           (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
    FROM pts a JOIN pts b ON a.k < b.k
    WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) <= {GEO_R * GEO_R}
    """,
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within planar distance GEO_R of each other
    — the spatial radius self-join, grid-blocked: each point lands in a
    floor-grid cell sized to the radius, side A explodes to its 3x3
    cell neighborhood (9 bounded copies), and the join is CELL-EQUALITY
    (hash join, plan-audited) followed by the exact distance check.
    Complete by construction: cell size >= r means any pair within r
    sits in adjacent cells. Each qualifying pair matches exactly once
    (one (dx,dy) offset hits the partner's cell).

    Scale: candidates are bounded by local density (points per 3x3
    neighborhood), never n² — the oracle runs the quadratic form as
    ground truth. Coordinates are md5-synthesized identically in both
    engines, so the raw squared distances are bit-identical doubles."""
    cust = Catalog(spark, sf_dir).customer
    pts = cust.select(
        F.col("c_custkey").alias("k"),
        F.expr(_SPARK_COORD.format(salt="lat")).alias("lat"),
        F.expr(_SPARK_COORD.format(salt="lon")).alias("lon"),
    ).select(
        "k",
        "lat",
        "lon",
        F.floor("lon").cast("int").alias("cx"),
        F.floor("lat").cast("int").alias("cy"),
    )
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("int").alias("dx"),
        (F.col("id") / 3).cast("int").alias("dy_raw"),
    ).select("dx", (F.col("dy_raw") - 1).alias("dy"))
    a = (
        pts.crossJoin(F.broadcast(offsets))
        .select(
            F.col("k").alias("cust_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            (F.col("cx") + F.col("dx")).alias("jx"),
            (F.col("cy") + F.col("dy")).alias("jy"),
        )
    )
    b = pts.select(
        F.col("k").alias("cust_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist2 = (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b")) + (
        F.col("lon_a") - F.col("lon_b")
    ) * (F.col("lon_a") - F.col("lon_b"))
    return (
        a.join(b, ["jx", "jy"])
        .where(F.col("cust_a") < F.col("cust_b"))
        .withColumn("dist2", dist2)
        .where(F.col("dist2") <= GEO_R * GEO_R)
        .select("cust_a", "cust_b", "dist2")
    )


GEO_KNN_K = 3


@query(
    "geo_knn_within_radius",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k,
             {_SQL_COORD.format(salt='lat')} AS lat,
             {_SQL_COORD.format(salt='lon')} AS lon
      FROM customer),
    cand AS (
      SELECT a.k AS cust, b.k AS neighbor,
             (a.lat - b.lat) * (a.lat - b.lat)
             + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
      FROM pts a JOIN pts b ON a.k <> b.k
      WHERE (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) <= {GEO_R * GEO_R})
    SELECT cust, neighbor, dist2, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY cust
                    ORDER BY dist2, neighbor) AS rn
          FROM cand)
    WHERE rn <= {GEO_KNN_K}
    """,
)
def geo_knn_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point k nearest neighbors within radius GEO_R (k =
    GEO_KNN_K): the same grid-blocked candidate generation as
    ``geo_radius_join`` (directional this time — every point ranks its
    own neighborhood), then a per-point rank bounded INSIDE the shuffle
    (WindowGroupLimit, plan-audited) — a dense cell must not force a
    full per-point sort. Ties on identical distances break on neighbor
    id; distances are bit-identical doubles, so the ranking is
    deterministic cross-engine. Bounded-radius kNN is the exact,
    scale-shaped form — UNBOUNDED kNN needs expanding-ring search or an
    ANN index (sim_ann_* are this repo's vector-space versions)."""
    from pyspark.sql import Window

    cust = Catalog(spark, sf_dir).customer
    pts = cust.select(
        F.col("c_custkey").alias("k"),
        F.expr(_SPARK_COORD.format(salt="lat")).alias("lat"),
        F.expr(_SPARK_COORD.format(salt="lon")).alias("lon"),
    ).select(
        "k", "lat", "lon",
        F.floor("lon").cast("int").alias("cx"),
        F.floor("lat").cast("int").alias("cy"),
    )
    offsets = spark.range(9).select(
        (F.col("id") % 3 - 1).cast("int").alias("dx"),
        ((F.col("id") / 3).cast("int") - 1).alias("dy"),
    )
    a = pts.crossJoin(F.broadcast(offsets)).select(
        F.col("k").alias("cust"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cx") + F.col("dx")).alias("jx"),
        (F.col("cy") + F.col("dy")).alias("jy"),
    )
    b = pts.select(
        F.col("k").alias("neighbor"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist2 = (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b")) + (
        F.col("lon_a") - F.col("lon_b")
    ) * (F.col("lon_a") - F.col("lon_b"))
    cand = (
        a.join(b, ["jx", "jy"])
        .where(F.col("cust") != F.col("neighbor"))
        .withColumn("dist2", dist2)
        .where(F.col("dist2") <= GEO_R * GEO_R)
    )
    w = Window.partitionBy("cust").orderBy("dist2", "neighbor")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= GEO_KNN_K)
        .select("cust", "neighbor", "dist2", "rank")
    )
