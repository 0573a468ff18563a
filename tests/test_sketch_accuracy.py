"""Accuracy invariants for the rows-only (sketch/seeded) operators.

The six rows-only registry entries are rows-only because their VALUES
are engine-specific by design (HLL and GK sketches, seeded sampling,
MLlib hash families, binary decode). That exempts them from the
cross-engine oracle — not from accuracy: each sketch carries a
documented error bound, and these tests hold the engine to it against
the exact ground truth computed in the same session.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from motorway_spark.queries import QUERIES

from tests.conftest import SF_CORRECT as SF


def test_approx_count_distinct_within_rsd(spark):
    """HLL++ with rsd=0.02 must land within ~3x the configured relative
    standard deviation of the exact count on every group (3 sigma)."""
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in QUERIES["agg_approx_distinct"](spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for flag, n in exact.items():
        rel_err = abs(approx[flag] - n) / n
        assert rel_err <= 3 * 0.02, (flag, approx[flag], n, rel_err)


def test_percentile_approx_within_rank_error(spark):
    """The GK sketch at accuracy=10000 guarantees rank error <=
    n/10000; verify each approximate percentile's TRUE rank sits within
    that band (value-space bounds would be distribution-dependent —
    rank space is the sketch's actual contract)."""
    rows = QUERIES["agg_percentile_approx"](spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    for r in rows:
        flag = r["l_returnflag"]
        vals = [
            x["l_extendedprice"]
            for x in li.where(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        ]
        vals.sort()
        n = len(vals)
        tol = n / 10_000 + 1
        for q, got in (("p50", r["p50"]), ("p90", r["p90"]), ("p99", r["p99"])):
            target_rank = {"p50": 0.5, "p90": 0.9, "p99": 0.99}[q] * n
            # rank of the returned value in the exact ordering
            import bisect

            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            # some rank in [lo, hi] must be within tolerance of target
            nearest = min(abs(lo - target_rank), abs(hi - target_rank))
            if lo <= target_rank <= hi:
                nearest = 0
            assert nearest <= tol, (flag, q, got, nearest, tol)


def test_sample_fraction_proportion_and_subset(spark):
    """Seeded Bernoulli sampling: the draw must be a true subset of the
    table and its size within 5 sigma of Binomial(n, 0.1)."""
    sample = QUERIES["sample_fraction"](spark, SF)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = li.count()
    k = sample.count()
    mean, sigma = 0.1 * n, (n * 0.1 * 0.9) ** 0.5
    assert abs(k - mean) <= 5 * sigma, (k, mean, sigma)
    assert (
        sample.join(
            li.select("l_orderkey", "l_linenumber"),
            ["l_orderkey", "l_linenumber"],
            "left_anti",
        ).count()
        == 0
    )


def _canon_rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_rows_only_queries_are_rerun_deterministic(spark):
    """The driver's rows-only check hashes result rows — a rows-only
    query that drifts between invocations would flake the gate. Pin
    rerun-determinism for the remaining rows-only entries (fixed MLlib
    seeds, deterministic decode stub, seeded sampler) by running each
    twice in one session."""
    for name in (
        "sim_ann_ivf",
        "multimodal_decode_features",
        "sample_fraction",
        "agg_approx_distinct",
        "agg_percentile_approx",
    ):
        first = _canon_rows(QUERIES[name](spark, SF))
        second = _canon_rows(QUERIES[name](spark, SF))
        assert first == second, name


def test_mllib_minhash_oracle_constants_match_fitted_model(spark):
    """dedup_minhash_mllib's oracle inlines MLlib's seed-42 hash
    coefficients as SQL literals (r5: rows-only → full oracle). Pin that
    the inlined constants and the affine formula reproduce a freshly
    FITTED model's transform output bit-for-bit, and that
    approxSimilarityJoin's threshold is strict < (a pair at exactly the
    threshold distance is excluded) — the two facts the oracle's
    exactness rests on."""
    from pyspark.ml.feature import MinHashLSH
    from pyspark.ml.linalg import Vectors

    from motorway_spark.queries.dedup import (
        MLLIB_LSH_A,
        MLLIB_LSH_B,
        MLLIB_LSH_PRIME,
    )

    sets = {0: [1, 5, 16000], 1: [2, 9999]}
    df = spark.createDataFrame(
        [(k, Vectors.sparse(1 << 14, xs, [1.0] * len(xs))) for k, xs in sets.items()],
        ["id", "features"],
    )
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(df)
    got = {r["id"]: [int(v[0]) for v in r["hashes"]] for r in model.transform(df).collect()}
    for k, xs in sets.items():
        mine = [
            min(((1 + x) * a + b) % MLLIB_LSH_PRIME for x in xs)
            for a, b in zip(MLLIB_LSH_A, MLLIB_LSH_B)
        ]
        assert mine == got[k], k

    # strict-< threshold: jaccard({1},{1,2}) = 0.5 exactly -> dist 0.5
    pair_df = spark.createDataFrame(
        [(0, Vectors.sparse(16, [1], [1.0])), (1, Vectors.sparse(16, [1, 2], [1.0, 1.0]))],
        ["id", "features"],
    )
    m2 = MinHashLSH(inputCol="features", outputCol="h", numHashTables=8, seed=42).fit(pair_df)
    at_threshold = (
        m2.approxSimilarityJoin(pair_df, pair_df, 0.5, distCol="d")
        .filter("datasetA.id < datasetB.id")
        .count()
    )
    above_threshold = (
        m2.approxSimilarityJoin(pair_df, pair_df, 0.51, distCol="d")
        .filter("datasetA.id < datasetB.id")
        .count()
    )
    assert at_threshold == 0 and above_threshold == 1


def test_embedding_quality_stats_flags_crafted_defects(spark, tmp_path):
    """r5: the vector-column QA gate must actually flag each defect
    class — wrong dimension, NaN component, zero vector, low norm —
    exercised end-to-end on a crafted embeddings table (the Catalog is
    lazy, so a dir with only embeddings.parquet suffices)."""
    import math

    from motorway_spark.queries import QUERIES

    dim = 64
    good = [1.0] + [0.0] * (dim - 1)            # norm2 = 1
    rows = [
        (0, good, 0),
        (1, [0.0] * dim, 0),                     # zero vector
        (2, [float("nan")] + [0.0] * (dim - 1), 0),  # NaN component
        (3, [0.1] + [0.0] * (dim - 1), 0),       # low norm (0.01 < 0.25)
        (4, [1.0] * 10, 1),                      # wrong dimension
        (5, [2.0] + [0.0] * (dim - 1), 1),       # norm2 = 4
        (6, [None] + [1.0] * (dim - 1), 1),      # NULL component (r5 review)
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {
        r["label"]: r
        for r in QUERIES["embedding_quality_stats"](spark, str(tmp_path)).collect()
    }
    l0, l1 = out[0], out[1]
    assert l0["n_vectors"] == 4 and l0["n_bad_dim"] == 0
    assert l0["n_nonfinite"] == 1 and l0["n_zero"] == 1
    # zero + low-norm; the NaN vector is flagged invalid, so norm2 is
    # NOT computed for it (NULL-skip vs NULL-propagate divergence
    # between the engines' sums — the r5 review finding)
    assert l0["n_low_norm"] == 2
    assert l0["min_norm2"] == 0.0
    assert l0["max_norm2"] == 1.0  # the clean unit vector; NaN excluded
    assert l1["n_vectors"] == 3 and l1["n_bad_dim"] == 1
    # the NULL-component vector is a counted defect, not a silent pass
    assert l1["n_nonfinite"] == 1
    assert l1["min_norm2"] == 4.0 and l1["max_norm2"] == 4.0
    assert not any(
        v is not None and math.isnan(v)
        for r in out.values()
        for v in (r["min_norm2"], r["max_norm2"])
    )


def test_semdedup_within_cell_only(spark, tmp_path):
    """r5: dedup_semantic_semdedup must (a) drop a vector whose lower-id
    CELL-MATE is cosine-similar, naming it dup_of, and (b) KEEP a
    similar pair that lands in different cells — the published SemDeDup
    approximation — pinned on a crafted fixture where cell assignment
    and cosines are hand-computable. The codebook is vec_ids 100-107."""
    from motorway_spark.queries import QUERIES
    from motorway_spark.queries.similarity import IVF_CENTROID_LO, SEM_TAU

    assert IVF_CENTROID_LO == 100 and SEM_TAU == 0.3
    dim = 64

    def unit(ix_w):  # sparse unit-ish vector from {index: weight}
        v = [0.0] * dim
        for i, w in ix_w.items():
            v[i] = w
        n = sum(x * x for x in v) ** 0.5
        return [x / n for x in v]

    rows = [(100 + k, unit({k: 1.0}), 0) for k in range(8)]  # orthogonal codebook
    rows += [
        (0, unit({0: 1.0}), 0),            # cell 0
        (1, unit({0: 0.9, 1: 0.1}), 0),    # cell 0, cos(v0,v1)≈0.994 -> dup of 0
        (2, unit({1: 0.8, 0: 0.6}), 0),    # nearest centroid e2 -> cell 1,
                                           # cos(v2,v0)=0.6 >= tau but KEPT
        (3, [0.0] * dim, 0),               # zero vector: no cosine exists ->
                                           # semantic dedup must ABSTAIN (keep)
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {
        r["vec_id"]: r
        for r in QUERIES["dedup_semantic_semdedup"](spark, str(tmp_path)).collect()
    }
    assert len(out) == 12
    assert out[3]["keep"] is True and out[3]["dup_of"] is None  # abstained
    assert out[0]["cell"] == 0 and out[0]["keep"] is True
    assert out[1]["cell"] == 0 and out[1]["keep"] is False
    assert out[1]["dup_of"] == 0 and out[1]["dup_cosine"] > 0.99
    assert out[2]["cell"] == 1 and out[2]["keep"] is True  # cross-cell miss
    # codebook vectors participate too: 100 == v0 exactly (dup of 0),
    # 101 has cos 0.8 with its cell-mate v2 (dup of 2); the rest are
    # orthogonal to everything and survive
    assert out[100]["keep"] is False and out[100]["dup_of"] == 0
    assert out[101]["keep"] is False and out[101]["dup_of"] == 2
    assert all(out[100 + k]["keep"] is True for k in range(2, 8))
