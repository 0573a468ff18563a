"""Similarity search over embedding vectors (array<float> column).

North-star extension (BASELINE.json): brute-force cosine top-k as the
exactness baseline, plus an LSH-bucketed variant as the scale path.

Determinism: dot products fold left-to-right in doubles in BOTH engines
(Spark ``aggregate`` / DuckDB ``list_sum∘list_transform∘list_zip`` are
sequential over the list), so the raw doubles are bit-identical; results
round to 6dp and tie-break on vec_id, making top-k stable cross-engine.

Scale shape: brute-force is O(n·q) dot products — fine for reranking,
wrong for candidate generation at 100 TB. The LSH variant buckets by
sign-pattern of h random hyperplane projections: candidates share a
bucket, exact rerank only inside buckets. Hyperplanes are generated
once on the driver from a fixed seed and inlined as literals —
deterministic and broadcast-free (they live in the plan itself).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from motorway_spark.catalog import Catalog
from motorway_spark.queries.helpers import scale_partitions, scale_partitions_df
from motorway_spark.queries.registry import query

N_QUERIES = 20  # vec_id < 20 are the query vectors
TOP_K = 5


DIM = 64  # embeddings fixture dimension (FIXTURES.md §3)

# Row-level vector validity: the numpy kernels (matmul/LSH/IVF/semdedup)
# convert Arrow batches with np.array(..., dtype=float64), which throws
# on NULL or ragged rows — so every kernel filters to valid vectors and
# ABSTAINS on the rest (their rows simply don't participate), and each
# paired oracle applies the IDENTICAL predicate. Element-level defects
# (NaN/NULL components) are embedding_quality_stats' job — kernels
# assume a QA-gated column, as the docstrings state.
_VALID_VEC_SQL = "embedding IS NOT NULL AND len(embedding) = 64"


def _valid_vectors(df: DataFrame) -> DataFrame:
    return df.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == DIM)
    )


def _dot(a: Column | str, b: Column | str) -> Column:
    """Unrolled left-to-right dot product. The naive ``F.aggregate``
    fold is an interpreted Catalyst HOF (~10x slower); a 64-term
    addition chain is whole-stage-codegen'd AND keeps the exact
    left-to-right summation order of DuckDB's list fold, so doubles
    stay bit-identical cross-engine.

    Built as ONE ``F.expr`` string: composing 64 terms with Column
    operators costs ~192 py4j round-trips (~1 s of driver time per
    plan build, measured); one SQL string is a single call."""
    an = a if isinstance(a, str) else _col_sql(a)
    bn = b if isinstance(b, str) else _col_sql(b)
    terms = " + ".join(
        f"CAST(element_at({an}, {i}) AS DOUBLE) * CAST(element_at({bn}, {i}) AS DOUBLE)"
        for i in range(1, DIM + 1)
    )
    return F.expr(f"({terms})")


def _norm(a: Column | str) -> Column:
    an = a if isinstance(a, str) else _col_sql(a)
    terms = " + ".join(
        f"CAST(element_at({an}, {i}) AS DOUBLE) * CAST(element_at({an}, {i}) AS DOUBLE)"
        for i in range(1, DIM + 1)
    )
    return F.expr(f"sqrt({terms})")


def _col_sql(col: Column) -> str:
    """Column → SQL fragment (works for simple named columns)."""
    return str(col._jc)  # noqa: SLF001 — py4j Column.toString is the SQL name


_SQL_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)
_SQL_NORM = (
    "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


@query(
    "sim_knn_cosine",
    oracle=f"""
    WITH pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_SQL_DOT.format(a='q.embedding', b='c.embedding')}
                   / ({_SQL_NORM.format(a='q.embedding')}
                      * {_SQL_NORM.format(a='c.embedding')}), 6) AS cosine
      FROM (SELECT * FROM embeddings WHERE {_VALID_VEC_SQL}) q
      JOIN (SELECT * FROM embeddings WHERE {_VALID_VEC_SQL}) c
        ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs)
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM ranked WHERE rn <= {TOP_K}
    """,
)
def sim_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exactness baseline (and the
    reranker inside every ANN scheme). The query side is tiny →
    broadcast, so the corpus streams with no shuffle; top-k per query
    is a bounded window."""
    emb = Catalog(spark, sf_dir).embeddings
    # norms are per-VECTOR, so compute them once on each side instead of
    # per candidate pair — cuts the pair-row expression from 3 unrolled
    # 64-term folds to 1 (smaller codegen, q×n fewer flops)
    q = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm("embedding").alias("q_norm"),
        )
    )
    # the corpus×queries nested-loop amplifies work N_QUERIES-fold, so
    # a single-split corpus file must fan out first (measured: the
    # whole scan otherwise runs on one core at bench SFs)
    par = spark.sparkContext.defaultParallelism
    c = emb.repartition(par).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _norm("embedding").alias("c_norm"),
    )
    cosine = F.round(
        _dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    pairs = (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine)
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@query(
    "sim_pairs_threshold",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND({_SQL_DOT.format(a='a.embedding', b='b.embedding')}
                 / ({_SQL_NORM.format(a='a.embedding')}
                    * {_SQL_NORM.format(a='b.embedding')}), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_SQL_DOT.format(a='a.embedding', b='b.embedding')}
          / ({_SQL_NORM.format(a='a.embedding')}
             * {_SQL_NORM.format(a='b.embedding')}) >= 0.25
    """,
)
def sim_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine ≥ 0.25 (embedding-cosine
    near-dup detection). All-pairs form — the LSH variant below is the
    scale path; this is its exact oracle."""
    emb = Catalog(spark, sf_dir).embeddings
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_emb"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b_emb"))
    cosine = _dot("a_emb", "b_emb") / (_norm("a_emb") * _norm("b_emb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine_raw", cosine)
        .filter(F.col("cosine_raw") >= 0.25)
        .select("vec_a", "vec_b", F.round("cosine_raw", 6).alias("cosine"))
    )


def _hyperplanes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Fixed-seed random hyperplanes, inlined as plan literals."""
    rng = np.random.default_rng(20240613)
    return [[float(v) for v in row] for row in rng.standard_normal((n_planes, dim))]


ANN_TABLES, ANN_BITS = 8, 4
_ANN_PLANES = _hyperplanes(n_planes=ANN_TABLES * ANN_BITS)

# Hyperplanes inlined into the oracle as literal DOUBLE lists — the same
# inline-the-constants trick that made minhash oracle-exact (dedup.MH_A/
# MH_B). repr() prints shortest-round-trip doubles, which DuckDB parses
# back to the identical bits. Each row carries its table id and the bit
# weight 8>>b so the bucket code is one SUM per (vec, table).
_SQL_ANN_PLANES = ",\n      ".join(
    f"({idx // ANN_BITS}, {8 >> (idx % ANN_BITS)},"
    f" [{', '.join(repr(v) for v in row)}])"
    for idx, row in enumerate(_ANN_PLANES)
)


@query(
    "sim_ann_lsh",
    oracle=f"""
    WITH planes(tbl, w, plane) AS (VALUES
      {_SQL_ANN_PLANES}),
    proj AS MATERIALIZED (
      SELECT e.vec_id, p.tbl, p.w,
             {_SQL_DOT.format(a='e.embedding', b='p.plane')} AS d
      FROM (SELECT * FROM embeddings WHERE {_VALID_VEC_SQL}) e
      CROSS JOIN planes p),
    buckets AS MATERIALIZED (
      SELECT vec_id, tbl, SUM(CASE WHEN d > 0 THEN w ELSE 0 END) AS bucket
      FROM proj GROUP BY vec_id, tbl),
    cand AS MATERIALIZED (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buckets q JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
      WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND({_SQL_DOT.format(a='qe.embedding', b='ce.embedding')}
                   / ({_SQL_NORM.format(a='qe.embedding')}
                      * {_SQL_NORM.format(a='ce.embedding')}), 6) AS cosine
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM ranked WHERE rn <= 3
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane (SimHash) LSH, multi-table.

    The standard (k, L) amplification: L=8 independent tables, each
    bucketing on the sign pattern of k=4 hyperplane projections. A
    neighbor at cosine θ collides in one table with p(θ)^k and is
    FOUND if it collides in ANY table: 1-(1-p^k)^L. A single 8-bit
    table (k=8, L=1) measures 2% recall@3 on the fixtures — the
    single-table shortcut silently loses the neighbors it exists to
    find; with (4, 8) recall@3 is ≥60% (tests/test_ann_recall.py holds
    the floor).

    Scale shape: each vector explodes into L (table, bucket) rows; the
    candidate join is (table, bucket)-equality — still a plain shuffle
    join that scales linearly (L× the single-table shuffle, the classic
    recall-vs-cost dial), vs the all-pairs product of
    sim_pairs_threshold. Exact cosine rerank runs only on the deduped
    union of per-table collisions.

    Oracle (upgraded from rows-only in round 4): the hyperplanes are
    fixed-seed driver literals, so they inline into the DuckDB SQL as
    DOUBLE list literals and the sign buckets replay exactly. The
    projection below accumulates dimension-by-dimension (a left fold,
    ~64 vectorized adds per batch) instead of one BLAS matmul: BLAS
    pairwise summation differs from DuckDB's sequential list fold at
    ~1e-15, which is harmless for ROUNDED cosines (sim_knn_matmul) but
    a projection crossing ZERO flips a bucket bit — the fold order must
    match exactly where the output is a sign, not a rounded value.
    """
    import numpy as np
    import pandas as pd

    n_tables, k_bits = ANN_TABLES, ANN_BITS
    emb = _valid_vectors(Catalog(spark, sf_dir).embeddings)
    # 64 × 32 projection matrix rides the closure; ALL table buckets
    # come from ~64 vectorized accumulate steps per Arrow batch. The
    # declarative alternative — 32 unrolled 64-term sign expressions
    # per row — builds a ~10k-node expression tree that blows up
    # analyzer AND codegen (measured 9 s plan build + 12 s exec at
    # sf0.1 vs <1 s here): past a few hundred nodes, vector math
    # belongs in numpy behind mapInPandas, exactly like sim_knn_matmul.
    planes_mat = np.array(_ANN_PLANES, dtype=np.float64).T
    bit_weights = 1 << np.arange(k_bits - 1, -1, -1)

    def assign_buckets(batches):
        for pdf in batches:
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            # left-fold accumulation (see docstring: sign must match
            # DuckDB's sequential fold bit-for-bit)
            proj = np.zeros((vecs.shape[0], planes_mat.shape[1]))
            for i in range(vecs.shape[1]):
                proj += vecs[:, i : i + 1] * planes_mat[i : i + 1, :]
            signs = proj > 0  # batch × (tables·bits)
            out = []
            for t in range(n_tables):
                codes = signs[:, t * k_bits : (t + 1) * k_bits] @ bit_weights
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"],
                            "embedding": pdf["embedding"],
                            "tbl": t,
                            "bucket": codes.astype(np.int32),
                        }
                    )
                )
            yield pd.concat(out)

    # r13: corpus-size-derived fan-out for the Python pass (guide §2)
    par = scale_partitions(spark, sf_dir, "embeddings")
    bucketed = (
        emb.repartition(par)
        .select("vec_id", "embedding")
        .mapInPandas(
            assign_buckets,
            schema="vec_id long, embedding array<float>, tbl int, bucket int",
        )
    )
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "tbl",
        "bucket",
    )
    c = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "tbl",
        "bucket",
    )
    # union of per-table collisions, deduped while keeping the vectors
    # (same one-pass shape as dedup_minhash's pair aggregation)
    cand = (
        q.join(c, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("q_emb").alias("q_emb"), F.first("c_emb").alias("c_emb"))
    )
    cosine = F.round(
        _dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6
    )
    pairs = cand.withColumn("cosine", cosine)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


@query(
    "sim_knn_matmul",
    oracle=f"""
    WITH pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_SQL_DOT.format(a='q.embedding', b='c.embedding')}
                   / ({_SQL_NORM.format(a='q.embedding')}
                      * {_SQL_NORM.format(a='c.embedding')}), 6) AS cosine
      FROM (SELECT * FROM embeddings WHERE {_VALID_VEC_SQL}) q
      JOIN (SELECT * FROM embeddings WHERE {_VALID_VEC_SQL}) c
        ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM pairs)
    SELECT query_id, neighbor_id, cosine, rn AS rank
    FROM ranked WHERE rn <= {TOP_K}
    """,
)
def sim_knn_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k, matmul formulation: the bench/scale
    path. Each Arrow batch of corpus vectors becomes one numpy matrix;
    the (tiny) query matrix rides the closure; one BLAS matmul scores
    the whole batch; per-batch top-k candidates then reduce to global
    top-k with one narrow shuffle of k·|Q| rows per partition.

    Oracle (upgraded from rows-only in round 3): same SQL twin as
    sim_knn_cosine. BLAS pairwise/SIMD accumulation differs from the
    SQL left-fold at ~1e-15 relative error — five orders of magnitude
    below the 6dp rounding granularity — so the ROUNDED cosines and the
    (cosine DESC, neighbor_id) ranks are identical across engines;
    verified at sf0.001/0.01/0.1."""
    import numpy as np
    import pandas as pd

    emb = _valid_vectors(Catalog(spark, sf_dir).embeddings)
    q_rows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in q_rows])
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score_batches(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy()
            c = np.array(list(pdf["embedding"]), dtype=np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            # Round BEFORE per-batch selection: the global rank is over
            # the 6dp-rounded cosine, so pruning on the raw BLAS score
            # could drop a boundary candidate that TIES the k-th kept
            # one at 6dp (and would win the neighbor_id tiebreak).
            # Selecting by rounded value and keeping EVERY candidate at
            # or above the k-th rounded score makes per-batch pruning
            # provably membership-preserving.
            sims = np.round(q_mat @ c.T, 6)  # |Q| x batch
            k = min(TOP_K + 1, sims.shape[1])
            out = []
            for qi, qid in enumerate(q_ids):
                row = sims[qi]
                thresh = np.partition(row, -k)[-k]
                for ci in np.nonzero(row >= thresh)[0]:
                    if ids[ci] != qid:
                        out.append((int(qid), int(ids[ci]), float(row[ci])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine"])

    candidates = emb.select("vec_id", "embedding").mapInPandas(
        score_batches, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


IVF_CELLS = 8
IVF_PROBE = 2
IVF_CENTROID_LO, IVF_CENTROID_HI = 100, 107  # vec_ids of the fixed codebook


@query(
    "sim_ann_ivf_fixed",
    oracle=f"""
    WITH cells AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cent
      FROM embeddings
      WHERE vec_id BETWEEN {IVF_CENTROID_LO} AND {IVF_CENTROID_HI}),
    dists AS MATERIALIZED (
      SELECT e.vec_id, c.cell,
             list_sum(list_transform(range(1, 65),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE)))) AS d
      FROM (SELECT * FROM embeddings WHERE {_VALID_VEC_SQL}) e
      CROSS JOIN cells c),
    assigned AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM dists)
      WHERE rn = 1),
    probe AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM dists WHERE vec_id < {N_QUERIES})
      WHERE rn <= {IVF_PROBE}),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, a.cell
      FROM probe p JOIN assigned a USING (cell)
      WHERE p.query_id <> a.vec_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, cand.cell,
             ROUND({_SQL_DOT.format(a='qe.embedding', b='ce.embedding')}
                   / ({_SQL_NORM.format(a='qe.embedding')}
                      * {_SQL_NORM.format(a='ce.embedding')}), 6) AS cosine
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cell, cosine, rn AS rank
    FROM ranked WHERE rn <= 3
    """,
)
def sim_ann_ivf_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a FIXED coarse codebook — the oracle-exact twin of
    sim_ann_ivf (whose MLlib-k-means centroids are engine/seed-specific
    and keep it rows-only). Standard IVF practice at 100 TB is to train
    the codebook on a tiny sample anyway; the degenerate-but-honest form
    of that is taking {IVF_CELLS} fixed corpus vectors (vec_ids
    100-107, disjoint from the query set) AS the codebook. Everything
    downstream — nearest-cell assignment, {IVF_PROBE}-cell probe, exact
    cosine rerank — is then deterministic and replays bit-for-bit in
    DuckDB.

    Determinism: squared-L2 distances accumulate dimension-by-dimension
    (left fold, the sim_ann_lsh convention) so both engines compare
    IDENTICAL doubles; argmin ties break on cell index in both (numpy
    argmin takes the first minimum; the oracle orders by (d, cell)).

    Scale shape: assignment is one mapInPandas pass (codebook rides the
    closure — 8 vectors, like sim_knn_matmul's query set); the probe
    join is cell-equality — a plain int-key shuffle join; rerank only
    on probed cells' members. Cells are the partition-pruning story for
    vectors: written cell-partitioned, a probe reads n_probe/n_cells of
    the corpus.
    """
    import numpy as np
    import pandas as pd

    emb = _valid_vectors(Catalog(spark, sf_dir).embeddings)
    # one bounded collect serves both the codebook (8 vectors) and the
    # query set (20) — two separate collects would each pay a Spark job
    small = emb.filter(
        (F.col("vec_id") < N_QUERIES)
        | ((F.col("vec_id") >= IVF_CENTROID_LO) & (F.col("vec_id") <= IVF_CENTROID_HI))
    ).select("vec_id", "embedding").collect()
    cent_rows = sorted(
        (r for r in small if r["vec_id"] >= IVF_CENTROID_LO), key=lambda r: r["vec_id"]
    )
    cents = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)

    def _cell_dists(vecs: np.ndarray) -> np.ndarray:
        """Per-dim left-fold accumulated squared L2 to every centroid."""
        acc = np.zeros((vecs.shape[0], cents.shape[0]))
        for i in range(vecs.shape[1]):
            d = vecs[:, i : i + 1] - cents[None, :, i]
            acc += d * d
        return acc

    def assign(batches):
        for pdf in batches:
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            cell = _cell_dists(vecs).argmin(axis=1)  # first-min = lowest cell
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": cell.astype(np.int32),
                }
            )

    # r13: corpus-size-derived fan-out for the Python pass (guide §2)
    par = scale_partitions(spark, sf_dir, "embeddings")
    assigned = (
        emb.repartition(par)
        .select("vec_id", "embedding")
        .mapInPandas(assign, schema="vec_id long, embedding array<float>, cell int")
    )

    # probe list: 20 query vectors x 8 cells — computed on the driver
    # with the SAME accumulation, bounded like sim_knn_matmul's collect
    q_rows = sorted(
        (r for r in small if r["vec_id"] < N_QUERIES), key=lambda r: r["vec_id"]
    )
    q_vecs = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    q_dists = _cell_dists(q_vecs)
    probe_rows = [
        (int(r["vec_id"]), list(r["embedding"]), int(c))
        for r, drow in zip(q_rows, q_dists)
        for c in np.argsort(drow, kind="stable")[:IVF_PROBE]
    ]
    probe = spark.createDataFrame(
        probe_rows, "query_id long, q_emb array<float>, cell int"
    )

    cosine = F.round(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6)
    pairs = (
        probe.join(
            assigned.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_emb"),
                "cell",
            ),
            "cell",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cell", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


@query("sim_ann_ivf")  # rows-only: k-means centroids are engine/seed-specific
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via IVF (inverted-file) coarse quantization — the
    second standard ANN scheme next to sim_ann_lsh, completing the
    LSH/IVF pair every vector store ships.

    MLlib KMeans (fixed seed) learns n_cells centroids; every corpus
    vector is assigned to its nearest cell (the "inverted file"); each
    query probes its n_probe closest cells and exact-reranks only
    those cells' members. Recall/cost dial = n_probe/n_cells.

    Scale shape: training samples a bounded fraction (KMeans over 100 TB
    trains on a sample — standard IVF practice); assignment is one
    broadcast-centroid map pass; the probe join is cell-equality — a
    plain shuffle join on an int key, linear like the LSH variant, vs
    the all-pairs product of sim_pairs_threshold. Cells ARE the
    partition-pruning story for vectors: at 100 TB the corpus would be
    written partitioned by cell id, so a probe reads n_probe/n_cells
    of the data.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    n_cells, n_probe = 8, 2
    emb = _valid_vectors(Catalog(spark, sf_dir).embeddings)
    par = spark.sparkContext.defaultParallelism
    vecs = emb.repartition(par).select(
        "vec_id", "embedding", array_to_vector(F.col("embedding")).alias("features")
    )
    model = KMeans(k=n_cells, seed=20240613, featuresCol="features").fit(vecs)
    assigned = model.transform(vecs).select(
        "vec_id", "embedding", F.col("prediction").alias("cell")
    )

    # per-query probe list: distance from each query to each centroid,
    # keep the n_probe nearest cells (centroids are a tiny local list —
    # the computation is a plan-literal crossjoin-free expression)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    dist_cols = [
        F.expr(
            "("
            + " + ".join(
                f"(CAST(element_at(q_emb, {i+1}) AS DOUBLE) - {c[i]!r}D)"
                f" * (CAST(element_at(q_emb, {i+1}) AS DOUBLE) - {c[i]!r}D)"
                for i in range(DIM)
            )
            + ")"
        ).alias(f"d{ci}")
        for ci, c in enumerate(centers)
    ]
    probe = (
        q.select("query_id", "q_emb", F.array(*dist_cols).alias("dists"))
        .select(
            "query_id",
            "q_emb",
            F.explode(
                F.slice(
                    F.expr(
                        "array_sort(transform(dists, (d, i) -> struct(d AS dist, i AS cell)))"
                    ),
                    1,
                    n_probe,
                )
            ).alias("p"),
        )
        .select("query_id", "q_emb", F.col("p.cell").alias("cell"))
    )
    cosine = F.round(
        _dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6
    )
    pairs = (
        probe.join(
            assigned.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_emb"),
                "cell",
            ),
            "cell",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cell", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Int8 symmetric quantization (vector compression for storage/ANN).
# ---------------------------------------------------------------------------
def _quant_terms(accessor) -> tuple[str, str, str, str]:
    """(scale, checksum, n_saturated, sq_err) SQL fragments, unrolled
    over the 64 dims. ``accessor(i)`` renders the 1-based element
    access for the target engine; every arithmetic step is written
    identically on both sides so doubles stay bit-equal. floor(x+0.5)
    is explicit half-up rounding — ROUND()'s midpoint rule differs
    cross-engine (the fn_math/q2 lesson); floor is exact on doubles."""
    xs = [f"CAST({accessor(i)} AS DOUBLE)" for i in range(1, 65)]
    scale = "GREATEST(" + ", ".join(f"abs({x})" for x in xs) + ")"
    def q(x):
        return f"GREATEST(-127.0, LEAST(127.0, CAST(FLOOR({x} / scale * 127 + 0.5) AS DOUBLE)))"
    checksum = " + ".join(q(x) for x in xs)
    n_sat = " + ".join(f"(CASE WHEN abs({q(x)}) = 127.0 THEN 1 ELSE 0 END)" for x in xs)
    sq_err = " + ".join(
        f"({x} - {q(x)} * scale / 127) * ({x} - {q(x)} * scale / 127)" for x in xs
    )
    return scale, checksum, n_sat, sq_err


_O_SCALE, _O_CHECKSUM, _O_NSAT, _O_SQERR = _quant_terms(lambda i: f"embedding[{i}]")
_S_SCALE, _S_CHECKSUM, _S_NSAT, _S_SQERR = _quant_terms(
    lambda i: f"element_at(embedding, {i})"
)


@query(
    "embedding_quantize_int8",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding, {_O_SCALE} AS scale
               FROM embeddings)
    SELECT vec_id, label,
           ROUND(scale, 8) AS scale_r,
           CAST({_O_CHECKSUM} AS BIGINT) AS q_checksum,
           CAST({_O_NSAT} AS BIGINT) AS n_saturated,
           ROUND(({_O_SQERR}) / 64, 12) AS mse
    FROM v WHERE scale > 0
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the vector-compression
    step before storing/serving embeddings at scale (4x smaller than
    float32, SIMD-friendly dot products): scale = max|x|, q_i =
    clamp(round_half_up(x_i/scale*127)). Output is the quantization
    audit per vector (scale, integer checksum of the quantized codes,
    saturation count, reconstruction MSE) — checksum equality across
    engines proves both produced IDENTICAL int8 codes, not just close
    ones.

    Plan shape: one scan, zero shuffle, fully codegen'd — the 64-dim
    unrolled expressions follow this module's convention (_dot):
    interpreted HOF folds are ~10x slower, and one F.expr string costs
    one py4j call. At 100 TB this runs as a pure map over the
    embedding table; the scale factor rides along for dequantization.
    """
    emb = Catalog(spark, sf_dir).embeddings
    v = emb.select(
        "vec_id", "label", "embedding", F.expr(_S_SCALE).alias("scale")
    ).filter(F.col("scale") > 0)
    return v.select(
        "vec_id",
        "label",
        F.round(F.col("scale"), 8).alias("scale_r"),
        F.expr(_S_CHECKSUM).cast("bigint").alias("q_checksum"),
        F.expr(_S_NSAT).cast("bigint").alias("n_saturated"),
        F.round(F.expr(f"({_S_SQERR}) / 64"), 12).alias("mse"),
    )


# ---------------------------------------------------------------------------
# embedding_random_projection — seeded JL projection 64 -> 4, oracle-exact
# ---------------------------------------------------------------------------

RP_OUT_DIMS = 4


def _rp_matrix() -> list[list[float]]:
    """Fixed-seed Gaussian projection matrix (RP_OUT_DIMS x DIM),
    inlined as plan literals like the ANN hyperplanes."""
    rng = np.random.default_rng(20240815)
    return [
        [float(v) for v in row]
        for row in rng.standard_normal((RP_OUT_DIMS, DIM)) / np.sqrt(RP_OUT_DIMS)
    ]


_RP_ROWS = _rp_matrix()


def _rp_term_chain(acc: str, coefs: list[float]) -> str:
    """One projected component as an unrolled left-to-right chain —
    identical association order in both engines, so the double result
    is bit-exact (repr() literals round-trip to the same bits). ``acc``
    is an element-accessor template with an ``{i}`` placeholder
    (1-based): DuckDB ``embedding[{i}]`` == Spark
    ``element_at(embedding, {i})``."""
    return " + ".join(
        f"CAST({acc.format(i=i + 1)} AS DOUBLE) * {coefs[i]!r}" for i in range(DIM)
    )


@query(
    "embedding_random_projection",
    oracle=f"""
    SELECT vec_id,
      {", ".join(f"ROUND({_rp_term_chain('embedding[{i}]', row)}, 6) AS p{k + 1}"
                 for k, row in enumerate(_RP_ROWS))}
    FROM embeddings
    """,
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection: reduce the 64-dim
    embedding column to RP_OUT_DIMS dims with a fixed-seed Gaussian
    matrix (rows scaled by 1/sqrt(k), so pairwise distances are
    preserved in expectation) — the storage/ANN compaction step that
    runs before coarse indexing. The matrix lives in the plan as
    literals; each output dim is an unrolled 64-term multiply-add chain
    (whole-stage codegen, identical left-to-right IEEE order in DuckDB),
    so results are bit-exact cross-engine before the display rounding.

    Scale shape: a pure per-row map — zero shuffles, zero broadcast
    (the matrix is plan-resident), and column pruning reads only
    (vec_id, embedding). At 100 TB this is scan-bound; the same chain
    shape extends to any k, and for k large enough to matter one
    switches to the BLAS-per-Arrow-batch kernel sim_knn_matmul already
    uses."""
    emb = Catalog(spark, sf_dir).embeddings
    # Spark's element_at == DuckDB's 1-based [] indexing.
    cols = [
        F.round(
            F.expr(_rp_term_chain("element_at(embedding, {i})", row)), 6
        ).alias(f"p{k + 1}")
        for k, row in enumerate(_RP_ROWS)
    ]
    return emb.select("vec_id", *cols)


# ---------------------------------------------------------------------------
# dedup_semantic_semdedup — cluster-then-prune semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------

SEM_TAU = 0.3  # within-cell cosine threshold (fixture vectors are near-
               # orthogonal random points; real corpora use ~0.95+)
SEM_ANCHOR_W = 64  # per-cell anchor width: every vector is compared only
                   # against the W lowest-id members of its cell, so the
                   # pair stage is O(n * W) — the MH_BUCKET_CAP treatment
                   # applied to SemDeDup's within-cluster comparisons



def semdedup_flags(
    spark: SparkSession, codebook_src: DataFrame, vectors: DataFrame
) -> DataFrame:
    """SemDeDup core over any (vec_id, embedding) frame: cells from the
    fixed corpus-vector codebook in ``codebook_src`` (vec_ids
    IVF_CENTROID_LO..HI — the quantizer is trained once on the full
    corpus even when ``vectors`` is a filtered subset), anchor-capped
    within-cell cosine flags for ``vectors``. Shared by the registered
    query and pipeline_corpus_curation; see dedup_semantic_semdedup for
    semantics, determinism, and scale notes."""
    import numpy as np
    import pandas as pd

    cent_rows = sorted(
        _valid_vectors(codebook_src)
        .filter(
            (F.col("vec_id") >= IVF_CENTROID_LO)
            & (F.col("vec_id") <= IVF_CENTROID_HI)
        )
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    cents = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            acc = np.zeros((vecs.shape[0], cents.shape[0]))
            for i in range(vecs.shape[1]):
                d = vecs[:, i : i + 1] - cents[None, :, i]
                acc += d * d  # per-dim left fold == oracle's range() fold
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": acc.argmin(axis=1).astype(np.int32),
                }
            )

    # r13: input-size-derived fan-out for the Python pass (guide §2;
    # frame variant — this helper takes any (vec_id, embedding) frame)
    par = scale_partitions_df(vectors)
    assigned = (
        _valid_vectors(vectors)
        .repartition(par)
        .select("vec_id", "embedding")
        .mapInPandas(assign, schema="vec_id long, embedding array<float>, cell int")
    )
    # assigned feeds three consumers (anchor collect, kernel input,
    # final rollcall) — eager-persist so the assignment map runs once.
    # Lifecycle via the shared CacheRegistry: one live frame per
    # operator, other operators' leftovers released (SCALE.md lesson).
    from motorway_spark.maintenance import CACHES

    assigned = CACHES.persist_swap("semdedup.assigned", assigned)

    # Bounded anchor collect: the W lowest-id members of each cell —
    # at most W*k = 512 vectors (128 KB), the sim_knn_matmul closure
    # pattern. Production replaces the collect with a broadcast.
    w_anchor = Window.partitionBy("cell").orderBy("vec_id")
    anchor_rows = (
        assigned.withColumn("arn", F.row_number().over(w_anchor))
        .filter(F.col("arn") <= SEM_ANCHOR_W)
        .select("vec_id", "cell", "embedding")
        .collect()
    )

    def _fold_dots(m: "np.ndarray", a: "np.ndarray") -> "np.ndarray":
        """(rows x dim) x (anchors x dim) -> rows x anchors, accumulated
        dimension-by-dimension: vectorized left fold, bit-equal to the
        oracle's sequential list_sum."""
        acc = np.zeros((m.shape[0], a.shape[0]))
        for i in range(m.shape[1]):
            acc += m[:, i : i + 1] * a[None, :, i]
        return acc

    by_cell: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for c in sorted({r["cell"] for r in anchor_rows}):
        rows_c = sorted(
            (r for r in anchor_rows if r["cell"] == c), key=lambda r: r["vec_id"]
        )
        ids = np.array([r["vec_id"] for r in rows_c], dtype=np.int64)
        mat = np.array([r["embedding"] for r in rows_c], dtype=np.float64)
        by_cell[c] = (ids, mat)

    def _fold_norms(m: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(m.shape[0])
        for i in range(m.shape[1]):
            acc += m[:, i] * m[:, i]
        return np.sqrt(acc)

    anchor_norms = {c: _fold_norms(mat) for c, (ids, mat) in by_cell.items()}

    def find_dups(batches):
        for pdf in batches:
            out_vb, out_va, out_cos = [], [], []
            for c in pdf["cell"].unique():
                if c not in by_cell:
                    continue
                sub = pdf[pdf["cell"] == c]
                vecs = np.array(list(sub["embedding"]), dtype=np.float64)
                vids = sub["vec_id"].to_numpy()
                a_ids, a_mat = by_cell[c]
                dots = _fold_dots(vecs, a_mat)
                norms = _fold_norms(vecs)
                # zero-norm vectors have no cosine: 0/0 -> NaN, and
                # isfinite excludes them -> semantic dedup abstains
                # (mirrored by the oracle's norm > 0 guards)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / (norms[:, None] * anchor_norms[c][None, :])
                hit_r, hit_a = np.nonzero(
                    np.isfinite(cos)
                    & (cos >= SEM_TAU)
                    & (a_ids[None, :] < vids[:, None])
                )
                out_vb.extend(vids[hit_r])
                out_va.extend(a_ids[hit_a])
                out_cos.extend(cos[hit_r, hit_a])
            yield pd.DataFrame(
                {
                    "vb": pd.Series(out_vb, dtype="int64"),
                    "va": pd.Series(out_va, dtype="int64"),
                    "cos": pd.Series(out_cos, dtype="float64"),
                }
            )

    pairs = assigned.select("vec_id", "cell", "embedding").mapInPandas(
        find_dups, schema="vb long, va long, cos double"
    )
    # winner per vb: max cosine, ties -> lowest va (min over (-cos, va))
    best = (
        pairs.groupBy("vb")
        .agg(
            F.min(
                F.struct((-F.col("cos")).alias("neg"), F.col("va"), F.col("cos"))
            ).alias("w")
        )
        .select(
            F.col("vb").alias("vec_id"),
            F.col("w.va").alias("dup_of"),
            F.col("w.cos").alias("cos"),
        )
    )
    return assigned.select("vec_id", "cell").join(best, "vec_id", "left").select(
        "vec_id",
        "cell",
        F.col("dup_of").isNull().alias("keep"),
        "dup_of",
        F.round("cos", 6).alias("dup_cosine"),
    )



def semdedup_oracle_ctes(vec_src: str) -> str:
    """The SemDeDup assignment/anchor/pair CTE chain as oracle SQL,
    parameterized on the vector-source CTE/table name — shared by the
    dedup_semantic_semdedup and pipeline_corpus_curation oracles so the
    two cannot drift (the SQL twin of the semdedup_flags factoring).
    The pair stage guards both norms > 0: a zero vector has no cosine,
    so semantic dedup ABSTAINS on it in BOTH engines (numpy yields NaN
    — excluded via isfinite; DuckDB would otherwise sort NaN as
    greatest and wrongly drop the vector)."""
    return f"""cells AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, embedding AS cent
      FROM embeddings
      WHERE vec_id BETWEEN {IVF_CENTROID_LO} AND {IVF_CENTROID_HI}),
    dists AS MATERIALIZED (
      SELECT e.vec_id, c.cell,
             list_sum(list_transform(range(1, 65),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cent[i] AS DOUBLE)))) AS d
      FROM (SELECT * FROM {vec_src} WHERE {_VALID_VEC_SQL}) e
      CROSS JOIN cells c),
    assigned AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM dists)
      WHERE rn = 1),
    anchors AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS arn
        FROM assigned)
      WHERE arn <= {SEM_ANCHOR_W}),
    sem_pairs AS (
      SELECT a.vec_id AS va, b.vec_id AS vb, a.cell,
             {_SQL_DOT.format(a='ea.embedding', b='eb.embedding')}
               / ({_SQL_NORM.format(a='ea.embedding')}
                  * {_SQL_NORM.format(a='eb.embedding')}) AS cos
      FROM anchors a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN {vec_src} ea ON ea.vec_id = a.vec_id
      JOIN {vec_src} eb ON eb.vec_id = b.vec_id
      WHERE {_SQL_NORM.format(a='ea.embedding')} > 0
        AND {_SQL_NORM.format(a='eb.embedding')} > 0)"""


@query(
    "dedup_semantic_semdedup",
    oracle=f"""
    WITH {semdedup_oracle_ctes('embeddings')},
    best_lower AS (
      SELECT vb AS vec_id, va AS dup_of, cos FROM (
        SELECT va, vb, cos,
               row_number() OVER (PARTITION BY vb
                                  ORDER BY cos DESC, va) AS rn
        FROM sem_pairs WHERE cos >= {SEM_TAU!r})
      WHERE rn = 1)
    SELECT a.vec_id, a.cell,
           (b.dup_of IS NULL) AS keep,
           b.dup_of,
           ROUND(b.cos, 6) AS dup_cosine
    FROM assigned a LEFT JOIN best_lower b ON a.vec_id = b.vec_id
    """,
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by clustering the
    embedding space, then comparing vectors ONLY within a cluster — the
    modern LLM-corpus pruning step that removes meaning-level duplicates
    exact/minhash dedup can't see. Cells come from the same fixed
    corpus-vector codebook as sim_ann_ivf_fixed (standard practice
    trains the coarse quantizer on a tiny sample); a vector is dropped
    (keep=false) when some LOWER-id anchor cell-mate has cosine >=
    SEM_TAU — the keep-lowest-id rule every dedup op in this engine
    uses — and reports its strongest lower neighbor for audit.

    Determinism: cell assignment accumulates squared-L2 per dimension
    (left fold, first-min argmin — bit-identical to the oracle's
    (d, cell) ordering); dots and norms accumulate per dimension the
    same way (vectorized across rows, sequential over dims — the
    sim_knn_matmul trick), so cos = dot/(na*nb) matches the oracle's
    list-fold doubles bit-for-bit; the dup_of winner orders by
    (cos DESC, id) on those raw doubles.

    Scale shape: the published algorithm's pair stage is O(Σ cell²),
    which at FIXED k is quadratic in n (production SemDeDup scales k
    with the corpus — the paper uses k=50k for LAION — to keep cell
    width constant). This engine applies its standard bounded-candidate
    treatment instead of trusting k: each vector is compared only
    against the SEM_ANCHOR_W lowest-id members of its cell — O(n·W),
    linear — at the cost of missing dups whose only similar lower-id
    mate is a non-anchor (the MH_BUCKET_CAP / df-cap philosophy; the
    cap is replicated in the oracle like every other candidate gate).
    The W·k anchor matrix (512 vectors here) is a bounded collect that
    rides the kernel closure exactly like sim_knn_matmul's query set,
    so there is NO pair join at all: one mapInPandas pass computes each
    batch's cosines against the anchor matrix as k vectorized per-dim
    folds. An earlier draft materialized the pairs through a cell-
    equality join and evaluated the unrolled 64-term cosine chain per
    pair — measured 6 us/row (the chain falls out of codegen at this
    width), 21 s at sf1 vs 2.6 s for this kernel. At fixture scale every
    cell is narrower than W, so capped and published results coincide.
    """
    emb = Catalog(spark, sf_dir).embeddings
    return semdedup_flags(spark, emb, emb)


RANGE_TAU = 0.3  # cosine radius for the range query


@query(
    "sim_range_search",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND({_SQL_DOT.format(a='q.embedding', b='c.embedding')}
                 / ({_SQL_NORM.format(a='q.embedding')}
                    * {_SQL_NORM.format(a='c.embedding')}), 6) AS cosine
    FROM (SELECT * FROM embeddings WHERE {_VALID_VEC_SQL}) q
    JOIN (SELECT * FROM embeddings WHERE {_VALID_VEC_SQL}) c
      ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {N_QUERIES}
      AND {_SQL_DOT.format(a='q.embedding', b='c.embedding')}
          / ({_SQL_NORM.format(a='q.embedding')}
             * {_SQL_NORM.format(a='c.embedding')}) >= {RANGE_TAU}
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) similarity search: EVERY corpus vector within
    cosine >= RANGE_TAU of each query vector — the third query shape a
    vector store serves besides top-k (sim_knn_cosine) and all-pairs
    threshold (sim_pairs_threshold): "give me everything semantically
    close to this", where the caller wants completeness, not a fixed k
    (dedup candidate pull, recall-first retrieval, near-dup audit of a
    specific document).

    Same plan skeleton as sim_knn_cosine minus the window: broadcast
    query side, corpus streams once with per-side precomputed norms, the
    radius predicate filters in-stage — no shuffle at all after the
    fan-out repartition (top-k needed one for its window). The unrolled
    codegen'd dot and the raw-value predicate (round only in the
    projection) keep doubles bit-identical cross-engine. At 100 TB the
    LSH/IVF bucketing (sim_ann_*) generates candidates and this exact
    form reranks them."""
    emb = Catalog(spark, sf_dir).embeddings
    q = F.broadcast(
        _valid_vectors(emb)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm("embedding").alias("q_norm"),
        )
    )
    par = spark.sparkContext.defaultParallelism
    c = _valid_vectors(emb).repartition(par).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _norm("embedding").alias("c_norm"),
    )
    cosine_raw = _dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm"))
    return (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_raw", cosine_raw)
        .filter(F.col("cosine_raw") >= RANGE_TAU)
        .select(
            "query_id", "neighbor_id", F.round("cosine_raw", 6).alias("cosine")
        )
    )


# ---------------------------------------------------------------------------
# Oracle-exact k-means (quantized Lloyd): the FIT half of IVF, replayable —
# plus the full trained-ANN composition (fit -> inverted file -> probe).
# ---------------------------------------------------------------------------
def _km_mean_sql(vec: str) -> str:
    """One centroid component as SQL: integer-exact half-up mean of
    ``{vec}`` (a 1-based element access template) on the micro-unit
    grid. A double-domain mean is NOT cross-engine-stable: the
    DECIMAL(38,6) sum over n rows can make the true mean land EXACTLY
    on a half-microunit (measured: 0.594524/56 = 10616.5 micro), where
    the engines' decimal->double casts differ by an ulp and flip the
    rounding. So u = exact micro-unit sum as BIGINT and mean_micro =
    floor((2u + n) / (2n)) — mathematical half-up in integer
    arithmetic; the one double division is safe because the quotient's
    distance to any integer is 0 or >= 1/(2n), orders of magnitude
    above an ulp, so FLOOR cannot flip.

    The inner CAST(... AS DOUBLE) hop before the decimal cast is load-
    bearing: DuckDB rounds FLOAT->DECIMAL from the float32's SHORTEST
    decimal repr ("0.2563205" -> half-even tie -> 0.256320) while
    Spark widens to double first ("0.2563205063..." -> 0.256321; 4 of
    500 rows measured); widening in SQL makes both engines round the
    same 17-digit value."""
    return (
        f"CAST(FLOOR(CAST(2 * CAST(SUM(CAST(CAST({vec} AS DOUBLE)"
        f" AS DECIMAL(38,6))) * 1000000 AS BIGINT) + COUNT(*) AS DOUBLE)"
        f" / CAST(2 * COUNT(*) AS DOUBLE)) AS DOUBLE) / 1000000.0"
    )


def _km_mean_aggs() -> list[Column]:
    """Spark mirror of _km_mean_sql over the ``embedding`` column."""
    return [
        F.expr(_km_mean_sql(f"element_at(embedding, {i})")).alias(f"m{i}")
        for i in range(1, DIM + 1)
    ]


# DuckDB CTE prefix shared by the fit and the composed ANN query:
# valid corpus, fixed init codebook, assignment 1, quantized means 1,
# assignment 2 (with per-row distance).
def _km_cte_prefix() -> str:
    mean_cols = ", ".join(
        f"{_km_mean_sql(f'e.embedding[{i}]')} AS m{i}" for i in range(1, DIM + 1)
    )
    cent_list = "list_value(" + ", ".join(f"m{i}" for i in range(1, DIM + 1)) + ")"
    # explicit left-associative chain, NOT list_sum: list_sum's fold
    # order is engine-internal (measured 3e-6 drift vs numpy's per-dim
    # accumulation); a `+` chain parses strictly left-to-right, which
    # is exactly the numpy acc-loop order
    dist = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        for i in range(1, DIM + 1)
    )
    return f"""
    WITH valid AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE {_VALID_VEC_SQL}),
    c0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
      FROM embeddings
      WHERE vec_id BETWEEN {IVF_CENTROID_LO} AND {IVF_CENTROID_HI}),
    a1 AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cell) AS rn
        FROM valid e CROSS JOIN c0 c)
      WHERE rn = 1),
    c1 AS MATERIALIZED (
      SELECT cell, {cent_list} AS cent FROM (
        SELECT a1.cell, {mean_cols}
        FROM a1 JOIN valid e USING (vec_id) GROUP BY a1.cell)),
    a2 AS MATERIALIZED (
      SELECT vec_id, cell, d FROM (
        SELECT e.vec_id, c.cell, {dist} AS d,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cell) AS rn
        FROM valid e CROSS JOIN c1 c)
      WHERE rn = 1)"""


def _kmeans_oracle() -> str:
    mean_cols = ", ".join(
        f"{_km_mean_sql(f'e.embedding[{i}]')} AS m{i}" for i in range(1, DIM + 1)
    )
    checksum_sum = " + ".join(f"m{i}" for i in range(1, DIM + 1))
    checksum = (
        f"CAST(FLOOR(({checksum_sum}) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0"
    )
    return f"""{_km_cte_prefix()},
    c2 AS (
      SELECT a2.cell, COUNT(*) AS n_members, {mean_cols}
      FROM a2 JOIN valid e USING (vec_id) GROUP BY a2.cell),
    inert AS (
      -- floor-based grid quantization, NOT ROUND: DuckDB rounds doubles
      -- by scaled multiply while Spark uses exact BigDecimal (the
      -- fn_math/q2 lesson); FLOOR(d*1e6 + 0.5) is the same IEEE ops in
      -- both engines, and the micro-unit sum is exact integer math
      SELECT cell,
             CAST(SUM(CAST(FLOOR(d * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS inertia
      FROM a2 GROUP BY cell)
    SELECT c2.cell, c2.n_members,
           {checksum} AS centroid_checksum, inert.inertia
    FROM c2 JOIN inert USING (cell)
    ORDER BY cell
    """


def _km_assign_factory(cents: "np.ndarray", cells: list[int]):
    """mapInPandas factory: nearest-cell assignment against a fixed
    centroid matrix, per-dim left-fold distances (bit-matches the
    oracle's explicit `+` chain), first-min tiebreak = lowest cell.
    Output schema: vec_id, embedding, cell, d (min squared L2)."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            acc = np.zeros((vecs.shape[0], cents.shape[0]))
            for i in range(vecs.shape[1]):
                d = vecs[:, i : i + 1] - cents[None, :, i]
                acc += d * d
            pos = acc.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": [cells[p] for p in pos],
                    "d": acc[np.arange(len(pos)), pos],
                }
            )

    return fn


_KM_ASSIGN_SCHEMA = "vec_id long, embedding array<float>, cell int, d double"


def _make_micro_halfup():
    """Build _micro_halfup nested-origin for BY-VALUE cloudpickle
    (see _make_leftfold_norms: the fused stats closures must stay
    self-contained on PYTHONPATH-less executors)."""

    def _micro_halfup(vals: "np.ndarray") -> "np.ndarray":
        """Bit-equal replication of Spark's CAST(double AS
        DECIMAL(38,6)) on the int64 micro grid — the per-element
        quantization inside _km_mean_sql's SUM. Spark's cast goes
        scala BigDecimal(double) -> java BigDecimal(Double.toString(d))
        -> setScale(6, HALF_UP): the SHORTEST round-trip decimal repr
        rounded half-up (away from zero) at 6 places. Fast path:
        sign(x) * floor(|x|*1e6 + 0.5) — exact whenever the scaled
        fractional part is not within 1e-4 of the .5 tie (the float
        path's error is ~1e-8 absolute at |x| <= 100, four orders of
        magnitude inside the guard band). Near-ties requantize exactly
        via Decimal(repr(x)) — Python's repr is the same
        shortest-round-trip value as Double.toString. Verified against
        Spark's own cast over the full sf0.1 element domain and a
        synthetic tie ladder (tools/verify_micro_halfup.py, r13)."""
        a = np.abs(vals) * 1000000.0
        out = (np.sign(vals) * np.floor(a + 0.5)).astype(np.int64)
        near = np.abs(a - np.floor(a) - 0.5) < 1e-4
        if near.any():
            import decimal

            q6 = decimal.Decimal("0.000001")
            for idx in np.argwhere(near):
                t = tuple(idx)
                x = float(vals[t])
                out[t] = int(
                    decimal.Decimal(repr(x))
                    .quantize(q6, rounding=decimal.ROUND_HALF_UP)
                    .scaleb(6)
                )
        return out

    return _micro_halfup


_micro_halfup = _make_micro_halfup()


def _micro_mean(u: int, n: int) -> float:
    """Driver-side mirror of _km_mean_sql's closing arithmetic:
    half-up mean on the micro grid from the exact int64 micro sum
    ``u`` and count ``n`` — FLOOR(CAST(2u+n AS DOUBLE)/CAST(2n AS
    DOUBLE)) / 1e6, the identical IEEE ops in the identical order."""
    import math

    return float(math.floor(float(2 * u + n) / float(2 * n))) / 1000000.0


# Fused assignment + training-sums pass (r13, guide §1.2/§4.1): the
# Lloyd update's decimal mean is a half-up micro-grid quantization per
# element followed by an EXACT integer sum — so the mapInPandas
# assignment pass can emit per-cell int64 partial sums (<= IVF_CELLS
# rows x DIM+3 longs per task) instead of shipping the whole corpus
# (vec_id, 64-float embedding, cell, d) back through Arrow into a
# 64-expression DECIMAL(38,6) hash aggregate. The JVM side reduces to
# a trivial bigint sum; the driver finishes with _micro_mean. Payload
# per pass: O(cells * tasks), not O(corpus).
_KM_STATS_SCHEMA = "cell int, n long, dmicro long, " + ", ".join(
    f"s{i} long" for i in range(1, DIM + 1)
)


def _km_assign_stats_factory(
    cents: "np.ndarray", cells: list[int], normalize: bool = False
):
    """mapInPandas factory: nearest-cell assignment (identical
    left-fold distances and first-min tiebreak as _km_assign_factory /
    _resn_assign_factory) fused with the per-cell training statistics:
    member count ``n``, inertia ``dmicro`` (sum of FLOOR(d*1e6+0.5)),
    and ``s1..s{DIM}`` — exact int64 micro sums of the assigned
    vectors' components (normalized components when ``normalize``,
    matching the residual loop's ``element/nrm`` grid)."""
    import pandas as pd

    def fn(batches):
        k = len(cells)
        n_acc = np.zeros(k, dtype=np.int64)
        d_acc = np.zeros(k, dtype=np.int64)
        s_acc = np.zeros((k, DIM), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            base = (
                vecs / _leftfold_norms(vecs)[:, None] if normalize else vecs
            )
            acc = np.zeros((base.shape[0], cents.shape[0]))
            for i in range(base.shape[1]):
                d = base[:, i : i + 1] - cents[None, :, i]
                acc += d * d
            pos = acc.argmin(axis=1)
            dmin = acc[np.arange(len(pos)), pos]
            dmic = np.floor(dmin * 1000000.0 + 0.5).astype(np.int64)
            micro = _micro_halfup(base)
            np.add.at(n_acc, pos, 1)
            np.add.at(d_acc, pos, dmic)
            np.add.at(s_acc, pos, micro)
        live = np.nonzero(n_acc)[0]
        out = {
            "cell": np.array([cells[int(p)] for p in live], dtype="int32"),
            "n": n_acc[live],
            "dmicro": d_acc[live],
        }
        for i in range(DIM):
            out[f"s{i + 1}"] = s_acc[live, i]
        yield pd.DataFrame(out)

    return fn


def _km_stats_rows(stats: DataFrame):
    """Reduce a stats-factory output to the per-cell codebook: returns
    (rows sorted by cell, cells, cents ndarray) where each row carries
    the exact total n / dmicro / micro sums and cents applies
    _micro_mean per component."""
    aggs = [F.sum("n").alias("n"), F.sum("dmicro").alias("dmicro")] + [
        F.sum(f"s{i}").alias(f"s{i}") for i in range(1, DIM + 1)
    ]
    rows = sorted(
        stats.groupBy("cell").agg(*aggs).collect(), key=lambda r: r["cell"]
    )
    cells = [r["cell"] for r in rows]
    cents = np.array(
        [
            [_micro_mean(r[f"s{i}"], r["n"]) for i in range(1, DIM + 1)]
            for r in rows
        ],
        dtype=np.float64,
    ).reshape(-1, DIM)
    return rows, cells, cents


KM_MAX_ITERS = 6      # convergence-looped Lloyd: iteration cap
KM_TOL_MICRO = 25000  # stop when max centroid movement <= 0.025 (micro grid)


def _lloyd_fit(
    spark: SparkSession,
    sf_dir: str,
    max_iters: int,
    tol_micro: int | None = None,
):
    """The generalized Lloyd loop every trained-ANN operator consumes:
    run up to ``max_iters`` iterations of assign -> quantized means,
    stopping early when the max centroid movement (integer micro
    units, computed from the <= {IVF_CELLS}-row collected codebooks)
    drops to ``tol_micro`` — an INTEGER-EXACT criterion both engines
    evaluate identically, so an unrolled oracle reaches the same stop
    iteration. ``tol_micro=None`` runs exactly ``max_iters`` (the
    fixed-iteration consumers: _lloyd_c1 and the 2-iteration fits).

    Returns (corpus, trace, cells, cents): trace is one dict per
    EXECUTED iteration — n_cells, movement_micro (max over cells
    surviving the iteration of the max per-dim |delta|, floor(x*1e6
    + 0.5); iteration 1 diffs against the raw init codebook, all
    later iterations are micro-grid exact), inertia_micro (sum of
    squared assign distances on the micro grid — the cost the loop
    is descending).

    Scale shape (100 TB): per iteration one mapInPandas assignment
    pass (codebook in the closure) + one map-side-combinable hash
    aggregate; the driver sees only the <= {IVF_CELLS}-row codebook
    per iteration — movement/stop is a control-plane decision over
    bounded data, never a data path.

    The corpus persists via the cache registry: Lloyd re-reads it once
    per assignment pass — the canonical iterative-workload caching
    case; without it each pass repeats the scan + repartition shuffle
    (A/B at sf0.1: fit 3.9->3.7 s, composed ANN 4.9->4.0 s). Exclusive
    swap releases prior operators' scopes, and the NEXT operator's
    swap releases this one."""
    import math

    from motorway_spark.maintenance import CACHES

    emb = _valid_vectors(Catalog(spark, sf_dir).embeddings)
    # r13: fan-out width derived from the corpus size (guide §2 —
    # scale-adaptive partitioning): every Lloyd pass is a mapInPandas
    # Python round trip per task, so a core-count constant wastes ~30
    # worker round trips per pass on the sub-MB bench corpus while
    # still under-splitting a 100 TB one.
    par = scale_partitions(spark, sf_dir, "embeddings")
    corpus = CACHES.persist_swap(
        "lloyd.corpus", emb.repartition(par).select("vec_id", "embedding")
    )

    cent_rows = (
        Catalog(spark, sf_dir)
        .embeddings.filter(
            (F.col("vec_id") >= IVF_CENTROID_LO)
            & (F.col("vec_id") <= IVF_CENTROID_HI)
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    cents = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    cells = list(range(IVF_CELLS))

    trace: list[dict] = []
    for it in range(1, max_iters + 1):
        # r13: fused stats pass — per-cell int64 micro sums replace the
        # full-corpus Arrow return + 64-expression decimal aggregate
        # (bit-equal by construction, see _micro_halfup/_micro_mean)
        stats = corpus.mapInPandas(
            _km_assign_stats_factory(cents, cells), schema=_KM_STATS_SCHEMA
        )
        rows, new_cells, new_cents = _km_stats_rows(stats)
        prev = {c: cents[k] for k, c in enumerate(cells)}
        # Degenerate corpus (zero valid vectors) or total cell turnover:
        # no surviving cell to measure movement over. Movement is then
        # UNDEFINED (None), which never satisfies the tolerance, so the
        # loop runs to the cap — matching the oracle, whose MAX over an
        # empty c{i} JOIN c{i-1} is NULL and whose MIN-converged filter
        # therefore falls through to KM_MAX_ITERS. (A movement=0 default
        # here would fake convergence at iteration 1 and diverge.)
        movement: int | None = None
        for k, c in enumerate(new_cells):
            if c in prev:
                for j in range(DIM):
                    dm = int(math.floor(abs(new_cents[k, j] - prev[c][j]) * 1e6 + 0.5))
                    if movement is None or dm > movement:
                        movement = dm
        trace.append(
            {
                "iter": it,
                "n_cells": len(new_cells),
                "movement_micro": movement,
                # SUM over an empty assignment is NULL in the oracle
                "inertia_micro": (
                    sum(r["dmicro"] for r in rows) if rows else None
                ),
            }
        )
        cells, cents = new_cells, new_cents
        if (
            tol_micro is not None
            and movement is not None
            and movement <= tol_micro
        ):
            break
    return corpus, trace, cells, cents


def _lloyd_c1(spark: SparkSession, sf_dir: str):
    """Shared fit prefix: A1 = assign(corpus, C0); C1 = quantized
    means — one iteration of the generalized _lloyd_fit loop (the
    convergence-looped trainer IS the code path the IVF/IVFPQ
    consumers run). Returns (corpus, cells1, C1)."""
    corpus, _trace, cells1, c1 = _lloyd_fit(spark, sf_dir, max_iters=1)
    return corpus, cells1, c1


@query("cluster_kmeans_lloyd", oracle=_kmeans_oracle())
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means clustering with DETERMINISTIC, oracle-replayable training
    — the FIT half of IVF made exact, so the whole train-then-probe ANN
    pipeline carries full oracles (fit here; probe in sim_ann_ivf_fixed;
    the two composed in sim_ann_ivf_lloyd). This is the quantized-Lloyd
    answer to why sim_ann_ivf stays rows-only: MLlib's centroids are an
    opaque function of partitioning and seed internals, but Lloyd's
    update itself is just argmin + mean — expressible identically in two
    engines if (a) init is fixed data (the {IVF_CELLS} codebook vectors,
    vec_ids {IVF_CENTROID_LO}-{IVF_CENTROID_HI}), (b) distances fold
    per-dim left-to-right (the sim_ann_ivf_fixed convention), and (c)
    each new centroid is an integer-exact half-up mean on the micro-unit
    grid (see _km_mean_sql for why a double-domain mean is not enough —
    true half-microunit ties exist and engine casts diverge there).

    Two full iterations: A1 = assign(corpus, C0); C1 = mean(A1);
    A2 = assign(corpus, C1); C2 = mean(A2). Output per surviving cell:
    member count, centroid checksum (sum of C2 components), and
    inertia (sum of A2 squared distances, exact integer micro-units).

    Scale shape (100 TB): assignment is one mapInPandas pass per
    iteration with the codebook in the closure (8x64 doubles — the
    sim_knn_matmul pattern); the update is one {DIM}-column decimal
    hash aggregate (map-side combinable); the only collects are the
    8-row codebooks. Iterations are a fixed constant — the plan is
    K x (map + agg), linear in corpus size, no quadratic term.

    Reference: motorway has no clustering surface; this extends the
    north-star ANN family (SURVEY.md §2b) with the training step every
    IVF deployment needs.
    """
    corpus, cells1, c1 = _lloyd_c1(spark, sf_dir)
    # r13: the A2 aggregate runs as the fused stats pass (per-cell
    # int64 micro sums; see _km_assign_stats_factory) and the 8-row
    # report closes IN the returned plan with the identical
    # arithmetic: each mean replays _km_mean_sql's closing ops
    # (FLOOR((2u+n)/(2n))/1e6 over the exact bigint micro sum),
    # checksum keeps the left-to-right IEEE add chain, inertia =
    # CAST(SUM(dmicro) AS DOUBLE)/1e6. One distributed plan, no
    # driver round trip — the noop/bench action drives it directly.
    stats = corpus.mapInPandas(
        _km_assign_stats_factory(c1, cells1), schema=_KM_STATS_SCHEMA
    )
    agg = stats.groupBy("cell").agg(
        F.sum("n").alias("n_members"),
        F.sum("dmicro").alias("__dm"),
        *[F.sum(f"s{i}").alias(f"u{i}") for i in range(1, DIM + 1)],
    )
    mean_sql = (
        "CAST(FLOOR(CAST(2 * u{i} + n_members AS DOUBLE)"
        " / CAST(2 * n_members AS DOUBLE)) AS DOUBLE) / 1000000.0"
    )
    with_means = agg.selectExpr(
        "cell",
        "n_members",
        "__dm",
        *[f"{mean_sql.format(i=i)} AS m{i}" for i in range(1, DIM + 1)],
    )
    chain = " + ".join(f"m{i}" for i in range(1, DIM + 1))
    return (
        with_means.selectExpr(
            "cell",
            "n_members",
            f"CAST(FLOOR(({chain}) * 1000000.0 + 0.5) AS DOUBLE)"
            " / 1000000.0 AS centroid_checksum",
            "CAST(__dm AS DOUBLE) / 1000000.0 AS inertia",
        )
        .orderBy("cell")
    )


def _km_converged_oracle() -> str:
    """Unrolled {KM_MAX_ITERS}-iteration Lloyd chain with per-iteration
    integer movement — the oracle picks the SAME stop iteration as the
    engine's early-exit loop because the criterion (max per-dim
    centroid delta on the micro grid <= {KM_TOL_MICRO}) is integer
    arithmetic both engines evaluate identically; iterations past the
    stop are generated in the unroll but filtered out by the final
    WHERE (the oracle pays for the full unroll — correctness needs
    only the filter, and the fixture converges well inside the cap)."""
    mean_cols = ", ".join(
        f"{_km_mean_sql(f'e.embedding[{i}]')} AS m{i}" for i in range(1, DIM + 1)
    )
    cent_list = "list_value(" + ", ".join(f"m{i}" for i in range(1, DIM + 1)) + ")"
    dist = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        for i in range(1, DIM + 1)
    )
    ctes = [
        f"""valid AS MATERIALIZED (
      SELECT vec_id, embedding FROM embeddings WHERE {_VALID_VEC_SQL})""",
        f"""c0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
      FROM embeddings
      WHERE vec_id BETWEEN {IVF_CENTROID_LO} AND {IVF_CENTROID_HI})""",
    ]
    move = "greatest(" + ", ".join(
        f"CAST(FLOOR(ABS(a.cent[{i}] - b.cent[{i}]) * 1000000.0 + 0.5)"
        " AS BIGINT)"
        for i in range(1, DIM + 1)
    ) + ")"
    stat_rows = []
    for i in range(1, KM_MAX_ITERS + 1):
        ctes.append(f"""a{i} AS MATERIALIZED (
      SELECT vec_id, cell, d FROM (
        SELECT e.vec_id, c.cell, {dist} AS d,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cell) AS rn
        FROM valid e CROSS JOIN c{i - 1} c)
      WHERE rn = 1)""")
        ctes.append(f"""c{i} AS MATERIALIZED (
      SELECT cell, {cent_list} AS cent FROM (
        SELECT a{i}.cell, {mean_cols}
        FROM a{i} JOIN valid e USING (vec_id) GROUP BY a{i}.cell))""")
        stat_rows.append(
            f"""SELECT {i} AS iter,
             (SELECT CAST(COUNT(*) AS INTEGER) FROM c{i}) AS n_cells,
             (SELECT MAX({move}) FROM c{i} a JOIN c{i - 1} b USING (cell))
               AS movement_micro,
             (SELECT SUM(CAST(FLOOR(d * 1000000.0 + 0.5) AS BIGINT))
              FROM a{i}) AS inertia_micro"""
        )
    trace = "\n      UNION ALL\n      ".join(stat_rows)
    cte_sql = ",\n    ".join(ctes)
    return f"""
    WITH {cte_sql},
    trace0 AS MATERIALIZED (
      {trace})
    SELECT CAST(iter AS INTEGER) AS iter, n_cells,
           CAST(movement_micro AS BIGINT) AS movement_micro,
           CAST(inertia_micro AS DOUBLE) / 1000000.0 AS inertia,
           movement_micro <= {KM_TOL_MICRO} AS converged
    FROM trace0
    WHERE iter <= COALESCE((SELECT MIN(iter) FROM trace0
                            WHERE movement_micro <= {KM_TOL_MICRO}),
                           {KM_MAX_ITERS})
    ORDER BY iter
    """


@query("cluster_kmeans_converged", oracle=_km_converged_oracle())
def cluster_kmeans_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-LOOPED k-means — cluster_kmeans_lloyd generalized
    from fixed 2 iterations to run-until-converged (max centroid
    movement <= {KM_TOL_MICRO} micro units, cap {KM_MAX_ITERS}), with
    the convergence TRACE as the result: one row per executed
    iteration carrying n_cells, movement_micro (the integer-exact stop
    criterion), inertia (the cost Lloyd descends), and the converged
    flag. The stop decision replays in DuckDB because movement is
    integer micro-grid arithmetic: the oracle unrolls all
    {KM_MAX_ITERS} iterations, computes the same movements, and its
    WHERE picks the same least converged iteration — dynamic control
    flow verified by a static query.

    Scale shape (100 TB): each iteration is one mapInPandas assignment
    pass + one map-side-combinable hash aggregate ({DIM} decimal sums,
    <= {IVF_CELLS} output rows); the driver only ever holds the 8-row
    codebook per iteration — the loop is control flow over bounded
    artifacts, the data path stays distributed. Early exit bounds the
    cost at convergence, the cap bounds it under divergence.

    Reference: motorway has no clustering surface; this completes the
    trainer story the verdict asked for — _lloyd_fit is the SHARED
    loop sim_ann_ivf_lloyd / sim_ann_ivfpq consume (they pin
    max_iters; this query runs it to convergence)."""
    _corpus, trace, _cells, _cents = _lloyd_fit(
        spark, sf_dir, max_iters=KM_MAX_ITERS, tol_micro=KM_TOL_MICRO
    )
    rows = [
        (
            t["iter"],
            t["n_cells"],
            t["movement_micro"],
            None if t["inertia_micro"] is None else t["inertia_micro"] / 1e6,
            # NULL movement (degenerate input) -> NULL converged, like
            # the oracle's NULL <= tol
            None
            if t["movement_micro"] is None
            else t["movement_micro"] <= KM_TOL_MICRO,
        )
        for t in trace
    ]
    return spark.createDataFrame(
        rows,
        "iter int, n_cells int, movement_micro bigint,"
        " inertia double, converged boolean",
    ).orderBy("iter")


def _ivf_lloyd_oracle() -> str:
    mean_cols = ", ".join(
        f"{_km_mean_sql(f'e.embedding[{i}]')} AS m{i}" for i in range(1, DIM + 1)
    )
    cent_list = "list_value(" + ", ".join(f"m{i}" for i in range(1, DIM + 1)) + ")"
    dist = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        for i in range(1, DIM + 1)
    )
    return f"""{_km_cte_prefix()},
    c2 AS MATERIALIZED (
      SELECT cell, {cent_list} AS cent FROM (
        SELECT a2.cell, {mean_cols}
        FROM a2 JOIN valid e USING (vec_id) GROUP BY a2.cell)),
    d3 AS MATERIALIZED (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {dist}, c.cell) AS rn
      FROM valid e CROSS JOIN c2 c),
    a3 AS MATERIALIZED (SELECT vec_id, cell FROM d3 WHERE rn = 1),
    probe AS (
      SELECT vec_id AS query_id, cell FROM d3
      WHERE vec_id < {N_QUERIES} AND rn <= {IVF_PROBE}),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, a.cell
      FROM probe p JOIN a3 a USING (cell)
      WHERE p.query_id <> a.vec_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id, cand.cell,
             ROUND({_SQL_DOT.format(a='qe.embedding', b='ce.embedding')}
                   / ({_SQL_NORM.format(a='qe.embedding')}
                      * {_SQL_NORM.format(a='ce.embedding')}), 6) AS cosine
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    SELECT query_id, neighbor_id, cell, cosine, rn AS rank
    FROM ranked WHERE rn <= 3
    """


@query("sim_ann_ivf_lloyd", oracle=_ivf_lloyd_oracle())
def sim_ann_ivf_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE trained-ANN pipeline, oracle-exact end to end:
    quantized-Lloyd k-means fit (cluster_kmeans_lloyd's two iterations)
    -> inverted file over the FITTED codebook C2 -> {IVF_PROBE}-cell
    probe -> exact cosine rerank, top 3 per query. sim_ann_ivf_fixed
    proved the probe with a degenerate codebook; this replays the real
    production sequence (train, index, search) bit-for-bit in DuckDB —
    the operator sim_ann_ivf (MLlib-fitted, rows-only) represents, with
    the packaged trainer swapped for the replayable one.

    Scale shape: everything cluster_kmeans_lloyd says, plus one more
    assignment pass for the inverted file and the cell-equality probe
    join (int key, linear — the sim_ann_ivf_fixed analysis). The fitted
    codebook crosses to the driver as 8x64 quantized doubles, exactly
    like the fixed codebook did.
    """
    corpus, cells1, c1 = _lloyd_c1(spark, sf_dir)
    # r13: C2 via the fused stats pass (bit-equal micro-sum means)
    _rows, cells2, c2 = _km_stats_rows(
        corpus.mapInPandas(
            _km_assign_stats_factory(c1, cells1), schema=_KM_STATS_SCHEMA
        )
    )

    a3 = corpus.mapInPandas(
        _km_assign_factory(c2, cells2), schema=_KM_ASSIGN_SCHEMA
    ).select("vec_id", "embedding", "cell")

    # per-query probe list on the driver: 20 bounded query vectors x
    # <= 8 cells, per-dim left-fold distances, (d, cell) tie order
    q_rows = (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    probe_pairs = []
    for r in q_rows:
        v = np.array(r["embedding"], dtype=np.float64)
        acc = np.zeros(c2.shape[0])
        for i in range(DIM):
            d = v[i] - c2[:, i]
            acc += d * d
        order = sorted(range(len(cells2)), key=lambda p: (acc[p], cells2[p]))
        probe_pairs += [
            (r["vec_id"], cells2[p]) for p in order[:IVF_PROBE]
        ]
    probe = F.broadcast(
        spark.createDataFrame(probe_pairs, "query_id long, cell int")
    )

    q_emb = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cosine = F.round(
        _dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6
    )
    pairs = (
        probe.join(
            a3.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("c_emb"),
                "cell",
            ),
            "cell",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(q_emb), "query_id")
        .withColumn("cosine", cosine)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cell", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric-distance (ADC) scan — the
# memory-compressed ANN path, oracle-exact end to end.
# ---------------------------------------------------------------------------
PQ_M = 8          # subspaces
PQ_SUBDIM = 8     # dims per subspace (PQ_M * PQ_SUBDIM = DIM)
PQ_K = 16         # codes per subspace (4 bits)
PQ_CB_LO, PQ_CB_HI = 100, 115  # vec_ids of the fixed PQ codebook vectors
PQ_RERANK = 50    # ADC candidates per query fed to the exact rerank


def _pq_sub_dist_sql(v: str, vn: str, c: str, cn: str, s: int) -> str:
    """Squared L2 over subspace s between L2-NORMALIZED vectors, as an
    explicit left-fold chain (1-based SQL array indexing; dims
    s*8+1 .. s*8+8). On the unit sphere squared L2 = 2 - 2*cosine, so
    the ADC order is the cosine order — unnormalized L2 would rank by
    magnitude as much as by angle (measured: recall 0.27 raw vs 0.9+
    normalized on the fixture)."""
    return " + ".join(
        f"(CAST({v}[{s * PQ_SUBDIM + i}] AS DOUBLE) / {vn}"
        f" - CAST({c}[{s * PQ_SUBDIM + i}] AS DOUBLE) / {cn})"
        f" * (CAST({v}[{s * PQ_SUBDIM + i}] AS DOUBLE) / {vn}"
        f" - CAST({c}[{s * PQ_SUBDIM + i}] AS DOUBLE) / {cn})"
        for i in range(1, PQ_SUBDIM + 1)
    )


def _pq_oracle() -> str:
    enc_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT v.vec_id, {s} AS s, c.code,"
        f" {_pq_sub_dist_sql('v.embedding', 'v.nrm', 'c.embedding', 'c.nrm', s)} AS d"
        " FROM valid v CROSS JOIN cb c"
        for s in range(PQ_M)
    )
    tab_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT q.vec_id AS query_id, {s} AS s, c.code,"
        f" {_pq_sub_dist_sql('q.embedding', 'q.nrm', 'c.embedding', 'c.nrm', s)} AS d"
        " FROM queries q CROSS JOIN cb c"
        for s in range(PQ_M)
    )
    nrm = _SQL_NORM.format(a="embedding")
    return f"""
    WITH valid AS MATERIALIZED (
      SELECT vec_id, embedding, {nrm} AS nrm
      FROM embeddings WHERE {_VALID_VEC_SQL}),
    queries AS MATERIALIZED (
      SELECT vec_id, embedding, nrm FROM valid WHERE vec_id < {N_QUERIES}),
    cb AS MATERIALIZED (
      SELECT vec_id - {PQ_CB_LO} AS code, embedding, {nrm} AS nrm
      FROM embeddings
      WHERE vec_id BETWEEN {PQ_CB_LO} AND {PQ_CB_HI}),
    cdist AS MATERIALIZED (
      {enc_blocks}),
    codes AS MATERIALIZED (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM cdist) WHERE rn = 1),
    qdist AS (
      {tab_blocks}),
    qtab AS MATERIALIZED (
      SELECT query_id, s, code,
             CAST(FLOOR(d * 1000000.0 + 0.5) AS BIGINT) AS dmicro
      FROM qdist),
    adc AS MATERIALIZED (
      SELECT t.query_id, k.vec_id AS neighbor_id,
             CAST(SUM(t.dmicro) AS BIGINT) AS adc_micro
      FROM codes k JOIN qtab t ON t.s = k.s AND t.code = k.code
      WHERE t.query_id <> k.vec_id
      GROUP BY 1, 2),
    cand AS (
      SELECT query_id, neighbor_id, adc_micro FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_micro, neighbor_id) AS rn
        FROM adc) WHERE rn <= {PQ_RERANK}),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(cand.adc_micro AS DOUBLE) / 1000000.0 AS adc_dist,
             ROUND({_SQL_DOT.format(a='qe.embedding', b='ce.embedding')}
                   / ({_SQL_NORM.format(a='qe.embedding')}
                      * {_SQL_NORM.format(a='ce.embedding')}), 6) AS cosine
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, adc_dist, cosine, rn AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    """


def _make_leftfold_norms():
    """Build _leftfold_norms as a NESTED-ORIGIN function: its qualname
    contains '<locals>', so cloudpickle serializes any mapInPandas
    closure referencing it BY VALUE instead of by module reference —
    executors need numpy but NOT an importable motorway_spark (the
    bare local-cluster deployment rung tests/test_local_cluster.py
    pins; the r13 fused stats factories reference this helper, and a
    by-reference pickle would crash-loop PYTHONPATH-less executors on
    ModuleNotFoundError)."""

    def _leftfold_norms(vecs: "np.ndarray") -> "np.ndarray":
        """Row norms accumulated dim-by-dim — the same left-fold order
        as the SQL `+` chains and DuckDB's list_sum, so the normalized
        components divide by bit-identical norms in both engines
        (numpy's own .sum() is pairwise and can differ in the last
        ulp)."""
        acc = np.zeros(vecs.shape[0])
        for i in range(vecs.shape[1]):
            acc += vecs[:, i] * vecs[:, i]
        return np.sqrt(acc)

    return _leftfold_norms


_leftfold_norms = _make_leftfold_norms()


def _pq_encode_factory(cbn: "np.ndarray", emit_embedding: bool = True):
    """mapInPandas factory: PQ-encode each vector — L2-normalize (left-
    fold norm), then per subspace the argmin over {PQ_K} NORMALIZED
    codebook subvectors with per-dim left-fold distances (bit-matches
    the oracle's explicit `+` chains), first-min tiebreak = lowest
    code. One pass computes all {PQ_M} codes.

    ``emit_embedding=False`` drops the 64-float embedding from the
    OUTPUT batches (guide §4.1: column pruning cannot reach inside an
    opaque Python function, so a downstream select ships the payload
    through Arrow first and drops it after) — use with
    ``_PQ_CODES_NARROW_SCHEMA`` wherever only the codes are consumed."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = vecs / _leftfold_norms(vecs)[:, None]
            out = {"vec_id": pdf["vec_id"]}
            if emit_embedding:
                out["embedding"] = pdf["embedding"]
            for s in range(PQ_M):
                acc = np.zeros((vecs.shape[0], cbn.shape[0]))
                for i in range(s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM):
                    d = vn[:, i : i + 1] - cbn[None, :, i]
                    acc += d * d
                out[f"c{s}"] = acc.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    return fn


@query("sim_ann_pq_adc", oracle=_pq_oracle())
def sim_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance (ADC) scan —
    the MEMORY-COMPRESSED search path (Jegou et al.'s PQ, the layout
    inside FAISS IVF-PQ), oracle-exact end to end: encode every vector
    as {PQ_M} x 4-bit codes against a fixed {PQ_K}-entry-per-subspace
    codebook (vec_ids {PQ_CB_LO}-{PQ_CB_HI}, the sim_ann_ivf_fixed
    convention — a TRAINED per-subspace codebook is the
    cluster_kmeans_lloyd machinery applied per subspace), build each
    query's 8x16 distance table, approximate distance = table-lookup
    sum over the codes, take the {PQ_RERANK} best per query, exact
    cosine rerank, top 3.

    Determinism is the whole design: ADC table entries are quantized
    to INTEGER micro-units (FLOOR(d*1e6+0.5)) before summing, so the
    8-term per-candidate sum is order-free integer arithmetic — an
    unquantized double sum across a hash aggregate would be
    summation-order-dependent and could never hash-match. Encoding
    argmins and candidate ranks tie-break on (d, code) / (adc, vec_id).

    Scale shape (100 TB): encoding is one mapInPandas pass (the
    sim_knn_matmul closure pattern, 16x64 doubles in the closure) run
    ONCE at ingest — after it the scan never touches float vectors:
    codes are {PQ_M} ints (4 bits each in a real bit-packed layout =
    32x memory compression vs 256-byte float32 vectors). The ADC scan
    here is explode + broadcast-join + integer-sum — whole-stage
    codegen, zero Python per candidate — linear in n like
    sim_knn_matmul but over 8 int lookups instead of 64 float
    multiplies per pair; compose with the IVF cell prune
    (sim_ann_ivf_lloyd) for the sublinear candidate set, exactly as
    FAISS composes IVF+PQ. Exact vectors are read back only for the
    {PQ_RERANK}-row-per-query rerank.

    Reference: completes the ANN ladder (SURVEY.md §2b north-star):
    brute-force (exact) -> LSH (hash prune) -> IVF (partition prune)
    -> PQ (compressed scan), each oracle-checked."""
    emb = _valid_vectors(Catalog(spark, sf_dir).embeddings)
    corpus = emb.select("vec_id", "embedding")

    cb_rows = (
        Catalog(spark, sf_dir)
        .embeddings.filter(
            (F.col("vec_id") >= PQ_CB_LO) & (F.col("vec_id") <= PQ_CB_HI)
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    cb = np.array([r["embedding"] for r in cb_rows], dtype=np.float64)
    cbn = cb / _leftfold_norms(cb)[:, None]

    # r12 opt: the ADC scan consumes only (vec_id, codes) — don't ship
    # the 64-float embedding back through Arrow (§4.1)
    codes = corpus.mapInPandas(
        _pq_encode_factory(cbn, emit_embedding=False),
        schema=_PQ_CODES_NARROW_SCHEMA,
    )

    # query ADC tables: 20 bounded query vectors x 8 subspaces x 16
    # codes, micro-int entries — driver-built, broadcast (2,560 rows)
    q_rows = (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    return _pq_adc_rerank(spark, corpus, codes, _pq_fixed_tab_rows(q_rows, cbn))


def _pq_fixed_tab_rows(q_rows, cbn: "np.ndarray") -> list[tuple]:
    """ADC distance tables for the FIXED (normalized) codebook: per
    (query, subspace, code) the squared L2 between the NORMALIZED query
    subvector and the codebook subvector, integer micro grid. Bounded:
    {N_QUERIES} x {PQ_M} x {PQ_K} rows. Shared by sim_ann_pq_adc and
    the streaming ingest twin."""
    import math

    tab_rows = []
    for r in q_rows:
        v = np.array([r["embedding"]], dtype=np.float64)
        vq = (v / _leftfold_norms(v)[:, None])[0]
        for s in range(PQ_M):
            acc = np.zeros(cbn.shape[0])
            for i in range(s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM):
                d = vq[i] - cbn[:, i]
                acc += d * d
            tab_rows += [
                (int(r["vec_id"]), s, code, int(math.floor(acc[code] * 1e6 + 0.5)))
                for code in range(PQ_K)
            ]
    return tab_rows


def _pq_adc_rerank(spark, corpus, codes, tab_rows) -> DataFrame:
    """Shared PQ tail: ADC scan (explode + broadcast table join +
    order-free integer sums) -> top-{PQ_RERANK} per query -> exact
    cosine rerank -> top 3. Used by the fixed-codebook and the trained
    (Lloyd) variants."""
    tab = F.broadcast(
        spark.createDataFrame(
            tab_rows, "query_id long, s int, code int, dmicro long"
        )
    )

    stack = ", ".join(f"{s}, c{s}" for s in range(PQ_M))
    exploded = codes.select(
        "vec_id", F.expr(f"stack({PQ_M}, {stack}) AS (s, code)")
    )
    adc = (
        exploded.join(tab, ["s", "code"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dmicro").alias("adc_micro"))
    )
    wa = Window.partitionBy("query_id").orderBy("adc_micro", "vec_id")
    cand = (
        adc.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= PQ_RERANK)
        .drop("rn")
    )

    q_emb = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        cand.join(
            corpus.select("vec_id", F.col("embedding").alias("c_emb")),
            "vec_id",
        )
        .join(F.broadcast(q_emb), "query_id")
        .withColumn(
            "cosine",
            F.round(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("adc_micro").cast("double") / F.lit(1000000.0)).alias(
                "adc_dist"
            ),
            "cosine",
            "rank",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Trained PQ: per-subspace quantized-Lloyd codebooks (one iteration),
# then the same ADC scan — FAISS's actual IVF-PQ training step,
# oracle-exact.
# ---------------------------------------------------------------------------
def _pq_trained_mean_sql(s: int, j: int) -> str:
    """Trained centroid component j (1..8) of subspace s: the
    integer-exact half-up mean (_km_mean_sql) over NORMALIZED
    components of the vectors assigned to the code."""
    return _km_mean_sql(
        f"(CAST(e.embedding[{s * PQ_SUBDIM + j}] AS DOUBLE) / e.nrm)"
    )


def _pq_lloyd_oracle() -> str:
    nrm = _SQL_NORM.format(a="embedding")
    enc_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT v.vec_id, {s} AS s, c.code,"
        f" {_pq_sub_dist_sql('v.embedding', 'v.nrm', 'c.embedding', 'c.nrm', s)} AS d"
        " FROM valid v CROSS JOIN cb c"
        for s in range(PQ_M)
    )
    cb1_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT {s} AS s, k.code, "
        + ", ".join(
            f"{_pq_trained_mean_sql(s, j)} AS m{j}"
            for j in range(1, PQ_SUBDIM + 1)
        )
        + f" FROM codes1 k JOIN valid e USING (vec_id) WHERE k.s = {s}"
        " GROUP BY k.code"
        for s in range(PQ_M)
    )

    def dist2(v: str, vn: str, s: int) -> str:
        return " + ".join(
            f"(CAST({v}[{s * PQ_SUBDIM + j}] AS DOUBLE) / {vn} - c.m{j})"
            f" * (CAST({v}[{s * PQ_SUBDIM + j}] AS DOUBLE) / {vn} - c.m{j})"
            for j in range(1, PQ_SUBDIM + 1)
        )

    enc2_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT v.vec_id, {s} AS s, c.code,"
        f" {dist2('v.embedding', 'v.nrm', s)} AS d"
        f" FROM valid v CROSS JOIN (SELECT * FROM cb1 WHERE s = {s}) c"
        for s in range(PQ_M)
    )
    qdist_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT q.vec_id AS query_id, {s} AS s, c.code,"
        f" {dist2('q.embedding', 'q.nrm', s)} AS d"
        f" FROM queries q CROSS JOIN (SELECT * FROM cb1 WHERE s = {s}) c"
        for s in range(PQ_M)
    )
    return f"""
    WITH valid AS MATERIALIZED (
      SELECT vec_id, embedding, {nrm} AS nrm
      FROM embeddings WHERE {_VALID_VEC_SQL}),
    queries AS MATERIALIZED (
      SELECT vec_id, embedding, nrm FROM valid WHERE vec_id < {N_QUERIES}),
    cb AS MATERIALIZED (
      SELECT vec_id - {PQ_CB_LO} AS code, embedding, {nrm} AS nrm
      FROM embeddings
      WHERE vec_id BETWEEN {PQ_CB_LO} AND {PQ_CB_HI}),
    cdist1 AS MATERIALIZED (
      {enc_blocks}),
    codes1 AS MATERIALIZED (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM cdist1) WHERE rn = 1),
    cb1 AS MATERIALIZED (
      {cb1_blocks}),
    cdist2 AS MATERIALIZED (
      {enc2_blocks}),
    codes2 AS MATERIALIZED (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM cdist2) WHERE rn = 1),
    qdist AS (
      {qdist_blocks}),
    qtab AS MATERIALIZED (
      SELECT query_id, s, code,
             CAST(FLOOR(d * 1000000.0 + 0.5) AS BIGINT) AS dmicro
      FROM qdist),
    adc AS MATERIALIZED (
      SELECT t.query_id, k.vec_id AS neighbor_id,
             CAST(SUM(t.dmicro) AS BIGINT) AS adc_micro
      FROM codes2 k JOIN qtab t ON t.s = k.s AND t.code = k.code
      WHERE t.query_id <> k.vec_id
      GROUP BY 1, 2),
    cand AS (
      SELECT query_id, neighbor_id, adc_micro FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_micro, neighbor_id) AS rn
        FROM adc) WHERE rn <= {PQ_RERANK}),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(cand.adc_micro AS DOUBLE) / 1000000.0 AS adc_dist,
             ROUND({_SQL_DOT.format(a='qe.embedding', b='ce.embedding')}
                   / ({_SQL_NORM.format(a='qe.embedding')}
                      * {_SQL_NORM.format(a='ce.embedding')}), 6) AS cosine
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, adc_dist, cosine, rn AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    """


def _pq_encode_trained_factory(trained: dict, emit_embedding: bool = True):
    """mapInPandas factory for the TRAINED codebooks: per subspace s,
    ``trained[s]`` is (codes list, k_s x 8 centroid matrix over that
    subspace's dims). Same left-fold distances and (d, code) tiebreak
    as pass 1 (codes are listed ascending, argmin takes the first
    min). ``emit_embedding=False``: see _pq_encode_factory."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = vecs / _leftfold_norms(vecs)[:, None]
            out = {"vec_id": pdf["vec_id"]}
            if emit_embedding:
                out["embedding"] = pdf["embedding"]
            for s in range(PQ_M):
                codes_s, cents_s = trained[s]
                acc = np.zeros((vecs.shape[0], cents_s.shape[0]))
                for j in range(PQ_SUBDIM):
                    d = vn[:, s * PQ_SUBDIM + j : s * PQ_SUBDIM + j + 1] - cents_s[None, :, j]
                    acc += d * d
                pos = acc.argmin(axis=1)
                out[f"c{s}"] = np.array([codes_s[p] for p in pos], dtype="int32")
            yield pd.DataFrame(out)

    return fn


def _ivfpq_invfile_codes_factory(
    c2: "np.ndarray", cells2: list[int], trained: dict
):
    """mapInPandas factory fusing the IVF inverted-file assignment
    (raw-space nearest C2 cell — _km_assign_factory's left-fold and
    first-min tiebreak, bit for bit) with the trained PQ encode
    (_pq_encode_trained_factory's normalized-space subspace argmin) in
    ONE pass, emitting only (vec_id, cell, c0..c{PQ_M-1}) — no
    embedding payload. Replaces two full corpus passes (and the
    embedding column the encode pass used to ship back through Arrow)
    with one narrow pass (guide §1.2 fewer passes, §4.1 pass only the
    columns the consumer needs)."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            # inverted file: raw-space nearest C2 cell
            acc = np.zeros((vecs.shape[0], c2.shape[0]))
            for i in range(vecs.shape[1]):
                d = vecs[:, i : i + 1] - c2[None, :, i]
                acc += d * d
            pos = acc.argmin(axis=1)
            out = {
                "vec_id": pdf["vec_id"],
                "cell": np.array([cells2[p] for p in pos], dtype="int32"),
            }
            # trained PQ codes: normalized-space subspace argmin
            vn = vecs / _leftfold_norms(vecs)[:, None]
            for s in range(PQ_M):
                codes_s, cents_s = trained[s]
                a2 = np.zeros((vecs.shape[0], cents_s.shape[0]))
                for j in range(PQ_SUBDIM):
                    d = (
                        vn[:, s * PQ_SUBDIM + j : s * PQ_SUBDIM + j + 1]
                        - cents_s[None, :, j]
                    )
                    a2 += d * d
                p2 = a2.argmin(axis=1)
                out[f"c{s}"] = np.array(
                    [codes_s[p] for p in p2], dtype="int32"
                )
            yield pd.DataFrame(out)

    return fn


_IVFPQ_INV_CODES_SCHEMA = "vec_id long, cell int, " + ", ".join(
    f"c{s} int" for s in range(PQ_M)
)


def _pq_fixed_cbn(spark: SparkSession, sf_dir: str) -> "np.ndarray":
    """The normalized fixed init codebook (vec_ids {PQ_CB_LO}..{PQ_CB_HI})
    as a {PQ_K} x {DIM} float64 matrix — the shared pass-1 starting point
    for every trained-PQ consumer."""
    cb_rows = (
        Catalog(spark, sf_dir)
        .embeddings.filter(
            (F.col("vec_id") >= PQ_CB_LO) & (F.col("vec_id") <= PQ_CB_HI)
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    cb = np.array([r["embedding"] for r in cb_rows], dtype=np.float64)
    return cb / _leftfold_norms(cb)[:, None]


_PQ_CODES_SCHEMA = "vec_id long, embedding array<float>, " + ", ".join(
    f"c{s} int" for s in range(PQ_M)
)
# codes-only output for encode passes whose consumers never read the
# embedding back (ADC scans, the ingest registry): pair with
# emit_embedding=False on the factories (§4.1)
_PQ_CODES_NARROW_SCHEMA = "vec_id long, " + ", ".join(
    f"c{s} int" for s in range(PQ_M)
)


# Fused PQ train pass (r13): per-(s, code) int64 micro partial sums of
# the NORMALIZED subspace components — the _km_mean_sql grid computed
# inside the pass-1 encode, so neither the embedding payload nor the
# 8x-unpivoted (s, code, x1..x8) rows ever cross back through Arrow.
_PQ_STATS_SCHEMA = "s int, code int, n long, " + ", ".join(
    f"x{j} long" for j in range(1, PQ_SUBDIM + 1)
)


def _pq_encode_stats_factory(cbn: "np.ndarray"):
    """Pass-1 PQ encode (identical left-fold distances / first-min
    tiebreak as _pq_encode_factory) fused with the per-(s, code)
    training sums: member count and exact int64 micro sums of the
    normalized subspace components (see _micro_halfup)."""
    import pandas as pd

    def fn(batches):
        n_acc = np.zeros((PQ_M, PQ_K), dtype=np.int64)
        x_acc = np.zeros((PQ_M, PQ_K, PQ_SUBDIM), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = vecs / _leftfold_norms(vecs)[:, None]
            micro = _micro_halfup(vn)
            for s in range(PQ_M):
                acc = np.zeros((vecs.shape[0], cbn.shape[0]))
                for i in range(s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM):
                    d = vn[:, i : i + 1] - cbn[None, :, i]
                    acc += d * d
                pos = acc.argmin(axis=1)
                np.add.at(n_acc[s], pos, 1)
                np.add.at(
                    x_acc[s],
                    pos,
                    micro[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM],
                )
        live = np.argwhere(n_acc > 0)
        out = {
            "s": np.array([int(s) for s, _c in live], dtype="int32"),
            "code": np.array([int(c) for _s, c in live], dtype="int32"),
            "n": np.array([n_acc[s, c] for s, c in live], dtype=np.int64),
        }
        for j in range(PQ_SUBDIM):
            out[f"x{j + 1}"] = np.array(
                [x_acc[s, c, j] for s, c in live], dtype=np.int64
            )
        yield pd.DataFrame(out)

    return fn


def _pq_stats_trained(
    stats: DataFrame,
) -> dict[int, tuple[list[int], "np.ndarray"]]:
    """Reduce a per-(s, code) stats pass to the trained codebooks:
    {s: (codes ascending, k_s x {PQ_SUBDIM} matrix of _micro_mean)}."""
    aggs = [F.sum("n").alias("n")] + [
        F.sum(f"x{j}").alias(f"x{j}") for j in range(1, PQ_SUBDIM + 1)
    ]
    all_rows = stats.groupBy("s", "code").agg(*aggs).collect()
    trained: dict[int, tuple[list[int], "np.ndarray"]] = {}
    for s in range(PQ_M):
        rows = sorted(
            (r for r in all_rows if r["s"] == s), key=lambda r: r["code"]
        )
        trained[s] = (
            [r["code"] for r in rows],
            np.array(
                [
                    [
                        _micro_mean(r[f"x{j}"], r["n"])
                        for j in range(1, PQ_SUBDIM + 1)
                    ]
                    for r in rows
                ],
                dtype=np.float64,
            ).reshape(-1, PQ_SUBDIM),
        )
    return trained


def _pq_train(
    spark: SparkSession, sf_dir: str, corpus: DataFrame
) -> dict[int, tuple[list[int], "np.ndarray"]]:
    """One quantized-Lloyd iteration for ALL {PQ_M} subspaces in ONE
    job: pass-1 encode against the fixed codebook FUSED with the
    per-(s, code) training sums (r13 — the previous shape shipped the
    embedding back through Arrow and unpivoted 8x rows into a decimal
    hash aggregate; the sums are bit-equal int64 micro arithmetic, see
    _micro_halfup). Still exactly one execution of the encode pass
    (pinned by tests/test_plan_audit.py's job audit).
    Returns {s: (codes ascending, k_s x {PQ_SUBDIM} centroid matrix)}."""
    cbn0 = _pq_fixed_cbn(spark, sf_dir)
    stats = corpus.mapInPandas(
        _pq_encode_stats_factory(cbn0), schema=_PQ_STATS_SCHEMA
    )
    return _pq_stats_trained(stats)


def _pq_trained_tab_rows(q_rows, trained) -> list[tuple]:
    """ADC distance tables for the trained codebooks: per (query,
    subspace, code) the squared L2 between the NORMALIZED query
    subvector and the trained sub-centroid, on the integer micro grid.
    Bounded: {N_QUERIES} x {PQ_M} x {PQ_K} rows."""
    import math

    tab_rows = []
    for r in q_rows:
        v = np.array([r["embedding"]], dtype=np.float64)
        vq = (v / _leftfold_norms(v)[:, None])[0]
        for s in range(PQ_M):
            codes_s, cents_s = trained[s]
            acc = np.zeros(cents_s.shape[0])
            for j in range(PQ_SUBDIM):
                d = vq[s * PQ_SUBDIM + j] - cents_s[:, j]
                acc += d * d
            tab_rows += [
                (
                    int(r["vec_id"]),
                    s,
                    int(codes_s[p]),
                    int(math.floor(acc[p] * 1e6 + 0.5)),
                )
                for p in range(len(codes_s))
            ]
    return tab_rows


@query("sim_ann_pq_lloyd", oracle=_pq_lloyd_oracle())
def sim_ann_pq_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED product quantization — the complete PQ pipeline the way
    FAISS actually builds it: one quantized-Lloyd iteration PER
    SUBSPACE refines the fixed init codebook (assign subvectors, take
    integer-exact half-up means of the NORMALIZED components — the
    cluster_kmeans_lloyd playbook applied 8 times in parallel), then
    re-encode against the trained centroids and run the same ADC scan +
    exact rerank as sim_ann_pq_adc. The full train -> encode -> search
    sequence replays bit-for-bit in DuckDB.

    Scale shape (100 TB): pass-1 encode and pass-2 encode are each one
    mapInPandas pass; the per-subspace centroid update is ONE hash
    aggregate per subspace over (code, 8 decimal sums) — map-side
    combinable, 16-row outputs; the only collects are the 8x16
    codebook rollups and 20 query vectors. Training cost is K x
    (map + agg) like the IVF fit; a production run iterates the same
    two steps to convergence.

    Reference: completes the ANN ladder's training story — fixed
    codebooks proved the search path (sim_ann_pq_adc), this proves the
    trainer, mirroring how sim_ann_ivf_fixed -> sim_ann_ivf_lloyd
    proved the coarse quantizer."""
    from motorway_spark.maintenance import CACHES

    emb = _valid_vectors(Catalog(spark, sf_dir).embeddings)
    # r13: corpus-size-derived fan-out (see _lloyd_fit / guide §2)
    par = scale_partitions(spark, sf_dir, "embeddings")
    corpus = CACHES.persist_swap(
        "pq_lloyd.corpus", emb.repartition(par).select("vec_id", "embedding")
    )

    trained = _pq_train(spark, sf_dir, corpus)
    # r12 opt: ADC consumes only (vec_id, codes) — narrow output (§4.1)
    codes2 = corpus.mapInPandas(
        _pq_encode_trained_factory(trained, emit_embedding=False),
        schema=_PQ_CODES_NARROW_SCHEMA,
    )

    q_rows = (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    tab_rows = _pq_trained_tab_rows(q_rows, trained)
    return _pq_adc_rerank(spark, corpus, codes2, tab_rows)




# ---------------------------------------------------------------------------
# IVF + PQ composed — FAISS's flagship index layout: TRAINED coarse
# cells (the sim_ann_ivf_lloyd quantizer) prune candidates, PQ codes
# score them (ADC), floats only at the rerank. Oracle-exact.
# ---------------------------------------------------------------------------
IVFPQ_PROBE = 6  # composed indexes need a higher nprobe than IVF-alone:
# the coarse prune's misses MULTIPLY with the code quantization's.
# Round-9 knee search (full grid: coarse Lloyd iters {2,3,4} x nprobe
# {4,6,8} x PQ codebook {fixed,trained}, recall@3 on the fixture):
#   fixed PQ:   probe4 0.50, probe6 0.58-0.65, probe8 0.65 (= PQ alone)
#   trained PQ: probe4 0.58-0.65, probe6 0.70-0.75, probe8 0.75
#   extra coarse iterations beyond 2: +-0.02 at every probe (flat)
# The big lever is CODEBOOK QUALITY (trained PQ, now one cheap job),
# the second is nprobe; probe 6 + trained = 0.72 measured, the knee —
# probe 8 scans every cell (no pruning left on an 8-cell fixture;
# production IVF_CELLS grows ~sqrt(n) and nprobe stays a small
# fraction, so the fixture's 6/8 ratio is fixture-bound, not the
# design point).


def _ivfpq_oracle() -> str:
    """Trained coarse quantizer (the _km_cte_prefix Lloyd chain -> C2
    -> inverted file a3 -> probe) composed with the TRAINED-codebook PQ
    ADC scan (the _pq_lloyd_oracle chain: pass-1 encode -> one
    quantized-Lloyd sub-centroid update -> pass-2 encode). ``valid``
    (raw, from the km prefix) and ``validn`` (normalized view for PQ)
    are separate CTEs on purpose."""
    nrm = _SQL_NORM.format(a="embedding")
    mean_cols = ", ".join(
        f"{_km_mean_sql(f'e.embedding[{i}]')} AS m{i}" for i in range(1, DIM + 1)
    )
    cent_list = "list_value(" + ", ".join(f"m{i}" for i in range(1, DIM + 1)) + ")"
    dist = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) - c.cent[{i}])"
        for i in range(1, DIM + 1)
    )
    enc_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT v.vec_id, {s} AS s, c.code,"
        f" {_pq_sub_dist_sql('v.embedding', 'v.nrm', 'c.embedding', 'c.nrm', s)} AS d"
        " FROM validn v CROSS JOIN cb c"
        for s in range(PQ_M)
    )
    cb1_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT {s} AS s, k.code, "
        + ", ".join(
            f"{_pq_trained_mean_sql(s, j)} AS m{j}"
            for j in range(1, PQ_SUBDIM + 1)
        )
        + f" FROM codes1 k JOIN validn e USING (vec_id) WHERE k.s = {s}"
        " GROUP BY k.code"
        for s in range(PQ_M)
    )

    def dist2(v: str, vn: str, s: int) -> str:
        return " + ".join(
            f"(CAST({v}[{s * PQ_SUBDIM + j}] AS DOUBLE) / {vn} - c.m{j})"
            f" * (CAST({v}[{s * PQ_SUBDIM + j}] AS DOUBLE) / {vn} - c.m{j})"
            for j in range(1, PQ_SUBDIM + 1)
        )

    enc2_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT v.vec_id, {s} AS s, c.code,"
        f" {dist2('v.embedding', 'v.nrm', s)} AS d"
        f" FROM validn v CROSS JOIN (SELECT * FROM cb1 WHERE s = {s}) c"
        for s in range(PQ_M)
    )
    tab_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT q.vec_id AS query_id, {s} AS s, c.code,"
        f" {dist2('q.embedding', 'q.nrm', s)} AS d"
        f" FROM queriesn q CROSS JOIN (SELECT * FROM cb1 WHERE s = {s}) c"
        for s in range(PQ_M)
    )
    return f"""{_km_cte_prefix()},
    c2 AS MATERIALIZED (
      SELECT cell, {cent_list} AS cent FROM (
        SELECT a2.cell, {mean_cols}
        FROM a2 JOIN valid e USING (vec_id) GROUP BY a2.cell)),
    d3 AS MATERIALIZED (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {dist}, c.cell) AS rn
      FROM valid e CROSS JOIN c2 c),
    a3 AS MATERIALIZED (SELECT vec_id, cell FROM d3 WHERE rn = 1),
    probe AS (
      SELECT vec_id AS query_id, cell FROM d3
      WHERE vec_id < {N_QUERIES} AND rn <= {IVFPQ_PROBE}),
    validn AS MATERIALIZED (
      SELECT vec_id, embedding, {nrm} AS nrm
      FROM embeddings WHERE {_VALID_VEC_SQL}),
    queriesn AS MATERIALIZED (
      SELECT vec_id, embedding, nrm FROM validn WHERE vec_id < {N_QUERIES}),
    cb AS MATERIALIZED (
      SELECT vec_id - {PQ_CB_LO} AS code, embedding, {nrm} AS nrm
      FROM embeddings
      WHERE vec_id BETWEEN {PQ_CB_LO} AND {PQ_CB_HI}),
    cdist1 AS MATERIALIZED (
      {enc_blocks}),
    codes1 AS MATERIALIZED (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM cdist1) WHERE rn = 1),
    cb1 AS MATERIALIZED (
      {cb1_blocks}),
    cdist2 AS MATERIALIZED (
      {enc2_blocks}),
    codes2 AS MATERIALIZED (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM cdist2) WHERE rn = 1),
    qdist AS (
      {tab_blocks}),
    qtab AS MATERIALIZED (
      SELECT query_id, s, code,
             CAST(FLOOR(d * 1000000.0 + 0.5) AS BIGINT) AS dmicro
      FROM qdist),
    cand0 AS MATERIALIZED (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probe p JOIN a3 a USING (cell)
      WHERE p.query_id <> a.vec_id),
    adc AS MATERIALIZED (
      SELECT c.query_id, c.neighbor_id,
             CAST(SUM(t.dmicro) AS BIGINT) AS adc_micro
      FROM cand0 c
      JOIN codes2 k ON k.vec_id = c.neighbor_id
      JOIN qtab t ON t.query_id = c.query_id
                 AND t.s = k.s AND t.code = k.code
      GROUP BY 1, 2),
    cand AS (
      SELECT query_id, neighbor_id, adc_micro FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_micro, neighbor_id) AS rn
        FROM adc) WHERE rn <= {PQ_RERANK}),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(cand.adc_micro AS DOUBLE) / 1000000.0 AS adc_dist,
             ROUND({_SQL_DOT.format(a='qe.embedding', b='ce.embedding')}
                   / ({_SQL_NORM.format(a='qe.embedding')}
                      * {_SQL_NORM.format(a='ce.embedding')}), 6) AS cosine
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, adc_dist, cosine, rn AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    """


@query("sim_ann_ivfpq", oracle=_ivfpq_oracle())
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed — the index layout FAISS ships as its default
    billion-scale configuration, oracle-exact end to end: the TRAINED
    coarse quantizer (cluster_kmeans_lloyd's two-iteration fit, exactly
    sim_ann_ivf_lloyd's C2 cells) prunes candidates to {IVFPQ_PROBE}
    probed cells per query (composed indexes need a higher nprobe than
    IVF-alone — quantization misses multiply), and within them the
    TRAINED-codebook ADC scan of sim_ann_pq_lloyd scores candidates
    from 4-bit codes alone — float vectors are touched only at the
    {PQ_RERANK}-row exact rerank. Round 9 lifted composed recall@3
    0.50 -> 0.72 on the fixture by swapping the fixed PQ codebook for
    the trained one (the big measured lever) and probe 4 -> 6 (the
    knee; full grid at IVFPQ_PROBE).

    Scale shape (100 TB): training is the Lloyd fit (K x (map + agg))
    plus the PQ sub-centroid update (ONE unpivoted hash aggregate, 128
    rows out); ingest is one assignment pass + two encode passes
    (mapInPandas, codebooks in closures); per query the candidate set
    is {IVFPQ_PROBE}/{IVF_CELLS} of the corpus, each candidate costing
    {PQ_M} integer lookups via broadcast table join (whole-stage
    codegen, no Python); the rerank reads {PQ_RERANK} float vectors.
    Sub-linear candidates x 32x-compressed scoring x constant rerank —
    the composition the ANN ladder was built toward, with every stage's
    arithmetic replayable in DuckDB."""
    # trained coarse quantizer: C1 from the shared Lloyd prefix, one
    # more assignment pass -> C2 (r13: fused stats pass, bit-equal
    # micro-sum means), inverted file over C2
    corpus, cells1, c1 = _lloyd_c1(spark, sf_dir)
    _rows, cells2, c2 = _km_stats_rows(
        corpus.mapInPandas(
            _km_assign_stats_factory(c1, cells1), schema=_KM_STATS_SCHEMA
        )
    )
    # PQ codebook: TRAINED sub-centroids (the sim_ann_pq_lloyd trainer,
    # one unpivoted job) — codebook quality is the measured big recall
    # lever for the composition (see the IVFPQ_PROBE grid above)
    trained = _pq_train(spark, sf_dir, corpus)
    # r12 opt: inverted file + trained encode FUSED into one narrow
    # mapInPandas pass (identical arithmetic to the two passes it
    # replaces), persisted because the final plan reads it twice (the
    # probe join and the exploded ADC input). Bounded: one codes row
    # per vector.
    from motorway_spark.maintenance import CACHES

    inv_codes = CACHES.persist_swap(
        "ivfpq.inv_codes",
        corpus.mapInPandas(
            _ivfpq_invfile_codes_factory(c2, cells2, trained),
            schema=_IVFPQ_INV_CODES_SCHEMA,
        ),
        exclusive=False,
    )
    inv = inv_codes.select("vec_id", "cell")
    codes = inv_codes

    # driver-side: probe lists vs C2 + trained PQ ADC tables (20 queries)
    q_rows = (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    probe_pairs = []
    for r in q_rows:
        v = np.array(r["embedding"], dtype=np.float64)
        acc = np.zeros(c2.shape[0])
        for i in range(DIM):
            d = v[i] - c2[:, i]
            acc += d * d
        order = sorted(range(len(cells2)), key=lambda p: (acc[p], cells2[p]))
        probe_pairs += [
            (int(r["vec_id"]), cells2[p]) for p in order[:IVFPQ_PROBE]
        ]
    tab_rows = _pq_trained_tab_rows(q_rows, trained)

    probe = F.broadcast(
        spark.createDataFrame(probe_pairs, "query_id long, cell int")
    )
    tab = F.broadcast(
        spark.createDataFrame(
            tab_rows, "query_id long, s int, code int, dmicro long"
        )
    )

    cand0 = (
        probe.join(inv, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
    )
    stack = ", ".join(f"{s}, c{s}" for s in range(PQ_M))
    exploded = codes.select(
        "vec_id", F.expr(f"stack({PQ_M}, {stack}) AS (s, code)")
    )
    adc = (
        cand0.join(exploded, "vec_id")
        .join(tab, ["query_id", "s", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dmicro").alias("adc_micro"))
    )
    wa = Window.partitionBy("query_id").orderBy("adc_micro", "vec_id")
    cand = (
        adc.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= PQ_RERANK)
        .drop("rn")
    )
    q_emb = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        cand.join(
            corpus.select("vec_id", F.col("embedding").alias("c_emb")),
            "vec_id",
        )
        .join(F.broadcast(q_emb), "query_id")
        .withColumn(
            "cosine",
            F.round(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("adc_micro").cast("double") / F.lit(1000000.0)).alias(
                "adc_dist"
            ),
            "cosine",
            "rank",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF + PQ with RESIDUAL encoding — FAISS's actual IVFPQ: PQ codes are
# trained on and encode the residual (normalized vector minus its
# coarse cell's centroid), not the raw vector. Residual magnitudes are
# a fraction of vector magnitudes, so the same 4-bit budget spends its
# resolution on the part the coarse quantizer didn't explain — the
# standard reason composed recall stays high at LOWER nprobe.
# ---------------------------------------------------------------------------
IVFPQ_RES_PROBE = 4  # the point of residuals: recall at lower nprobe
IVFPQ_RES_COARSE_ITERS = 6  # normalized-space Lloyd iterations
IVFPQ_RES_RERANK = 200  # ADC candidates fed to the exact rerank
# Round-10 knee grid on the fixture (recall@3 at probe 4, residual PQ
# on normalized-space cells; engine-measured at the ship point,
# simulator-swept elsewhere — the simulator reproduces the engine's
# 0.617 base point exactly):
#   coarse2/rerank50 0.617, coarse2/rerank100 0.717
#   coarse4/rerank50 0.617, coarse4/rerank100 0.767   <- r10/r11 ship
#   extra PQ Lloyd iteration: +0.016 at rerank 50, +0.000 at 100
# Round-12 engine-measured extension (same method, probe 4):
#   coarse4/rerank150 0.800, coarse4/rerank200 0.800
#   coarse6/rerank100 0.783, coarse6/rerank200 0.817  <- ship (r12)
#   coarse8/rerank200 0.850
# Ship moved to coarse6/rerank200 = 0.817 at UNCHANGED probe cost:
# +2 coarse Lloyd passes are train-time (amortized once per index
# build) and the doubled rerank stays a per-query CONSTANT — the two
# cheap levers the r11 knee identified, spent exactly as it advised.
# Probe CEILING (true neighbors inside probed cells) explains the
# levers: coarse2 = 0.733@4, coarse4 = 0.800@4 — more Lloyd sharpens
# the cells; the rerank widening recovers ADC near-misses inside the
# probed set (4-bit codes on a tightly-clustered 500-vector fixture
# discriminate weakly; at production scale rerank is a constant, not
# a corpus fraction). Raw-space coarse cells measured strictly worse
# for residuals (0.567@4 probe) — the residual only works when cells
# live in the same (normalized) space it is computed in, which is why
# this operator normalizes FIRST (FAISS cosine-metric setup).
# vs the raw-encoding operator: 0.817 @ probe4 > 0.717 @ probe6 —
# better recall while scanning 4/6 of the cells per query.


def _res_c2n_mean_sql(i: int) -> str:
    """Component i of a cell's NORMALIZED-space centroid: the
    integer-exact half-up mean over members' embedding[i]/nrm."""
    return _km_mean_sql(f"(CAST(e.embedding[{i}] AS DOUBLE) / e.nrm)")


def _resn_assign_factory(cents: "np.ndarray", cells: list[int]):
    """_km_assign_factory on the UNIT SPHERE: nearest-cell assignment
    of the NORMALIZED vector (left-fold distances, lowest-cell
    tiebreak). The whole residual index lives in normalized space —
    cells are angular regions, which is the FAISS cosine-metric setup
    (normalize, then L2 everywhere)."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = vecs / _leftfold_norms(vecs)[:, None]
            acc = np.zeros((vn.shape[0], cents.shape[0]))
            for i in range(vn.shape[1]):
                d = vn[:, i : i + 1] - cents[None, :, i]
                acc += d * d
            pos = acc.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": [cells[p] for p in pos],
                    "d": acc[np.arange(len(pos)), pos],
                }
            )

    return fn


def _res_factory(
    cents: "np.ndarray",
    cells: list[int],
    codebooks: dict[int, tuple[list[int], "np.ndarray"]],
    emit_residuals: bool,
):
    """mapInPandas factory for the residual pipeline: assign the
    NORMALIZED vector to its coarse cell (``cents`` rows are the
    normalized-space centroids, ascending ``cells`` order so argmin's
    first-min = the oracle's ORDER BY d, cell), subtract that
    centroid to form the residual, and encode each residual subspace
    against ``codebooks`` (codes ascending -> ORDER BY d, code).
    ``emit_residuals`` adds r1..r{DIM} columns for the training
    aggregate (pass 1); pass 2 emits codes only."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = vecs / _leftfold_norms(vecs)[:, None]
            acc = np.zeros((vn.shape[0], cents.shape[0]))
            for i in range(vn.shape[1]):
                d = vn[:, i : i + 1] - cents[None, :, i]
                acc += d * d
            pos = acc.argmin(axis=1)
            res = vn - cents[pos]
            out = {
                "vec_id": pdf["vec_id"],
                "cell": np.array([cells[p] for p in pos], dtype="int32"),
            }
            for s in range(PQ_M):
                codes_s, cents_s = codebooks[s]
                a2 = np.zeros((res.shape[0], cents_s.shape[0]))
                for j in range(PQ_SUBDIM):
                    d = (
                        res[:, s * PQ_SUBDIM + j : s * PQ_SUBDIM + j + 1]
                        - cents_s[None, :, j]
                    )
                    a2 += d * d
                p2 = a2.argmin(axis=1)
                out[f"c{s}"] = np.array(
                    [codes_s[p] for p in p2], dtype="int32"
                )
            if emit_residuals:
                for i in range(DIM):
                    out[f"r{i + 1}"] = res[:, i]
            yield pd.DataFrame(out)

    return fn


_RES_CODES_SCHEMA = "vec_id long, cell int, " + ", ".join(
    f"c{s} int" for s in range(PQ_M)
)
_RES_PASS1_SCHEMA = (
    _RES_CODES_SCHEMA + ", " + ", ".join(f"r{i} double" for i in range(1, DIM + 1))
)


def _res_train_stats_factory(
    cents: "np.ndarray",
    cells: list[int],
    codebooks: dict[int, tuple[list[int], "np.ndarray"]],
):
    """_res_factory's pass-1 (assign -> residual -> encode against the
    init codebooks) fused with the per-(s, code) training sums over the
    RESIDUAL components (r13): exact int64 micro partial sums replace
    the 64-double residual payload + stack unpivot + decimal aggregate.
    Identical assignment/encode arithmetic; _micro_halfup quantizes the
    same residual doubles the Arrow pass used to ship."""
    import pandas as pd

    def fn(batches):
        n_acc = np.zeros((PQ_M, PQ_K), dtype=np.int64)
        x_acc = np.zeros((PQ_M, PQ_K, PQ_SUBDIM), dtype=np.int64)
        code_idx: dict[int, dict[int, int]] = {
            s: {c: i for i, c in enumerate(codebooks[s][0])}
            for s in range(PQ_M)
        }
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            vn = vecs / _leftfold_norms(vecs)[:, None]
            acc = np.zeros((vn.shape[0], cents.shape[0]))
            for i in range(vn.shape[1]):
                d = vn[:, i : i + 1] - cents[None, :, i]
                acc += d * d
            pos = acc.argmin(axis=1)
            res = vn - cents[pos]
            micro = _micro_halfup(res)
            for s in range(PQ_M):
                codes_s, cents_s = codebooks[s]
                a2 = np.zeros((res.shape[0], cents_s.shape[0]))
                for j in range(PQ_SUBDIM):
                    d = (
                        res[:, s * PQ_SUBDIM + j : s * PQ_SUBDIM + j + 1]
                        - cents_s[None, :, j]
                    )
                    a2 += d * d
                p2 = a2.argmin(axis=1)
                slot = np.array(
                    [code_idx[s][codes_s[p]] for p in p2], dtype=np.int64
                )
                np.add.at(n_acc[s], slot, 1)
                np.add.at(
                    x_acc[s],
                    slot,
                    micro[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM],
                )
        inv_codes = {
            s: {i: c for c, i in code_idx[s].items()} for s in range(PQ_M)
        }
        live = np.argwhere(n_acc > 0)
        out = {
            "s": np.array([int(s) for s, _c in live], dtype="int32"),
            "code": np.array(
                [int(inv_codes[int(s)][int(c)]) for s, c in live],
                dtype="int32",
            ),
            "n": np.array([n_acc[s, c] for s, c in live], dtype=np.int64),
        }
        for j in range(PQ_SUBDIM):
            out[f"x{j + 1}"] = np.array(
                [x_acc[s, c, j] for s, c in live], dtype=np.int64
            )
        yield pd.DataFrame(out)

    return fn


def _ivfpq_res_oracle() -> str:
    """The residual chain, ENTIRELY on the unit sphere (the FAISS
    cosine-metric setup: normalize, then L2 everywhere): a
    normalized-space Lloyd fit of depth ``IVFPQ_RES_COARSE_ITERS``
    (c0 = the 8 fixed init vectors normalized -> a1 -> c1 -> ... ->
    c{ITERS}, generated to that constant), inverted file and probe
    over the final centroids, residuals resn = normalized vector minus
    its cell's final centroid (64 explicit columns), a residual-space
    init codebook cbres (the SAME 16 fixed PQ vectors, re-expressed as
    their own residuals), one quantized-Lloyd refinement cb1 over residual
    members, re-encode, and a CELL-AWARE ADC (the query's distance
    table is per probed cell, because the query residual differs per
    cell)."""
    nrm = _SQL_NORM.format(a="embedding")
    c2n_cols = ", ".join(
        f"{_res_c2n_mean_sql(i)} AS m{i}" for i in range(1, DIM + 1)
    )
    cent_list = "list_value(" + ", ".join(f"m{i}" for i in range(1, DIM + 1)) + ")"
    # normalized-space distances: corpus side e.embedding[i]/e.nrm,
    # centroid side cent[i] (c0's cent is raw[i]/cnrm at build)
    ndist = " + ".join(
        f"(CAST(e.embedding[{i}] AS DOUBLE) / e.nrm - c.cent[{i}])"
        f" * (CAST(e.embedding[{i}] AS DOUBLE) / e.nrm - c.cent[{i}])"
        for i in range(1, DIM + 1)
    )
    res_cols = ", ".join(
        f"CAST(v.embedding[{i}] AS DOUBLE) / v.nrm - c.cent[{i}] AS r{i}"
        for i in range(1, DIM + 1)
    )
    qres_cols = ", ".join(
        f"CAST(q.embedding[{i}] AS DOUBLE) / q.nrm - c.cent[{i}] AS r{i}"
        for i in range(1, DIM + 1)
    )
    # the normalized-space Lloyd chain, loop-generated to the
    # configured depth: a{i} assigns against c{i-1}, c{i} is the
    # quantized normalized-mean update over a{i}'s members
    lloyd_chain = ",\n    ".join(
        f"""a{i} AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cell,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {ndist}, c.cell) AS rn
        FROM validn e CROSS JOIN c{i - 1} c)
      WHERE rn = 1),
    c{i} AS MATERIALIZED (
      SELECT cell, {cent_list} AS cent FROM (
        SELECT a{i}.cell, {c2n_cols}
        FROM a{i} JOIN validn e USING (vec_id) GROUP BY a{i}.cell))"""
        for i in range(1, IVFPQ_RES_COARSE_ITERS + 1)
    )
    cfinal = f"c{IVFPQ_RES_COARSE_ITERS}"

    def rdist(v: str, c: str, s: int) -> str:
        return " + ".join(
            f"({v}.r{s * PQ_SUBDIM + j} - {c}.r{s * PQ_SUBDIM + j})"
            f" * ({v}.r{s * PQ_SUBDIM + j} - {c}.r{s * PQ_SUBDIM + j})"
            for j in range(1, PQ_SUBDIM + 1)
        )

    def rdist_cb1(v: str, s: int) -> str:
        return " + ".join(
            f"({v}.r{s * PQ_SUBDIM + j} - c.m{j})"
            f" * ({v}.r{s * PQ_SUBDIM + j} - c.m{j})"
            for j in range(1, PQ_SUBDIM + 1)
        )

    enc1_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT v.vec_id, {s} AS s, c.code, {rdist('v', 'c', s)} AS d"
        " FROM resn v CROSS JOIN cbres c"
        for s in range(PQ_M)
    )
    cb1_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT {s} AS s, k.code, "
        + ", ".join(
            f"{_km_mean_sql(f'e.r{s * PQ_SUBDIM + j}')} AS m{j}"
            for j in range(1, PQ_SUBDIM + 1)
        )
        + f" FROM codes1 k JOIN resn e USING (vec_id) WHERE k.s = {s}"
        " GROUP BY k.code"
        for s in range(PQ_M)
    )
    enc2_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT v.vec_id, {s} AS s, c.code, {rdist_cb1('v', s)} AS d"
        f" FROM resn v CROSS JOIN (SELECT * FROM cb1 WHERE s = {s}) c"
        for s in range(PQ_M)
    )
    qdist_blocks = "\n      UNION ALL\n      ".join(
        f"SELECT q.query_id, q.cell, {s} AS s, c.code, {rdist_cb1('q', s)} AS d"
        f" FROM qres q CROSS JOIN (SELECT * FROM cb1 WHERE s = {s}) c"
        for s in range(PQ_M)
    )
    return f"""
    WITH validn AS MATERIALIZED (
      SELECT vec_id, embedding, {nrm} AS nrm
      FROM embeddings WHERE {_VALID_VEC_SQL}),
    queriesn AS MATERIALIZED (
      SELECT vec_id, embedding, nrm FROM validn WHERE vec_id < {N_QUERIES}),
    c0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
             list_transform(embedding,
                            x -> CAST(x AS DOUBLE) / {nrm}) AS cent
      FROM embeddings
      WHERE vec_id BETWEEN {IVF_CENTROID_LO} AND {IVF_CENTROID_HI}),
    {lloyd_chain},
    dfin AS MATERIALIZED (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {ndist}, c.cell) AS rn
      FROM validn e CROSS JOIN {cfinal} c),
    afin AS MATERIALIZED (SELECT vec_id, cell FROM dfin WHERE rn = 1),
    probe AS (
      SELECT vec_id AS query_id, cell FROM dfin
      WHERE vec_id < {N_QUERIES} AND rn <= {IVFPQ_RES_PROBE}),
    resn AS MATERIALIZED (
      SELECT v.vec_id, a.cell, {res_cols}
      FROM validn v JOIN afin a USING (vec_id)
      JOIN {cfinal} c USING (cell)),
    cbres AS MATERIALIZED (
      SELECT vec_id - {PQ_CB_LO} AS code, * FROM resn
      WHERE vec_id BETWEEN {PQ_CB_LO} AND {PQ_CB_HI}),
    cdist1 AS MATERIALIZED (
      {enc1_blocks}),
    codes1 AS MATERIALIZED (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM cdist1) WHERE rn = 1),
    cb1 AS MATERIALIZED (
      {cb1_blocks}),
    cdist2 AS MATERIALIZED (
      {enc2_blocks}),
    codes2 AS MATERIALIZED (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM cdist2) WHERE rn = 1),
    qres AS MATERIALIZED (
      SELECT p.query_id, p.cell, {qres_cols}
      FROM probe p JOIN queriesn q ON q.vec_id = p.query_id
      JOIN {cfinal} c USING (cell)),
    qdist AS (
      {qdist_blocks}),
    qtab AS MATERIALIZED (
      SELECT query_id, cell, s, code,
             CAST(FLOOR(d * 1000000.0 + 0.5) AS BIGINT) AS dmicro
      FROM qdist),
    cand0 AS MATERIALIZED (
      SELECT p.query_id, a.vec_id AS neighbor_id, a.cell
      FROM probe p JOIN afin a USING (cell)
      WHERE p.query_id <> a.vec_id),
    adc AS MATERIALIZED (
      SELECT c.query_id, c.neighbor_id,
             CAST(SUM(t.dmicro) AS BIGINT) AS adc_micro
      FROM cand0 c
      JOIN codes2 k ON k.vec_id = c.neighbor_id
      JOIN qtab t ON t.query_id = c.query_id AND t.cell = c.cell
                 AND t.s = k.s AND t.code = k.code
      GROUP BY 1, 2),
    cand AS (
      SELECT query_id, neighbor_id, adc_micro FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc_micro, neighbor_id) AS rn
        FROM adc) WHERE rn <= {IVFPQ_RES_RERANK}),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(cand.adc_micro AS DOUBLE) / 1000000.0 AS adc_dist,
             ROUND({_SQL_DOT.format(a='qe.embedding', b='ce.embedding')}
                   / ({_SQL_NORM.format(a='qe.embedding')}
                      * {_SQL_NORM.format(a='ce.embedding')}), 6) AS cosine
      FROM cand
      JOIN embeddings qe ON qe.vec_id = cand.query_id
      JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, adc_dist, cosine, rn AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 3
    """


@query("sim_ann_ivfpq_residual", oracle=_ivfpq_res_oracle())
def sim_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ with RESIDUAL encoding, oracle-exact end to end — the
    configuration FAISS actually ships as IVFPQ for the cosine metric:
    normalize first, then build the WHOLE index on the unit sphere. A
    {IVFPQ_RES_COARSE_ITERS}-iteration normalized-space Lloyd fit
    gives angular cells; each vector's PQ codes are trained on and
    encode its RESIDUAL (normalized vector minus its cell's centroid)
    instead of the raw normalized vector — the coarse step explains
    the rough position, the 4-bit budget spends all its resolution on
    what's left. Measured on the fixture: recall@3 = 0.767 at probe
    {IVFPQ_RES_PROBE}, above the raw-encoding operator's 0.717 at
    probe 6 — equal-or-better recall while scanning 4/6 of the cells
    per query, the residual selling point at 100 TB (full knee grid
    and the probe-ceiling analysis at IVFPQ_RES_PROBE above; the
    raw-space-cells variant measured 0.567@4, which is WHY the index
    normalizes first).

    Mechanics, each stage cross-engine-replayable: cell centroids are
    per-cell integer-exact half-up means of normalized components
    (the _km_mean_sql grid), iterated {IVFPQ_RES_COARSE_ITERS} times
    from the normalized fixed init; residual init codebook = the same
    16 fixed PQ vectors re-expressed as their own residuals (so init
    magnitudes match residual magnitudes); one quantized-Lloyd
    refinement over residual members (the _pq_train shape: ONE
    unpivoted stack -> (s, code) hash aggregate, 128 rows out, encode
    executions bounded); re-encode; then a CELL-AWARE ADC — the
    query's distance table is computed per probed cell because the
    query residual differs per cell (FAISS's per-list table), joined
    on (query, cell, s, code) as broadcast integer lookups; floats
    only at the {IVFPQ_RES_RERANK}-row exact rerank.

    Scale shape (100 TB): per Lloyd iteration one mapInPandas
    assignment pass + one <= {IVF_CELLS}-row hash aggregate of {DIM}
    decimal sums (map-side combinable); ingest is one assignment +
    two encode passes; the ADC table is per probed cell
    ({IVFPQ_RES_PROBE} x {PQ_M} x {PQ_K} rows per query, still a
    broadcast constant); candidates per query DROP by the probe
    ratio vs the raw operator; the rerank reads {IVFPQ_RES_RERANK}
    float vectors — a constant, not a corpus fraction. All collects
    bounded: 8-row cell centroids per iteration, 16x64 residual init,
    128-row trained codebook, 20 query vectors.

    Reference: completes the ANN ladder's final rung the round-9
    verdict named (residual encoding, FAISS IVFPQ parity); motorway
    itself has no retrieval surface (north-star extension,
    SURVEY.md §2b)."""
    from motorway_spark.maintenance import CACHES

    emb = _valid_vectors(Catalog(spark, sf_dir).embeddings)
    # r13: corpus-size-derived fan-out (see _lloyd_fit / guide §2)
    par = scale_partitions(spark, sf_dir, "embeddings")
    corpus = CACHES.persist_swap(
        "ivfpq_res.corpus",
        emb.repartition(par).select("vec_id", "embedding"),
    )

    # normalized-space coarse quantizer: IVFPQ_RES_COARSE_ITERS Lloyd iterations on the
    # unit sphere from the normalized fixed init (c0 -> a1 -> c1 ->
    # a2 -> c2); each iteration = one assignment pass + one <=8-row
    # hash aggregate of DIM integer-exact normalized means
    init_rows = (
        Catalog(spark, sf_dir)
        .embeddings.filter(
            (F.col("vec_id") >= IVF_CENTROID_LO)
            & (F.col("vec_id") <= IVF_CENTROID_HI)
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    iv = np.array([r["embedding"] for r in init_rows], dtype=np.float64)
    cents = iv / _leftfold_norms(iv)[:, None]
    cells = list(range(IVF_CELLS))
    # r13: each coarse iteration is the fused normalized stats pass —
    # per-cell int64 micro sums of element/nrm (bit-equal to the old
    # _km_mean_sql decimal aggregate over the Arrow-returned corpus)
    for _ in range(IVFPQ_RES_COARSE_ITERS):
        _rows, cells, cents = _km_stats_rows(
            corpus.mapInPandas(
                _km_assign_stats_factory(cents, cells, normalize=True),
                schema=_KM_STATS_SCHEMA,
            )
        )
    cell_pos = {c: k for k, c in enumerate(cells)}
    # NOTE r12 opt: no separate inverted-file assignment pass — the
    # trained-encode pass (codes2 below) assigns each vector's cell
    # with the identical normalized left-fold arithmetic, so its cell
    # column IS the inverted file. One full mapInPandas pass removed
    # (guide §1.2: fewer passes).

    # residual init codebook: the 16 fixed PQ vectors as their own
    # residuals (init magnitudes match residual magnitudes)
    cb_rows = (
        emb.filter(
            (F.col("vec_id") >= PQ_CB_LO) & (F.col("vec_id") <= PQ_CB_HI)
        )
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    cbv = np.array([r["embedding"] for r in cb_rows], dtype=np.float64)
    cbn = cbv / _leftfold_norms(cbv)[:, None]
    acc = np.zeros((cbn.shape[0], cents.shape[0]))
    for i in range(DIM):
        d = cbn[:, i : i + 1] - cents[None, :, i]
        acc += d * d
    cbres_full = cbn - cents[acc.argmin(axis=1)]
    init = {
        s: (
            list(range(PQ_K)),
            cbres_full[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM],
        )
        for s in range(PQ_M)
    }

    # train: pass-1 residual encode FUSED with the (s, code) training
    # sums (r13 — previously the pass shipped 64 residual doubles per
    # vector back through Arrow into a stack unpivot + decimal
    # aggregate; the int64 micro sums are bit-equal, see _micro_halfup)
    trained = _pq_stats_trained(
        corpus.mapInPandas(
            _res_train_stats_factory(cents, cells, init),
            schema=_PQ_STATS_SCHEMA,
        )
    )

    # Persisted: the final plan references the trained codes TWICE
    # (the probe join's inverted file and the exploded ADC input) —
    # without the persist each branch re-runs the encode mapInPandas
    # over the whole corpus. Bounded: one (cell, codes) row per vector.
    codes2 = CACHES.persist_swap(
        "ivfpq_res.codes",
        corpus.mapInPandas(
            _res_factory(cents, cells, trained, emit_residuals=False),
            schema=_RES_CODES_SCHEMA,
        ),
        exclusive=False,
    )

    # driver-side: probe lists + per-(query, cell) residual ADC tables
    q_rows = (
        corpus.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    import math

    probe_pairs = []
    tab_rows = []
    for r in q_rows:
        v = np.array(r["embedding"], dtype=np.float64)
        qn = (v / _leftfold_norms(v[None, :])[:, None])[0]
        qacc = np.zeros(cents.shape[0])
        for i in range(DIM):
            d = qn[i] - cents[:, i]
            qacc += d * d
        order = sorted(
            range(len(cells)), key=lambda p: (qacc[p], cells[p])
        )
        for p in order[:IVFPQ_RES_PROBE]:
            cell = cells[p]
            probe_pairs.append((int(r["vec_id"]), cell))
            qres = qn - cents[cell_pos[cell]]
            for s in range(PQ_M):
                codes_s, cents_s = trained[s]
                sacc = np.zeros(cents_s.shape[0])
                for j in range(PQ_SUBDIM):
                    d = qres[s * PQ_SUBDIM + j] - cents_s[:, j]
                    sacc += d * d
                tab_rows += [
                    (
                        int(r["vec_id"]),
                        cell,
                        s,
                        int(codes_s[p2]),
                        int(math.floor(sacc[p2] * 1e6 + 0.5)),
                    )
                    for p2 in range(len(codes_s))
                ]

    probe = F.broadcast(
        spark.createDataFrame(probe_pairs, "query_id long, cell int")
    )
    tab = F.broadcast(
        spark.createDataFrame(
            tab_rows, "query_id long, cell int, s int, code int, dmicro long"
        )
    )

    cand0 = (
        probe.join(codes2.select("vec_id", "cell"), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", "cell")
    )
    stack = ", ".join(f"{s}, c{s}" for s in range(PQ_M))
    exploded = codes2.select(
        "vec_id", F.expr(f"stack({PQ_M}, {stack}) AS (s, code)")
    )
    adc = (
        cand0.join(exploded, "vec_id")
        .join(tab, ["query_id", "cell", "s", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dmicro").alias("adc_micro"))
    )
    wa = Window.partitionBy("query_id").orderBy("adc_micro", "vec_id")
    cand = (
        adc.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= IVFPQ_RES_RERANK)
        .drop("rn")
    )
    q_emb = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        cand.join(
            corpus.select("vec_id", F.col("embedding").alias("c_emb")),
            "vec_id",
        )
        .join(F.broadcast(q_emb), "query_id")
        .withColumn(
            "cosine",
            F.round(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("adc_micro").cast("double") / F.lit(1000000.0)).alias(
                "adc_dist"
            ),
            "cosine",
            "rank",
        )
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion — the standard retrieval ensemble (Cormack et
# al., SIGIR'09): fuse two independent ANN rankings into a consensus
# ranking without score calibration, using only the ranks.
# ---------------------------------------------------------------------------
RRF_K = 60  # the canonical smoothing constant from the RRF paper


def _rrf_oracle() -> str:
    """Compose the two branch oracles verbatim as CTEs (a CTE body may
    itself start with WITH), then fuse: score = sum over branches of
    1/(RRF_K + rank) — two exact double terms added left-to-right,
    identical IEEE arithmetic in both engines."""
    from motorway_spark.queries.registry import ORACLES

    lsh = ORACLES["sim_ann_lsh"]
    ivf = ORACLES["sim_ann_ivf_fixed"]
    return f"""
    WITH lsh AS MATERIALIZED ({lsh}),
    ivf AS MATERIALIZED ({ivf}),
    pairs AS (
      SELECT COALESCE(l.query_id, i.query_id) AS query_id,
             COALESCE(l.neighbor_id, i.neighbor_id) AS neighbor_id,
             l.rank AS lsh_rank, i.rank AS ivf_rank
      FROM lsh l FULL JOIN ivf i
        ON l.query_id = i.query_id AND l.neighbor_id = i.neighbor_id),
    scored AS (
      SELECT query_id, neighbor_id, lsh_rank, ivf_rank,
             COALESCE(1.0 / ({RRF_K} + lsh_rank), 0.0)
             + COALESCE(1.0 / ({RRF_K} + ivf_rank), 0.0) AS rrf_score
      FROM pairs)
    SELECT query_id, neighbor_id, lsh_rank, ivf_rank, rrf_score,
           rn AS fused_rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf_score DESC, neighbor_id)
                 AS rn
          FROM scored)
    WHERE rn <= 3
    """


@query("sim_rank_fusion_rrf", oracle=_rrf_oracle())
def sim_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion over two independent ANN branches — the
    retrieval ensemble a production vector-search stack runs when no
    single index is trusted alone: LSH (hash prune) and IVF (partition
    prune) each produce a top-3 ranking per query from DIFFERENT
    candidate geometries; RRF scores every (query, neighbor) with
    sum(1 / ({RRF_K} + rank)) over the branches that returned it and
    reranks — no score calibration, only ranks, which is why RRF
    survives heterogeneous retrievers (BM25 + vectors in a full RAG
    stack; two ANN layouts here, where both branches carry full
    oracles). Agreement rises: a neighbor both branches rank floats to
    the top even when neither ranked it first.

    Scale shape (100 TB): the branches ARE the scale story (each is
    its own audited operator); the fusion itself is a full outer join
    on (query_id, neighbor_id) over two tiny top-k frames (20 x 3 rows
    each) and a per-query window over <= 6 rows — constant work per
    query regardless of corpus size.

    Reference: motorway has no retrieval surface; this extends the
    north-star ANN family (SURVEY.md §2b) with the ensemble layer,
    composing two registered operators the way pipeline_dedup_funnel
    composes the dedup stages. The oracle embeds both branch oracles
    verbatim as CTEs and replays the fusion arithmetic."""
    # Materialize each branch's tiny top-k (20 x 3 rows) EAGERLY before
    # invoking the next branch: both branches ride the exclusive
    # CACHES.persist_swap, so building sim_ann_ivf_fixed releases
    # sim_ann_lsh's cached corpus — a lazy LSH frame would then fully
    # recompute from scan at action time. localCheckpoint truncates the
    # lineage while the branch's cache is still live, so the fused join
    # reads two materialized k-row frames.
    l = (
        sim_ann_lsh(spark, sf_dir)
        .select("query_id", "neighbor_id", F.col("rank").alias("lsh_rank"))
        .localCheckpoint(eager=True)
    )
    i = (
        sim_ann_ivf_fixed(spark, sf_dir)
        .select("query_id", "neighbor_id", F.col("rank").alias("ivf_rank"))
        .localCheckpoint(eager=True)
    )
    pairs = l.join(i, ["query_id", "neighbor_id"], "full")
    score = (
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lsh_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("ivf_rank")), F.lit(0.0))
    ).alias("rrf_score")
    scored = pairs.select(
        "query_id", "neighbor_id", "lsh_rank", "ivf_rank", score
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), "neighbor_id"
    )
    return (
        scored.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= 3)
        .orderBy("query_id", "fused_rank")
    )


# ---------------------------------------------------------------------------
# Embedding drift monitor — the ML-ops data-quality gate for vector
# columns: per-label centroid movement between two corpus halves on
# the integer micro grid (the Lloyd movement arithmetic repurposed).
# ---------------------------------------------------------------------------
DRIFT_TOL_MICRO = 200000  # flag when a label's centroid moved > 0.2


def _emb_drift_oracle() -> str:
    mean_cols = ", ".join(
        f"{_km_mean_sql(f'e.embedding[{i}]')} AS m{i}" for i in range(1, DIM + 1)
    )
    move = "greatest(" + ", ".join(
        f"CAST(FLOOR(ABS(r.m{i} - c.m{i}) * 1000000.0 + 0.5) AS BIGINT)"
        for i in range(1, DIM + 1)
    ) + ")"
    return f"""
    WITH halves AS MATERIALIZED (
      SELECT e.label, e.vec_id % 2 AS half, COUNT(*) AS n, {mean_cols}
      FROM embeddings e
      WHERE {_VALID_VEC_SQL} AND label IS NOT NULL
      GROUP BY e.label, e.vec_id % 2),
    joined AS (
      SELECT r.label, r.n AS n_ref, c.n AS n_cand, {move} AS drift_micro
      FROM (SELECT * FROM halves WHERE half = 0) r
      JOIN (SELECT * FROM halves WHERE half = 1) c USING (label))
    SELECT CAST(label AS INTEGER) AS label,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cand AS BIGINT) AS n_cand,
           drift_micro,
           drift_micro > {DRIFT_TOL_MICRO} AS drifted
    FROM joined
    ORDER BY label
    """


@query("dq_embedding_drift", oracle=_emb_drift_oracle())
def dq_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor — the vector-column analogue of
    dq_split_drift_chi2: did the embedding distribution MOVE between
    two corpus halves (old/new crawl, train/serve window, A/B shard)?
    Per label the two halves' centroids are integer-exact micro-grid
    means (_km_mean_sql — the cluster_kmeans_lloyd arithmetic), and
    drift is the max per-dim centroid delta in micro units (the Lloyd
    MOVEMENT criterion repurposed as a monitor), flagged above
    {DRIFT_TOL_MICRO} micro. Because every quantity is integer-exact,
    the drift DECISION is cross-engine-stable — a drift monitor whose
    own arithmetic drifts is how silent threshold rot starts.

    The parity split (vec_id % 2) is the null-hypothesis calibration:
    halves of the SAME distribution should sit under the threshold, so
    a flagged label on a real old/new split is signal, not split
    noise (measured on the fixture: parity-split noise 0.070-0.125
    micro-max at ~25 rows/half — small halves are noisy, 1/sqrt(n) —
    so the threshold sits at 0.2, above the null at this granularity
    and far below a real distribution move; all 10 labels read
    drifted=false on the calibration split).

    Scale shape (100 TB): ONE hash aggregate to (labels x 2) rows
    ({DIM} decimal sums each, map-side combinable), a tiny self-join,
    {DIM}-way GREATEST — no window, no driver data path; the monitor
    costs one corpus scan regardless of label count.

    Reference: motorway's stats pipeline watches stream volumes; this
    is the embedding-quality gate its ML users would bolt on, per the
    north-star (SURVEY §2b data-quality family)."""
    emb = _valid_vectors(Catalog(spark, sf_dir).embeddings).filter(
        F.col("label").isNotNull()
    )
    # Deliberately the two-branch form: folding both halves into ONE
    # groupBy(label) of 128 conditional decimal sums (each half's
    # _km_mean_sql with SUM/COUNT replaced by CASE-conditional forms —
    # bit-identical, and it halves the scan) was measured SLOWER at
    # both fixture decades (same-session interleaved best-of-N:
    # sf0.1 2.80 vs 2.70 s — noise — but sf1 3.37 vs 4.75 s, 0.71x):
    # the decimal sums dominate, the CASE doubles the expression count
    # on one task's critical path, and the two 64-sum branches execute
    # CONCURRENTLY on idle cores while the parquet re-scan they share
    # is cheap (guide §1.3: the empirical loop overrules the
    # shuffle-count ideal).
    halves = (
        emb.withColumn("half", F.col("vec_id") % 2)
        .groupBy("label", "half")
        .agg(F.count(F.lit(1)).alias("n"), *_km_mean_aggs())
    )
    r = halves.filter(F.col("half") == 0).select(
        "label",
        F.col("n").alias("n_ref"),
        *[F.col(f"m{i}").alias(f"r{i}") for i in range(1, DIM + 1)],
    )
    c = halves.filter(F.col("half") == 1).select(
        "label",
        F.col("n").alias("n_cand"),
        *[F.col(f"m{i}").alias(f"c{i}") for i in range(1, DIM + 1)],
    )
    move = F.greatest(
        *[
            F.expr(f"CAST(FLOOR(ABS(r{i} - c{i}) * 1000000.0 + 0.5) AS BIGINT)")
            for i in range(1, DIM + 1)
        ]
    ).alias("drift_micro")
    return (
        r.join(c, "label")
        .select(
            F.col("label").cast("int").alias("label"),
            "n_ref",
            "n_cand",
            move,
        )
        .withColumn("drifted", F.col("drift_micro") > DRIFT_TOL_MICRO)
        .orderBy("label")
    )
