"""Bit-equality proof for the r13 fused Lloyd/PQ training sums.

_micro_halfup (numpy, inside the fused mapInPandas stats passes) must
replicate Spark's `CAST(CAST(x AS DECIMAL(38,6)) * 1000000 AS BIGINT)`
— the per-element quantization the old _km_mean_sql aggregate applied —
for every double the passes feed it, and _micro_mean must replicate the
closing `FLOOR(CAST(2u+n AS DOUBLE)/CAST(2n AS DOUBLE))/1e6`.

Domains checked, mirroring every call site:
  1. raw fixture elements (CAST(float AS DOUBLE) widening — _lloyd_fit,
     cluster_kmeans_lloyd, sim_ann_ivf_lloyd, sim_ann_ivfpq C2)
  2. normalized elements element/nrm (_pq_train, residual coarse loop)
  3. residual components vn - cent (residual PQ train)
  4. a synthetic tie ladder: exact half-microunit decimals, values one
     ulp either side of ties, negatives, zeros, subnormal-small values
  5. _micro_mean over every (u, n) pair harvested from the fixture
     aggregates plus adversarial near-integer quotients

Usage: python tools/verify_micro_halfup.py [sf_dir]
Exit 0 = every element bit-equal; prints counts per domain.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def spark_micro(spark, vals: np.ndarray) -> np.ndarray:
    """Ground truth: Spark's own cast chain over a double column."""
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    ).selectExpr("CAST(CAST(x AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS u")
    return np.array([r["u"] for r in df.collect()], dtype=np.int64)


def check(name: str, spark, vals: np.ndarray, fails: list) -> None:
    from motorway_spark.queries.similarity import _micro_halfup

    got = _micro_halfup(vals.astype(np.float64))
    want = spark_micro(spark, vals)
    bad = np.nonzero(got != want)[0]
    print(f"{name}: n={len(vals)} mismatches={len(bad)}")
    for i in bad[:5]:
        print(f"  x={vals[i]!r} numpy={got[i]} spark={want[i]}")
    if len(bad):
        fails.append(name)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from motorway_spark.catalog import Catalog
    from motorway_spark.queries.similarity import (
        DIM,
        _leftfold_norms,
        _micro_mean,
    )
    from motorway_spark.session import get_session

    spark = get_session("verify-micro-halfup", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    fails: list = []

    emb = (
        Catalog(spark, sf_dir)
        .embeddings.filter("embedding IS NOT NULL")
        .filter(f"size(embedding) = {DIM}")
        .select("embedding")
        .toPandas()
    )
    vecs = np.array(list(emb["embedding"]), dtype=np.float64)
    norms = _leftfold_norms(vecs)
    vn = vecs / norms[:, None]
    # a plausible centroid for the residual domain: the plain mean
    res = vn - vn.mean(axis=0)[None, :]

    rng = np.random.RandomState(13)

    def sample(mat: np.ndarray, n: int) -> np.ndarray:
        flat = mat.ravel()
        idx = rng.choice(len(flat), size=min(n, len(flat)), replace=False)
        return flat[idx]

    check("raw_elements", spark, sample(vecs, 60000), fails)
    check("normalized_elements", spark, sample(vn, 60000), fails)
    check("residual_elements", spark, sample(res, 60000), fails)

    # tie ladder: exact half-microunit decimal strings (their nearest
    # double's shortest repr IS the tie, exercising HALF_UP), plus one
    # ulp either side, plus signed variants and tiny/zero values
    ladder = []
    for k in [0, 1, 2, 7, 123, 9999, 123456, 999999, 5000001]:
        t = float(f"{k}.5e-6") if k else 0.5e-6
        ladder += [t, np.nextafter(t, 0.0), np.nextafter(t, 1.0)]
    base = np.array(ladder, dtype=np.float64)
    ties = np.concatenate([base, -base, [0.0, -0.0, 1e-12, -1e-12, 2.0]])
    check("tie_ladder", spark, ties, fails)

    # _micro_mean vs the SQL closing arithmetic, over harvested sums
    u_vals = []
    for mat in (vecs, vn, res):
        from motorway_spark.queries.similarity import _micro_halfup

        micro = _micro_halfup(mat[: min(len(mat), 4000)])
        u_vals += [int(micro[: n + 1, d].sum()) for n, d in
                   zip(rng.randint(1, min(len(mat), 4000), 200),
                       rng.randint(0, DIM, 200))]
    pairs = [(u, int(rng.randint(1, 5000))) for u in u_vals]
    # adversarial: quotients landing exactly on integers / half-units
    pairs += [(10616 * 56 + 28, 56), (10616 * 56 + 27, 56), (0, 7),
              (-3, 2), (3, 2), (-1, 3), (1, 3), (999999999999, 1000000)]
    df = spark.createDataFrame(
        [(int(u), int(n)) for u, n in pairs], "u long, n long"
    ).selectExpr(
        "u", "n",
        "CAST(FLOOR(CAST(2 * u + n AS DOUBLE) / CAST(2 * n AS DOUBLE))"
        " AS DOUBLE) / 1000000.0 AS m",
    )
    bad_mean = 0
    for r in df.collect():
        got = _micro_mean(r["u"], r["n"])
        if got != r["m"]:
            bad_mean += 1
            if bad_mean <= 5:
                print(f"  mean u={r['u']} n={r['n']} numpy={got} spark={r['m']}")
    print(f"micro_mean: n={len(pairs)} mismatches={bad_mean}")
    if bad_mean:
        fails.append("micro_mean")

    print("FAIL" if fails else "ALL BIT-EQUAL")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
