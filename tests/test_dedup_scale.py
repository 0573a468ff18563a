"""Hot-bucket cap for MinHash LSH candidate generation.

A boilerplate-heavy corpus puts thousands of near-identical docs into
the same (band, bucket); the uncapped bucket-equality join then emits
width² pairs. ``band_candidates(max_bucket_width=…)`` must bound the
output (SCALE.md's promised mitigation), while leaving normal-width
buckets untouched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from motorway_spark.queries.dedup import (
    band_candidates,
    minhash_bands,
    minhash_signatures,
)


def _skewed_docs(spark):
    """40 byte-identical boilerplate docs (one white-hot bucket in every
    band) + 10 distinct docs, a few of which are near-dups of each
    other."""
    boiler = [(i, "terms of service boilerplate " * 5) for i in range(40)]
    distinct = [
        (100 + i, f"genuinely unique document number {i} with its own words {i * 7}")
        for i in range(10)
    ]
    return spark.createDataFrame(boiler + distinct, "doc_id long, text string")


def test_hot_bucket_cap_bounds_candidates(spark):
    docs = _skewed_docs(spark)
    bands = minhash_bands(minhash_signatures(docs)).cache()

    uncapped = band_candidates(bands, max_bucket_width=None)
    capped = band_candidates(bands, max_bucket_width=10)

    n_uncapped = uncapped.count()
    n_capped = capped.count()
    # uncapped: the 40-doc boilerplate bucket alone yields C(40,2)=780 pairs
    assert n_uncapped >= 780
    # capped: every >10-wide bucket dropped -> candidate count collapses
    # below the all-pairs floor of a single hot bucket
    assert n_capped < 780
    # bound: total candidates <= sum over surviving buckets of C(w,2)
    widths = (
        bands.join(
            bands.groupBy("band", "bucket").agg(F.count("*").alias("w")),
            ["band", "bucket"],
        )
        .filter(F.col("w") <= 10)
        .groupBy("band", "bucket")
        .agg(F.first("w").alias("w"))
        .collect()
    )
    pair_bound = sum(r["w"] * (r["w"] - 1) // 2 for r in widths)
    assert n_capped <= pair_bound

    # no hot-bucket member appears in any capped candidate pair
    hot_ids = set(range(40))
    for row in capped.collect():
        assert row["doc_a"] not in hot_ids
        assert row["doc_b"] not in hot_ids


def test_cap_preserves_normal_buckets(spark):
    """Pairs whose buckets are under the cap are identical with and
    without the cap — capping only removes hot-bucket output."""
    docs = _skewed_docs(spark)
    bands = minhash_bands(minhash_signatures(docs)).cache()
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in band_candidates(bands, None).collect()
        if r["doc_a"] >= 100 and r["doc_b"] >= 100
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in band_candidates(bands, 10).collect()
        if r["doc_a"] >= 100 and r["doc_b"] >= 100
    }
    assert capped == uncapped
