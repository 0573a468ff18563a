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

# ---------------------------------------------------------------------------
# PassJoin blocking completeness for the lev<=1 fuzzy join.
# ---------------------------------------------------------------------------
def test_lev1_blocking_finds_head_region_deletions(spark):
    """A deletion/insertion at position <= 9 shifts the tail, so NEITHER
    fixed half matches — the round-3 blocking missed these pairs (the
    supplier fixtures are fixed-length, so only substitutions occurred
    and the gap was invisible). The shifted-tail blocks must surface
    them regardless of which side of the pair is the longer string."""
    from motorway_spark.queries.dedup import _lev1_candidates

    rows = [
        (1, "Supplier#000000001"),
        (2, "Suplier#000000001"),   # deletion at pos 3 (head region)
        (3, "Supplier#00000001"),   # deletion at pos 10+ (tail region)
        (4, "Xupplier#000000001"),  # substitution at pos 1
        (5, "completely different name"),
        # longer-string-has-LOWER-id orientation of a head-region edit
        (6, "xVendor#9912345"),
        (7, "Vendor#9912345"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    cand = _lev1_candidates(df, "id", "name")
    got = {(r["supp_a"], r["supp_b"]) for r in cand.collect()}
    # every true lev<=1 pair must be a candidate
    assert (1, 2) in got   # head-region deletion (the round-3 miss)
    assert (1, 3) in got   # tail-region deletion
    assert (1, 4) in got   # substitution
    assert (6, 7) in got   # head-region edit, other orientation
    # and nothing pairs with the unrelated name at lev<=1 after the
    # exact filter the query applies
    from pyspark.sql import functions as F

    exact = cand.withColumn("d", F.levenshtein("name_a", "name_b")).filter(
        F.col("d") <= 1
    )
    ids = {(r["supp_a"], r["supp_b"]) for r in exact.collect()}
    assert all(5 not in pair for pair in ids)


# ---------------------------------------------------------------------------
# Containment df-cap invariants (round 4) — same argument as the minhash
# hot-bucket cap, applied to shingle document frequency.
# ---------------------------------------------------------------------------
def _containment_corpus(spark):
    """60 byte-identical boilerplate docs (every shingle df=60 — the
    quadratic blow-up case) + one genuine containment pair built from
    rare shingles + 8 unrelated docs."""
    boiler = [(i, "terms of service apply here now always forever and ever amen") for i in range(60)]
    contained = [(200, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    container = [(201, "alpha beta gamma delta epsilon zeta eta theta iota kappa plus a tail")]
    distinct = [
        (300 + i, f"unique document number {i} speaks only about topic {i * 13}")
        for i in range(8)
    ]
    return spark.createDataFrame(
        boiler + contained + container + distinct, "doc_id long, text string"
    )


def test_containment_df_cap_suppresses_boilerplate_quadratics(spark):
    from motorway_spark.queries.dedup import containment_pairs

    docs = _containment_corpus(spark)
    out = containment_pairs(docs, df_cap=5).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}

    # every boilerplate shingle has df=60 > cap: the 60*59 directional
    # boilerplate pairs must NOT be candidates (they are exact dupes —
    # dedup_exact's job, same routing argument as the minhash cap)
    assert not any(a < 100 and b < 100 for a, b in pairs)

    # the genuine containment pair rides its rare shingles: doc 200's
    # shingles are all present in doc 201 (containment 1.0), and 201 is
    # NOT contained in 200 (the tail shingles are missing)
    assert (200, 201) in pairs
    assert (201, 200) not in pairs
    row = next(r for r in out if (r.doc_a, r.doc_b) == (200, 201))
    assert row.n_common == row.n_a and row.containment == 1.0


def test_containment_uncapped_would_explode(spark):
    """Sanity check on the argument itself: WITHOUT the cap the same
    corpus yields all 60*59 boilerplate pairs as candidates — the cap
    is load-bearing, not cosmetic."""
    from motorway_spark.queries.dedup import containment_pairs

    docs = _containment_corpus(spark)
    out = containment_pairs(docs, df_cap=10_000).collect()
    boiler_pairs = {(r.doc_a, r.doc_b) for r in out if r.doc_a < 100 and r.doc_b < 100}
    assert len(boiler_pairs) == 60 * 59  # identical docs: containment 1.0 both ways


def test_url_canonicalization_kernel_edges(spark):
    """The canonical kernel (r5) must collapse the documented mess —
    case, www, default port, trailing slash, fragment, utm params,
    param order — and must NOT collapse genuinely different URLs."""
    from motorway_spark.queries.dedup import _CANON_SPARK
    from pyspark.sql import functions as F

    cases = [
        # (raw, expected canonical)
        ("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&ref=rss#top",
         "https://example.com/A/b?ref=rss"),
        ("https://example.com/A/b?ref=rss",
         "https://example.com/A/b?ref=rss"),
        ("https://example.com/A/b?b=2&a=1",
         "https://example.com/A/b?a=1&b=2"),      # params sorted
        ("https://example.com/A/b?utm_campaign=only",
         "https://example.com/A/b"),               # all params dropped
        ("https://example.com:443/",
         "https://example.com"),                   # root slash stripped
        ("https://example.com/other",
         "https://example.com/other"),             # distinct stays distinct
        ("https://example.com:8443/x",
         "https://example.com:8443/x"),            # non-default port kept
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "raw_url string")
    got = [
        r["c"]
        for r in df.select(
            F.expr(_CANON_SPARK.format(u="raw_url")).alias("c")
        ).collect()
    ]
    assert got == [want for _, want in cases]


def test_url_canonical_dedup_groups_complete(spark, sf_dir):
    """Every canonical page must gather its full variant group: doc_ids
    3k..3k+2 map to page k, so n_variants == 3 (or the partial tail),
    n_distinct_raw == n_variants (synthesized forms all differ), and
    the keeper is the smallest doc_id of the group."""
    from motorway_spark.queries import QUERIES

    rows = QUERIES["dedup_url_canonical"](spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_variants"] for r in rows) == n_docs
    for r in rows:
        page = r["keeper_doc_id"] // 3
        assert r["keeper_doc_id"] == page * 3  # min of the group
        assert f"/docs/page-{page}?" in r["canonical_url"] or r[
            "canonical_url"
        ].endswith(f"/docs/page-{page}")
        assert r["n_distinct_raw"] == r["n_variants"]
        assert r["n_variants"] <= 3


def test_chunk_dedup_keep_first_semantics(spark, tmp_path):
    """r5: dedup_chunk_global must keep the globally FIRST occurrence of
    each 10-token chunk ((doc_id, idx) order), drop every later copy,
    chunk the tail short, and reassemble survivors in original order —
    pinned on a crafted corpus where the expected output is computable
    by hand."""
    from motorway_spark.queries import QUERIES
    from motorway_spark.queries.dedup import CHUNK_TOKENS

    assert CHUNK_TOKENS == 10
    c1 = " ".join(f"a{i}" for i in range(10))   # chunk shared by all docs
    c2 = " ".join(f"b{i}" for i in range(10))   # unique to doc 0
    c3 = " ".join(f"c{i}" for i in range(10))   # unique to doc 1
    tail = "t0 t1 t2"                            # 3-token tail chunk (doc 2)
    rows = [
        (0, f"{c1} {c2}", "en", "s", 0),         # keeps both (first owner of c1)
        (1, f"{c1} {c3}", "en", "s", 0),         # keeps only c3
        (2, f"{c1} {tail}", "en", "s", 0),       # keeps only the tail
        (3, c1, "en", "s", 0),                   # keeps nothing
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in QUERIES["dedup_chunk_global"](spark, str(tmp_path)).collect()
    }
    assert len(out) == 4  # empty docs still reported
    assert (out[0]["n_chunks_total"], out[0]["n_chunks_kept"]) == (2, 2)
    assert out[0]["kept_text"] == f"{c1} {c2}"
    assert (out[1]["n_chunks_total"], out[1]["n_chunks_kept"]) == (2, 1)
    assert out[1]["kept_text"] == c3
    assert (out[2]["n_chunks_total"], out[2]["n_chunks_kept"]) == (2, 1)
    assert out[2]["kept_text"] == tail
    assert (out[3]["n_chunks_total"], out[3]["n_chunks_kept"]) == (1, 0)
    assert out[3]["kept_text"] == ""


def test_bloom_geometry_is_output_invisible(spark, sf_dir):
    """Bloom geometry may only change the CANDIDATE count, never the
    answer: a deliberately saturated 64-bit filter (every position set,
    prefilter useless) and the default 2^16 one must produce identical
    dupe sets — false positives all die in the exact verify."""
    from pyspark.sql import functions as F

    from motorway_spark.queries.dedup import bloom_incremental_dupes

    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(100)
        .select("doc_id", "text")
    )
    # craft guaranteed cross-slice dupes: id*10 lands in the incoming
    # slice (%10 = 0 < 3), id*10+5 carries the SAME text in the corpus
    # slice — so exactly the even-half texts we duplicate must be flagged
    incoming = base.select((F.col("doc_id") * 10).alias("doc_id"), "text")
    corpus = base.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") * 10 + 5).alias("doc_id"), "text"
    )
    docs = incoming.unionAll(corpus)
    default = {
        (r["doc_id"], r["fp"]) for r in bloom_incremental_dupes(docs).collect()
    }
    saturated = {
        (r["doc_id"], r["fp"])
        for r in bloom_incremental_dupes(docs, bits=64).collect()
    }
    assert default == saturated
    want_ids = {r["doc_id"] * 10 for r in base.filter("doc_id % 2 = 0").collect()}
    assert {d for d, _fp in default} >= want_ids
    assert default  # dupes really exist


def test_registry_merge_cost_flat_when_bucket_size_held(spark, tmp_path):
    """stream_dedup_minhash's registry table: per-batch MERGE cost must
    track TOUCHED buckets, not registry size. With bucket size held
    constant (num_buckets scaled with the registry) and a fixed-key
    batch, a 10× registry may not grow per-batch merge time beyond
    noise (measured 1.04×; the pre-fix full-dir listing gave 3×).
    Loose 2.5× bound so machine noise can't flake the suite."""
    import time

    from motorway_spark.sinks.upsert import UpsertParquetSink

    def merge_time(n_keys: int, num_buckets: int, tag: str) -> float:
        sink = UpsertParquetSink(
            spark,
            str(tmp_path / f"reg_{tag}"),
            key_cols=["band", "bkt"],
            num_buckets=num_buckets,
        )
        seed = spark.range(n_keys).select(
            (F.col("id") % 4).alias("band"),
            F.col("id").alias("bkt"),
            (-F.col("id")).alias("neg_min_doc_id"),
        )
        sink.upsert_batch(seed, batch_id=0)

        def batch(off: int):
            return spark.range(20).select(
                (F.col("id") % 4).alias("band"),
                (F.col("id") + off).alias("bkt"),
                (-F.col("id") - off).alias("neg_min_doc_id"),
            )

        sink.upsert_batch(batch(n_keys + 1000), batch_id=1)  # warm
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            sink.upsert_batch(batch(n_keys + 10_000 * (i + 2)), batch_id=2 + i)
            best = min(best, time.perf_counter() - t0)
        return best

    small = merge_time(40_000, 64, "small")
    big = merge_time(400_000, 640, "big")  # 10× registry, same bucket size
    assert big < small * 2.5, f"merge not flat: {small:.2f}s -> {big:.2f}s"
