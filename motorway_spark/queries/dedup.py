"""Deduplication operators: exact, n-gram Jaccard, MinHash, SimHash.

North-star extension (BASELINE.json): the standard large-corpus dedup
ladder, each expressed Spark-first:

- exact: hash-groupBy on a 16-byte content fingerprint (never the raw
  text — the shuffle key must stay narrow at 100 TB);
- n-gram Jaccard: explode distinct shingles → self-join on shingle →
  |A∩B| / (|A|+|B|-|A∩B|). Exact but quadratic in colliding docs; the
  scale path is MinHash below, this is the ground-truth oracle for it;
- MinHash: k md5-derived hash functions over char-4-gram shingles,
  banded LSH (#bands × rows/band = k) so candidate generation is a
  bucket-equality shuffle join, never an all-pairs product;
- SimHash: 60-bit sign-aggregated token-hash fingerprint; near-dups =
  Hamming-adjacent fingerprints. Fully oracle-paired: the md5-derived
  token hashes are cross-engine deterministic, so DuckDB replays the
  per-bit sums via an UNNEST(range(0,60)) explode.

Hash determinism: both engines compute ``md5`` identically; the first
15 hex chars parsed base-16 give a 60-bit non-negative int that Spark
(``conv``) and DuckDB (``'0x…'::BIGINT``) agree on bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band

# Affine minhash family g_i(h) = (A[i]*h + B[i]) mod P over a single
# md5-derived base hash per shingle (classic one-hash + k-affine
# construction: 1 md5 instead of k per shingle — ~16x less hashing).
# P = 2^31-1 keeps products < 2^62: no int64 overflow in either engine.
MH_P = 2147483647
MH_A = [136595217, 2012316703, 1682038539, 1364310590, 359038264, 433493079,
        1777299530, 1210759832, 462896480, 807857526, 1123795075, 317591402,
        152912876, 1088304369, 526566710, 518709552]
MH_B = [1245224186, 1470736871, 279559650, 754868027, 1410937, 1052195292,
        303533433, 746792541, 1158961924, 1431491696, 1974745603, 1833278573,
        1286806185, 2106819035, 1494222724, 333901497]


def _h64(col: Column) -> Column:
    """Deterministic cross-engine 60-bit hash of a string column."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("bigint")


def _empty_str_array() -> Column:
    return F.array().cast("array<string>")


def _char_shingles(text: Column, k: int = 4) -> Column:
    """Distinct char k-grams (1-based substring positions). Texts
    shorter than k yield [] — guarded explicitly because Spark's
    ``sequence(1, 0)`` auto-infers step -1 and yields [1, 0] (DuckDB's
    ``range(1, 1)`` is empty): unguarded, a short text crashed the word
    variant on ``slice(_, 0, k)`` and silently produced a phantom
    shingle here (found by the NULL/degenerate-input smoke)."""
    n = F.length(text) - (k - 1)
    return F.when(
        n >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n), lambda i: F.substring(text, i, F.lit(k))
            )
        ),
    ).otherwise(_empty_str_array())


def _word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams; docs with fewer than k tokens yield []
    (see _char_shingles for the sequence(1, 0) trap)."""
    words = F.split(text, " ")
    n = F.size(words) - (k - 1)
    return F.when(
        n >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat_ws(" ", F.slice(words, i, k)),
            )
        ),
    ).otherwise(_empty_str_array())


# SQL twins of the shingle builders (DuckDB list comprehensions).
_SQL_CHAR_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(length(text)-3, 0)+1),"
    " i -> substr(text, i, 4)))"
)
_SQL_WORD_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(w)-2, 0)+1),"
    " i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"
)


@query(
    "dedup_exact",
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents)
    SELECT content_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM h GROUP BY content_hash
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep min doc_id. One shuffle
    on a 32-char key; group states are (count, min) — constant size."""
    docs = Catalog(spark, sf_dir).documents
    return (
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id"))
    )


@query(
    "dedup_exact_keep_first",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents)
    WHERE rn = 1
    """,
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the first (lowest doc_id) copy, returning
    surviving rows — the materializing form of dedup_exact."""
    from pyspark.sql import Window

    docs = Catalog(spark, sf_dir).documents
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, UNNEST({_SQL_WORD_SHINGLES}) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b USING (s)
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.02
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (threshold 0.02 on this
    synthetic corpus). The shingle self-join shuffles on the shingle
    string; frequent shingles explode quadratically, which is exactly
    why the MinHash variant below is the 100 TB path — this operator is
    its exact ground truth."""
    docs = Catalog(spark, sf_dir).documents
    sh = docs.select(
        "doc_id", F.explode(_word_shingles(F.col("text"))).alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.02)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _minhash_signature(text: Column) -> Column:
    """Array of N_MINHASH min-hashes over char-4-gram shingles: one
    md5-derived base hash per shingle, then the affine family
    g_i(h) = (A[i]·h + B[i]) mod P per signature slot."""
    base = F.transform(_char_shingles(text), lambda s: _h64(s) % MH_P)
    a_arr = F.array(*[F.lit(a) for a in MH_A])
    b_arr = F.array(*[F.lit(b) for b in MH_B])
    return F.transform(
        F.sequence(F.lit(1), F.lit(N_MINHASH)),
        lambda i: F.array_min(
            F.transform(
                base,
                lambda h: (F.element_at(a_arr, i) * h + F.element_at(b_arr, i)) % MH_P,
            )
        ),
    )


_SQL_MH_A = "[" + ", ".join(str(a) for a in MH_A) + "]"
_SQL_MH_B = "[" + ", ".join(str(b) for b in MH_B) + "]"
_SQL_MINHASH = f"""
    list_transform(range(1, {N_MINHASH} + 1),
      i -> list_min(list_transform(
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {MH_P}),
             h -> ({_SQL_MH_A}[i] * h + {_SQL_MH_B}[i]) % {MH_P})))
"""


def band_candidates(
    bands: DataFrame, max_bucket_width: int | None = None
) -> DataFrame:
    """Candidate pairs from (doc_id, band, bucket) rows via bucket-
    equality self-join.

    ``max_bucket_width`` is the hot-bucket cap SCALE.md promises: a
    bucket holding w near-identical docs (boilerplate, templated pages)
    contributes w² join output — one 10M-doc hot bucket is 10^14 pairs
    and kills the stage. Buckets wider than the cap are dropped from
    candidate generation entirely (their members are better handled by
    dedup_exact first — docs that similar are usually byte-identical
    after normalization). The hot-bucket list is found with one cheap
    count aggregate on the already-computed band rows and is tiny by
    construction, so it broadcast-anti-joins back; candidate output is
    then bounded by cap × (rows in capped buckets), linear not
    quadratic. ``None`` = exact LSH semantics (the oracle-checked
    form)."""
    if max_bucket_width is not None:
        hot = (
            bands.groupBy("band", "bucket")
            .agg(F.count("*").alias("_w"))
            .filter(F.col("_w") > max_bucket_width)
            .select("band", "bucket")
        )
        bands = bands.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    # r13 (guide §2): pin the pair join's shuffle width — see
    # _minhash_est_pairs for the full rationale (AQE's byte-based
    # coalescing cannot see the ~width² in-stage expansion; an explicit
    # keyed repartition is never coalesced and the join reuses it).
    from motorway_spark.queries.helpers import scale_partitions_df

    npart = scale_partitions_df(
        bands, floor_bytes=128 << 10, target_bytes=32 << 20
    )
    bands = bands.repartition(npart, "band", "bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh[16]) signature rows. Shingles explode to rows so
    md5 + the affine family run inside whole-stage codegen (nested
    array lambdas are interpreted in Catalyst — measured 16x slower);
    the 16 min-aggregates collapse back to one signature row per doc
    with map-side partial agg, so the shuffle carries one row per
    (doc × partition), not per shingle."""
    # The explode amplifies work ~180x per input row, so input splits
    # must not under-subscribe the cluster: a dimension-sized doc table
    # arrives as ONE split and would hash every shingle on one core
    # (measured 4x wall-clock at sf0.1). At 100 TB the scan has plenty
    # of splits and AQE-coalesce keeps this repartition near-free.
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par)
        .select("doc_id", F.explode(_char_shingles(F.col("text"))).alias("s"))
        .withColumn("h", _h64(F.col("s")) % MH_P)
    )
    return (
        sh.groupBy("doc_id")
        .agg(
            *[
                F.min((F.lit(MH_A[i]) * F.col("h") + F.lit(MH_B[i])) % MH_P).alias(
                    f"m{i}"
                )
                for i in range(N_MINHASH)
            ]
        )
        .select(
            "doc_id", F.array(*[F.col(f"m{i}") for i in range(N_MINHASH)]).alias("mh")
        )
    )


def minhash_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) LSH rows from signature rows."""
    return sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"),
        F.col("mh"),
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.array_join(
                F.slice(F.col("mh"), F.col("band") * 4 + 1, 4), ","
            ).cast("binary")
        ).alias("bucket"),
    )


@query(
    "dedup_minhash",
    oracle=f"""
    WITH sig AS MATERIALIZED (
      -- MATERIALIZED: DuckDB inlines CTEs by default, and sig is
      -- referenced 3x (bands, sa, sb) — inlining recomputes the whole
      -- shingle+minhash pipeline each time (measured 3x slower)
      SELECT doc_id, {_SQL_MINHASH} AS mh
      FROM (SELECT doc_id, {_SQL_CHAR_SHINGLES} AS sh FROM documents)
      WHERE len(sh) > 0),
    bands AS MATERIALIZED (
      SELECT doc_id, band,
             md5(array_to_string(mh[band*4+1 : band*4+4], ',')) AS bucket
      FROM sig, UNNEST(range(0, {N_BANDS})) AS t(band)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    est AS (
      SELECT doc_a, doc_b,
             CAST(len(list_filter(range(1, {N_MINHASH}+1),
                  i -> sa.mh[i] = sb.mh[i])) AS DOUBLE) / {N_MINHASH} AS est_jaccard
      FROM cand
      JOIN sig sa ON doc_a = sa.doc_id
      JOIN sig sb ON doc_b = sb.doc_id)
    SELECT doc_a, doc_b, ROUND(est_jaccard, 6) AS est_jaccard
    FROM est WHERE est_jaccard >= 0.375
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection (16 hashes, 4 bands × 4 rows).

    Scale shape: signatures are one narrow map-side pass; candidate
    generation explodes each doc into 4 (band, bucket) rows and
    shuffle-joins on bucket equality — cost is proportional to real
    collisions, not n². Signatures RIDE THROUGH the band join (mh is
    128 bytes/row extra shuffle) and pair dedup is a groupBy keeping
    first(mh) — so the expensive signature subtree (shingle explode +
    md5 + 16 min-aggregates) executes exactly ONCE; the naive
    distinct-then-rejoin formulation re-executes it three times
    (measured 2.8 s → 1.1 s at sf0.1). This is the 100 TB fuzzy-dedup
    path; its exact counterpart/oracle is dedup_ngram_jaccard.

    Exact LSH semantics here (no bucket cap) so the DuckDB oracle
    matches bit-for-bit; the production form at 100 TB passes
    ``band_candidates(max_bucket_width=…)`` — tests/test_dedup_scale.py.
    """
    return _minhash_est_pairs(Catalog(spark, sf_dir).documents)


def _minhash_est_pairs(docs: DataFrame, max_bucket_width: int | None = None) -> DataFrame:
    """Shared body of dedup_minhash / dedup_minhash_capped: signatures →
    band rows (carrying mh) → optional hot-bucket cap → bucket-equality
    pair join → estimated Jaccard ≥ 0.375."""
    sig = minhash_signatures(docs)
    # band rows that keep mh (minhash_bands shape + signature payload,
    # built from ONE sig subtree — no self-join back onto sig)
    bands = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"),
        F.col("mh"),
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.array_join(F.slice(F.col("mh"), F.col("band") * 4 + 1, 4), ",").cast(
                "binary"
            )
        ).alias("bucket"),
        "mh",
    )
    if max_bucket_width is not None:
        # hot-bucket cap (see band_candidates): the hot list is tiny by
        # construction → broadcast anti-join, candidates bounded by
        # cap × rows instead of width² per bucket
        hot = (
            bands.groupBy("band", "bucket")
            .agg(F.count("*").alias("_w"))
            .filter(F.col("_w") > max_bucket_width)
            .select("band", "bucket")
        )
        bands = bands.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    # r13 (guide §2): pin the pair join's shuffle width. The band
    # self-join EXPANDS ~width² rows per bucket, which AQE's byte-based
    # coalescing cannot see — measured at sf1 it coalesced this join to
    # 2 tasks and serialized ~13 minutes of pair work on 32 cores
    # (stage 426/435: 2 tasks, 813 task-seconds). An explicit
    # repartition on the join keys is never coalesced by AQE and the
    # join reuses the partitioning (same keys, same count), so the
    # quadratic work spreads over a width derived from the INPUT size
    # with an expansion-aware per-task budget: ~128 KB of band rows
    # per task up to the core count locally, 32 MB per task at scale —
    # the CAPPED production path then emits ~cap x 32 MB of pairs per
    # task. Results are partition-independent (the pair set per bucket
    # is fixed; first(mh) is value-deterministic because every row of
    # a (doc_a, doc_b) group carries identical signatures).
    from motorway_spark.queries.helpers import scale_partitions_df

    npart = scale_partitions_df(
        docs, floor_bytes=128 << 10, target_bytes=32 << 20
    )
    bands = bands.repartition(npart, "band", "bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.mh").alias("mh_a"),
            F.col("b.mh").alias("mh_b"),
        )
        # dedup pairs colliding in >1 band while keeping signatures —
        # replaces distinct + two sig re-joins
        .groupBy("doc_a", "doc_b")
        .agg(F.first("mh_a").alias("mh_a"), F.first("mh_b").alias("mh_b"))
    )
    est = pairs.select(
        "doc_a",
        "doc_b",
        (
            F.size(
                F.filter(
                    F.zip_with(F.col("mh_a"), F.col("mh_b"), lambda x, y: x == y),
                    lambda eq: eq,
                )
            ).cast("double")
            / N_MINHASH
        ).alias("est_jaccard"),
    )
    return est.filter(F.col("est_jaccard") >= 0.375).select(
        "doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


MH_BUCKET_CAP = 16


@query(
    "dedup_minhash_capped",
    oracle=f"""
    WITH sig AS MATERIALIZED (
      SELECT doc_id, {_SQL_MINHASH} AS mh
      FROM (SELECT doc_id, {_SQL_CHAR_SHINGLES} AS sh FROM documents)
      WHERE len(sh) > 0),
    bands AS MATERIALIZED (
      SELECT doc_id, band,
             md5(array_to_string(mh[band*4+1 : band*4+4], ',')) AS bucket
      FROM sig, UNNEST(range(0, {N_BANDS})) AS t(band)),
    hot AS (
      SELECT band, bucket FROM bands
      GROUP BY band, bucket HAVING COUNT(*) > {MH_BUCKET_CAP}),
    keep AS (
      SELECT * FROM bands b
      WHERE NOT EXISTS (SELECT 1 FROM hot h
                        WHERE h.band = b.band AND h.bucket = b.bucket)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM keep a JOIN keep b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    est AS (
      SELECT doc_a, doc_b,
             CAST(len(list_filter(range(1, {N_MINHASH}+1),
                  i -> sa.mh[i] = sb.mh[i])) AS DOUBLE) / {N_MINHASH} AS est_jaccard
      FROM cand
      JOIN sig sa ON doc_a = sa.doc_id
      JOIN sig sb ON doc_b = sb.doc_id)
    SELECT doc_a, doc_b, ROUND(est_jaccard, 6) AS est_jaccard
    FROM est WHERE est_jaccard >= 0.375
    """,
)
def dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE PRODUCTION FORM of MinHash LSH dedup: identical to
    dedup_minhash plus the hot-bucket cap (width > {cap} buckets are
    excluded from candidate generation — their members are
    near-identical boilerplate cliques whose pair count grows
    quadratically; they belong to dedup_exact). Round-3 measurement on
    a 10x template-heavy corpus: uncapped candidates 70M/397s, capped
    1.15M/11.8s (SCALE.md). The cap itself is SQL-expressible (a
    HAVING + NOT EXISTS over the band rows), so this path is
    oracle-verified end to end, not just invariant-tested — both
    engines drop exactly the same buckets and emit exactly the same
    surviving pairs."""
    return _minhash_est_pairs(
        Catalog(spark, sf_dir).documents, max_bucket_width=MH_BUCKET_CAP
    )


@query(
    "dedup_simhash",
    oracle="""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
      FROM (SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS t
            FROM documents)),
    bits AS MATERIALIZED (
      SELECT doc_id, j,
             SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM tok, UNNEST(range(0, 60)) AS tj(j)
      GROUP BY doc_id, j),
    fp AS MATERIALIZED (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS fp
      FROM bits GROUP BY doc_id),
    bands AS MATERIALIZED (
      SELECT doc_id, fp, band, (fp >> (band * 15)) & 32767 AS bucket
      FROM fp, UNNEST(range(0, 4)) AS tb(band)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
      FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 8
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit sign-aggregated token-hash
    fingerprint, candidates via 16-bit band buckets, keep Hamming ≤ 8.

    Spark shape: tokens explode → per-(doc, bit) contribution is
    computed from a 60-bit token hash; a single groupBy(doc) with an
    array-sum fold rebuilds the 64 counters; fingerprint = sign bits.
    Candidates bucket-join on 16-bit quarters (a fingerprint pair with
    Hamming ≤ 8 < 4 bands must agree on ≥1 band — pigeonhole), then
    exact Hamming via bit_count(xor).
    """
    docs = Catalog(spark, sf_dir).documents
    toks = F.array_distinct(F.split(F.col("text"), " "))
    # spread the token explode across cores (single-split input table —
    # same rationale as minhash_signatures)
    par = spark.sparkContext.defaultParallelism
    tok = docs.repartition(par).select("doc_id", F.explode(toks).alias("t")).withColumn(
        "h", _h64(F.col("t"))
    )
    # per-(doc, bit) ±1 contributions summed into 60 counters in ONE
    # groupBy — the bit loop is unrolled into plan literals (no Python
    # in the row path)
    bit_of = lambda j: F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))  # noqa: E731
    summed = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.when(bit_of(j) == 1, 1).otherwise(-1)).alias(f"s{j}")
            for j in range(60)
        ]
    )
    fp_col = None
    for j in range(60):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp_col = term if fp_col is None else fp_col + term
    fp = summed.select("doc_id", fp_col.alias("fp"))
    band_vals = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.shiftright(F.col("fp"), band * 15)
                .bitwiseAND(F.lit((1 << 15) - 1))
                .alias("bucket"),
            )
            for band in range(4)
        ]
    )
    bands = (
        fp.select("doc_id", "fp", F.explode(band_vals).alias("bb"))
        .select("doc_id", "fp", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
            .cast("bigint")
            .alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= 8).orderBy("doc_a", "doc_b")


# MLlib MinHashLSH internals, replicated so the DuckDB oracle can run the
# IDENTICAL pipeline (the sim_ann_lsh playbook: inline the engine's
# "random" parameters as SQL literals):
# - the hash family is h_i(x) = ((1+x)*a_i + b_i) mod HASH_PRIME with
#   (a_i, b_i) drawn from java.util.Random(seed); seed=42 below, so the
#   coefficients are fixed constants (tests/test_sketch_accuracy.py pins
#   them against a freshly fitted model's transform output);
# - approxSimilarityJoin generates candidates by (table, hash) equality
#   and filters on the EXACT key distance 1 - |A∩B|/|A∪B| with a STRICT
#   < threshold (pinned by the same test).
MLLIB_LSH_PRIME = 2038074743
MLLIB_LSH_A = [1562431131, 1467211249, 662969971, 595021506,
               1429255520, 1939977183, 791955277, 592164477]
MLLIB_LSH_B = [117392763, 102948884, 2023087525, 1519796918,
               196118093, 969067502, 819572292, 1482678032]
MLLIB_NUM_FEATURES = 1 << 14
_SQL_LSH_A = "[" + ", ".join(map(str, MLLIB_LSH_A)) + "]"
_SQL_LSH_B = "[" + ", ".join(map(str, MLLIB_LSH_B)) + "]"


@query(
    "dedup_minhash_mllib",
    oracle=f"""
    WITH idx AS MATERIALIZED (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               list_distinct(string_split(text, ' ')),
               t -> ('0x' || substr(md5(t), 1, 15))::BIGINT
                    % {MLLIB_NUM_FEATURES}))) AS xs
      FROM documents
      WHERE len(string_split(text, ' ')) > 0),
    mh AS MATERIALIZED (
      SELECT doc_id, xs,
             list_transform(range(1, 9),
               i -> list_min(list_transform(xs,
                      x -> ((1 + x) * {_SQL_LSH_A}[i] + {_SQL_LSH_B}[i])
                           % {MLLIB_LSH_PRIME}))) AS h
      FROM idx),
    bt AS MATERIALIZED (
      SELECT doc_id, i, h[i] AS hv FROM mh, UNNEST(range(1, 9)) AS t(i)),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bt a JOIN bt b ON a.i = b.i AND a.hv = b.hv
      WHERE a.doc_id < b.doc_id),
    jac AS (
      SELECT doc_a, doc_b,
             len(list_intersect(xa.xs, xb.xs)) AS nc,
             len(xa.xs) AS na, len(xb.xs) AS nb
      FROM cand
      JOIN idx xa ON doc_a = xa.doc_id
      JOIN idx xb ON doc_b = xb.doc_id)
    SELECT doc_a, doc_b,
           1 - (1 - CAST(nc AS DOUBLE) / (na + nb - nc)) AS est_jaccard
    FROM jac
    WHERE (1 - CAST(nc AS DOUBLE) / (na + nb - nc)) < 0.6
    """,
)
def dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib MinHashLSH variant (SURVEY.md §2b north-star row): token
    sets → sparse binary vectors → ``MinHashLSH.fit`` →
    ``approxSimilarityJoin``. The hand-rolled dedup_minhash above is the
    from-scratch engine implementation; this one demonstrates the
    packaged MLlib path — and is oracle-EXACT: the featurizer is the
    repo's cross-engine md5 indexer (``pmod(_h64(token), 2^14)``)
    instead of HashingTF (murmur3 has no DuckDB twin), and the model's
    seed-derived hash coefficients are inlined in the oracle SQL as
    literals, so DuckDB replays candidate generation, the exact-distance
    rerank, and the strict-< threshold bit-for-bit.

    The VectorUDT shim is a row-Python UDF by necessity — Arrow has no
    VectorUDT mapping, so every Spark↔MLlib interop crosses this bridge;
    it builds one SparseVector per doc from an already-computed int
    array (no tokenization in Python). NOT the scale path: this query
    exists to prove MLlib parity; production dedup is the pure-SQL
    ``dedup_minhash`` / ``dedup_minhash_capped`` above (no Python in
    the hot loop, bounded hot buckets)."""
    from pyspark.ml.feature import MinHashLSH
    from pyspark.ml.linalg import SparseVector, VectorUDT

    docs = Catalog(spark, sf_dir).documents
    tokens = docs.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("tokens")
    ).filter(F.size("tokens") > 0)
    idxs = tokens.select(
        "doc_id",
        F.array_sort(
            F.array_distinct(
                F.transform(
                    "tokens",
                    lambda t: F.pmod(_h64(t), F.lit(MLLIB_NUM_FEATURES)).cast("int"),
                )
            )
        ).alias("xs"),
    )

    @F.udf(returnType=VectorUDT())
    def to_vec(xs):
        return SparseVector(MLLIB_NUM_FEATURES, xs, [1.0] * len(xs))

    feats = idxs.select("doc_id", to_vec("xs").alias("features"))
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = (
        model.approxSimilarityJoin(feats, feats, 0.6, distCol="jaccard_dist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            (F.lit(1.0) - F.col("jaccard_dist")).alias("est_jaccard"),
        )
    )
    return pairs.orderBy("doc_a", "doc_b")


@query(
    "dedup_cluster_canonical",
    oracle=f"""
    WITH sig AS MATERIALIZED (
      -- MATERIALIZED throughout: DuckDB inlines CTEs by default; the
      -- nested references here (edges->pairs->cand->bands->sig, many
      -- paths) would recompute the minhash pipeline exponentially —
      -- measured 216 s inlined vs ~15 s materialized at sf0.01
      SELECT doc_id, {_SQL_MINHASH} AS mh
      FROM (SELECT doc_id, {_SQL_CHAR_SHINGLES} AS sh FROM documents)
      WHERE len(sh) > 0),
    bands AS MATERIALIZED (
      SELECT doc_id, band,
             md5(array_to_string(mh[band*4+1 : band*4+4], ',')) AS bucket
      FROM sig, UNNEST(range(0, {N_BANDS})) AS t(band)),
    hot AS (
      SELECT band, bucket FROM bands
      GROUP BY band, bucket HAVING COUNT(*) > {MH_BUCKET_CAP}),
    keep AS MATERIALIZED (
      SELECT * FROM bands b
      WHERE NOT EXISTS (SELECT 1 FROM hot h
                        WHERE h.band = b.band AND h.bucket = b.bucket)),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM keep a JOIN keep b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM cand
      JOIN sig sa ON doc_a = sa.doc_id
      JOIN sig sb ON doc_b = sb.doc_id
      WHERE CAST(len(list_filter(range(1, {N_MINHASH}+1),
                 i -> sa.mh[i] = sb.mh[i])) AS DOUBLE) / {N_MINHASH} >= 0.375),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    verts AS (SELECT DISTINCT src AS doc FROM edges),
    reach AS (
      WITH RECURSIVE r(doc, other) AS (
        SELECT doc, doc FROM verts
        UNION
        SELECT r.doc, e.dst FROM r JOIN edges e ON r.other = e.src)
      SELECT * FROM r)
    SELECT doc AS doc_id, MIN(other) AS cluster_id,
           CAST(doc = MIN(other) AS BOOLEAN) AS is_canonical
    FROM reach GROUP BY doc
    """,
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER resolution: near-dup pairs only say "a ~ b";
    a training pipeline must keep ONE doc per transitive duplicate
    group. Connected components over the minhash pair graph via
    iterative min-label propagation: every vertex repeatedly adopts the
    smallest label among itself and its neighbors until a fixpoint —
    cluster_id = min doc_id of the component, is_canonical marks the
    keeper. The DuckDB oracle computes the same components with a
    recursive CTE (transitive closure), so the iterative Spark
    algorithm is exact-checked end to end.

    Scale shape: each iteration is one (edges ⋈ labels) shuffle join on
    vertex id + a min-aggregate — the hash-partitioned form of Pregel
    label propagation; iterations = component diameter (near-dup
    clusters are shallow — boilerplate families, not long chains).
    The driver loop only checks a scalar convergence count per
    iteration; labels stay distributed. GraphFrames/GraphX would
    package this; the raw DataFrame form avoids the dependency and
    shows the algebra.

    Pairs come from the CAPPED minhash path (round 4): at 100 TB the
    uncapped generator's hot-bucket w² blowup (70M candidates at a 10x
    template-heavy corpus, SCALE.md) would explode the edge list before
    the label loop starts. The cap is SQL-expressible, so the oracle
    applies the identical HAVING/NOT EXISTS bucket drop and the
    clustering stays exact-checked end to end.
    """
    pairs = _minhash_est_pairs(
        Catalog(spark, sf_dir).documents, max_bucket_width=MH_BUCKET_CAP
    ).select("doc_a", "doc_b")
    labels = label_propagation(pairs)
    return labels.select(
        F.col("doc").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("doc") == F.col("label")).alias("is_canonical"),
    )


def label_propagation(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected-component labels (doc, label) over an undirected pair
    graph via iterative min-label propagation; label = min doc id of
    the component. Shared by dedup_cluster_canonical and the scale
    measurements.

    localCheckpoint TRUNCATES LINEAGE — without it every iteration's
    plan embeds all previous iterations (and the whole upstream pair
    pipeline), growing exponentially until the driver OOMs during
    planning. This is the iterative-algorithm idiom on Spark: the
    per-iteration plan must stay O(1), state lives in materialized
    partitions (GraphX does exactly this internally)."""
    # Lazy checkpoints: still truncate lineage for the loop, but the
    # materialization rides the convergence count instead of costing
    # extra up-front actions.
    edges = (
        pairs.union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))
        .distinct()
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("label", F.col("doc"))
        .localCheckpoint(eager=False)
    )
    label_t = labels.schema["label"].dataType
    # Fused update (r13): min(own label, neighbor labels) as ONE
    # join + ONE aggregate — the neighbor contributions (src, label)
    # union the self rows (doc, label) and a single min-groupBy yields
    # the new label; the self row smuggles the previous label through
    # the aggregate (max over one non-null) so convergence stays a
    # filter over the checkpoint. Replaces the join+agg+left-join form:
    # one shuffle join fewer per iteration, identical algebra
    # (min over {self} ∪ neighbors == least(label, min nbr)).
    # Convergence is CHECKED every 2nd iteration: a converged fixpoint
    # is stable under extra iterations (min-propagation is idempotent
    # there), so batching the scalar count halves the driver actions at
    # an identical result; the lazy checkpoints of the unchecked
    # iteration materialize under the same count job (plan depth <= 2
    # iterations).
    check_every = 2
    for it in range(1, max_iters + 1):  # diameter bound; dup clusters are shallow
        contrib = edges.join(labels, F.col("dst") == F.col("doc")).select(
            F.col("src").alias("doc"),
            F.col("label"),
            F.lit(None).cast(label_t).alias("__prev"),
        )
        selfrows = labels.select(
            "doc", "label", F.col("label").alias("__prev")
        )
        new_full = (
            contrib.unionByName(selfrows)
            .groupBy("doc")
            .agg(
                F.min("label").alias("label"),
                F.max("__prev").alias("__prev"),
            )
            .localCheckpoint(eager=False)
        )
        labels = new_full.select("doc", "label")
        if it % check_every == 0 or it == max_iters:
            changed = new_full.filter(F.col("label") != F.col("__prev")).count()
            if changed == 0:
                break
    return labels


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (dedup via the vector space).
# ---------------------------------------------------------------------------
@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH pairs AS MATERIALIZED (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
               x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    SELECT d.doc_id, d.source, MIN(p.doc_a) AS dup_of,
           COUNT(*) AS n_near_dups
    FROM pairs p
    JOIN documents d ON d.doc_id = p.doc_b
    WHERE p.cosine >= 0.25
    GROUP BY d.doc_id, d.source
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over the documents table: a document is
    a near-duplicate when its embedding (joined on doc_id = vec_id) has
    cosine >= 0.25 with any LOWER-id document; output names the earliest
    such partner as the canonical survivor.

    All-pairs form = the exact oracle twin of this family; production
    candidate generation at 100 TB is sim_ann_lsh / sim_ann_ivf
    (similarity.py) feeding the same rerank + min-partner reduction.
    The dot product is the unrolled codegen chain from similarity._dot
    (bit-identical to DuckDB's sequential list fold).
    """
    from motorway_spark.queries.similarity import _dot, _norm

    emb = Catalog(spark, sf_dir).embeddings
    docs = Catalog(spark, sf_dir).documents.select("doc_id", "source")
    a = emb.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("a_emb"))
    b = emb.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("b_emb"))
    cosine = _dot("a_emb", "b_emb") / (_norm("a_emb") * _norm("b_emb"))
    dups = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= 0.25)
        .groupBy("doc_b")
        .agg(F.min("doc_a").alias("dup_of"), F.count("*").alias("n_near_dups"))
    )
    return dups.join(docs, F.col("doc_b") == F.col("doc_id")).select(
        "doc_id", "source", "dup_of", "n_near_dups"
    )


# ---------------------------------------------------------------------------
# Edit-distance fuzzy join (blocked, exact).
# ---------------------------------------------------------------------------
@query(
    "fuzzy_join_levenshtein",
    oracle="""
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
    FROM supplier a JOIN supplier b
      ON a.s_suppkey < b.s_suppkey
     AND abs(length(a.s_name) - length(b.s_name)) <= 1
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy self-join: supplier-name pairs within
    Levenshtein distance 1 — the record-linkage primitive (typo-level
    entity matching) the dedup ladder lacks elsewhere.

    Scale shape (the oracle runs the quadratic form; Spark does NOT):
    candidates come from PassJoin-style segment blocking
    (_lev1_candidates), exact levenshtein only on candidates. Work is
    linear in names per block; the all-pairs product never
    materializes. A length pre-filter (lev >= length difference)
    guards the general case.
    """
    supp = Catalog(spark, sf_dir).supplier.select("s_suppkey", "s_name")
    return (
        _lev1_candidates(supp, "s_suppkey", "s_name")
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= 1)
        .select("supp_a", "supp_b", "dist")
    )


def _lev1_candidates(df: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """PassJoin-style lev<=1 candidate pairs (id_a < id_b) with a
    complete blocking scheme — every pair at Levenshtein distance <= 1
    is a candidate:

    - equal length (substitution): the edit sits in the head OR the
      tail, so the OTHER fixed half is identical → block on head
      substring(1,9) and on tail substring(10);
    - length difference 1 (insertion/deletion): if the edit position is
      >= 10 the heads still match (covered by the head block); if it is
      <= 9 the longer string's suffix FROM 11 equals the shorter's
      suffix from 10 — the shifted-tail blocks cover exactly this case
      (the round-3 blocking missed it: neither fixed half matches when
      a char is inserted/deleted in the head region).

    Each block is a plain hash self-join; the union is deduped and
    length-filtered, so recall is exact while work stays linear in the
    per-block group sizes."""
    blocked = df.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        F.substring(F.col(name_col), 1, 9).alias("block_head"),
        F.expr(f"substring({name_col}, 10)").alias("block_tail"),
        F.expr(f"substring({name_col}, 11)").alias("block_tail_shift"),
    )
    # (a-side block column, b-side block column): symmetric fixed halves
    # plus both orientations of the shifted tail (either side may be the
    # longer string of an unequal-length pair)
    blocks = [
        ("block_head", "block_head"),
        ("block_tail", "block_tail"),
        ("block_tail_shift", "block_tail"),
        ("block_tail", "block_tail_shift"),
    ]
    pairs = None
    for blk_a, blk_b in blocks:
        a = blocked.select(
            F.col("_id").alias("supp_a"),
            F.col("_name").alias("name_a"),
            F.col(blk_a).alias("blk"),
        )
        b = blocked.select(
            F.col("_id").alias("supp_b"),
            F.col("_name").alias("name_b"),
            F.col(blk_b).alias("blk"),
        )
        cand = a.join(b, "blk").filter(F.col("supp_a") != F.col("supp_b")).select(
            F.least("supp_a", "supp_b").alias("supp_a_k"),
            F.greatest("supp_a", "supp_b").alias("supp_b_k"),
            F.when(F.col("supp_a") < F.col("supp_b"), F.col("name_a"))
            .otherwise(F.col("name_b"))
            .alias("name_a_k"),
            F.when(F.col("supp_a") < F.col("supp_b"), F.col("name_b"))
            .otherwise(F.col("name_a"))
            .alias("name_b_k"),
        )
        pairs = cand if pairs is None else pairs.unionAll(cand)
    return (
        pairs.distinct()
        .select(
            F.col("supp_a_k").alias("supp_a"),
            F.col("supp_b_k").alias("supp_b"),
            F.col("name_a_k").alias("name_a"),
            F.col("name_b_k").alias("name_b"),
        )
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= 1)
    )


# --------------------------------------------------------------------------
# dedup_containment — directional sub-document containment
# --------------------------------------------------------------------------

# Rare-shingle candidate gate: only shingles with document frequency
# <= this cap generate candidate pairs. The exclusion rule is part of
# the operator contract (applied identically in the oracle), exactly
# like dedup_minhash_capped's hot-bucket cap: high-df shingles are
# boilerplate — they generate quadratic candidate blow-up while any
# pair at a high containment threshold almost surely also shares rare
# shingles. At 100 TB this caps the candidate join at sum(df<=cap df^2)
# instead of sum over all shingles.
CONTAIN_DF_CAP = 5
CONTAIN_NUM, CONTAIN_DEN = 9, 10  # threshold 0.9 as an exact fraction



@query(
    "dedup_containment",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, UNNEST({_SQL_WORD_SHINGLES}) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
    df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
    rare AS (SELECT s FROM df WHERE df <= {CONTAIN_DF_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b USING (s) JOIN rare USING (s)
      WHERE a.doc_id <> b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
      GROUP BY c.doc_a, c.doc_b)
    SELECT doc_a, doc_b, sa.n AS n_a, n_common,
           CAST(n_common AS DOUBLE) / sa.n AS containment
    FROM common JOIN sizes sa ON doc_a = sa.doc_id
    WHERE n_common * {CONTAIN_DEN} >= sa.n * {CONTAIN_NUM}
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-dup: flag (doc_a, doc_b) where at
    least 90% of doc_a's word-3-gram shingles also appear in doc_b —
    the sub-document/template-instance relation that symmetric Jaccard
    misses when |A| << |B| (a quote, a boilerplate header, a chunked
    copy). This is the containment form of near-dup used for corpus
    hygiene alongside minhash (Broder's containment vs resemblance
    distinction).

    Two-pass candidate/verify shape (the repo's standard scale
    pattern): candidates come from a self-join restricted to RARE
    shingles (df <= CONTAIN_DF_CAP; the df cap is the hot-bucket cap
    analogue and part of the contract — the oracle applies it too),
    then the EXACT common-shingle count is recomputed only for
    candidate pairs. The >= 0.9 decision is integer arithmetic
    (n_common * 10 >= n_a * 9) — no float in the predicate — and the
    reported containment is a single integer/integer IEEE division,
    bit-identical cross-engine."""
    return containment_pairs(Catalog(spark, sf_dir).documents)


def containment_pairs(
    docs: DataFrame,
    df_cap: int = CONTAIN_DF_CAP,
    num: int = CONTAIN_NUM,
    den: int = CONTAIN_DEN,
) -> DataFrame:
    """The containment operator over any (doc_id, text) frame — shared
    by the registered query and the scale tests (tests/test_dedup_scale
    .py exercises the df-cap invariants on a boilerplate-heavy corpus).
    """
    # fixture doc tables arrive as ONE split; the shingle transform is
    # the expensive map, so spread it first (same rationale and measured
    # effect as minhash_signatures above — near-free at real scale)
    par = docs.sparkSession.sparkContext.defaultParallelism
    # doc_sets feeds THREE plan branches (the exploded candidate side and
    # both verify joins); without a persist each branch re-runs the
    # shingle map and the repartition exchange. The fill is EAGER
    # because the branches' stages run concurrently — a lazy persist
    # lets them race and each recompute the map before the cache is
    # populated. MEMORY_AND_DISK so the per-doc arrays spill rather
    # than OOM at large corpus sizes. Lifecycle is the shared
    # CacheRegistry: one live frame per operator, other operators'
    # leftover caches released before this fill (SCALE.md sf10 lesson).
    from motorway_spark.maintenance import CACHES

    doc_sets = CACHES.persist_swap(
        "containment.doc_sets",
        docs.repartition(par).select(
            "doc_id", _word_shingles(F.col("text")).alias("shs")
        ),
    )
    sh = doc_sets.select("doc_id", F.explode("shs").alias("s"))
    rare = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= df_cap)
        .select("s")
    )
    sh_rare = sh.join(rare, "s")
    cand = (
        sh_rare.select(F.col("doc_id").alias("doc_a"), "s")
        .join(sh_rare.select(F.col("doc_id").alias("doc_b"), "s"), "s")
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Exact verify: join the candidate pairs to the per-doc shingle SETS
    # (two narrow hash joins on doc ids carrying ~doc-sized arrays) and
    # intersect in-row, instead of re-exploding and re-shuffling
    # (pair, shingle) rows through a per-pair aggregate. With the split
    # spread above, 5.3 s -> 3.4 s at sf0.1; n_common is identical (the
    # arrays are distinct by construction). Per-pair cost is |A|x|B|
    # over ~50-entry arrays, constant in corpus size.
    return (
        cand.join(
            doc_sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a")),
            "doc_a",
        )
        .join(
            doc_sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size("shs_a").alias("n_a"),
            F.size(F.array_intersect("shs_a", "shs_b")).alias("n_common"),
        )
        .where(F.col("n_common") * den >= F.col("n_a") * num)
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_common",
            (F.col("n_common").cast("double") / F.col("n_a")).alias("containment"),
        )
    )


# --------------------------------------------------------------------------
# dedup_url_canonical — URL canonicalization dedup
# --------------------------------------------------------------------------

# The fixtures carry no URL column, so both engines derive the SAME
# synthetic raw URLs from (doc_id, source) — three messy variants per
# canonical page (uppercase scheme/host + www + default port + utm
# params / trailing slash + fragment + utm / mixed-case host + port) —
# and the operator under test is the canonicalization kernel that must
# collapse them. Every step is the Java-regex/RE2 common subset
# (text_pii_redact precedent).
_URL_RAW_SPARK = """
CASE CAST(doc_id % 3 AS INT)
  WHEN 0 THEN concat('HTTPS://WWW.Example.COM:443/docs/page-',
                     CAST(doc_id div 3 AS STRING),
                     '?utm_source=', source, '&ref=rss')
  WHEN 1 THEN concat('https://example.com/docs/page-',
                     CAST(doc_id div 3 AS STRING),
                     '/?ref=rss&utm_campaign=', source, '#frag')
  ELSE concat('https://Example.com:443/docs/page-',
              CAST(doc_id div 3 AS STRING), '?ref=rss')
END
"""
_URL_RAW_DUCK = """
CASE CAST(doc_id % 3 AS INT)
  WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/docs/page-'
              || CAST(doc_id // 3 AS VARCHAR)
              || '?utm_source=' || source || '&ref=rss'
  WHEN 1 THEN 'https://example.com/docs/page-'
              || CAST(doc_id // 3 AS VARCHAR)
              || '/?ref=rss&utm_campaign=' || source || '#frag'
  ELSE 'https://Example.com:443/docs/page-'
       || CAST(doc_id // 3 AS VARCHAR) || '?ref=rss'
END
"""

# canonicalization, given a string column {u}:
#   lowercase scheme+host, strip default :443, strip leading www.,
#   strip trailing path slash, drop the fragment, drop utm_* params,
#   sort surviving params.
_CANON_SPARK = """
concat(
  lower(regexp_extract({u}, '^([A-Za-z]+)://', 1)), '://',
  regexp_replace(regexp_replace(
    lower(regexp_extract({u}, '^[A-Za-z]+://([^/?#]+)', 1)),
    ':443$', ''), '^www\\\\.', ''),
  regexp_replace(regexp_extract({u}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                 '/+$', ''),
  CASE WHEN array_join(array_sort(filter(
         split(regexp_extract({u}, '\\\\?([^#]*)', 1), '&'),
         x -> x != '' AND substr(x, 1, 4) != 'utm_')), '&') = ''
       THEN ''
       ELSE concat('?', array_join(array_sort(filter(
              split(regexp_extract({u}, '\\\\?([^#]*)', 1), '&'),
              x -> x != '' AND substr(x, 1, 4) != 'utm_')), '&'))
  END)
"""
_CANON_DUCK = """
lower(regexp_extract({u}, '^([A-Za-z]+)://', 1)) || '://' ||
regexp_replace(regexp_replace(
  lower(regexp_extract({u}, '^[A-Za-z]+://([^/?#]+)', 1)),
  ':443$', ''), '^www\\.', '') ||
regexp_replace(regexp_extract({u}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
               '/+$', '') ||
CASE WHEN array_to_string(list_sort(list_filter(
       string_split(regexp_extract({u}, '\\?([^#]*)', 1), '&'),
       x -> x <> '' AND substr(x, 1, 4) <> 'utm_')), '&') = ''
     THEN ''
     ELSE '?' || array_to_string(list_sort(list_filter(
            string_split(regexp_extract({u}, '\\?([^#]*)', 1), '&'),
            x -> x <> '' AND substr(x, 1, 4) <> 'utm_')), '&')
END
"""


@query(
    "dedup_url_canonical",
    oracle=f"""
    WITH raw AS (SELECT doc_id, {_URL_RAW_DUCK} AS raw_url FROM documents),
    canon AS (SELECT doc_id, raw_url,
                     {_CANON_DUCK.format(u='raw_url')} AS canonical_url
              FROM raw)
    SELECT canonical_url,
           COUNT(*) AS n_variants,
           COUNT(DISTINCT raw_url) AS n_distinct_raw,
           MIN(doc_id) AS keeper_doc_id
    FROM canon GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the crawl-hygiene step that runs
    BEFORE content dedup: lowercase scheme/host, strip the default
    port, the ``www.`` prefix, trailing path slashes, fragments, and
    ``utm_*`` tracking params, sort surviving params, then group by the
    canonical form (keep min doc_id). Three deterministic messy
    variants per page are synthesized from (doc_id, source) —
    identically in both engines — and must collapse to one canonical
    URL each.

    Scale shape: canonicalization is a pure per-row map (regex +
    array ops, whole-stage codegen); the dedup is one hash aggregate on
    the canonical string — exactly dedup_exact's economics. At 100 TB
    group states are (count, count-distinct-raw, min) per URL; the
    distinct-raw count is bounded by the variant count per page, not
    corpus size."""
    docs = Catalog(spark, sf_dir).documents
    canon = docs.select(
        "doc_id",
        F.expr(_URL_RAW_SPARK).alias("raw_url"),
    ).select(
        "doc_id",
        "raw_url",
        F.expr(_CANON_SPARK.format(u="raw_url")).alias("canonical_url"),
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.countDistinct("raw_url").alias("n_distinct_raw"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


# ---------------------------------------------------------------------------
# dedup_chunk_global — C4-style span-level exact dedup (keep first occurrence)
# ---------------------------------------------------------------------------
#
# C4 deduplicates three-sentence spans corpus-wide, keeping one occurrence
# and dropping the rest from every other document (Raffel et al. 2020 §2.2);
# RefinedWeb does the same at line granularity. The fixture documents are
# single-line token streams, so the span unit here is a fixed window of
# CHUNK_TOKENS consecutive tokens (non-overlapping, tail kept short).

CHUNK_TOKENS = 10


@query(
    "dedup_chunk_global",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
    tok AS (
      SELECT doc_id, unnest(tokens) AS tok,
             generate_subscripts(tokens, 1) AS ord
      FROM toks),
    chunks AS (
      SELECT doc_id,
             CAST(floor((ord - 1) / {CHUNK_TOKENS}) AS BIGINT) AS idx,
             string_agg(tok, ' ' ORDER BY ord) AS chunk
      FROM tok GROUP BY doc_id, CAST(floor((ord - 1) / {CHUNK_TOKENS}) AS BIGINT)),
    ranked AS (
      SELECT doc_id, idx,
             row_number() OVER (PARTITION BY chunk
                                ORDER BY doc_id, idx) AS rn
      FROM chunks),
    kept AS (
      SELECT c.doc_id, c.idx, c.chunk
      FROM chunks c JOIN ranked r
        ON c.doc_id = r.doc_id AND c.idx = r.idx AND r.rn = 1),
    totals AS (
      SELECT doc_id, COUNT(*) AS n_chunks_total FROM chunks GROUP BY doc_id),
    rebuilt AS (
      SELECT doc_id,
             COUNT(*) AS n_chunks_kept,
             string_agg(chunk, ' ' ORDER BY idx) AS kept_text
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           t.n_chunks_total,
           COALESCE(r.n_chunks_kept, 0) AS n_chunks_kept,
           COALESCE(r.kept_text, '') AS kept_text
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def dedup_chunk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level global exact dedup, C4-style: split every document into
    fixed CHUNK_TOKENS(=10)-token chunks, keep only the globally FIRST
    occurrence of each distinct chunk (order: doc_id, then position),
    and reassemble each document from its surviving chunks in original
    order. Returns per-doc (total chunks, kept chunks, rebuilt text) —
    the template-heavy fixture corpus loses most of its repeated spans.

    Scale shape (100 TB): chunking is a pure map (split + sequence +
    slice, no explode shuffle); the keep-first ranking shuffles only the
    narrow (doc_id, idx, md5-fingerprint) projection — never chunk text
    — as a window on the 16-byte fingerprint; survivors rejoin the
    chunk text by (doc_id, idx); reassembly is one hash aggregate on
    doc_id. Nothing is quadratic; per-group window state is the
    occurrence list of ONE distinct chunk (bounded by duplication
    factor, and only (doc_id, idx) pairs at that).
    """
    from pyspark.sql import Window

    docs = Catalog(spark, sf_dir).documents
    # Map-side chunking via higher-order functions: no explode shuffle.
    # NULL text must drop (DuckDB's unnest(NULL) emits no row; here
    # size(NULL) = -1 makes sequence(0, -1) step-infer to [0, -1] —
    # two phantom NULL chunks per NULL doc).
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split(F.col("text"), " ").alias("tokens")
    )
    n_chunks = F.ceil(F.size("tokens") / F.lit(CHUNK_TOKENS)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(F.col("tokens"), i * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
        ),
    )
    chunks = toks.select(
        "doc_id", F.posexplode(chunk_arr).alias("idx", "chunk")
    ).withColumn("idx", F.col("idx").cast("long"))

    # Keep-first ranking on the md5 fingerprint only (narrow shuffle).
    fp = chunks.select(
        "doc_id", "idx", F.md5(F.col("chunk").cast("binary")).alias("fp")
    )
    w = Window.partitionBy("fp").orderBy("doc_id", "idx")
    survivors = (
        fp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "idx")
    )
    kept = chunks.join(survivors, ["doc_id", "idx"], "left_semi")

    totals = chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks_total"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda s: s.chunk,
            ),
            " ",
        ).alias("kept_text"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_chunks_total",
        F.coalesce("n_chunks_kept", F.lit(0)).alias("n_chunks_kept"),
        F.coalesce("kept_text", F.lit("")).alias("kept_text"),
    )


# dedup_bloom_incremental: Bloom geometry. 2^16 bits / 5 probes sized
# for the fixture corpus; production sizes m,k from the standard
# m = -n ln(p)/(ln 2)^2 formula per ingest batch.
BLOOM_BITS = 1 << 16
BLOOM_K = 5
INCOMING_MOD = 10  # doc_id % 10 < 3 plays the "new batch"; rest is corpus
INCOMING_LT = 3


@query(
    "dedup_bloom_incremental",
    oracle=f"""
    SELECT d.doc_id, md5(d.text) AS fp
    FROM documents d
    WHERE d.doc_id % {INCOMING_MOD} < {INCOMING_LT}
      AND EXISTS (SELECT 1 FROM documents c
                  WHERE c.doc_id % {INCOMING_MOD} >= {INCOMING_LT}
                    AND md5(c.text) = md5(d.text))
    """,
)
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup with a Bloom prefilter: which documents
    of an incoming batch already exist (by exact md5 fingerprint) in the
    standing corpus? The fixture's doc_id % 10 < 3 slice plays the
    incoming batch. This is THE daily operation of a growing training
    corpus — and at 100 TB the naive form (shuffle-join every incoming
    fingerprint against billions of corpus fingerprints) wastes the
    whole join on the ~99% of documents that are genuinely new.

    Bloom-prefilter shape, built from public primitives (Spark's
    bloom_filter_agg/might_contain are internal-only): the corpus folds
    into a BOUNDED bit-position set (k=5 xxhash64 probes into 2^16
    slots — at most 65,536 distinct ints regardless of corpus size,
    the broadcastable summary a real BloomFilter packs into a bitmap);
    an incoming doc is a CANDIDATE only if all k of its probe positions
    are present (no false negatives: an fp present in the corpus set
    all of its own positions). Definitely-new docs exit at the
    broadcast-join stage without ever shuffling; only candidates (true
    dupes + the filter's false-positive fraction) reach the exact
    fingerprint semi-join that removes false positives. The oracle is
    therefore the plain EXACT semi-join — the Bloom layer must be
    output-invisible, which is precisely the approximate-prefilter +
    exact-verify contract (same pattern as minhash-candidates +
    exact-verify)."""
    return bloom_incremental_dupes(Catalog(spark, sf_dir).documents)


def bloom_incremental_dupes(
    docs: DataFrame, bits: int = BLOOM_BITS, k: int = BLOOM_K
) -> DataFrame:
    """The bloom-prefilter operator over any (doc_id, text) frame,
    geometry-parameterized — shared by the registered query (fixed
    BLOOM_BITS/BLOOM_K so the driver gate is stable) and the scale
    tests. Geometry affects ONLY the candidate count (performance), not
    output: false positives die in the exact verify, so any (bits, k)
    yields the identical result. Production sizing: bits ≈
    -n·ln(p)/(ln 2)² for target fp-rate p — an UNDERSIZED filter
    saturates (every probe position set) and silently degenerates into
    the full exact join it was supposed to avoid (measured, SCALE.md
    round 6)."""
    from motorway_spark.maintenance import CACHES

    # one text scan + md5 pass feeds all three branches (bloom build,
    # exact verify, incoming probe) — in production the corpus side is a
    # precomputed fingerprint column/index, which this cache stands for
    fps = CACHES.persist_swap(
        "bloom.fps",
        docs.select("doc_id", F.md5(F.col("text")).alias("fp")),
    )
    is_incoming = F.col("doc_id") % INCOMING_MOD < INCOMING_LT
    corpus_fp = fps.filter(~is_incoming).select("fp")
    incoming = fps.filter(is_incoming).select("doc_id", "fp")

    def probes(col):
        return F.array(
            *[
                F.pmod(F.xxhash64(F.concat(col, F.lit(f"#{i}"))), F.lit(bits))
                for i in range(k)
            ]
        )

    bloom = (
        corpus_fp.select(F.explode(probes(F.col("fp"))).alias("pos")).distinct()
    )
    cand = (
        incoming.select("doc_id", "fp", F.explode(probes(F.col("fp"))).alias("pos"))
        .join(F.broadcast(bloom), "pos")
        .groupBy("doc_id", "fp")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == k)
        .select("doc_id", "fp")
    )
    return cand.join(corpus_fp, "fp", "semi").select("doc_id", "fp")


# ExactSubstr-style span dedup: shingle width in tokens.
SPAN_K = 8


@query(
    "dedup_exact_substring_spans",
    oracle=f"""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents
      WHERE len(string_split(text, ' ')) >= {SPAN_K}),
    sh AS MATERIALIZED (
      SELECT doc_id, i AS s,
             md5(list_aggregate(toks[i : i + {SPAN_K} - 1], 'string_agg', ' '))
               AS fp
      FROM tok, UNNEST(range(1, len(toks) - {SPAN_K} + 2)) AS t(i)),
    dup AS MATERIALIZED (
      SELECT fp FROM sh GROUP BY fp HAVING COUNT(*) > 1),
    pos AS MATERIALIZED (
      SELECT doc_id, s, s + {SPAN_K} - 1 AS e
      FROM sh SEMI JOIN dup USING (fp)),
    isl AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1
                  THEN 1 ELSE 0 END AS new_island
      FROM pos),
    grp AS (
      SELECT doc_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM isl)
    SELECT doc_id,
           CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(e) AS BIGINT) AS span_end,
           CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS span_tokens,
           COUNT(*) AS n_shingles
    FROM grp
    GROUP BY doc_id, island
    """,
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span detection (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): find,
    per document, the maximal token spans whose every SPAN_K(=8)-token
    window occurs more than once in the corpus — the spans a span-level
    dedup pass would cut. The published suffix-array construction is
    replaced by a distributed blocked equivalent: k-token shingles with
    positions -> global occurrence counts -> duplicated shingle
    positions -> per-document interval merge (overlapping or adjacent
    [s, s+k-1] windows coalesce into maximal spans via the classic
    running-max-end island scan).

    Output: one row per maximal duplicated span (doc_id, 1-based token
    span_start/span_end, span length in tokens, #duplicated shingles
    merged into it). In-document repeats count: a shingle occurring
    twice in ONE doc is duplicated text just the same (total occurrence
    count > 1, not distinct-doc count).

    Scale shape (100 TB): the shingle explode emits O(tokens) rows but
    only (doc_id, pos, 16-byte md5) — never text; the duplicate gate is
    one hash aggregate on the fingerprint (map-side combinable) and a
    fingerprint-keyed semi join back; the island merge is a per-document
    window whose state is a single running max — linear end-to-end,
    no all-pairs anything. Docs shorter than SPAN_K tokens (incl.
    NULL/empty text) have no shingle and drop out on both engines.
    Reference parity: the reference has no dedup surface; this extends
    its 1:N intersection contract (motorway/intersection.py:24-47) to
    corpus-global span semantics.
    """
    from pyspark.sql import Window

    docs = Catalog(spark, sf_dir).documents
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).filter(F.size("toks") >= SPAN_K)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (SPAN_K - 1)),
                lambda i: F.struct(
                    i.alias("s"),
                    F.md5(
                        F.concat_ws(" ", F.slice("toks", i, SPAN_K)).cast("binary")
                    ).alias("fp"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.s", "p.fp")
    dup = sh.groupBy("fp").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    pos = sh.join(dup.select("fp"), "fp", "semi").select(
        "doc_id", "s", (F.col("s") + (SPAN_K - 1)).alias("e")
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = pos.withColumn(
        "new_island",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1, 1
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = isl.withColumn("island", F.sum("new_island").over(w_run))
    return grp.groupBy("doc_id", "island").agg(
        F.min("s").cast("bigint").alias("span_start"),
        F.max("e").cast("bigint").alias("span_end"),
        (F.max("e") - F.min("s") + 1).cast("bigint").alias("span_tokens"),
        F.count(F.lit(1)).alias("n_shingles"),
    ).drop("island")


def minhash_cluster_oracle_ctes() -> str:
    """The capped-minhash -> candidate-verify -> connected-components
    CTE chain as oracle SQL (names: sig, bands, hot, keep, cand, pairs,
    edges, verts, reach, comp — comp maps doc_id -> cluster_id = min
    member). Shared by composite-pipeline oracles so the cluster
    semantics cannot drift from dedup_cluster_canonical's."""
    return f"""sig AS MATERIALIZED (
      SELECT doc_id, {_SQL_MINHASH} AS mh
      FROM (SELECT doc_id, {_SQL_CHAR_SHINGLES} AS sh FROM documents)
      WHERE len(sh) > 0),
    bands AS MATERIALIZED (
      SELECT doc_id, band,
             md5(array_to_string(mh[band*4+1 : band*4+4], ',')) AS bucket
      FROM sig, UNNEST(range(0, {N_BANDS})) AS t(band)),
    hot AS (
      SELECT band, bucket FROM bands
      GROUP BY band, bucket HAVING COUNT(*) > {MH_BUCKET_CAP}),
    keep AS MATERIALIZED (
      SELECT * FROM bands b
      WHERE NOT EXISTS (SELECT 1 FROM hot h
                        WHERE h.band = b.band AND h.bucket = b.bucket)),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM keep a JOIN keep b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.doc_id < b.doc_id),
    pairs AS MATERIALIZED (
      SELECT doc_a, doc_b FROM cand
      JOIN sig sa ON doc_a = sa.doc_id
      JOIN sig sb ON doc_b = sb.doc_id
      WHERE CAST(len(list_filter(range(1, {N_MINHASH}+1),
                 i -> sa.mh[i] = sb.mh[i])) AS DOUBLE) / {N_MINHASH} >= 0.375),
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    verts AS MATERIALIZED (SELECT DISTINCT src AS doc FROM edges),
    reach AS MATERIALIZED (
      WITH RECURSIVE r(doc, other) AS (
        SELECT doc, doc FROM verts
        UNION
        SELECT r.doc, e.dst FROM r JOIN edges e ON r.other = e.src)
      SELECT * FROM r),
    comp AS MATERIALIZED (
      SELECT doc AS doc_id, MIN(other) AS cluster_id FROM reach GROUP BY doc)"""


def _cap_loss_oracle() -> str:
    return f"""
    WITH sig AS MATERIALIZED (
      SELECT doc_id, {_SQL_MINHASH} AS mh
      FROM (SELECT doc_id, {_SQL_CHAR_SHINGLES} AS sh FROM documents)
      WHERE len(sh) > 0),
    bands AS MATERIALIZED (
      SELECT doc_id, band,
             md5(array_to_string(mh[band*4+1 : band*4+4], ',')) AS bucket
      FROM sig, UNNEST(range(0, {N_BANDS})) AS t(band)),
    est_all AS MATERIALIZED (
      SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               CAST(len(list_filter(range(1, {N_MINHASH}+1),
                    i -> sa.mh[i] = sb.mh[i])) AS DOUBLE) / {N_MINHASH}
                 AS est_jaccard
        FROM (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bucket = b.bucket
              WHERE a.doc_id < b.doc_id)
        JOIN sig sa ON doc_a = sa.doc_id
        JOIN sig sb ON doc_b = sb.doc_id)
      WHERE est_jaccard >= 0.375),
    hot AS (
      SELECT band, bucket FROM bands
      GROUP BY band, bucket HAVING COUNT(*) > {MH_BUCKET_CAP}),
    keep AS MATERIALIZED (
      SELECT * FROM bands b
      WHERE NOT EXISTS (SELECT 1 FROM hot h
                        WHERE h.band = b.band AND h.bucket = b.bucket)),
    est_cap AS MATERIALIZED (
      SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               CAST(len(list_filter(range(1, {N_MINHASH}+1),
                    i -> sa.mh[i] = sb.mh[i])) AS DOUBLE) / {N_MINHASH}
                 AS est_jaccard
        FROM (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM keep a JOIN keep b
                ON a.band = b.band AND a.bucket = b.bucket
              WHERE a.doc_id < b.doc_id)
        JOIN sig sa ON doc_a = sa.doc_id
        JOIN sig sb ON doc_b = sb.doc_id)
      WHERE est_jaccard >= 0.375),
    dropped AS MATERIALIZED (
      SELECT doc_a, doc_b FROM est_all
      EXCEPT SELECT doc_a, doc_b FROM est_cap),
    c AS (
      SELECT (SELECT COUNT(*) FROM est_all) AS n_all,
             (SELECT COUNT(*) FROM est_cap) AS n_cap,
             (SELECT COUNT(*) FROM dropped) AS n_drop,
             (SELECT COUNT(DISTINCT doc)
              FROM (SELECT doc_a AS doc FROM dropped
                    UNION ALL SELECT doc_b FROM dropped)) AS n_docs)
    SELECT n_all AS n_pairs_uncapped,
           n_cap AS n_pairs_capped,
           n_drop AS n_pairs_dropped,
           n_docs AS n_docs_affected,
           CASE WHEN n_all = 0 THEN NULL
                ELSE ROUND(CAST(n_cap AS DOUBLE) / CAST(n_all AS DOUBLE), 6)
           END AS retained_pct
    FROM c
    """


@query("dedup_minhash_cap_loss", oracle=_cap_loss_oracle())
def dedup_minhash_cap_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVALUATION of the production LSH path: exactly which verified
    near-dup pairs does the hot-bucket cap (the 100 TB survival
    mechanism) sacrifice relative to the uncapped ground truth? One
    summary row: pair counts for both generators, the dropped-pair
    count, how many documents those dropped pairs touch, and the
    retention ratio. SCALE.md argues the trade-off qualitatively
    (dropped buckets are template families whose members are still
    deduplicated via other bands or the exact stage); this measures it
    under the oracle — both generators are the registered
    dedup_minhash / dedup_minhash_capped chains, and the capped pair
    set is provably a subset (the cap only removes band rows), so the
    anti-join IS the sacrifice.

    Deliberately NOT in bench.py: it embeds the uncapped
    ground-truth twin, which carries the documented quadratic and is
    excluded from sf10 by design — the evaluation belongs at gate SF
    (driver sf0.01) and in ad-hoc audits, not on the scale ledger.
    """
    docs = Catalog(spark, sf_dir).documents
    est_all = _minhash_est_pairs(docs).select("doc_a", "doc_b")
    est_cap = _minhash_est_pairs(docs, max_bucket_width=MH_BUCKET_CAP).select(
        "doc_a", "doc_b"
    )
    from motorway_spark.maintenance import CACHES

    # three consumers each (counts + anti-join) — persist both pair
    # sets; non-exclusive so the second persist keeps the first
    est_all = CACHES.persist_swap("caploss.all", est_all)
    est_cap = CACHES.persist_swap("caploss.cap", est_cap, exclusive=False)
    dropped = est_all.join(est_cap, ["doc_a", "doc_b"], "left_anti")
    dropped = CACHES.persist_swap("caploss.dropped", dropped, exclusive=False)
    n_all = est_all.agg(F.count(F.lit(1)).alias("n_pairs_uncapped"))
    n_cap = est_cap.agg(F.count(F.lit(1)).alias("n_pairs_capped"))
    n_drop = dropped.agg(F.count(F.lit(1)).alias("n_pairs_dropped"))
    n_docs = (
        dropped.select(F.explode(F.array("doc_a", "doc_b")).alias("doc"))
        .agg(F.count_distinct("doc").alias("n_docs_affected"))
    )
    return (
        n_all.crossJoin(n_cap)
        .crossJoin(n_drop)
        .crossJoin(n_docs)
        .select(
            "n_pairs_uncapped",
            "n_pairs_capped",
            "n_pairs_dropped",
            "n_docs_affected",
            F.when(F.col("n_pairs_uncapped") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    F.col("n_pairs_capped").cast("double")
                    / F.col("n_pairs_uncapped").cast("double"),
                    6,
                )
            )
            .alias("retained_pct"),
        )
    )


@query(
    "dedup_cross_source_matrix",
    oracle="""
    WITH fp AS MATERIALIZED (
      SELECT doc_id, source, md5(coalesce(text, '')) AS fp FROM documents),
    pairs AS (
      SELECT least(a.source, b.source) AS source_a,
             greatest(a.source, b.source) AS source_b
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id)
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
    FROM pairs GROUP BY source_a, source_b
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source duplication MATRIX: for every unordered pair of
    corpus sources, how many exact-duplicate document pairs straddle
    them (diagonal = within-source duplication) — the accounting view
    behind "which crawls overlap," which decides what a pipeline
    dedups against what and in which order. NULL text fingerprints as
    md5('') on both engines, so NULL/empty docs count as mutual
    duplicates here exactly like in the exact-dedup operators.

    Scale shape (100 TB): one hash aggregate groups each fingerprint's
    (doc_id, source) rows; the per-fingerprint pair expansion is
    IN-ROW over the doc_id-sorted member list (the basket trick —
    duplicate groups are template-family-sized, never corpus-sized,
    and the expansion never shuffles); the matrix aggregate is
    |sources|² rows at most. The oracle's fp self-join enumerates the
    identical pair set.
    """
    docs = Catalog(spark, sf_dir).documents
    fp = docs.select(
        "doc_id",
        "source",
        F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias("fp"),
    )
    groups = fp.groupBy("fp").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "source"))).alias("ms")
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda y: F.struct(
                    F.least(x.source, y.source).alias("source_a"),
                    F.greatest(x.source, y.source).alias("source_b"),
                ),
            ),
        )
    )
    return (
        groups.select(F.inline(pair_arr))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"))
    )
