"""Training-data sampling & packing operators (north-star extensions).

The ops every large-scale training-data pipeline runs between "corpus"
and "dataloader": deterministic sampling, split assignment, class
balancing, and token-budget sequence packing. None exist in the
reference (motorway moves records, it does not curate corpora); all are
declared engine surface in the spirit of SURVEY.md §2b's north-star
rows.

Determinism convention: anywhere a "random" choice is needed, the
engines order/assign by ``md5(key)`` — a pure function both Spark and
DuckDB implement identically — so every query here is EXACTLY
oracle-checkable (no seeded-RNG drift between engines) and reproducible
across runs/cluster sizes. That is also the production-correct choice:
hash-based selection is stable under re-partitioning and retries,
whereas per-partition RNG changes output when the split layout changes.

Scale shape: every operator is one scan + one hash shuffle at most
(window by small key set, or pure projection); selection keys are
16-byte digests, never text. ``pack_sequences`` is the one with a real
sequencing constraint and it rides a running-sum window inside hash
shards — the shard key bounds partition state exactly like the
reference's HashRingGrouper bounded per-process state (grouping.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query

# Per-stratum exact sample size (events per event_type).
STRATUM_K = 500
# Token budget per packed sequence (fixture docs are ~20-80 tokens).
PACK_BUDGET = 512
# Per-class cap for balancing (documents per source).
CLASS_CAP = 80


# ---------------------------------------------------------------------------
# Exact stratified sampling: k rows per stratum, chosen by hash order.
# ---------------------------------------------------------------------------
@query(
    "sample_stratified_exact",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, event_id, user_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
      FROM events)
    SELECT event_type, event_id, user_id
    FROM ranked WHERE rn <= {STRATUM_K}
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY k events per event_type (unlike ``sampleBy``'s binomial
    per-stratum counts), selected by md5(event_id) order so the sample
    is deterministic, engine-independent, and stable under
    repartitioning. One shuffle on the stratum key; row_number <= k
    compiles to WindowGroupLimit (per-group top-k heaps in the
    shuffle, not full per-stratum sorts) — the same bounded-shuffle
    shape as topk_per_group, so stratum skew cannot blow memory."""
    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy(F.md5(F.col("event_id").cast("string")))
    return (
        ev.select("event_type", "event_id", "user_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_K)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Deterministic train/test split by key hash.
# ---------------------------------------------------------------------------
@query(
    "split_train_test",
    oracle="""
    SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6'
                THEN 'train' ELSE 'test' END AS split,
           source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~90/10 train/test assignment by the leading byte of
    md5(doc_id) — the split every doc carries forever, independent of
    cluster size, partitioning, or insertion order (re-running over a
    grown corpus never moves an old doc across splits, so test-set
    contamination cannot creep in). Pure projection + small aggregate;
    the per-(split, source) accounting is the audit table a pipeline
    materializes alongside the split."""
    docs = Catalog(spark, sf_dir).documents
    split = F.when(
        F.md5(F.col("doc_id").cast("string")) < "e6", "train"
    ).otherwise("test")
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Class-balanced downsampling: cap each class at K by hash order.
# ---------------------------------------------------------------------------
@query(
    "balance_classes",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
      FROM documents)
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM ranked WHERE rn <= {CLASS_CAP}
    GROUP BY source
    """,
)
def balance_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class cap (here: per source, the training-mixture knob):
    keep at most K docs per class, chosen by md5(doc_id) order.
    Majority classes downsample to K, minority classes pass through
    whole — the standard mixture-balancing primitive. Same
    WindowGroupLimit-bounded shuffle as stratified sampling; the
    output is the per-class accounting (counts and kept volume)."""
    docs = Catalog(spark, sf_dir).documents
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= CLASS_CAP)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget sequence packing (greedy, shard-local).
# ---------------------------------------------------------------------------
@query(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    sharded AS (
      SELECT doc_id, n_tokens,
             CAST(substring(h, 1, 1) AS VARCHAR) AS shard, h
      FROM toks WHERE n_tokens <= {PACK_BUDGET}),
    runsum AS (
      SELECT shard, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM sharded),
    packed AS (
      SELECT shard, doc_id, n_tokens,
             CAST(FLOOR((cum - 1) / {PACK_BUDGET}) AS BIGINT) AS pack_no
      FROM runsum)
    SELECT shard, pack_no,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY shard, pack_no
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: assign docs to fixed token-budget packs
    (the pretraining batch-construction op — minimize padding by
    filling each pack to ~BUDGET tokens). Docs hash-shard by the first
    md5 nibble; within a shard a running token sum assigns
    pack_no = floor((cum-1)/BUDGET) — contiguous hash-ordered docs
    share a pack. This cumulative-bin formulation packs each pack to
    the budget boundary (a doc may straddle; training pipelines split
    or pad there — the accounting is identical), is one window pass,
    and is exactly reproducible cross-engine. Shards bound window
    partition size and parallelize packing: 16 here, thousands in
    production — pack ids stay stable because the shard key is part of
    the identity. Over-budget docs are filtered (they get truncation
    upstream, a per-row op). Output is the per-pack fill accounting —
    the padding-waste audit."""
    docs = Catalog(spark, sf_dir).documents
    toks = docs.select(
        "doc_id",
        # whitespace token count, same convention as text_token_count
        # (codegen'd split+size, no interpreted HOF in this hot path)
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).filter(F.col("n_tokens") <= PACK_BUDGET)
    sharded = toks.withColumn("shard", F.substring("h", 1, 1))
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sharded.withColumn(
        "pack_no",
        F.floor((F.sum("n_tokens").over(w) - 1) / PACK_BUDGET).cast("bigint"),
    )
    return packed.groupBy("shard", "pack_no").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: drop train docs sharing n-grams with eval.
# ---------------------------------------------------------------------------
EVAL_MOD = 53  # doc_id % EVAL_MOD == 0 -> held-out eval doc (pseudo benchmark)

from motorway_spark.queries.dedup import _SQL_WORD_SHINGLES  # noqa: E402


@query(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH sh AS MATERIALIZED (
      SELECT doc_id, UNNEST({_SQL_WORD_SHINGLES}) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
    eval_sh AS (SELECT doc_id AS eval_doc, s FROM sh WHERE doc_id % {EVAL_MOD} = 0),
    train_sh AS (SELECT doc_id, s FROM sh WHERE doc_id % {EVAL_MOD} <> 0),
    hits AS (
      SELECT t.doc_id,
             COUNT(DISTINCT t.s) AS n_shared_ngrams,
             MIN(e.eval_doc) AS contaminated_by
      FROM train_sh t JOIN eval_sh e USING (s)
      GROUP BY t.doc_id)
    SELECT d.doc_id, d.source, h.n_shared_ngrams, h.contaminated_by
    FROM hits h JOIN documents d USING (doc_id)
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the standard pretraining hygiene step
    next to split_train_test: a TRAINING document is contaminated when
    it shares any word n-gram with a HELD-OUT (benchmark/eval) document,
    and must be dropped before training so eval scores measure
    generalization, not memorization. Held-out set here = doc_id %
    EVAL_MOD == 0 (a deterministic pseudo-benchmark); n-gram = the
    word-3-gram shingles shared with the dedup family (production runs
    8-13-grams — same plan, longer shingle).

    Output: every contaminated train doc with its distinct shared-ngram
    count and the earliest eval doc it collides with (the audit a
    decontamination run must produce; the clean set is the anti-join).

    Scale shape: the eval side is tiny by construction (benchmarks are
    MBs against TBs of train), so Spark broadcasts it — the shingle
    match runs map-side with NO shuffle of the train corpus; the only
    exchange is the per-doc hit aggregation, keyed by doc_id. The
    100 TB form is identical: explode train shingles, broadcast-join
    the eval shingle set, aggregate.
    """
    from motorway_spark.queries.dedup import _word_shingles

    docs = Catalog(spark, sf_dir).documents
    par = spark.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par)
        .select("doc_id", F.explode(_word_shingles(F.col("text"))).alias("s"))
    )
    eval_sh = sh.filter(F.col("doc_id") % EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc"), "s"
    )
    train_sh = sh.filter(F.col("doc_id") % EVAL_MOD != 0)
    hits = (
        train_sh.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("s").alias("n_shared_ngrams"),
            F.min("eval_doc").alias("contaminated_by"),
        )
    )
    return hits.join(docs.select("doc_id", "source"), "doc_id").select(
        "doc_id", "source", "n_shared_ngrams", "contaminated_by"
    )


# ---------------------------------------------------------------------------
# Importance-weighted sampling: keep-probability proportional to a score.
# ---------------------------------------------------------------------------

IW_SCALE = 100.0  # weight = min(1, n_tokens / IW_SCALE): favor long docs
# 16^15 — md5's first 15 hex chars as a uniform in [0, 1): u = digits/16^15
_IW_DENOM = float(16**15)


@query(
    "sample_importance_weighted",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tokens,
             least(1.0, len(string_split(text, ' ')) / {IW_SCALE!r}) AS weight,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               / {_IW_DENOM!r} AS u
      FROM documents),
    kept AS (SELECT * FROM scored WHERE u < weight)
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CAST(s.weight AS DECIMAL(38,6))) AS DOUBLE), 4)
             AS expected_kept,
           CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
    FROM scored s
    LEFT JOIN (SELECT source, COUNT(*) AS n_kept, SUM(n_tokens) AS tokens_kept
               FROM kept GROUP BY source) k ON s.source = k.source
    GROUP BY s.source, k.n_kept, k.tokens_kept
    """,
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus sampling (DoReMi/DSIR-style reweighting
    reduced to its pipeline primitive): each document is kept with
    probability equal to its weight — here min(1, n_tokens/100), the
    favor-long-documents heuristic — decided DETERMINISTICALLY by
    comparing the document's md5-uniform u = first-15-hex-digits/16^15
    against the weight. No RNG: the decision is a pure function of
    doc_id, so it is stable under repartitioning, retries, and engine
    choice (the module's md5 convention extended from ordering to
    Bernoulli thresholding). Output is the per-source accounting:
    population, kept count, EXPECTED kept (sum of weights, exact-decimal
    summed), and surviving tokens — expected vs actual converging is the
    sanity check a production reweighting job monitors.

    Scale shape: scoring and the keep decision are pure per-row maps on
    a pruned (doc_id, text->length, source) scan; the accounting is one
    map-side-combinable aggregate over |sources| groups. The weight
    function swaps freely (quality scores, domain multipliers) without
    changing the plan shape."""
    docs = Catalog(spark, sf_dir).documents
    n_tokens = F.size(F.split(F.col("text"), " "))
    weight = F.least(F.lit(1.0), n_tokens / F.lit(IW_SCALE))
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    ) / F.lit(_IW_DENOM)
    scored = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        weight.alias("weight"),
        u.alias("u"),
    )
    kept = scored.filter(F.col("u") < F.col("weight"))
    k_agg = kept.groupBy("source").agg(
        F.count("*").alias("n_kept"), F.sum("n_tokens").alias("tokens_kept")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.sum(F.col("weight").cast("decimal(38,6)")).cast("double"), 4
            ).alias("expected_kept"),
        )
        .join(k_agg, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "expected_kept",
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
        )
    )
