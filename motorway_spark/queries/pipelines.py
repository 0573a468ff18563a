"""Composite training-data preparation pipeline — the north-star ops
chained the way a pre-training corpus actually uses them.

One declarative plan per run: quality filter → exact dedup (keep
first) → near-dup cluster resolution (keep canonical) → per-source
corpus accounting. Each stage is an already-oracle-checked operator
(text_quality, dedup_exact_keep_first, dedup_cluster_canonical); this
query proves they COMPOSE — the oracle replays the entire pipeline in
DuckDB SQL, so stage wiring errors (wrong join key, dropped rows,
filter-before-dedup vs after) hash-fail loudly.

Scale shape: the stages share one documents scan per branch, every
join is keyed on doc_id (no shuffle wider than the corpus), and the
only iterative piece (connected components) is already lineage-
truncated. At 100 TB this exact plan is the nightly corpus-refresh
job: filter early (quality prunes ~45% before any pairwise work),
dedup on narrow keys, account per source at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query
from motorway_spark.queries.dedup import (
    _SQL_CHAR_SHINGLES,
    _SQL_MINHASH,
    MH_BUCKET_CAP,
    N_BANDS,
    N_MINHASH,
    dedup_cluster_canonical,
    dedup_exact_keep_first,
)
from motorway_spark.queries.text import _PUNCT_SQL, _sql_stopword_hits, STOPWORDS

QUALITY_FLOOR = 0.65


@query(
    "pipeline_training_prep",
    oracle=f"""
    WITH quality AS MATERIALIZED (
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      m AS (SELECT doc_id,
                   len(toks) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE CAST(len(regexp_extract_all(text, '{_PUNCT_SQL}')) AS DOUBLE)
                             / length(text) END AS punct_ratio,
                   CAST({_sql_stopword_hits(STOPWORDS['en'])} AS DOUBLE) / len(toks)
                     AS stop_ratio
            FROM t)
      SELECT doc_id,
             ROUND(0.4 * least(n_tokens / 50.0, 1.0)
                 + 0.3 * uniq_ratio
                 + 0.2 * least(stop_ratio * 5, 1.0)
                 + 0.1 * (1.0 - least(punct_ratio * 10, 1.0)), 6) AS quality_score
      FROM m),
    keepfirst AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn = 1),
    sig AS MATERIALIZED (
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
      SELECT doc AS doc_id, MIN(other) AS cluster_id FROM reach GROUP BY doc),
    kept AS (
      SELECT d.doc_id, d.source,
             len(string_split(d.text, ' ')) AS ws_tokens,
             q.quality_score
      FROM documents d
      JOIN quality q USING (doc_id)
      JOIN keepfirst kf USING (doc_id)
      LEFT JOIN comp c USING (doc_id)
      WHERE q.quality_score >= {QUALITY_FLOOR}
        AND (c.doc_id IS NULL OR c.cluster_id = c.doc_id))
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(ws_tokens) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(quality_score AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_quality
    FROM kept
    GROUP BY source
    """,
)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality ≥ {floor} → exact-dedup keep-first → near-dup keep
    canonical → per-source (docs, whitespace tokens, avg quality)."""
    from motorway_spark.queries.text import text_quality

    docs = Catalog(spark, sf_dir).documents
    quality = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    keepfirst = dedup_exact_keep_first(spark, sf_dir).select("doc_id")
    clusters = dedup_cluster_canonical(spark, sf_dir).select(
        F.col("doc_id").alias("c_doc_id"), "is_canonical"
    )
    kept = (
        docs.join(quality, "doc_id")
        .join(keepfirst, "doc_id")
        .join(clusters, F.col("doc_id") == F.col("c_doc_id"), "left")
        .filter(
            (F.col("quality_score") >= QUALITY_FLOOR)
            & (F.col("c_doc_id").isNull() | F.col("is_canonical"))
        )
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).alias("ws_tokens"),
            "quality_score",
        )
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum(F.col("quality_score").cast("decimal(38,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_quality"),
    )


@query(
    "pipeline_engagement_report",
    oracle="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
    m AS (SELECT user_id, event_id, ts_us,
            CASE WHEN lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    s AS (SELECT user_id, ts_us,
            CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS session_no
          FROM m),
    sess AS MATERIALIZED (
      SELECT user_id, session_no, COUNT(*) AS n_events,
             CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us
      FROM s GROUP BY user_id, session_no),
    per_user AS MATERIALIZED (
      SELECT user_id, COUNT(*) AS n_sessions,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             CAST(SUM(duration_us) AS BIGINT) AS engaged_us
      FROM sess GROUP BY user_id)
    SELECT CASE WHEN n_sessions >= 70 THEN 'heavy'
                WHEN n_sessions >= 55 THEN 'regular'
                ELSE 'light' END AS tier,
           COUNT(*) AS n_users,
           CAST(SUM(n_sessions) AS BIGINT) AS total_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(SUM(engaged_us) AS BIGINT) AS total_engaged_us
    FROM per_user GROUP BY 1
    """,
)
def pipeline_engagement_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite product-analytics chain over the timeseries family:
    sessionize (gaps-and-islands window) → per-user session rollup →
    activity-tier report. Stages reuse the oracle-checked
    sessionize_events operator unchanged; the oracle replays the whole
    chain in one DuckDB statement, so wiring errors between stages
    hash-fail loudly (same composition contract as
    pipeline_training_prep).

    Scale shape: one events scan, one hash exchange on user_id (the
    window), then every later aggregate is keyed per user or per tier —
    strictly narrowing. No stage widens beyond the session count.
    """
    from motorway_spark.queries.timeseries import sessionize_events

    sess = sessionize_events(spark, sf_dir)
    per_user = sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum("duration_us").alias("engaged_us"),
    )
    tier = (
        F.when(F.col("n_sessions") >= 70, "heavy")
        .when(F.col("n_sessions") >= 55, "regular")
        .otherwise("light")
    )
    return per_user.groupBy(tier.alias("tier")).agg(
        F.count("*").alias("n_users"),
        F.sum("n_sessions").alias("total_sessions"),
        F.sum("n_events").alias("total_events"),
        F.sum("engaged_us").alias("total_engaged_us"),
    )


PIPE_QUALITY_FLOOR = 0.65
PIPE_CLASS_CAP = 10
PIPE_PACK_BUDGET = 512


@query(
    "pipeline_pretraining_mix",
    oracle=f"""
    WITH quality AS MATERIALIZED (
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      m AS (SELECT doc_id,
                   len(toks) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE CAST(len(regexp_extract_all(text, '{_PUNCT_SQL}')) AS DOUBLE)
                             / length(text) END AS punct_ratio,
                   CAST({_sql_stopword_hits(STOPWORDS['en'])} AS DOUBLE) / len(toks)
                     AS stop_ratio
            FROM t)
      SELECT doc_id,
             ROUND(0.4 * least(n_tokens / 50.0, 1.0)
                 + 0.3 * uniq_ratio
                 + 0.2 * least(stop_ratio * 5, 1.0)
                 + 0.1 * (1.0 - least(punct_ratio * 10, 1.0)), 6) AS quality_score
      FROM m),
    keepfirst AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn = 1),
    surviving AS MATERIALIZED (
      SELECT d.doc_id, d.source, d.text
      FROM documents d
      JOIN quality q USING (doc_id)
      JOIN keepfirst kf USING (doc_id)
      WHERE q.quality_score >= {PIPE_QUALITY_FLOOR}),
    balanced AS MATERIALIZED (
      SELECT doc_id, source, text FROM (
        SELECT *, row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
        FROM surviving)
      WHERE rn <= {PIPE_CLASS_CAP}),
    assigned AS MATERIALIZED (
      SELECT doc_id, source,
             CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6'
                  THEN 'train' ELSE 'test' END AS split,
             len(string_split(text, ' ')) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM balanced
      WHERE len(string_split(text, ' ')) <= {PIPE_PACK_BUDGET}),
    packed AS (
      SELECT split, source, doc_id, n_tokens,
             CAST(substring(h, 1, 1) AS VARCHAR) AS shard,
             CAST(FLOOR((SUM(n_tokens) OVER (
                    PARTITION BY split, CAST(substring(h, 1, 1) AS VARCHAR)
                    ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                  / {PIPE_PACK_BUDGET}) AS BIGINT) AS pack_no
      FROM assigned)
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT shard || '-' || CAST(pack_no AS VARCHAR)) AS BIGINT)
             AS n_packs,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE)
                 / (COUNT(DISTINCT shard || '-' || CAST(pack_no AS VARCHAR))
                    * {PIPE_PACK_BUDGET}.0), 6) AS fill_ratio
    FROM packed
    GROUP BY split
    """,
)
def pipeline_pretraining_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sampling/packing family composed end to end, the way a
    pretraining mixture is actually cut: quality floor → exact dedup
    keep-first → per-source class cap (md5 order) → hash-stable
    train/test split → token-budget sequence packing per (split,
    shard) → per-split accounting (docs, tokens, packs, fill ratio).
    Every stage is an already-oracle-checked operator; this query
    proves the COMPOSITION (stage order matters: balancing before
    splitting keeps the mixture identical in both splits; packing
    after splitting keeps packs split-pure). The oracle replays the
    whole chain in one DuckDB statement, so wiring errors hash-fail
    loudly — same contract as pipeline_training_prep.

    Scale shape: one documents scan feeds quality/dedup/balance (all
    keyed on doc_id/source — shuffles bounded by corpus width), the
    split is a pure projection, and packing shuffles once on (split,
    shard) — the shard key bounds window partition state exactly as in
    pack_sequences."""
    from motorway_spark.queries.text import text_quality
    from pyspark.sql import Window

    docs = Catalog(spark, sf_dir).documents
    quality = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    keepfirst = dedup_exact_keep_first(spark, sf_dir).select("doc_id")
    surviving = (
        docs.join(quality, "doc_id")
        .join(keepfirst, "doc_id")
        .filter(F.col("quality_score") >= PIPE_QUALITY_FLOOR)
        .select("doc_id", "source", "text")
    )
    w_bal = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    balanced = (
        surviving.withColumn("rn", F.row_number().over(w_bal))
        .filter(F.col("rn") <= PIPE_CLASS_CAP)
        .drop("rn")
    )
    h = F.md5(F.col("doc_id").cast("string"))
    assigned = (
        balanced.select(
            "doc_id",
            "source",
            F.when(h < "e6", "train").otherwise("test").alias("split"),
            F.size(F.split("text", " ")).alias("n_tokens"),
            h.alias("h"),
        )
        .filter(F.col("n_tokens") <= PIPE_PACK_BUDGET)
        .withColumn("shard", F.substring("h", 1, 1))
    )
    w_pack = (
        Window.partitionBy("split", "shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = assigned.withColumn(
        "pack_no",
        F.floor((F.sum("n_tokens").over(w_pack) - 1) / PIPE_PACK_BUDGET).cast("bigint"),
    )
    pack_key = F.concat_ws("-", "shard", F.col("pack_no").cast("string"))
    return packed.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.count_distinct(pack_key).alias("n_packs"),
        F.round(
            F.sum("n_tokens").cast("double")
            / (F.count_distinct(pack_key) * float(PIPE_PACK_BUDGET)),
            6,
        ).alias("fill_ratio"),
    )


@query(
    "pipeline_entity_resolution",
    oracle="""
    WITH pairs AS (
      SELECT a.s_suppkey AS doc_a, b.s_suppkey AS doc_b
      FROM supplier a JOIN supplier b
        ON a.s_suppkey < b.s_suppkey
       AND abs(length(a.s_name) - length(b.s_name)) <= 1
      WHERE levenshtein(a.s_name, b.s_name) <= 1),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
    verts AS (SELECT s_suppkey AS doc FROM supplier),
    reach AS (
      WITH RECURSIVE r(doc, other) AS (
        SELECT doc, doc FROM verts
        UNION
        SELECT r.doc, e.dst FROM r JOIN edges e ON r.other = e.src)
      SELECT * FROM r),
    labels AS (
      SELECT doc, MIN(other) AS entity_id FROM reach GROUP BY doc)
    SELECT l.entity_id,
           s.s_name AS canonical_name,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(l.doc) AS BIGINT) AS member_key_sum
    FROM labels l JOIN supplier s ON s.s_suppkey = l.entity_id
    GROUP BY l.entity_id, s.s_name
    """,
)
def pipeline_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage pipeline end to end: typo-level fuzzy matching →
    transitive closure → one canonical row per real-world entity. The
    composite of ``fuzzy_join_levenshtein`` (PassJoin blocking + exact
    verify) and ``label_propagation`` (Pregel-style connected
    components, localCheckpoint per iteration), finished with a
    canonical-name rollup. Singleton suppliers (no fuzzy twin) are
    their own entity — the left join + coalesce keeps them.

    The oracle replays the whole chain declaratively: quadratic lev
    join (the blocking's ground truth) → recursive-CTE closure →
    rollup, so the pipeline is exact-checked END TO END, composition
    included, not just per stage. Scale shape: blocking joins + the
    per-iteration (edges ⋈ labels) shuffle all key on supplier id;
    the quadratic form exists only in the oracle."""
    from motorway_spark.queries.dedup import _lev1_candidates, label_propagation

    supp = Catalog(spark, sf_dir).supplier.select("s_suppkey", "s_name")
    pairs = (
        _lev1_candidates(supp, "s_suppkey", "s_name")
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select(F.col("supp_a").alias("doc_a"), F.col("supp_b").alias("doc_b"))
    )
    labels = label_propagation(pairs)
    resolved = supp.join(labels, supp.s_suppkey == labels.doc, "left").select(
        "s_suppkey",
        F.coalesce(F.col("label"), F.col("s_suppkey")).alias("entity_id"),
    )
    agg = resolved.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("s_suppkey").alias("member_key_sum"),
    )
    return agg.join(
        supp.select(
            F.col("s_suppkey").alias("entity_id"),
            F.col("s_name").alias("canonical_name"),
        ),
        "entity_id",
    ).select("entity_id", "canonical_name", "n_members", "member_key_sum")


# ---------------------------------------------------------------------------
# pipeline_corpus_curation — quality gates -> semantic dedup -> accounting
# ---------------------------------------------------------------------------

from motorway_spark.queries.similarity import (  # noqa: E402
    SEM_TAU,
    semdedup_flags,
    semdedup_oracle_ctes,
)

CUR_LANG = "en"
CUR_MIN_TOKENS = 30


@query(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH docs_t AS (
      SELECT doc_id, source, lang,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    quality AS MATERIALIZED (
      SELECT * FROM docs_t
      WHERE lang = '{CUR_LANG}' AND n_tokens >= {CUR_MIN_TOKENS}),
    vq AS MATERIALIZED (
      SELECT e.vec_id, e.embedding
      FROM embeddings e JOIN quality q ON e.vec_id = q.doc_id),
    {semdedup_oracle_ctes('vq')},
    dupped AS (
      SELECT DISTINCT vb AS vec_id FROM sem_pairs WHERE cos >= {SEM_TAU!r}),
    kept AS (
      SELECT q.* FROM quality q
      WHERE q.doc_id NOT IN (SELECT vec_id FROM dupped))
    SELECT t.source,
           CAST(t.n_candidates AS BIGINT) AS n_candidates,
           CAST(COALESCE(q.n_quality, 0) AS BIGINT) AS n_quality,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(k.tokens_kept, 0) AS BIGINT) AS tokens_kept
    FROM (SELECT source, COUNT(*) AS n_candidates FROM docs_t GROUP BY source) t
    LEFT JOIN (SELECT source, COUNT(*) AS n_quality
               FROM quality GROUP BY source) q ON t.source = q.source
    LEFT JOIN (SELECT source, COUNT(*) AS n_kept, SUM(n_tokens) AS tokens_kept
               FROM kept GROUP BY source) k ON t.source = k.source
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern corpus-curation composite — the SemDeDup-era counterpart
    of pipeline_training_prep's minhash chain: language + length gates
    first (cheap single-scan predicates prune before any vector work),
    then SEMANTIC dedup over the survivors' embeddings (semdedup_flags
    with the corpus-trained codebook — the quantizer sees the full
    table, the flags only the filtered subset, exactly how a production
    curation run reuses its quantizer across filter iterations), then
    per-source accounting of the surviving token budget. Documents with
    no embedding row pass the dedup stage untouched — the stage abstains
    rather than drops what it cannot judge. The oracle replays the full
    chain including the anchor-capped within-cell cosine decisions.

    Output: per source — documents scanned, past quality gates, kept
    after semantic dedup, and the surviving token count (the number
    that actually matters when filling a pre-training mix).

    Scale shape: gates are scan predicates (pushdown-friendly); the
    doc->vector join is id-keyed; semantic dedup inherits semdedup's
    O(n·W) anchor bound; accounting is a map-side-combinable aggregate
    over |sources| groups. All counts integer — no float determinism
    surface anywhere outside the (bit-exact) cosine kernel."""
    cat = Catalog(spark, sf_dir)
    docs_t = cat.documents.select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    quality = docs_t.filter(
        (F.col("lang") == CUR_LANG) & (F.col("n_tokens") >= CUR_MIN_TOKENS)
    )
    emb = cat.embeddings
    vectors = emb.join(
        quality.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    ).select("vec_id", "embedding")
    flags = semdedup_flags(spark, emb, vectors)
    # Documents with no embedding row pass through: semantic dedup
    # ABSTAINS where it has no vector to judge (the oracle's NOT IN
    # dupped has the same semantics). Invisible at sf0.01 where the two
    # tables are 1:1 — caught at sf0.1 where docs outnumber vectors.
    kept = quality.join(
        flags.select(F.col("vec_id").alias("doc_id"), "keep"), "doc_id", "left"
    ).filter(F.col("keep").isNull() | F.col("keep"))
    totals = docs_t.groupBy("source").agg(F.count("*").alias("n_candidates"))
    q_agg = quality.groupBy("source").agg(F.count("*").alias("n_quality"))
    k_agg = kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )
    return (
        totals.join(q_agg, "source", "left")
        .join(k_agg, "source", "left")
        .select(
            "source",
            "n_candidates",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
        )
    )


def _funnel_oracle() -> str:
    from motorway_spark.queries.dedup import minhash_cluster_oracle_ctes
    from motorway_spark.queries.similarity import SEM_TAU, semdedup_oracle_ctes

    return f"""
    WITH keepfirst AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents)
      WHERE rn = 1),
    {minhash_cluster_oracle_ctes()},
    s2 AS MATERIALIZED (
      SELECT kf.doc_id FROM keepfirst kf
      LEFT JOIN comp c USING (doc_id)
      WHERE c.doc_id IS NULL OR c.cluster_id = c.doc_id),
    {semdedup_oracle_ctes('embeddings')},
    dupped AS (
      SELECT DISTINCT vb AS vec_id FROM sem_pairs WHERE cos >= {SEM_TAU!r}),
    s3 AS MATERIALIZED (
      SELECT doc_id FROM s2
      WHERE doc_id NOT IN (SELECT vec_id FROM dupped)),
    c AS (
      SELECT (SELECT COUNT(*) FROM documents) AS c0,
             (SELECT COUNT(*) FROM keepfirst) AS c1,
             (SELECT COUNT(*) FROM s2) AS c2,
             (SELECT COUNT(*) FROM s3) AS c3)
    SELECT 0 AS stage, 'total' AS stage_name,
           c0 AS docs_in, c0 AS docs_out, 0 AS removed FROM c
    UNION ALL SELECT 1, 'exact', c0, c1, c0 - c1 FROM c
    UNION ALL SELECT 2, 'near_dup', c1, c2, c1 - c2 FROM c
    UNION ALL SELECT 3, 'semantic', c2, c3, c2 - c3 FROM c
    """


@query("pipeline_dedup_funnel", oracle=_funnel_oracle())
def pipeline_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-cascade ATTRITION LEDGER — the per-stage accounting
    report every production corpus-dedup run publishes: how many
    documents enter and survive each rung of the ladder

        total -> exact (md5 keep-first)
              -> near-dup (capped-minhash clusters, keep canonical)
              -> semantic (SemDeDup over the embedding space)

    one row per stage with (docs_in, docs_out, removed). Exactly the
    stages of dedup_exact_keep_first, dedup_cluster_canonical and
    dedup_semantic_semdedup — REUSED, not reimplemented (and the oracle
    reuses their shared CTE factorings, so the funnel cannot drift from
    the registered stage semantics). Docs without an embedding abstain
    through the semantic stage, like pipeline_corpus_curation.

    Scale shape: each stage is the already-audited operator plan (hash
    agg on md5; capped LSH + label propagation; anchor-capped O(n*W)
    cosine); the ledger itself is four count aggregates combined with
    1-row cross joins (BroadcastNestedLoopJoin over single rows) and an
    inline explode — no new shuffle anywhere. All-integer output.
    """
    from motorway_spark.queries.dedup import (
        dedup_cluster_canonical,
        dedup_exact_keep_first,
    )
    from motorway_spark.queries.similarity import dedup_semantic_semdedup

    from motorway_spark.maintenance import CACHES

    docs = Catalog(spark, sf_dir).documents
    s1 = dedup_exact_keep_first(spark, sf_dir).select("doc_id")
    clusters = dedup_cluster_canonical(spark, sf_dir).select(
        F.col("doc_id").alias("c_doc_id"), "is_canonical"
    )
    flags = dedup_semantic_semdedup(spark, sf_dir).select(
        F.col("vec_id").alias("f_doc_id"), "keep"
    )
    # The four ledger counts are branches of ONE plan: without a cache,
    # c1/c2/c3 each recompute the keep-first shuffle and c2/c3 the
    # cluster join (the label-propagation loop itself is localCheckpoint
    # -truncated inside dedup_cluster_canonical, so it never re-runs).
    # Persist the survivor-id frames NON-exclusively, and only after the
    # semdedup call above — its own exclusive persist_swap would release
    # any funnel scope registered earlier. Both frames are doc_id-only
    # (narrowest possible cache).
    s1 = CACHES.persist_swap("funnel.s1", s1, exclusive=False)
    s2 = (
        s1.join(clusters, F.col("doc_id") == F.col("c_doc_id"), "left")
        .filter(F.col("c_doc_id").isNull() | F.col("is_canonical"))
        .select("doc_id")
    )
    s2 = CACHES.persist_swap("funnel.s2", s2, exclusive=False)
    s3 = (
        s2.join(flags, F.col("doc_id") == F.col("f_doc_id"), "left")
        .filter(F.col("keep").isNull() | F.col("keep"))
        .select("doc_id")
    )
    c0 = docs.agg(F.count("*").alias("c0"))
    c1 = s1.agg(F.count("*").alias("c1"))
    c2 = s2.agg(F.count("*").alias("c2"))
    c3 = s3.agg(F.count("*").alias("c3"))
    row = c0.crossJoin(c1).crossJoin(c2).crossJoin(c3)
    ledger = F.array(
        F.struct(
            F.lit(0).alias("stage"),
            F.lit("total").alias("stage_name"),
            F.col("c0").alias("docs_in"),
            F.col("c0").alias("docs_out"),
            F.lit(0).cast("bigint").alias("removed"),
        ),
        F.struct(
            F.lit(1).alias("stage"),
            F.lit("exact").alias("stage_name"),
            F.col("c0").alias("docs_in"),
            F.col("c1").alias("docs_out"),
            (F.col("c0") - F.col("c1")).alias("removed"),
        ),
        F.struct(
            F.lit(2).alias("stage"),
            F.lit("near_dup").alias("stage_name"),
            F.col("c1").alias("docs_in"),
            F.col("c2").alias("docs_out"),
            (F.col("c1") - F.col("c2")).alias("removed"),
        ),
        F.struct(
            F.lit(3).alias("stage"),
            F.lit("semantic").alias("stage_name"),
            F.col("c2").alias("docs_in"),
            F.col("c3").alias("docs_out"),
            (F.col("c2") - F.col("c3")).alias("removed"),
        ),
    )
    return row.select(F.inline(ledger))
