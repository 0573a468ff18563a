"""Scalar function coverage: string / date / math / array / map / JSON.

SURVEY.md §2b rows "String fns", "Date/time fns", "Math fns",
"Array/map fns", "JSON fns". The reference handles all of this as
arbitrary Python inside intersections (e.g. split at
examples/intersections.py:13-16, dict→rows at examples/database.py:60-67,
JSON envelope at messages.py:75-85); here each family is declarative and
whole-stage-codegen'd — no Python in the data path.

Cross-engine conventions:
- transcendental math (pow/exp/log) is rounded: libm last-ulp behavior
  is not specified; sqrt is IEEE-exact so it is compared raw.
- queries never return raw array/map values (engines stringify them
  differently); they reduce to scalars or sorted joined strings.
- regexp_replace gets the 'g' flag in DuckDB (Spark replaces all by
  default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from motorway_spark.catalog import Catalog
from motorway_spark.queries.registry import query


# ---------------------------------------------------------------------------
# Strings.
# ---------------------------------------------------------------------------
@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lc,
           upper(c_mktsegment) AS seg_uc,
           length(c_name) AS name_len,
           substring(c_name, 1, 8) AS name_head,
           concat_ws('|', c_mktsegment, c_name) AS tagged,
           trim('  ' || c_mktsegment || ' ') AS trimmed,
           replace(c_name, '#', '-') AS dashed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           strpos(c_name, '#') AS hash_pos,
           c_name LIKE 'Customer%' AS is_cust,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devoweled,
           levenshtein(c_mktsegment, 'MACHINERY') AS lev_dist,
           reverse(c_mktsegment) AS seg_rev
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).customer.filter(F.col("c_custkey") <= 500)
    return cust.select(
        "c_custkey",
        F.lower("c_name").alias("name_lc"),
        F.upper("c_mktsegment").alias("seg_uc"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.col("c_name").like("Customer%").alias("is_cust"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("devoweled"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("lev_dist"),
        F.reverse("c_mktsegment").alias("seg_rev"),
    )


@query(
    "fn_string_split",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_type, ' ')) AS n_words,
           string_split(p_type, ' ')[1] AS first_word,
           array_to_string(list_sort(string_split(p_type, ' ')), '_') AS sorted_words
    FROM part
    WHERE p_partkey <= 1000
    """,
)
def fn_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = Catalog(spark, sf_dir).part.filter(F.col("p_partkey") <= 1000)
    words = F.split(F.col("p_type"), " ")
    return part.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        words.getItem(0).alias("first_word"),
        F.array_join(F.sort_array(words), "_").alias("sorted_words"),
    )


# ---------------------------------------------------------------------------
# Date / time.
# ---------------------------------------------------------------------------
@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dy,
           quarter(o_orderdate) AS qtr,
           hour(o_orderdate) AS hr,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus30,
           CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 90 DAY AS DATE) AS VARCHAR) AS minus90,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end,
           epoch_us(o_orderdate) AS unix_us,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS VARCHAR) AS month_end
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 2000)
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.hour("o_orderdate").alias("hr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(d, 30).cast("string").alias("plus30"),
        F.date_sub(d, 90).cast("string").alias("minus90"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).alias("days_to_end"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("unix_us"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.last_day(d).cast("string").alias("month_end"),
    )


@query(
    "fn_datetime_agg",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           COUNT(*) AS n_orders,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
)
def fn_datetime_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-bucketed aggregation — the batch form of a tumbling window."""
    orders = Catalog(spark, sf_dir).orders
    return orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month")
    ).agg(
        F.count("*").alias("n_orders"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


# ---------------------------------------------------------------------------
# Math.
# ---------------------------------------------------------------------------
@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           abs(l_discount - 0.05) AS disc_dev,
           sqrt(l_quantity) AS qty_sqrt,
           ROUND(pow(l_quantity, 1.5), 6) AS qty_pow,
           ROUND(ln(l_extendedprice), 8) AS price_ln,
           ROUND(exp(l_discount), 8) AS disc_exp,
           ROUND(log10(l_extendedprice), 8) AS price_log10,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           mod(l_orderkey, 7) AS key_mod,
           greatest(l_quantity, 25.0) AS qty_hi,
           least(l_tax, 0.04) AS tax_lo
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(1.5)), 6).alias("qty_pow"),
        F.round(F.log(F.col("l_extendedprice")), 8).alias("price_ln"),
        F.round(F.exp("l_discount"), 8).alias("disc_exp"),
        F.round(F.log10("l_extendedprice"), 8).alias("price_log10"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_hi"),
        F.least(F.col("l_tax"), F.lit(0.04)).alias("tax_lo"),
    )


# ---------------------------------------------------------------------------
# Arrays (incl. higher-order functions) over the embeddings fixture.
# ---------------------------------------------------------------------------
@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 5) AS vec_sum,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS vec_max,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS vec_min,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 5) AS sq_norm
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array HOFs: transform / filter / aggregate. The sum folds run
    left-to-right sequentially in both engines → deterministic doubles;
    rounded anyway at the boundary.

    PERFORMANCE WARNING — do not copy this shape into a hot path:
    Catalyst HOF lambdas (`F.transform`/`F.aggregate`/`F.filter`) are
    INTERPRETED, not codegen'd — measured 4-16× slower than the
    equivalent codegen form (SCALE.md). This query exists to declare
    the HOF surface itself; for hot paths use the explode+aggregate
    form (minhash_signatures) or an unrolled `F.expr` chain
    (similarity._dot) — both whole-stage-codegen'd."""
    emb = Catalog(spark, sf_dir).embeddings
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 5
        ).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vec_max"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vec_min"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x), 5
        ).alias("sq_norm"),
    )


@query(
    "fn_array_ops",
    oracle="""
    WITH t AS (
      SELECT n_nationkey,
             [n_nationkey, n_regionkey, n_nationkey % 5, 7] AS a,
             [n_regionkey, 7, 99] AS b
      FROM nation)
    SELECT n_nationkey,
           array_to_string(list_sort(list_distinct(a)), ',') AS a_distinct,
           array_to_string(list_sort(list_intersect(a, b)), ',') AS ab_common,
           list_contains(a, 7) AS has7,
           list_position(b, 99) AS pos99,
           array_to_string(a[1:2], ',') AS a_head2,
           array_to_string(flatten([a, b]), ',') AS ab_concat,
           array_to_string(range(1, 4), ',') AS seq13
    FROM t
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = Catalog(spark, sf_dir).nation
    a = F.array(
        F.col("n_nationkey"),
        F.col("n_regionkey"),
        F.col("n_nationkey") % 5,
        F.lit(7),
    )
    b = F.array(F.col("n_regionkey"), F.lit(7), F.lit(99))
    return nation.select(
        "n_nationkey",
        F.array_join(F.sort_array(F.array_distinct(a)), ",").alias("a_distinct"),
        F.array_join(F.sort_array(F.array_intersect(a, b)), ",").alias("ab_common"),
        F.array_contains(a, 7).alias("has7"),
        F.array_position(b, 99).alias("pos99"),
        F.array_join(F.slice(a, 1, 2), ",").alias("a_head2"),
        F.array_join(F.concat(a, b), ",").alias("ab_concat"),
        F.array_join(F.sequence(F.lit(1), F.lit(3)), ",").alias("seq13"),
    )


# ---------------------------------------------------------------------------
# Maps: dict → rows (the reference's WordToDictIntersection reshape,
# examples/database.py:60-67).
# ---------------------------------------------------------------------------
@query(
    "fn_map_explode",
    oracle="""
    SELECT o_orderkey, u.k AS metric, u.v AS metric_value FROM (
      SELECT o_orderkey,
             UNNEST([{'k': 'price', 'v': o_totalprice},
                     {'k': 'half', 'v': o_totalprice / 2}]) AS u
      FROM orders WHERE o_orderkey <= 400)
    """,
)
def fn_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map → one row per entry (explode(map_entries)), reproducing the
    reference's dict-of-counts → row-per-key reshape."""
    orders = Catalog(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 400)
    m = F.create_map(
        F.lit("price"), F.col("o_totalprice"), F.lit("half"), F.col("o_totalprice") / 2
    )
    return orders.select(
        "o_orderkey", F.explode(m).alias("metric", "metric_value")
    )


# ---------------------------------------------------------------------------
# JSON (events.props is a JSON string — the motorway message envelope).
# ---------------------------------------------------------------------------
@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           json_valid(props) AS is_valid,
           CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled,
           json_extract_string(props, '$.missing') AS missing_field
    FROM events
    WHERE event_id < 3000
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / from_json over the schema-free JSON payload
    (motorway's Message.content is arbitrary JSON, messages.py:13)."""
    events = Catalog(spark, sf_dir).events.filter(F.col("event_id") < 3000)
    parsed = F.from_json(F.col("props"), T.StructType([T.StructField("k", T.IntegerType())]))
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        # validity of a NULL document is unknown, not false: DuckDB's
        # json_valid(NULL) is NULL; mirror that (degenerate-input smoke)
        F.when(
            F.col("props").isNotNull(),
            F.get_json_object("props", "$").isNotNull(),
        ).alias("is_valid"),
        (parsed.getField("k") * 2).alias("k_doubled"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@query(
    "fn_json_build",
    oracle="""
    SELECT n_nationkey,
           to_json({'nation': n_name, 'region': n_regionkey}) AS as_json
    FROM nation
    """,
)
def fn_json_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json round-trip (string+int fields only: cross-engine float
    shortest-repr in JSON is not guaranteed identical)."""
    nation = Catalog(spark, sf_dir).nation
    return nation.select(
        "n_nationkey",
        F.to_json(
            F.struct(F.col("n_name").alias("nation"), F.col("n_regionkey").alias("region"))
        ).alias("as_json"),
    )


@query(
    "fn_null_semantics",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'P') AS maybe_null,
           NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL AS was_p,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'fallback') AS coalesced,
           IFNULL(NULLIF(o_orderstatus, 'P'), 'ifnull') AS ifnulled,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS good_cast,
           o_orderstatus IS NOT DISTINCT FROM NULLIF(o_orderstatus, 'P') AS nsafe_eq
    FROM orders
    WHERE o_orderkey <= 3000
    """,
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif / coalesce / ifnull, null-safe equality
    (eqNullSafe = IS NOT DISTINCT FROM), try_cast error-free casting
    (the engine's per-record error isolation for casts — the declarative
    analogue of the reference's swallow-and-fail, intersection.py:135-143)."""
    orders = Catalog(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 3000)
    maybe_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return orders.select(
        "o_orderkey",
        maybe_null.alias("maybe_null"),
        maybe_null.eqNullSafe(F.lit(None)).alias("was_p"),
        F.coalesce(maybe_null, F.lit("fallback")).alias("coalesced"),
        F.ifnull(maybe_null, F.lit("ifnull")).alias("ifnulled"),
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_cast"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("good_cast"),
        F.col("o_orderstatus").eqNullSafe(maybe_null).alias("nsafe_eq"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS bor,
           xor(o_orderkey, o_custkey) AS bxor,
           CAST((o_orderkey & 255) << 2 AS BIGINT) AS shifted,
           CAST(o_orderkey >> 3 AS BIGINT) AS rshifted,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount,
           CAST(~o_orderkey AS BIGINT) AS flipped
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface: and/or/xor, shifts, popcount, not —
    the primitives behind the engine's hash-bucket/bitmask tricks
    (simhash band keys, hash-ring groupers). All codegen'd JVM
    expressions; popcount/not cast to BIGINT on both engines (Spark
    bit_count returns INT, DuckDB returns TINYINT)."""
    orders = Catalog(spark, sf_dir).orders.filter(F.col("o_orderkey") <= 2000)
    return orders.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("band"),
        F.expr("o_orderkey | 4096").alias("bor"),
        F.expr("o_orderkey ^ o_custkey").alias("bxor"),
        F.expr("CAST(shiftleft(o_orderkey & 255, 2) AS BIGINT)").alias("shifted"),
        F.expr("CAST(shiftright(o_orderkey, 3) AS BIGINT)").alias("rshifted"),
        F.expr("CAST(bit_count(o_orderkey) AS BIGINT)").alias("popcount"),
        F.expr("CAST(~o_orderkey AS BIGINT)").alias("flipped"),
    )


@query(
    "fn_url",
    oracle="""
    SELECT c_custkey,
           lower(c_mktsegment) || '.example.com' AS host,
           '/u/' || CAST(c_custkey AS STRING) AS path,
           'seg=' || c_mktsegment AS query,
           'https' AS protocol
    FROM customer WHERE c_custkey <= 2000
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface: parse_url(HOST/PATH/QUERY/PROTOCOL) over a
    URL constructed from row values. DuckDB has no parse_url, so the
    oracle derives each component from the same inputs directly —
    Spark's parser is checked against construction ground truth."""
    cust = Catalog(spark, sf_dir).customer.filter(F.col("c_custkey") <= 2000)
    url = F.concat(
        F.lit("https://"),
        F.lower("c_mktsegment"),
        F.lit(".example.com/u/"),
        F.col("c_custkey").cast("string"),
        F.lit("?seg="),
        F.col("c_mktsegment"),
    )
    with_url = cust.withColumn("url", url)
    return with_url.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_regex_extract_all",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(COALESCE(text, ''), '[a-z]*a[a-z]*', 0))
             AS INTEGER) AS n_a_words,
           COALESCE(array_to_string(
               regexp_extract_all(COALESCE(text, ''), '[a-z]*a[a-z]*', 0)[1:3],
               '|'), '')
             AS first_a_words,
           CAST(len(regexp_extract_all(COALESCE(text, ''), '[0-9]+', 0))
             AS INTEGER) AS n_numbers
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``regexp_extract_all`` surface: every match of a pattern, not
    just the first — counted and sampled (first three, joined) so the
    output stays scalar (array columns crash order-insensitive result
    checkers — the agg_percentile_approx lesson, applied at design
    time). Patterns stay in the Java-regex/RE2 common subset (the
    text_pii_redact rule). Pure codegen'd projection.

    NULL text counts as zero matches on both engines: Spark's
    size(NULL) is -1 while DuckDB's len(NULL) is NULL — coalescing the
    input to '' before matching is the only form with one answer
    everywhere (null-fixture parity pin)."""
    docs = Catalog(spark, sf_dir).documents
    txt = "coalesce(text, '')"
    return docs.where("doc_id % 5 = 0").select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all({txt}, '[a-z]*a[a-z]*', 0)")).alias("n_a_words"),
        # no-match -> '' in BOTH engines: Spark's array_join([]) is ''
        # but DuckDB's array_to_string([]) is NULL, hence the oracle's
        # COALESCE (degenerate-input smoke)
        F.array_join(
            F.slice(F.expr(f"regexp_extract_all({txt}, '[a-z]*a[a-z]*', 0)"), 1, 3), "|"
        ).alias("first_a_words"),
        F.size(F.expr(f"regexp_extract_all({txt}, '[0-9]+', 0)")).alias("n_numbers"),
    )

