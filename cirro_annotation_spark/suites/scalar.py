"""Scalar function coverage (SURVEY.md §2.9): string/regex/path/date/json/math.

Every expression stays JVM-side (whole-stage codegen) — these are the
functions that must never become Python UDFs in a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cirro_annotation_spark.registry import query
from cirro_annotation_spark.suites.util import RATIO, t


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           LOWER(TRIM(c_name))          AS name_norm,
           LENGTH(c_name)               AS name_len,
           SUBSTR(c_name, 1, 8)         AS name_prefix,
           UPPER(c_mktsegment)          AS segment_upper,
           CONCAT(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # str_trim_lower is the reference's column normalization (run_annotate.py:48).
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower(F.trim(F.col("c_name"))).alias("name_norm"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.upper("c_mktsegment").alias("segment_upper"),
        F.concat_ws("#", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
    )


@query(
    "scalar_str_endswith",
    oracle="""
    SELECT p_partkey,
           CASE WHEN ends_with(p_name, 'red') THEN 1 ELSE 0 END AS ends_red,
           CASE WHEN starts_with(p_type, 'STANDARD') THEN 1 ELSE 0 END AS std_type,
           CASE WHEN contains(p_brand, '#1') THEN 1 ELSE 0 END AS brand_1x
    FROM part
    """,
)
def scalar_str_endswith(spark: SparkSession, sf_dir: str) -> DataFrame:
    # str_endswith as a row-level predicate (the reference applies it at
    # the file-listing level, run_annotate.py:35,60,94; same function).
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").endswith("red").cast("int").alias("ends_red"),
        F.col("p_type").startswith("STANDARD").cast("int").alias("std_type"),
        F.col("p_brand").contains("#1").cast("int").alias("brand_1x"),
    )


@query(
    "scalar_regex_extract",
    oracle="""
    SELECT c_custkey,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
           CASE WHEN REGEXP_MATCHES(c_name, '[0-9]{3,}') THEN 1 ELSE 0 END AS has_3digits,
           REGEXP_REPLACE(c_name, '[0-9]', '#', 'g') AS name_masked
    FROM customer
    """,
)
def scalar_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # regex_extract_tokens / regex_match (run_annotate.py:133,140) as row ops.
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.when(F.col("c_name").rlike(r"[0-9]{3,}"), 1).otherwise(0).alias("has_3digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("name_masked"),
    )


@query(
    "scalar_path_funcs",
    oracle="""
    SELECT DISTINCT
           CONCAT('data/', source, '/', lang, '/doc_', CAST(doc_id AS VARCHAR), '.txt') AS path,
           source AS src_token,
           lang   AS lang_token
    FROM documents
    """,
)
def scalar_path_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """path_split_element + token extraction (run_annotate.py:133-136,191):
    build a tokenized path, then prove the engine recovers the tokens with
    the same `[tok]` → `([^/]+)` regex the manifest compiler uses."""
    d = t(spark, sf_dir, "documents")
    path = F.concat_ws(
        "/",
        F.lit("data"),
        "source",
        "lang",
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".txt")),
    )
    with_path = d.select(path.alias("path"))
    return with_path.select(
        "path",
        F.regexp_extract("path", r"^data/([^/]+)/([^/]+)/doc_\d+\.txt$", 1).alias(
            "src_token"
        ),
        F.regexp_extract("path", r"^data/([^/]+)/([^/]+)/doc_\d+\.txt$", 2).alias(
            "lang_token"
        ),
    ).distinct()


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events.props is a JSON string — get_json_object stays JVM-side.
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@query(
    "scalar_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS valid_json
    FROM events
    """,
)
def scalar_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON decode: from_json with a declared schema (vs the
    path-extract in scalar_json_extract) — struct fields become real
    columns Catalyst can prune/push."""
    e = t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k bigint")
    return e.select(
        "event_id",
        parsed["k"].alias("k"),
        parsed.isNotNull().cast("int").alias("valid_json"),
    )


@query(
    "scalar_array_funcs",
    oracle=f"""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(CAST(list_max(CAST(embedding AS DOUBLE[])) AS DOUBLE), {RATIO}) + 0 AS max_val,
           ROUND(list_sum(CAST(embedding[1:4] AS DOUBLE[])), {RATIO}) + 0 AS head_sum,
           CASE WHEN list_contains(list_transform(CAST(embedding AS DOUBLE[]), x -> x > 0), true)
                THEN 1 ELSE 0 END AS has_positive
    FROM embeddings
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar coverage (SURVEY §2.9 north star): size / max /
    slice+fold / existence — all JVM higher-order functions."""
    e = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max(v), RATIO).alias("max_val"),
        F.round(
            F.aggregate(F.slice(v, 1, 4), F.lit(0.0), lambda a, x: a + x), RATIO
        ).alias("head_sum"),
        F.exists(v, lambda x: x > 0).cast("int").alias("has_positive"),
    )


@query(
    "scalar_date_parts",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def scalar_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "scalar_date_format",
    oracle="""
    SELECT event_id,
           STRFTIME(ts, '%Y-%m-%d')   AS day_str,
           STRFTIME(ts, '%Y-%m-%d %H:00:00') AS hour_str,
           CAST(EXTRACT(dow FROM ts) AS INT) AS day_of_week
    FROM events
    """,
)
def scalar_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    # date_format display (reference ask_dataset.py:23). DOW aligned:
    # DuckDB EXTRACT(dow) is 0=Sunday; Spark dayofweek is 1=Sunday.
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.date_format("ts", "yyyy-MM-dd HH:00:00").alias("hour_str"),
        (F.dayofweek("ts") - 1).cast("int").alias("day_of_week"),
    )


@query(
    "scalar_math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), {RATIO})              AS disc_dev,
           ROUND(LN(l_extendedprice), {RATIO})                 AS log_price,
           ROUND(SQRT(l_quantity), {RATIO})                    AS sqrt_qty,
           CAST(CEIL(l_quantity / 10.0) AS BIGINT)             AS qty_decile,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), {RATIO}) AS charge
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), RATIO).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice")), RATIO).alias("log_price"),
        F.round(F.sqrt("l_quantity"), RATIO).alias("sqrt_qty"),
        F.ceil(F.col("l_quantity") / 10.0).cast("bigint").alias("qty_decile"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            RATIO,
        ).alias("charge"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 250000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending-excluded') AS status_label
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 250000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending-excluded")
        ).alias("status_label"),
    )


@query(
    "scalar_try_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           TRY_CAST(event_type AS DOUBLE) AS bogus_num
    FROM events
    """,
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pandas to_numeric(errors='coerce') parity (run_annotate.py:23-25):
    # parse failures become NULL, never errors.
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_num"),
        F.col("event_type").try_cast("double").alias("bogus_num"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           event_type AS m_type,
           CAST(LEN(json_keys(props)) AS INT) AS n_keys,
           CAST(props->>'k' AS BIGINT) AS k_val,
           array_to_string(json_keys(props), ',') AS keys
    FROM events
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed scalars (§2.9 north-star `map_*`): in-plan map
    construction + from_json into map<string,long> + key/value access —
    all codegen'd column functions, one narrow scan."""
    e = t(spark, sf_dir, "events")
    m = F.create_map(F.lit("type"), F.col("event_type"))
    pm = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.size(F.map_keys(pm)).alias("n_keys"),
        F.element_at(pm, "k").alias("k_val"),
        F.array_join(F.map_keys(pm), ",").alias("keys"),
    )


@query(
    "scalar_explode_outer",
    # explode_outer vs explode: a row whose array is EMPTY (115 of 500 fixture docs) survives with
    # a NULL element instead of vanishing — the difference between "doc
    # has no matches" being observable and silently disappearing.
    oracle="""
    WITH n AS (SELECT doc_id, regexp_extract_all(text, 'qu\\w+') AS nums
               FROM documents)
    SELECT doc_id, UNNEST(nums) AS num FROM n WHERE LEN(nums) > 0
    UNION ALL
    SELECT doc_id, NULL AS num FROM n WHERE LEN(nums) = 0
    """,
)
def scalar_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode_outer(F.regexp_extract_all("text", F.lit(r"qu\w+"), 0)).alias("num"),
    )


@query(
    "scalar_hof_exists_forall",
    # Higher-order predicates over arrays: exists / forall / filter-count
    # — all JVM-side lambda expressions, one narrow scan.
    oracle="""
    WITH tok AS (SELECT doc_id,
                        list_filter(string_split_regex(TRIM(text), '\\s+'), x -> x <> '') AS toks
                 FROM documents)
    SELECT doc_id,
           LEN(list_filter(toks, x -> LENGTH(x) > 8)) AS n_long_tokens,
           CAST(LEN(list_filter(toks, x -> LOWER(x) = 'the')) > 0 AS BOOLEAN) AS has_the,
           CAST(LEN(list_filter(toks, x -> LENGTH(x) < 20)) = LEN(toks) AS BOOLEAN) AS all_short
    FROM tok
    """,
)
def scalar_hof_exists_forall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cirro_annotation_spark.operators.text import tokens

    d = t(spark, sf_dir, "documents")
    toks = tokens("text")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 8)).alias("n_long_tokens"),
        F.exists(toks, lambda x: F.lower(x) == "the").alias("has_the"),
        F.forall(toks, lambda x: F.length(x) < 20).alias("all_short"),
    )
