"""Scalar function families (SURVEY.md §2.4 tail).

All built-in column expressions (JVM-side, codegen'd). Cross-engine
pinning choices, each documented at the call site:

- temporal outputs leave as epoch ints / DATE / formatted strings
  (never raw TIMESTAMP) so oracle hashing is representation-stable;
- ``ceil``/``floor`` are cast to BIGINT on both sides (DuckDB's
  return DOUBLE, Spark's return LONG);
- transcendental results (ln/log10/exp/sqrt) round to 6 decimals —
  libm ulp differences live far below that;
- Spark ``dayofweek`` is 1-7 Sunday-first; DuckDB's is 0-6 — oracle
  adds 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table


def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    d = F.to_date("ts")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.dayofweek("ts").alias("dow"),
        F.date_format(d, "yyyy-MM-dd").alias("day"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format(F.date_add(d, 7), "yyyy-MM-dd").alias("plus_week"),
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_month"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute_str"),
    )


def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.ceil(F.col("l_quantity") * 1.5).cast("long").alias("ceil_q"),
        F.floor(F.col("l_quantity") / 2).cast("long").alias("floor_half_q"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.log10(F.col("l_extendedprice")), 6).alias("log10_price"),
        F.round(F.sqrt(F.col("l_quantity")), 6).alias("sqrt_q"),
        F.round(F.pow(F.col("l_quantity"), 2), 2).alias("q_squared"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_disc"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_delta"),
    )


def q_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 6).alias("name6"),
        F.length("p_name").alias("name_len"),
        F.upper("p_name").alias("name_upper"),
        F.col("p_name").like("%gear%").alias("is_gear"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("name_replaced"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


def q_fn_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000.0, "high")
        .when(F.col("o_totalprice") >= 100000.0, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("pending")).alias(
            "status_or_pending"
        ),
        F.least(F.col("o_totalprice"), F.lit(250000.0)).alias("capped_price"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored_price"),
    )


def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    arr = F.split(F.trim(F.col("text")), r"\s+")
    # array results are emitted as joined strings: hash-stable across
    # result-fetch layers (pandas turns DuckDB lists into numpy
    # arrays whose str() differs from Python lists')
    return d.select(
        "doc_id",
        F.size(arr).alias("n_tokens"),
        F.array_join(F.slice(arr, 1, 3), " ").alias("first3"),
        F.array_contains(arr, "scan").alias("has_scan"),
        F.coalesce(F.array_position(arr, "scan"), F.lit(0)).alias("scan_pos"),
        F.array_join(F.sort_array(F.array_distinct(arr)), " ").alias("vocab"),
    )


def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        m["k"].alias("k_val"),
    )


def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("k_missing"),
    )


def q_fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.col("l_quantity").cast("decimal(9,2)").cast("double").alias("qty_dec"),
        (F.col("l_quantity") > 25).cast("int").alias("bulk_flag"),
        # dates emitted as ISO strings: stable across result-fetch
        # layers (pandas widens DATE to datetime64)
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ship_day"),
    )


QUERIES = {
    "q_fn_date": q_fn_date,
    "q_fn_math": q_fn_math,
    "q_fn_string2": q_fn_string2,
    "q_fn_case": q_fn_case,
    "q_fn_array": q_fn_array,
    "q_fn_map": q_fn_map,
    "q_fn_json": q_fn_json,
    "q_fn_cast": q_fn_cast,
}

ORACLE = {
    "q_fn_date": (
        "SELECT event_id, "
        "year(ts)::INT AS y, month(ts)::INT AS m, day(ts)::INT AS d, "
        "hour(ts)::INT AS h, minute(ts)::INT AS mi, "
        "CAST(date_part('second', ts) AS INT) AS s, "
        "(dayofweek(ts) + 1)::INT AS dow, "
        "strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, "
        "CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, "
        "strftime(CAST(ts AS DATE) + 7, '%Y-%m-%d') AS plus_week, "
        "strftime(CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS DATE), '%Y-%m-%d') AS plus_month, "
        "strftime(ts, '%Y-%m-%d %H:%M') AS minute_str "
        "FROM events"
    ),
    "q_fn_math": (
        "SELECT l_orderkey, l_linenumber, "
        "abs(l_discount - 0.05) AS abs_disc_delta, "
        "CAST(ceil(l_quantity * 1.5) AS BIGINT) AS ceil_q, "
        "CAST(floor(l_quantity / 2) AS BIGINT) AS floor_half_q, "
        "round(ln(l_extendedprice), 6) AS ln_price, "
        "round(log10(l_extendedprice), 6) AS log10_price, "
        "round(sqrt(l_quantity), 6) AS sqrt_q, "
        "round(pow(l_quantity, 2), 2) AS q_squared, "
        "l_orderkey % 7 AS mod7, "
        "round(exp(l_discount), 6) AS exp_disc, "
        "CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_delta "
        "FROM lineitem"
    ),
    "q_fn_string2": (
        "SELECT p_partkey, "
        "concat_ws('-', p_brand, p_type) AS brand_type, "
        "substring(p_name, 1, 6) AS name6, "
        "length(p_name)::INT AS name_len, "
        "upper(p_name) AS name_upper, "
        "(p_name LIKE '%gear%') AS is_gear, "
        "regexp_extract(p_name, '^(\\w+)', 1) AS first_word, "
        "len(string_split(p_name, ' '))::INT AS n_words, "
        "lpad(p_brand, 12, '*') AS brand_padded, "
        "replace(p_name, 'a', '@') AS name_replaced, "
        "reverse(p_brand) AS brand_rev "
        "FROM part"
    ),
    "q_fn_case": (
        "SELECT o_orderkey, "
        "CASE WHEN o_totalprice >= 300000.0 THEN 'high' "
        "     WHEN o_totalprice >= 100000.0 THEN 'mid' ELSE 'low' END AS price_band, "
        "coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_or_pending, "
        "least(o_totalprice, 250000.0) AS capped_price, "
        "greatest(o_totalprice, 50000.0) AS floored_price "
        "FROM orders"
    ),
    "q_fn_array": (
        "SELECT doc_id, "
        "len(string_split_regex(trim(text), '\\s+'))::INT AS n_tokens, "
        "array_to_string(string_split_regex(trim(text), '\\s+')[1:3], ' ') AS first3, "
        "list_contains(string_split_regex(trim(text), '\\s+'), 'scan') AS has_scan, "
        "coalesce(list_position(string_split_regex(trim(text), '\\s+'), 'scan'), 0)::BIGINT AS scan_pos, "
        "array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\\s+'))), ' ') AS vocab "
        "FROM documents"
    ),
    "q_fn_map": (
        "SELECT event_id, array_to_string(json_keys(props), ',') AS prop_keys, "
        "CAST(json_extract_string(props, '$.k') AS INT) AS k_val "
        "FROM events"
    ),
    "q_fn_json": (
        "SELECT event_id, "
        "json_extract_string(props, '$.k') AS k_str, "
        "CAST(json_extract_string(props, '$.k') AS INT) AS k_int, "
        "json_extract_string(props, '$.missing') AS k_missing "
        "FROM events"
    ),
    "q_fn_cast": (
        "SELECT l_orderkey, l_linenumber, "
        "CAST(l_orderkey AS VARCHAR) AS key_str, "
        "CAST(l_linenumber AS DOUBLE) AS line_dbl, "
        "CAST(CAST(l_quantity AS DECIMAL(9,2)) AS DOUBLE) AS qty_dec, "
        "CAST(l_quantity > 25 AS INT) AS bulk_flag, "
        "strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day "
        "FROM lineitem"
    ),
}


def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path over the semi-structured ``props``
    column: ``parse_json`` once into a Variant (binary-encoded,
    shredded access — NOT per-access string re-parsing like
    get_json_object), typed ``variant_get`` extraction, then
    ordinary aggregation. The schema-on-read story for 100 TB event
    payloads with drifting keys: parse cost paid once per row,
    every downstream field access is a cheap binary probe. Oracle:
    DuckDB's JSON extraction computes the same typed values."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
        # absent path -> SQL NULL from variant_get (distinct from a
        # JSON null VALUE, which is_variant_null flags) — presence is
        # an IS NOT NULL check on the extracted variant
        F.expr("variant_get(v, '$.missing') IS NOT NULL").alias(
            "missing_present"
        ),
    )
    return v.groupBy("event_type").agg(
        F.count("k").alias("n_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count_if(F.col("missing_present")).alias("n_missing_present"),
    )


QUERIES["q_fn_variant"] = q_fn_variant
ORACLE["q_fn_variant"] = (
    "WITH v AS (SELECT event_type, "
    "CAST(json_extract_string(props, '$.k') AS INT) AS k, "
    "json_extract(props, '$.missing') IS NOT NULL AS missing_present "
    "FROM events) "
    "SELECT event_type, count(k)::BIGINT AS n_k, sum(k)::BIGINT AS sum_k, "
    "min(k) AS min_k, max(k) AS max_k, "
    "count(*) FILTER (WHERE missing_present)::BIGINT AS n_missing_present "
    "FROM v GROUP BY event_type"
)


def q_fn_sqludf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDF (Spark 4 ``CREATE FUNCTION ... RETURN
    expr``): the shared-business-logic abstraction that stays INSIDE
    Catalyst — the function body is inlined into the plan at
    resolution, so unlike Python UDFs there is no serialization
    boundary, no executor callback, full codegen/pushdown. Oracle:
    DuckDB's CREATE MACRO is the same inline-expansion feature."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_rev(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    return spark.sql(
        "SELECT l_returnflag, "
        "round(sum(net_rev(l_extendedprice, l_discount)), 2) AS net_revenue, "
        "count(*) AS n FROM lineitem GROUP BY l_returnflag"
    )


QUERIES["q_fn_sqludf"] = q_fn_sqludf
ORACLE["q_fn_sqludf"] = (
    "CREATE OR REPLACE MACRO net_rev(p, d) AS p * (1.0 - d); "
    "SELECT l_returnflag, "
    "round(sum(net_rev(l_extendedprice, l_discount)), 2) AS net_revenue, "
    "count(*)::BIGINT AS n FROM lineitem GROUP BY l_returnflag"
)


def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with ``parse_url`` (protocol / host / path /
    one query parameter) — the log-analytics staple. The URL is
    synthesized deterministically from doc_id (the fixture has no URL
    column) and the oracle states the expected components directly,
    so this certifies Spark's parser against ground truth rather than
    against another parser. Pure per-row projection, zero shuffle."""
    d = table(spark, sf_dir, "documents")
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://site"), (i % 13).cast("string"),
        F.lit(".example.org/p/"), i.cast("string"),
        F.lit("?q=spark&page="), (i % 5).cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).alias("page"),
    )


QUERIES["q_fn_url"] = q_fn_url
ORACLE["q_fn_url"] = (
    "SELECT doc_id, 'https' AS proto, "
    "'site' || (doc_id % 13) || '.example.org' AS host, "
    "'/p/' || doc_id AS path, "
    "CAST(doc_id % 5 AS VARCHAR) AS page "
    "FROM documents"
)


def q_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion (Spark 4 built-in ``from_xml``): a synthesized
    per-event XML record is parsed back through the real parser with
    an explicit schema, and the extracted fields are certified
    against ground truth (the oracle states the expected values
    directly, as in q_fn_url — this checks Spark's XML parser, not
    parser-vs-parser). Per-row projection, zero shuffle; explicit
    schema, never XML inference (a full pre-scan at 100 TB)."""
    e = table(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<rec><id>"), F.col("event_id").cast("string"),
        F.lit("</id><who>u"), (F.col("user_id") % 97).cast("string"),
        F.lit("</who><kind>"), F.col("event_type"),
        F.lit("</kind></rec>"),
    )
    p = F.from_xml(xml, "id BIGINT, who STRING, kind STRING")
    return e.select(
        "event_id",
        p.getField("id").alias("xml_id"),
        p.getField("who").alias("xml_who"),
        p.getField("kind").alias("xml_kind"),
    )


QUERIES["q_fn_xml"] = q_fn_xml
ORACLE["q_fn_xml"] = (
    "SELECT event_id, event_id AS xml_id, "
    "'u' || (user_id % 97) AS xml_who, event_type AS xml_kind "
    "FROM events"
)
