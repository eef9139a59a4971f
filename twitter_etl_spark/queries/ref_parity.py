"""Reference-parity queries (SURVEY.md §2.1-2.3).

These are the operators the reference actually implements
(``/root/reference/main.R``), re-expressed over the ``documents``
fixture. The fixture text contains no URLs/mentions, so the
strip-regex queries synthesize noisy text in-query (identically on
both sides) to exercise the patterns for real.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import cleaning
from ..pipeline import transform_documents
from ..sinks import append_table
from ..sources import DOCUMENTS_SCHEMA, read_ndjson, write_ndjson
from ..tables import table

# Noisy text synthesized identically on both sides so the URL /
# mention regexes have something to delete (fixture text is clean).
_NOISE_PREFIX = "Visit https://spark.apache.org/docs MORE "
_NOISE_SUFFIX = " cc @User_1 and @dev2 END"


def _noisy(c):
    return F.concat(F.lit(_NOISE_PREFIX), c, F.lit(_NOISE_SUFFIX))


_SQL_NOISY = "'Visit https://spark.apache.org/docs MORE ' || text || ' cc @User_1 and @dev2 END'"


def _scratch(spark: SparkSession, name: str) -> str:
    """Per-run scratch path for queries with write side effects,
    keyed by the Spark application id so two concurrent harness /
    driver runs can never race on a shared fixed directory."""
    return f"/tmp/twitter_etl_spark/{spark.sparkContext.applicationId}/{name}"


# --- §2.1 sources & sinks ---------------------------------------------------

def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar table scan with projection + pushed-down filter
    ([EXT]; the plan must show ReadSchema pruned to 3 columns and
    PushedFilters on p_size)."""
    return (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 25)
        .select("p_partkey", "p_name", "p_retailprice")
    )


def q_source_ndjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDJSON landing-zone round trip (``main.R:55-66`` write side,
    ``main.R:81`` read side): land ``documents`` as NDJSON, re-read
    with the explicit schema (no inference), return the parsed rows."""
    path = _scratch(spark, "q_source_ndjson")
    write_ndjson(table(spark, sf_dir, "documents"), path, mode="overwrite")
    return read_ndjson(spark, path, DOCUMENTS_SCHEMA)


def q_sink_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only sink semantics (``main.R:113-121``): two appends
    of the same batch -> both copies kept (at-least-once, no upsert);
    an empty batch is guarded out (``main.R:75-78, 114``)."""
    path = _scratch(spark, "q_sink_append")
    shutil.rmtree(path, ignore_errors=True)
    batch = table(spark, sf_dir, "documents").filter(F.col("lang") == "es")
    assert append_table(batch, path) is True
    assert append_table(batch, path) is True
    assert append_table(batch.filter(F.lit(False)), path) is False  # empty guard
    return spark.read.parquet(path)


# --- §2.2 filter / project / multi-column mutate / keyed dedup --------------

def q_filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive filter with a negated predicate
    (``main.R:82``: ``filter(!is_retweet, lang == "es")``)."""
    df = table(spark, sf_dir, "documents")
    return df.filter((~(F.col("source") == "src0")) & (F.col("lang") == "es"))


def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transmute: keep exactly these columns, renamed
    (``main.R:83-92``)."""
    return table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("tweet_id"),
        F.col("text").alias("content"),
        F.col("source").alias("via"),
        F.col("lang"),
    )


def q_mutate_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mutate_at: apply one transform to a set of columns
    (``main.R:93-104`` applies the cleaner to content AND
    quoted_content); here lower+squish over text and source."""
    df = table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    for c in ("text", "source"):
        df = df.withColumn(c, cleaning.squish(cleaning.lower(F.col(c))))
    return df


def q_dedup_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup, keep-first (``main.R:105``): first occurrence per
    ``source`` in load order (doc_id = load-order surrogate).
    Deterministic survivor via row_number, not dropDuplicates
    (SURVEY.md §4.3.1)."""
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        table(spark, sf_dir, "documents")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "doc_id", "lang", "n_chars")
    )


# --- §2.3 the cleaning chain ------------------------------------------------

def q_str_lower(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", cleaning.lower(F.col("text")).alias("cleaned")
    )


def q_str_strip_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", cleaning.strip_urls(_noisy(F.col("text"))).alias("cleaned")
    )


def q_str_strip_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", cleaning.strip_mentions(_noisy(F.col("text"))).alias("cleaned")
    )


def q_str_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id", cleaning.strip_stopwords(cleaning.lower(F.col("text"))).alias("cleaned")
    )


def q_str_squish(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        cleaning.squish(F.concat(F.lit("  x "), F.col("text"), F.lit("  y  "))).alias("cleaned"),
    )


def q_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship composed chain (``main.R:96-103``):
    lower -> strip URLs -> strip mentions -> stopwords -> squish,
    one codegen'd column expression."""
    return table(spark, sf_dir, "documents").select(
        "doc_id", cleaning.clean_chain(_noisy(F.col("text"))).alias("cleaned")
    )


def q_flagship_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full transform_tweets-parity dataflow (``main.R:74-109``):
    filter -> project/rename -> clean chain -> keep-first dedup."""
    return transform_documents(table(spark, sf_dir, "documents"))


QUERIES = {
    "q_scan_parquet": q_scan_parquet,
    "q_source_ndjson": q_source_ndjson,
    "q_sink_append": q_sink_append,
    "q_filter_conj": q_filter_conj,
    "q_project_rename": q_project_rename,
    "q_mutate_multi": q_mutate_multi,
    "q_dedup_keyed": q_dedup_keyed,
    "q_str_lower": q_str_lower,
    "q_str_strip_urls": q_str_strip_urls,
    "q_str_strip_mentions": q_str_strip_mentions,
    "q_str_stopwords": q_str_stopwords,
    "q_str_squish": q_str_squish,
    "q_clean_pipeline": q_clean_pipeline,
    "q_flagship_transform": q_flagship_transform,
}

_clean = cleaning

ORACLE = {
    "q_scan_parquet": (
        "SELECT p_partkey, p_name, p_retailprice FROM part WHERE p_size >= 25"
    ),
    "q_source_ndjson": (
        "SELECT doc_id, text, lang, source, n_chars FROM documents"
    ),
    "q_sink_append": (
        "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE lang = 'es' "
        "UNION ALL "
        "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE lang = 'es'"
    ),
    "q_filter_conj": (
        "SELECT doc_id, text, lang, source, n_chars FROM documents "
        "WHERE NOT (source = 'src0') AND lang = 'es'"
    ),
    "q_project_rename": (
        "SELECT doc_id AS tweet_id, text AS content, source AS via, lang FROM documents"
    ),
    "q_mutate_multi": (
        f"SELECT doc_id, {_clean.sql_squish(_clean.sql_lower('text'))} AS text, "
        f"{_clean.sql_squish(_clean.sql_lower('source'))} AS source FROM documents"
    ),
    "q_dedup_keyed": (
        "SELECT source, doc_id, lang, n_chars FROM ("
        "  SELECT source, doc_id, lang, n_chars, "
        "         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn "
        "  FROM documents) WHERE rn = 1"
    ),
    "q_str_lower": f"SELECT doc_id, {_clean.sql_lower('text')} AS cleaned FROM documents",
    "q_str_strip_urls": (
        f"SELECT doc_id, {_clean.sql_strip_urls(_SQL_NOISY)} AS cleaned FROM documents"
    ),
    "q_str_strip_mentions": (
        f"SELECT doc_id, {_clean.sql_strip_mentions(_SQL_NOISY)} AS cleaned FROM documents"
    ),
    "q_str_stopwords": (
        f"SELECT doc_id, {_clean.sql_strip_stopwords(_clean.sql_lower('text'))} AS cleaned "
        "FROM documents"
    ),
    "q_str_squish": (
        "SELECT doc_id, "
        + _clean.sql_squish("'  x ' || text || '  y  '")
        + " AS cleaned FROM documents"
    ),
    "q_clean_pipeline": (
        f"SELECT doc_id, {_clean.sql_clean_chain(_SQL_NOISY)} AS cleaned FROM documents"
    ),
    "q_flagship_transform": (
        "WITH cleaned AS ("
        "  SELECT doc_id AS tweet_id, lang, "
        f"         {_clean.sql_clean_chain('text')} AS content, source "
        "  FROM documents WHERE lang = 'es') "
        "SELECT tweet_id, lang, content, source FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY content ORDER BY tweet_id) AS rn "
        "  FROM cleaned) WHERE rn = 1"
    ),
}

# q_dedup_keyed oracle must project rn out; column order doesn't
# matter (driver sorts columns by name) but the set must match.
