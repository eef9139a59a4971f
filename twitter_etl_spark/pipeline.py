"""Flagship dataflow: the reference's ``transform_tweets`` re-expressed.

Reference (``main.R:74-109``): NDJSON file -> parse -> filter
(``!is_retweet, lang == "es"``, main.R:82) -> transmute
(project + rename, main.R:83-92) -> mutate_at clean chain
(main.R:96-103) -> keep-first dedup on content (main.R:105).

Spark expression of the same semantics over the ``documents``
fixture (column mapping per FIXTURES.md: ``text -> content``,
``doc_id`` = load-order surrogate standing in for the SQLite rowid,
``source -> source``; ``is_retweet`` has no fixture column, so the
parity filter is the ``lang == 'es'`` predicate):

- The whole pre-dedup pipeline is a single codegen'd
  scan->filter->project stage; Catalyst pushes ``lang = 'es'`` into
  the parquet scan and prunes unread columns.
- Keep-first dedup is deterministic (SURVEY.md §4.3.1): an explicit
  ``row_number() OVER (PARTITION BY content ORDER BY tweet_id) = 1``
  rather than ``dropDuplicates`` (arbitrary survivor). At 100 TB the
  partition key is ``content`` (skew hazard: viral texts); AQE skew
  handling plus the fact that the window only needs a per-key top-1
  (no full sort of the table) keep this a single bounded shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cleaning import clean_chain


def transform_documents(df: DataFrame) -> DataFrame:
    """transform_tweets-parity dataflow over a documents-shaped input."""
    cleaned = (
        df.filter(F.col("lang") == "es")
        .select(
            F.col("doc_id").alias("tweet_id"),
            F.col("lang"),
            F.col("text").alias("content"),
            F.col("source"),
        )
        .withColumn("content", clean_chain(F.col("content")))
    )
    w = Window.partitionBy("content").orderBy(F.col("tweet_id"))
    return (
        cleaned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
