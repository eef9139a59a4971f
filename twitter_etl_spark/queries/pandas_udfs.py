"""Vectorized pandas-UDF surface (SURVEY.md §2.7).

Engine policy: built-in expressions first; when imperative per-group
logic is genuinely needed, Arrow-batched grouped-map
(``applyInPandas``) — never row-at-a-time Python UDFs. The z-score
query exists precisely to prove the pandas path against a pure-SQL
window oracle: same numbers, different execution strategy.

Scale: ``applyInPandas`` shuffles on the group key and materializes
one group per pandas frame — fine for bounded per-user groups;
pathological group sizes would need salting/chunked variants (and
usually mean the logic should be a window expression anyway).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import table

_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user sample z-score; NULL when the group has < 2 rows
    (matches SQL stddev_samp semantics)."""
    v = pdf["value"]
    if len(pdf) < 2:
        z = pd.Series([None] * len(pdf), dtype="float64")
    else:
        z = ((v - v.mean()) / v.std(ddof=1)).round(4)
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z}
    )


def q_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-user z-score of
    event values. Oracle is the equivalent SQL window expression —
    the pandas path must agree with the declarative one."""
    from ..session import ship_package_to_executors

    ship_package_to_executors(spark)
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return e.groupBy("user_id").applyInPandas(_zscore_group, schema=_ZSCORE_SCHEMA)


def q_text_tfidf_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib HashingTF + IDF feature-vector variant of TF-IDF
    (rows-only: hashed feature indices are engine-specific; the
    SQL-expressible q_text_tfidf pins exact values)."""
    from pyspark.ml.feature import IDF, HashingTF

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="tf", numFeatures=1 << 12).transform(d)
    model = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    out = model.transform(tf)
    return out.select("doc_id", F.col("tfidf").cast("string").alias("tfidf_vec"))


QUERIES = {
    "q_pandas_zscore": q_pandas_zscore,
    "q_text_tfidf_mllib": q_text_tfidf_mllib,  # rows-only
}

ORACLE = {
    "q_pandas_zscore": (
        "SELECT event_id, user_id, "
        "round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) AS zscore "
        "FROM events WINDOW w AS (PARTITION BY user_id)"
    ),
}
