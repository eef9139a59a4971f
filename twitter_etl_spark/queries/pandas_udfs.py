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


_ASOF_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
        T.StructField("prior_click_us", T.LongType()),
    ]
)


def _epoch_us(ts: pd.Series) -> pd.Series:
    """Exact integer epoch-microseconds (nullable): timestamps are
    sub-second, so float seconds would truncate differently across
    engines — integer µs is exact on both (DuckDB ``epoch_us``)."""
    iv = ts.astype("datetime64[us]").astype("int64")
    return pd.Series(iv, dtype="Int64").mask(ts.isna().to_numpy())


def _asof_cogroup(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    """Per-user pandas merge_asof: each purchase matched to the
    latest click at-or-before it (NULL when none)."""
    if purchases.empty:
        return pd.DataFrame(
            {"user_id": [], "event_id": [], "purchase_us": [], "prior_click_us": []}
        )
    p = purchases.sort_values("ts")
    c = clicks.sort_values("click_ts")
    if c.empty:
        m = p.assign(click_ts=pd.NaT)
    else:
        m = pd.merge_asof(
            p, c[["click_ts"]], left_on="ts", right_on="click_ts",
            direction="backward",
        )
    return pd.DataFrame(
        {
            "user_id": m["user_id"],
            "event_id": m["event_id"],
            "purchase_us": _epoch_us(m["ts"]),
            "prior_click_us": _epoch_us(m["click_ts"]),
        }
    )


def q_pandas_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF (``cogroup(...).applyInPandas``):
    per user, align purchases to their latest prior click with
    pandas ``merge_asof`` — the two-table per-key shape the grouped
    map can't express. Both sides shuffle once on user_id; each
    cogroup is one small Arrow batch pair. The oracle is the
    declarative equivalent (LEFT JOIN + max), which must agree
    exactly."""
    from ..session import ship_package_to_executors

    ship_package_to_executors(spark)
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(_asof_cogroup, schema=_ASOF_SCHEMA)
    )


def _gmean_fn(v: pd.Series) -> float:
    """Grouped-agg pandas UDF body: geometric mean (no builtin)."""
    import numpy as np

    return float(np.exp(np.log(v.astype("float64")).mean()))


def q_pandas_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (vectorized UDAF): per-lang geometric
    mean of document lengths. Arrow-batched, one hash-agg shuffle —
    the UDAF completes the §2.7 surface (scalar ✓ grouped-map ✓
    cogrouped-map ✓ UDAF ✓). Oracle: exp(avg(ln(x))). The udf is
    built here, not at module import (type parsing needs a live
    session)."""
    from ..session import ship_package_to_executors

    ship_package_to_executors(spark)
    gmean = F.pandas_udf(_gmean_fn, T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return d.groupBy("lang").agg(
        F.round(gmean("n_chars"), 4).alias("gmean_chars")
    )


QUERIES = {
    "q_pandas_zscore": q_pandas_zscore,
    "q_text_tfidf_mllib": q_text_tfidf_mllib,  # rows-only
    "q_pandas_asof_cogroup": q_pandas_asof_cogroup,
    "q_pandas_gmean": q_pandas_gmean,
}

ORACLE = {
    "q_pandas_zscore": (
        "SELECT event_id, user_id, "
        "round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) AS zscore "
        "FROM events WINDOW w AS (PARTITION BY user_id)"
    ),
    "q_pandas_asof_cogroup": (
        "SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us, "
        "max(epoch_us(c.ts)) AS prior_click_us "
        "FROM events p LEFT JOIN events c "
        "  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts "
        "WHERE p.event_type = 'purchase' "
        "GROUP BY p.user_id, p.event_id, p.ts"
    ),
    "q_pandas_gmean": (
        "SELECT lang, round(exp(avg(ln(n_chars))), 4) AS gmean_chars "
        "FROM documents WHERE n_chars > 0 GROUP BY lang"
    ),
}
