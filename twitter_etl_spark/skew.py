"""Skew mitigation utilities (SURVEY.md §4.3.6).

Two-stage salted aggregation: when a group-by key is pathologically
hot (a viral document, a bot user), a single reducer owns the whole
key. Salting splits each key into ``n_salt`` sub-keys for a partial
aggregate, then re-aggregates the partials — the hot key's work
spreads over ``n_salt`` reducers and the second shuffle carries one
row per (key, salt).

AQE's skew-join splitting covers *joins* automatically; this is the
aggregation-side counterpart for algebraic aggregates (sum/count/
min/max — anything with a merge function).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key: str | Column,
    value: Column,
    out_name: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage sum: partial sums per (key, salt), then final per
    key. Result equals a plain ``groupBy(key).sum(value)``."""
    salt = F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salt))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.sum(value).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(out_name))
