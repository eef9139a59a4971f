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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-safe equi join for a hot fact key when the dim side is
    too big to broadcast: the fact side gets a uniform salt, the dim
    side is replicated ``n_salt`` times (one row per salt), and the
    join key becomes (key, salt) — a hot key's rows spread over
    ``n_salt`` reducers instead of one. Result equals the plain
    join; cost is ``n_salt``× the dim shuffle, which is the explicit
    trade. AQE's skew-join split is the automatic alternative; this
    is the deterministic, plan-stable form for when you must pin it.
    The ``shuffle_hash`` hint keeps the demonstration on the shuffle
    path even where the dim would auto-broadcast."""
    salt = F.pmod(
        F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salt)
    ).cast("int")
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).hint("shuffle_hash")
    cond = (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"])
    return f.join(d, cond).drop("__salt")


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
