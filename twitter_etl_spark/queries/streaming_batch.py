"""Batch stand-ins for the streaming window operators (SURVEY.md §2.5).

The streaming layer (:mod:`twitter_etl_spark.streaming`) runs the
same windowing logic incrementally; these batch twins give the
DuckDB oracle a way to check the window semantics. Buckets are
emitted as epoch seconds (Spark's ``window()`` aligns to the epoch
origin; the oracle reproduces alignment with integer epoch math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

_DEC = "decimal(18,2)"


def q_stream_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling windows per event type (native window())."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_stream_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event lands in
    exactly two windows)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_s"),
            "n_events",
            "sum_value",
        )
    )


def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) per user:
    lag + cumulative-sum session ids, then per-session rollup. This
    is the batch twin of ``session_window`` in the streaming layer.
    One shuffle on user_id; the cumulative sum rides the same window
    sort."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts")), 1).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = e.withColumn("session_id", F.sum(is_new).over(wc))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("session_value"),
    )


QUERIES = {
    "q_stream_tumbling_batch": q_stream_tumbling_batch,
    "q_stream_sliding_batch": q_stream_sliding_batch,
    "q_sessionize_batch": q_sessionize_batch,
}

ORACLE = {
    "q_stream_tumbling_batch": (
        "SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_s, "
        "event_type, count(*)::BIGINT AS n_events, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
    "q_stream_sliding_batch": (
        "SELECT CAST(floor(epoch(ts) / 300) * 300 - off AS BIGINT) AS bucket_s, "
        "count(*)::BIGINT AS n_events, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
        "FROM events, (VALUES (0), (300)) offsets(off) "
        "GROUP BY 1"
    ),
    "q_sessionize_batch": (
        "WITH gaps AS ("
        "  SELECT user_id, event_id, ts, value, "
        "         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us "
        "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "tagged AS ("
        "  SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000 "
        "                 THEN 1 ELSE 0 END AS is_new FROM gaps), "
        "sessions AS ("
        # DuckDB window sum(INTEGER) yields HUGEINT, which pandas
        # materializes as float64 — cast to BIGINT so the driver's
        # pandas-path hash matches Spark's bigint (VERDICT r03 #1).
        "  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id "
        "  FROM tagged) "
        "SELECT user_id, session_id, count(*)::BIGINT AS n_events, "
        "epoch_us(min(ts))::BIGINT AS start_us, epoch_us(max(ts))::BIGINT AS end_us, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value "
        "FROM sessions GROUP BY user_id, session_id"
    ),
}
