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


#: allowed lateness before the watermark drops an event (the
#: ``withWatermark`` delay of the streaming twin), in microseconds.
_LATE_ALLOWED_US = 300_000_000  # 5 minutes


def q_stream_late_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data accounting — the batch twin of Structured
    Streaming's watermark semantics (``withWatermark("ts", "5
    minutes")``): replaying events in ARRIVAL order (event_id — the
    deterministic stand-in for processing order), the watermark
    after each arrival is ``max(event time seen so far) − allowed
    lateness``; an event is LATE (would be dropped by a stateful
    op) iff its own event time is already behind the watermark
    established by PRIOR arrivals. Reports, per event type: events,
    late events, the worst lateness in seconds, and the late
    fraction — the numbers an ops dashboard needs to size the
    watermark delay before data loss.

    Watermarks are tracked PER EVENT TYPE — the per-source-partition
    watermark model (each Kafka partition advances its own clock;
    Spark takes the min across partitions). That keeps the
    running-max window PARTITIONED (never a global sort): one
    shuffle on event_type, then a rows-frame running max over
    (event_id, ts) pairs — 16-byte rows at any corpus size."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts"))
    wm = F.max(us).over(w) - F.lit(_LATE_ALLOWED_US)
    tagged = e.select(
        "event_type",
        us.alias("us"),
        wm.alias("wm"),
    ).select(
        "event_type",
        F.when(F.col("us") < F.col("wm"), 1).otherwise(0).alias("late"),
        F.when(
            F.col("us") < F.col("wm"), F.col("wm") - F.col("us")
        ).alias("late_us"),
    )
    return tagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("late").cast("long").alias("n_late"),
        F.coalesce((F.max("late_us") / 1_000_000).cast("long"), F.lit(0)).alias(
            "max_late_s"
        ),
        F.round(F.sum("late") / F.count(F.lit(1)), 6).alias("late_frac"),
    )


QUERIES = {
    "q_stream_tumbling_batch": q_stream_tumbling_batch,
    "q_stream_sliding_batch": q_stream_sliding_batch,
    "q_sessionize_batch": q_sessionize_batch,
    "q_stream_late_batch": q_stream_late_batch,
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
    "q_stream_late_batch": (
        "WITH t AS (SELECT event_type, epoch_us(ts)::BIGINT AS us, "
        "  max(epoch_us(ts)::BIGINT) OVER (PARTITION BY event_type "
        "    ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
        f"    - {_LATE_ALLOWED_US} AS wm FROM events), "
        "tagged AS (SELECT event_type, "
        "  CASE WHEN us < wm THEN 1 ELSE 0 END AS late, "
        "  CASE WHEN us < wm THEN wm - us END AS late_us FROM t) "
        "SELECT event_type, count(*)::BIGINT AS n_events, "
        "sum(late)::BIGINT AS n_late, "
        "coalesce((max(late_us) // 1000000), 0)::BIGINT AS max_late_s, "
        "round(sum(late) * 1.0 / count(*), 6) AS late_frac "
        "FROM tagged GROUP BY event_type"
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
