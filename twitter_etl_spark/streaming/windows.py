"""Event-time streaming operators (SURVEY.md §2.5 [EXT]).

Each takes a *streaming* events-shaped DataFrame (``ts`` timestamp,
``user_id``, ``event_type``, ``value``) and returns a streaming
aggregation. Watermarks bound state: late rows beyond the horizon
are dropped, so state size is O(active windows), which is what
makes these runnable indefinitely on a cluster. Batch twins with
DuckDB oracles live in ``queries/streaming_batch.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    stream: DataFrame, width: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time windows per event type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    stream: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding event-time windows (overlap factor width/slide)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def windowed_distinct_users(
    stream: DataFrame,
    width: str = "10 minutes",
    watermark: str = "1 hour",
    rsd: float = 0.01,
) -> DataFrame:
    """Streaming DAU-shape: distinct active users per tumbling
    event-time window. Exact COUNT DISTINCT needs unbounded per-key
    state in a streaming aggregation, so the state IS an HLL sketch
    (``approx_count_distinct``, mergeable across micro-batches —
    exactly the per-day-HLL swap the batch twin
    ``q_behavior_dau_wau_mau`` documents for 100 TB). ``rsd`` is the
    sketch's relative-error knob: 1% keeps the fixture-scale counts
    exact while bounding state at O(windows × 2^p) regardless of
    user cardinality."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("n_active"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_active",
            "n_events",
        )
    )


def sessionized_stream(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows: gap-based, per user. State closes once the
    watermark passes session end + gap."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stream_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to a prior
    click by the same user within ``horizon`` (ad-attribution
    shape). Both sides carry watermarks and the join condition is
    time-BOUNDED in both directions — the two requirements that let
    the engine expire buffered rows, keeping state O(events inside
    the horizon) instead of unbounded. An unbounded-condition
    stream-stream join buffers forever and dies at scale; this
    signature makes the bound impossible to omit."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
        "inner",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def streaming_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup on event_id within the watermark
    horizon — the global-scope upgrade of the reference's per-chunk
    dedup (``main.R:105``); state is bounded by the watermark."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def windowed_countmin(
    stream: DataFrame,
    width: str = "10 minutes",
    watermark: str = "1 hour",
    depth: int = 3,
    sketch_width: int = 16,
) -> DataFrame:
    """Streaming count-min cells per tumbling window: the frequency
    sketch of ``user_id`` activity whose state is O(windows × depth
    × sketch_width) REGARDLESS of user cardinality — the streaming
    twin of ``q_agg_countmin`` (same md5 row hashes, so a batch
    probe of these cells equals the batch sketch on the same data).
    Exact per-user windowed counts would key streaming state on the
    user — unbounded; the sketch bounds it the same way
    ``windowed_distinct_users``'s HLL bounds distinct-count state.
    Cells sum across micro-batches (count-min's merge IS +), so
    each emitted row is the final cell for its window once the
    watermark closes it; a serving layer estimates any user's rate
    as min over depth rows of its hashed cells."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i")
    rows = stream.withWatermark("ts", watermark).select(
        "ts", d, F.col("user_id").cast("string").alias("k")
    )
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("i").cast("string"), "k")), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(sketch_width),
    )
    return (
        rows.select("ts", "i", bucket.alias("bucket"))
        .groupBy(F.window("ts", width).alias("w"), "i", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
        .select(
            F.col("w.start").alias("window_start"),
            "i",
            "bucket",
            "cell",
        )
    )


def windowed_hll_registers(
    stream: DataFrame, width: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming HLL register rows per tumbling window: (window,
    j, m_j) from the SAME fixed md5 hash as the batch sketch
    (queries/sketches.py::q_agg_hll_md5), so the emitted state is
    directly absorbable by the certifiable register rollup
    (rollup.py::update_register_rollup) — stream once, max-merge
    into history, read the hash-certified estimator. State is
    O(windows × 256) regardless of user cardinality; max merges
    across micro-batches exactly like the batch halves test pins."""
    from ..queries.sketches import hll_register_rows

    rows = hll_register_rows(
        stream.withWatermark("ts", watermark), "user_id", "ts"
    )
    return (
        rows.groupBy(F.window("ts", width).alias("w"), "j")
        .agg(F.max("rho").alias("m_j"))
        .select(F.col("w.start").alias("window_start"), "j", "m_j")
    )


def windowed_revenue_cents(
    stream: DataFrame, width: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming daily-revenue-cents panes: (day, rev_c) rows in
    EXACTLY the frame shape the retrospective change-point operator
    consumes (queries/timeseries.py::changepoint_from_daily — the
    q_ts_changepoint input). The cents sum is the same
    decimal(18,2)*100 BIGINT fixed-point as the batch side, so the
    streamed pane for a closed window equals the batch daily row
    bit-for-bit (pinned in test_streaming.py): a streaming job can
    maintain the daily table and the offline change-point scan
    reads it losslessly. State is O(open windows) — one decimal
    accumulator per day."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("rev")
        )
        .select(
            F.to_date(F.col("w.start")).alias("day"),
            (F.col("rev") * 100).cast("long").alias("rev_c"),
        )
    )
