"""Time-series operators over the event log (SURVEY.md §2 [EXT]).

The hypertable/continuous-aggregate query family (TimescaleDB /
InfluxDB-style) re-expressed as Spark DataFrame plans:

- **gap-fill** (``q_ts_gapfill``): dense daily buckets with
  zero-fill for missing (type, day) cells. The calendar grid is
  derived from a 1-row min/max aggregate and exploded — grid size
  is |types| × |days|, independent of event volume, so the dense
  side broadcasts and the event side is touched once.
- **LOCF** (``q_ts_locf``): last-observation-carried-forward over
  the dense per-user daily grid — ``last(value, ignorenulls=True)``
  over a per-user window (DuckDB twin: ``last_value(... IGNORE
  NULLS)``). Window is PARTITIONED by user: one shuffle on the
  entity key, never a global sort.
- **OHLC resample** (``q_ts_resample_ohlc``): open/high/low/close
  downsampling per (type, day). Open/close are ``min_by/max_by``
  keyed on a zero-padded ``(epoch_us, event_id)`` string — a total
  order both engines compare identically (DuckDB's ``arg_min``
  cannot take a composite key), and a hash-agg with map-side
  partials rather than a window sort.

Cross-engine notes: days emitted as ``yyyy-MM-dd`` strings (date
objects survive the drivers differently); values rounded at 2;
LOCF rows before a user's first observation stay NULL on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


def _events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        "ts",
        "event_id",
        F.to_date("ts").alias("day"),
    )


def _calendar(e: DataFrame) -> DataFrame:
    """1-row min/max agg exploded into the dense day axis."""
    bounds = e.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    return bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )


def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily event counts per type, zero-filled: the
    continuous-aggregate shape. The (type × day) grid is built from
    two tiny aggregates and LEFT-joins the real counts — the event
    table is scanned exactly once (for the counts); the grid never
    scales with volume."""
    e = _events_daily(spark, sf_dir)
    counts = e.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_raw")
    )
    grid = _calendar(e).crossJoin(
        e.select("event_type").distinct()
    )
    return grid.join(counts, ["event_type", "day"], "left").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_raw", F.lit(0)).alias("n"),
    )


def q_ts_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: per-user daily last value,
    forward-filled across the dense day grid. Observed days carry
    ``is_observed = 1``; leading days before a user's first
    observation remain NULL (no back-fill)."""
    e = _events_daily(spark, sf_dir)
    # deterministic "last of day": max_by on the (epoch, id) total order
    key = F.format_string("%020d%012d", F.unix_micros("ts"), F.col("event_id"))
    daily = e.groupBy("user_id", "day").agg(
        F.round(F.max_by("value", key), 2).alias("v_obs")
    )
    grid = _calendar(e).crossJoin(e.select("user_id").distinct())
    sparse = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return sparse.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("v_obs", ignorenulls=True).over(w).alias("value_filled"),
        (~F.isnull("v_obs")).cast("bigint").alias("is_observed"),
    )


def q_ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsample of ``value`` per (event_type, day): the
    financial-resample primitive as ONE hash aggregation (min_by /
    max_by / min / max partials combine map-side; a window-sort
    formulation would shuffle the full event stream)."""
    e = _events_daily(spark, sf_dir)
    key = F.format_string("%020d%012d", F.unix_micros("ts"), F.col("event_id"))
    return e.groupBy("event_type", F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.round(F.min_by("value", key), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max_by("value", key), 2).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


QUERIES = {
    "q_ts_gapfill": q_ts_gapfill,
    "q_ts_locf": q_ts_locf,
    "q_ts_resample_ohlc": q_ts_resample_ohlc,
}

_DAILY = (
    "SELECT user_id, event_type, value, ts, event_id, "
    "date_trunc('day', ts)::DATE AS day FROM events"
)

_CAL = (
    "SELECT unnest(generate_series(d0, d1, interval 1 day))::DATE AS day "
    "FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)"
)

_KEY = "printf('%020d%012d', epoch_us(ts)::BIGINT, event_id)"

ORACLE = {
    "q_ts_gapfill": (
        "WITH daily AS (" + _DAILY + "), "
        "counts AS (SELECT event_type, day, count(*) AS n_raw "
        "FROM daily GROUP BY event_type, day), "
        "cal AS (" + _CAL + "), "
        "grid AS (SELECT event_type, day FROM cal "
        "CROSS JOIN (SELECT DISTINCT event_type FROM daily)) "
        "SELECT g.event_type, strftime(g.day, '%Y-%m-%d') AS day, "
        "coalesce(c.n_raw, 0) AS n "
        "FROM grid g LEFT JOIN counts c "
        "ON g.event_type = c.event_type AND g.day = c.day"
    ),
    "q_ts_locf": (
        "WITH daily AS (" + _DAILY + "), "
        "obs AS (SELECT user_id, day, "
        "round(arg_max(value, " + _KEY + "), 2) AS v_obs "
        "FROM daily GROUP BY user_id, day), "
        "cal AS (" + _CAL + "), "
        "grid AS (SELECT user_id, day FROM cal "
        "CROSS JOIN (SELECT DISTINCT user_id FROM daily)), "
        "sparse AS (SELECT g.user_id, g.day, o.v_obs FROM grid g "
        "LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day) "
        "SELECT user_id, strftime(day, '%Y-%m-%d') AS day, "
        "last_value(v_obs IGNORE NULLS) OVER (PARTITION BY user_id "
        "ORDER BY day ROWS UNBOUNDED PRECEDING) AS value_filled, "
        "(v_obs IS NOT NULL)::BIGINT AS is_observed FROM sparse"
    ),
    "q_ts_resample_ohlc": (
        "WITH daily AS (" + _DAILY + ") "
        "SELECT event_type, strftime(day, '%Y-%m-%d') AS day, "
        "round(arg_min(value, " + _KEY + "), 2) AS open, "
        "round(max(value), 2) AS high, "
        "round(min(value), 2) AS low, "
        "round(arg_max(value, " + _KEY + "), 2) AS close, "
        "count(*) AS n "
        "FROM daily GROUP BY event_type, day"
    ),
}


def q_ts_interarrival(
    spark: SparkSession, sf_dir: str, *, exact: bool = True
) -> DataFrame:
    """Inter-arrival time distribution per event type: per-user gaps
    (lag over the user timeline — one shuffle on user_id) rolled up
    into mean / median / p95 seconds. The percentile here is exact
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, shared linear
    interpolation). ``exact=False`` is the RUNNABLE 100 TB path:
    ``percentile_approx`` (t-digest, mergeable map-side partials —
    the per-group reducer no longer buffers every gap) on the same
    plan shape — pinned fingerprint-identical by
    ``tests/test_plans.py::test_approx_percentile_swap_keeps_plan_shape``.
    The registered/oracle form stays exact for the driver's DuckDB
    hash gate."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts")), 1).over(w)
    ) / 1e6
    gaps = e.select("event_type", gap_s.alias("gap_s")).filter(
        F.col("gap_s").isNotNull()
    )
    pct = (
        F.percentile
        if exact
        else (lambda c, q: F.percentile_approx(c, q, F.lit(10000)))
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.avg("gap_s"), 4).alias("mean_gap_s"),
        F.round(pct("gap_s", F.lit(0.5)), 4).alias("median_gap_s"),
        F.round(pct("gap_s", F.lit(0.95)), 4).alias("p95_gap_s"),
    )


_EWMA_ALPHA = 0.25
_EWMA_SPAN = 12  # bounded lookback: rows beyond this contribute
# (1-a)^12 ~ 3% weight and are cut so the operator is a fixed-size
# window, not an unbounded running recurrence


def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per user
    (alpha 0.25, lookback capped at 12 rows — the pandas
    ``ewm(adjust=True)`` normalized form over a finite window).

    Formulated as a FIXED set of 12 lag terms over one per-user
    window (single shuffle on user_id) rather than the textbook
    recurrence: a recurrence needs stateful iteration, while the
    windowed form is pure expressions — and the naive alternative
    (sum of value*(1-a)^(-rn) rescaled by (1-a)^rn) overflows double
    past ~2.5k rows per key. Both engines evaluate the identical
    term order, so the float result is bit-identical before
    rounding."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    decay = 1.0 - _EWMA_ALPHA
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(_EWMA_SPAN):
        lagged = F.lag("value", j).over(w) if j else F.col("value")
        weight = float(decay**j)
        num = num + F.coalesce(lagged, F.lit(0.0)) * F.lit(weight)
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(
            F.lit(0.0)
        )
    return e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.col("value"), 2).alias("value"),
        (num / den).alias("_ewma"),
    ).select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.round(F.col("_ewma"), 4).alias("ewma"),
    )


def _ewma_sql() -> str:
    decay = 1.0 - _EWMA_ALPHA
    num_terms = []
    den_terms = []
    for j in range(_EWMA_SPAN):
        lag = f"lag(value, {j}) OVER w" if j else "value"
        weight = repr(float(decay**j))
        num_terms.append(f"coalesce({lag}, 0.0) * {weight}")
        den_terms.append(
            f"(CASE WHEN {lag} IS NOT NULL THEN {weight} ELSE 0.0 END)"
        )
    # parenthesize left-to-right exactly like the Spark fold above so
    # float addition order (and thus the pre-round bits) match
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return (
        "SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts_us, "
        "round(value, 2) AS value, "
        f"round((0.0 + {num}) / (0.0 + {den}), 4) AS ewma "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    )


QUERIES["q_ts_interarrival"] = q_ts_interarrival
QUERIES["q_ts_ewma"] = q_ts_ewma
ORACLE["q_ts_ewma"] = _ewma_sql()

ORACLE["q_ts_interarrival"] = (
    "WITH gaps AS (SELECT event_type, "
    "(epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id)) / 1e6 AS gap_s FROM events) "
    "SELECT event_type, count(*)::BIGINT AS n_gaps, "
    "round(avg(gap_s), 4) AS mean_gap_s, "
    "round(quantile_cont(gap_s, 0.5), 4) AS median_gap_s, "
    "round(quantile_cont(gap_s, 0.95), 4) AS p95_gap_s "
    "FROM gaps WHERE gap_s IS NOT NULL GROUP BY event_type"
)


import math as _math

#: 7-day half-life decay rate, computed ONCE in Python and inlined
#: as the same double literal into both engines (so DuckDB's ln(2)
#: vs Java's Math.log(2) last-ulp difference cannot enter).
_DECAY_LAMBDA = _math.log(2) / 604800.0
#: snapshot time for the decayed features (after the fixture's last
#: event at any SF — ages are always positive).
_DECAY_ASOF = "2024-02-01 00:00:00"


def q_ts_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement sum per user as of a snapshot time —
    the feature-store staple (recent activity counts more; 7-day
    half-life). ``Σ value·exp(−λ·age)`` needs no recurrence: it is a
    plain projection + hash agg, unlike EWMA's ordered window.

    Exact-arithmetic contract: the per-row weighted value is rounded
    at 6 decimals and fixed-pointed to BIGINT before the sum
    (integer reduction — engine sum order cannot show); λ is inlined
    as the identical double literal in both engines, and age is a
    whole-second integer in both (unix_timestamp floor == date_diff
    'second' boundary count for positive ages). ONE shuffle (the
    user hash agg) at any SF."""
    e = table(spark, sf_dir, "events")
    age_s = F.unix_timestamp(
        F.lit(_DECAY_ASOF).cast("timestamp")
    ) - F.unix_timestamp("ts")
    wv = F.floor(
        F.round(F.col("value") * F.exp(F.lit(-_DECAY_LAMBDA) * age_s), 6) * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    return (
        e.select("user_id", wv.alias("wv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("wv") / 1e6, 4).alias("decayed_value_sum"),
        )
    )


QUERIES["q_ts_decay_sum"] = q_ts_decay_sum
ORACLE["q_ts_decay_sum"] = (
    "WITH w AS (SELECT user_id, "
    f"  CAST(floor(round(value * exp(-({_DECAY_LAMBDA!r}) * "
    f"    date_diff('second', ts, TIMESTAMP '{_DECAY_ASOF}')), 6) "
    "    * 1e6 + 0.5) AS BIGINT) AS wv "
    "  FROM events) "
    "SELECT user_id, count(*)::BIGINT AS n_events, "
    "round(sum(wv) / 1e6, 4) AS decayed_value_sum "
    "FROM w GROUP BY user_id"
)


#: LTTB output budget per series.
_LTTB_N_OUT = 50


def _lttb_indices(x, y, n_out):
    """Core LTTB index selection (Steinarsson 2013): NumPy-vectorized
    within each bucket, sequential across buckets (each bucket's pick
    anchors the next triangle). Ties in the area argmax take the
    FIRST index — deterministic."""
    import numpy as np

    n = len(x)
    if n <= n_out:
        return np.arange(n)
    every = (n - 2) / (n_out - 2)
    idx = np.empty(n_out, dtype=np.int64)
    idx[0] = 0
    a = 0
    for i in range(n_out - 2):
        rs = int(np.floor(i * every)) + 1
        re = int(np.floor((i + 1) * every)) + 1
        as_ = re
        ae = min(int(np.floor((i + 2) * every)) + 1, n)
        avg_x = x[as_:ae].mean() if as_ < ae else x[n - 1]
        avg_y = y[as_:ae].mean() if as_ < ae else y[n - 1]
        area = np.abs(
            (x[a] - avg_x) * (y[rs:re] - y[a])
            - (x[a] - x[rs:re]) * (avg_y - y[a])
        )
        a = rs + int(np.argmax(area))
        idx[i + 1] = a
    idx[n_out - 1] = n - 1
    return idx


def q_ts_lttb(
    spark: SparkSession,
    sf_dir: str,
    *,
    two_level: bool = False,
    level1_chunk: int = 512,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    of each event-type series to ``_LTTB_N_OUT`` visually-
    representative points — the dashboarding downsampler.

    LTTB is inherently SEQUENTIAL within a series (each bucket's pick
    depends on the previous pick), so this is the documented use case
    for an Arrow-batched grouped-map (``applyInPandas``): parallel
    ACROSS series, NumPy-vectorized within each bucket, never
    row-at-a-time Python. Rows-only (no SQL oracle is possible for a
    stateful scan); pytest pins the output against an independent
    scalar-Python LTTB and structural invariants.

    Scale: one shuffle on the series key; per-task memory is one
    series. ``two_level=True`` is the RUNNABLE giant-series path:
    level 1 splits each series into ``level1_chunk``-row positional
    chunks and LTTB-reduces every chunk IN PARALLEL (per-task memory
    is one chunk), level 2 runs the same algorithm over the ≤
    n_out·⌈n/chunk⌉ survivors — the standard two-level
    approximation (endpoints and overall shape preserved; picks may
    differ from single-level near chunk seams, which is why the
    registered/tested form stays single-level)."""
    import numpy as np
    import pandas as pd

    n_out = _LTTB_N_OUT

    def pick(pdf: pd.DataFrame, keep_input_shape: bool) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # pin the epoch unit: Arrow may hand datetime64[ns] or [us]
        # depending on the conversion path
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        x = ts_us.to_numpy().astype(np.float64)
        y = pdf["value"].to_numpy()
        idx = _lttb_indices(x, y, n_out)
        out = pdf.iloc[idx]
        if keep_input_shape:  # level 1: survivors stay events-shaped
            return out[["event_id", "event_type", "ts", "value"]]
        return pd.DataFrame(
            {
                "event_type": out["event_type"].to_numpy(),
                "ts_us": ts_us.to_numpy()[idx],
                "value": out["value"].to_numpy(),
                "pick_order": np.arange(len(idx), dtype=np.int64),
            }
        )

    e = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    if two_level:
        from pyspark.sql import Window

        w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        chunked = e.withColumn(
            "chunk",
            ((F.row_number().over(w) - 1) / F.lit(level1_chunk)).cast(
                "long"
            ),
        )
        e = (
            chunked.groupBy("event_type", "chunk")
            .applyInPandas(
                lambda pdf: pick(pdf, True),
                "event_id long, event_type string, ts timestamp, value double",
            )
        )
    return e.groupBy("event_type").applyInPandas(
        lambda pdf: pick(pdf, False),
        "event_type string, ts_us long, value double, pick_order long",
    )


QUERIES["q_ts_lttb"] = q_ts_lttb  # rows-only: sequential per-series scan


#: CUSUM reference level and alarm threshold (Page 1954 one-sided
#: positive-drift form). The fixture's value median is ~35, so a
#: target of 40 makes most increments negative (the statistic
#: resets toward 0) while heavy-tailed spikes (max ~490) drive real
#: excursions past the alarm at every SF.
_CUSUM_TARGET = 40.0
_CUSUM_H = 200.0


def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per user over purchase
    events (Page 1954, Biometrika — public): the classic recursion
    ``S_t = max(0, S_{t-1} + (x_t − target))`` spelled CLOSED-FORM
    as ``S_t = cumsum_t − min(0, running-min(cumsum))`` — the
    max-reset recursion is exactly "distance above the lowest
    cumulative level seen so far", so two stock window frames
    replace what looks like an inherently sequential loop (no UDF,
    no recursion; both engines plan plain running aggregates).

    Exact-arithmetic contract: increments are fixed-pointed to
    BIGINT (round 4, ×1e4) before ANY window sum, so cumsum,
    running-min and their difference are integer math end to end;
    ordering is (ts, event_id)-tie-broken.

    Scale: two window passes over the same (user, time) partition
    order — one Exchange + one sort feeds BOTH frames; per-user
    state is O(1) per row. At 100 TB the partition key is the
    entity id, the same shape as q_win_running."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    inc = F.floor(
        F.round(F.col("value") - F.lit(_CUSUM_TARGET), 4) * 1e4 + F.lit(0.5)
    ).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rows = e.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_timestamp("ts").alias("ts_epoch"),
        inc.alias("inc"),
    ).withColumn("cs", F.sum("inc").over(w))
    rows = rows.withColumn(
        "floor_cs", F.least(F.lit(0).cast("bigint"), F.min("cs").over(w))
    )
    cusum = (F.col("cs") - F.col("floor_cs")) / 1e4
    return rows.select(
        "user_id",
        "event_id",
        "ts_epoch",
        F.round(cusum, 4).alias("cusum"),
        (cusum > _CUSUM_H).cast("int").alias("alarm"),
    )


QUERIES["q_ts_cusum"] = q_ts_cusum
ORACLE["q_ts_cusum"] = (
    "WITH e AS (SELECT user_id, event_id, "
    # floor before the BIGINT cast: DuckDB double->int casts ROUND,
    # Spark unix_timestamp floors sub-second timestamps
    "  floor(epoch(ts))::BIGINT AS ts_epoch, "
    f"  CAST(floor(round(value - {_CUSUM_TARGET!r}, 4) * 1e4 + 0.5) "
    "    AS BIGINT) AS inc, ts "
    "  FROM events WHERE event_type = 'purchase'), "
    "c AS (SELECT user_id, event_id, ts_epoch, ts, "
    "  sum(inc) OVER w AS cs FROM e "
    "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
    "    ROWS UNBOUNDED PRECEDING)), "
    # running-min MUST order by full-precision ts like the cumsum
    # window and the Spark side: ts_epoch is second-truncated, so two
    # same-user purchases inside one second whose event_id order
    # disagrees with sub-second ts order would otherwise diverge
    "f AS (SELECT user_id, event_id, ts_epoch, cs, "
    "  least(0, min(cs) OVER (PARTITION BY user_id ORDER BY ts, "
    "    event_id ROWS UNBOUNDED PRECEDING)) AS floor_cs FROM c) "
    "SELECT user_id, event_id, ts_epoch, "
    "round((cs - floor_cs) / 1e4, 4) AS cusum, "
    f"((cs - floor_cs) / 1e4 > {_CUSUM_H!r})::INT AS alarm FROM f"
)


def q_ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue
    (trend = centered 7-day moving average; seasonal = mean-centered
    day-of-week effect over detrended values; remainder = the rest)
    — ``statsmodels seasonal_decompose`` / STL-lite, the standard
    first look at any business time series, emitted only for days
    with a FULL 7-day window (the classic edge-NaN rule, spelled as
    a filter).

    Cross-engine exactness end to end (the PageRank/CUSUM idiom):
    daily revenue reduces as DECIMAL(18,2) then lives as BIGINT
    CENTS; the 7-day window sum, the detrended value
    ``7·rev − t7``, the day-of-week sums and the final remainder
    are ALL integer arithmetic. The only divisions form fixed-point
    1e-4 quantities via ``floor(int·100/denom + 0.5)`` where the
    numerator stays below 2^53 (one correctly-rounded IEEE division
    each — deterministic, unlike a float SUM). Day-of-week is
    Monday=0 on both engines (Spark ``weekday``, DuckDB
    ``isodow−1``).

    Scale: the event scan collapses map-side to ≤ span-days rows;
    everything after runs on the calendar axis (the
    ``q_ts_gapfill`` contract — the single-partition window is
    bounded by the calendar, never the data; at 100 TB you'd add a
    series key to the partition clause). Two scans of nothing, one
    broadcast of 7 seasonal rows."""
    e = _events_daily(spark, sf_dir)
    daily = e.groupBy("day").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("rev")
    )
    g = (
        _calendar(daily)
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce(
                (F.col("rev") * 100).cast("long"), F.lit(0).cast("long")
            ).alias("rev_c"),
        )
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    w = g.select(
        "day",
        "rev_c",
        F.sum("rev_c").over(w7).alias("t7"),
        F.count(F.lit(1)).over(w7).alias("c7"),
    ).filter(F.col("c7") == 7)
    i = w.select(
        "day",
        "rev_c",
        "t7",
        (F.lit(7) * F.col("rev_c") - F.col("t7")).alias("detr"),
        F.weekday("day").alias("dow"),
    )
    s = i.groupBy("dow").agg(
        F.floor(
            F.sum("detr").cast("double")
            * 100.0
            / (7.0 * F.count(F.lit(1)))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("s_fp")
    )
    m = s.agg(
        F.floor(F.sum("s_fp").cast("double") / 7.0 + F.lit(0.5))
        .cast("long")
        .alias("m_fp")
    )
    out = (
        i.join(F.broadcast(s), "dow")
        .crossJoin(F.broadcast(m))
        .select(
            "day",
            "rev_c",
            F.floor(
                F.col("t7").cast("double") * 100.0 / 7.0 + F.lit(0.5)
            )
            .cast("long")
            .alias("trend_fp"),
            (F.col("s_fp") - F.col("m_fp")).alias("seasonal_fp"),
        )
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        F.round(F.col("trend_fp") / 1e4, 4).alias("trend"),
        F.round(F.col("seasonal_fp") / 1e4, 4).alias("seasonal"),
        F.round(
            (F.col("rev_c") * 100 - F.col("trend_fp") - F.col("seasonal_fp"))
            / 1e4,
            4,
        ).alias("remainder"),
    )


QUERIES["q_ts_seasonal_decompose"] = q_ts_seasonal_decompose
ORACLE["q_ts_seasonal_decompose"] = (
    "WITH d AS (SELECT ts::DATE AS day, "
    "  sum(CAST(value AS DECIMAL(18,2))) AS rev FROM events GROUP BY 1), "
    "b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d), "
    "cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE "
    "  AS day FROM b), "
    "g AS (SELECT cal.day, coalesce((rev * 100)::BIGINT, 0) AS rev_c "
    "  FROM cal LEFT JOIN d USING (day)), "
    "w AS (SELECT day, rev_c, sum(rev_c) OVER win AS t7, "
    "  count(*) OVER win AS c7 FROM g "
    "  WINDOW win AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), "
    "i AS (SELECT day, rev_c, t7, 7 * rev_c - t7 AS detr, "
    "  isodow(day) - 1 AS dow FROM w WHERE c7 = 7), "
    "s AS (SELECT dow, floor(sum(detr)::DOUBLE * 100.0 / (7.0 * count(*)) "
    "  + 0.5)::BIGINT AS s_fp FROM i GROUP BY dow), "
    "m AS (SELECT floor(sum(s_fp)::DOUBLE / 7.0 + 0.5)::BIGINT AS m_fp FROM s) "
    "SELECT strftime(i.day, '%Y-%m-%d') AS day, "
    "round(rev_c / 100.0, 2) AS revenue, "
    "round(floor(t7::DOUBLE * 100.0 / 7.0 + 0.5)::BIGINT / 1e4, 4) AS trend, "
    "round((s_fp - m_fp) / 1e4, 4) AS seasonal, "
    "round((rev_c * 100 - floor(t7::DOUBLE * 100.0 / 7.0 + 0.5)::BIGINT "
    "  - (s_fp - m_fp)) / 1e4, 4) AS remainder "
    "FROM i JOIN s USING (dow) CROSS JOIN m"
)


def q_ts_sliding_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per observed day,
    estimated from per-day KMV panes — the EXECUTED form of the
    sketch swap :func:`~twitter_etl_spark.queries.behavior
    .q_behavior_dau_wau_mau` argues for ("at 100 TB the sketch swap
    is per-day sketches unioned over the window, same plan shape").
    Rolling COUNT DISTINCT is not sum-decomposable; a k-min pane IS
    merge-decomposable, losslessly: the union of complete per-day
    k-min lists contains the k smallest of the window's union, so
    ranking the merged pane rows and cutting at k gives EXACTLY the
    sketch a one-shot :func:`~.sketches.q_agg_kmv_distinct` over the
    window would build (the rollup.py KMV merge contract, here on a
    sliding axis). Output audits the estimator against the exact
    window count.

    Scale: pane build is one exchange on (day) over DISTINCT
    (day, user-digest) rows with a per-day top-k; each pane emits
    <= k 8-byte rows which explode x7 to their anchor windows —
    the window merge shuffles <= 7k rows per anchor REGARDLESS of
    corpus size (vs the exact twin's 7 x |distinct user-days|).
    The exact twin stays in the relation as the audited-error
    column; production drops it and keeps the pane path. Branch
    straddle: sf0.001 windows (<= 15 users) certify the exact
    short-circuit, sf0.01+ the estimator."""
    from .sketches import _KMV_K, kmv_estimate, kmv_hash_rows

    e = table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    )
    hd = kmv_hash_rows(e, "user_id", "day")
    wd = Window.partitionBy("day").orderBy("h")
    pane = (
        hd.select("day", "h", F.row_number().over(wd).alias("rn"))
        .filter(F.col("rn") <= _KMV_K)
        .select("day", "h")
    )
    days = hd.select("day").distinct()
    anchors = F.broadcast(days.select(F.col("day").alias("anchor")))
    merged = (
        pane.select(
            "h",
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", 6))
            ).alias("anchor"),
        )
        .join(anchors, "anchor")
        .select("anchor", "h")
        .distinct()
    )
    est = kmv_estimate(merged, "anchor")
    exact = (
        e.distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", 6))
            ).alias("anchor"),
        )
        .join(anchors, "anchor")
        .select("anchor", "user_id")
        .distinct()
        .groupBy("anchor")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return est.join(exact, "anchor").select(
        F.date_format("anchor", "yyyy-MM-dd").alias("day"),
        "n_exact",
        "kmv_est",
        F.round(
            F.abs(F.col("kmv_est") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )


QUERIES["q_ts_sliding_distinct_kmv"] = q_ts_sliding_distinct_kmv


def _sliding_kmv_sql() -> str:
    from .sketches import _KMV_K, _KMV_M

    return (
        "WITH ud AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) "
        "AS day, user_id FROM events), "
        "hd AS (SELECT DISTINCT day, "
        "(('0x' || substr(md5(user_id::VARCHAR), 1, 15))::UBIGINT)::BIGINT "
        "AS h FROM ud), "
        "pane AS (SELECT day, h FROM (SELECT day, h, row_number() OVER "
        "(PARTITION BY day ORDER BY h) AS rn FROM hd) "
        f"WHERE rn <= {_KMV_K}), "
        "days AS (SELECT DISTINCT day FROM ud), "
        "m AS (SELECT DISTINCT days.day AS anchor, pane.h FROM pane "
        "JOIN days ON days.day BETWEEN pane.day AND pane.day + 6), "
        "r AS (SELECT anchor, h, row_number() OVER "
        "(PARTITION BY anchor ORDER BY h) AS rn FROM m), "
        "a AS (SELECT anchor, count(*)::BIGINT AS n_state, "
        f"max(CASE WHEN rn = {_KMV_K} THEN h END)::BIGINT AS hk "
        f"FROM r WHERE rn <= {_KMV_K} GROUP BY anchor), "
        "est AS (SELECT anchor, "
        f"CASE WHEN n_state < {_KMV_K} THEN n_state::DOUBLE "
        f"ELSE {float(_KMV_K - 1)!r} * ({_KMV_M!r} / hk) END AS e FROM a), "
        "ex AS (SELECT days.day AS anchor, "
        "count(DISTINCT ud.user_id)::BIGINT AS n_exact FROM ud "
        "JOIN days ON days.day BETWEEN ud.day AND ud.day + 6 "
        "GROUP BY days.day) "
        "SELECT strftime(ex.anchor, '%Y-%m-%d') AS day, n_exact, "
        "round(e, 4) AS kmv_est, "
        "round(abs(round(e, 4) - n_exact) / n_exact, 4) AS rel_err "
        "FROM est JOIN ex ON est.anchor = ex.anchor"
    )


ORACLE["q_ts_sliding_distinct_kmv"] = _sliding_kmv_sql()


def q_ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend (double) exponential smoothing of daily
    revenue with a 7-day-ahead forecast — the trend-aware sequel to
    :func:`q_ts_ewma` (level only) and the forecasting counterpart
    of :func:`q_ts_seasonal_decompose` (which explains the past but
    predicts nothing). Textbook recursion (Holt 1957; Hyndman &
    Athanasopoulos, *Forecasting: Principles and Practice* — public)
    with dyadic alpha = beta = 0.5, init l1 = y1, b1 = y2 - y1:
    l_t = 0.5*y_t + 0.5*(l + b); b_t = 0.5*(l_t - l) + 0.5*b; then
    yhat_h = l_n + h*b_n. Emits (h, day, yhat, level, trend) for
    h = 1..7 in dollars (fixed-point 1e-4).

    A true recurrence cannot be spelled as a fixed lag set the EWMA
    way, and Spark has no running-scan HOF — so the series folds
    through ONE ``F.aggregate`` over the day-sorted array while the
    oracle runs the identical recursion as a DuckDB recursive CTE.
    Cross-engine float argument (the EWMA discipline, recursive
    edition): inputs are BIGINT cents, every step multiplies by the
    dyadic literal 0.5 and adds in the SAME written order in both
    engines, and IEEE double ops are deterministic — neither engine
    reassociates an explicit expression tree — so the pre-round bits
    match at every t; ONE rounding at the end.

    Scale: the event scan collapses map-side to <= span-days rows
    (the q_ts_gapfill contract); the fold runs on the calendar axis
    in one task — bounded by the calendar, never the data; at
    100 TB you add a series key and fold per key (applyInPandas or
    per-key aggregate, same recursion)."""
    e = _events_daily(spark, sf_dir)
    daily = e.groupBy("day").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("rev")
    )
    g = (
        _calendar(daily.select("day"))
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce(
                (F.col("rev") * 100).cast("long"), F.lit(0).cast("long")
            ).alias("rev_c"),
        )
    )
    arr = g.agg(
        F.array_sort(F.collect_list(F.struct("day", "rev_c"))).alias("ys"),
        F.max("day").alias("last_day"),
    )
    y1 = F.element_at("ys", 1).getField("rev_c")
    y2 = F.element_at("ys", 2).getField("rev_c")
    init = F.struct(
        y1.cast("double").alias("l"), (y2 - y1).cast("double").alias("b")
    )
    half = F.lit(0.5)

    def step(acc, x):
        l_new = half * x.getField("rev_c") + half * (
            acc.getField("l") + acc.getField("b")
        )
        b_new = half * (l_new - acc.getField("l")) + half * acc.getField("b")
        return F.struct(l_new.alias("l"), b_new.alias("b"))

    st = arr.select(
        "last_day",
        F.aggregate(
            F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
            init,
            step,
        ).alias("st"),
    ).select(
        "last_day", F.col("st.l").alias("l"), F.col("st.b").alias("b")
    )
    return st.select(
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"), "last_day", "l", "b"
    ).select(
        F.col("h").cast("int").alias("h"),
        F.date_format(
            F.date_add(F.col("last_day"), F.col("h")), "yyyy-MM-dd"
        ).alias("day"),
        F.round((F.col("l") + F.col("h") * F.col("b")) / 100.0, 4).alias(
            "yhat"
        ),
        F.round(F.col("l") / 100.0, 4).alias("level"),
        F.round(F.col("b") / 100.0, 4).alias("trend"),
    )


QUERIES["q_ts_holt_linear"] = q_ts_holt_linear
ORACLE["q_ts_holt_linear"] = (
    "WITH RECURSIVE d AS (SELECT ts::DATE AS day, "
    "  sum(CAST(value AS DECIMAL(18,2))) AS rev FROM events GROUP BY 1), "
    "bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM d), "
    "cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE "
    "  AS day FROM bnd), "
    "g AS (SELECT cal.day, coalesce((rev * 100)::BIGINT, 0) AS rev_c, "
    "  row_number() OVER (ORDER BY cal.day) AS rn "
    "  FROM cal LEFT JOIN d USING (day)), "
    "rec AS ("
    "  SELECT 1 AS t, "
    "  (SELECT rev_c FROM g WHERE rn = 1)::DOUBLE AS l, "
    "  ((SELECT rev_c FROM g WHERE rn = 2) "
    "   - (SELECT rev_c FROM g WHERE rn = 1))::DOUBLE AS b "
    "  UNION ALL "
    "  SELECT rec.t + 1, "
    "  0.5 * g.rev_c + 0.5 * (rec.l + rec.b), "
    "  0.5 * ((0.5 * g.rev_c + 0.5 * (rec.l + rec.b)) - rec.l) + 0.5 * rec.b "
    "  FROM rec JOIN g ON g.rn = rec.t + 1), "
    "fin AS (SELECT l, b FROM rec ORDER BY t DESC LIMIT 1), "
    "lastd AS (SELECT max(day) AS last_day FROM g) "
    "SELECT h::INT AS h, "
    "strftime(last_day + h::INT, '%Y-%m-%d') AS day, "
    "round((l + h * b) / 100.0, 4) AS yhat, "
    "round(l / 100.0, 4) AS level, "
    "round(b / 100.0, 4) AS trend "
    "FROM fin, lastd, (SELECT unnest(range(1, 8)) AS h)"
)


_CP_MIN_SEG = 7  # min days per side — guards degenerate edge splits


def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrospective single change-point in daily revenue: the split
    day maximizing the absolute difference of segment means (binary
    segmentation's first step / an offline complement to
    :func:`q_ts_cusum`'s online drift alarm), each side at least
    ``_CP_MIN_SEG`` days. Emits one row: the split day, segment
    sizes, the two means and their delta.

    Integer-exact (the seasonal-decompose discipline): daily cents,
    cumulative BIGINT sums over the calendar axis, candidate scores
    = |floor(cum*100/t + .5) − floor((tot−cum)*100/(n−t) + .5)| —
    two correctly-rounded IEEE divisions per candidate, everything
    else integer; winner = TakeOrderedAndProject on (score DESC,
    day ASC) — a deterministic tie-break, no global sort
    materialization.

    Scale: the event scan collapses map-side to <= span-days rows;
    the cumulative window and the n-candidate score scan run on the
    calendar axis (the q_ts_gapfill contract — at 100 TB add a
    series key to the window partition clause and this becomes a
    per-key change-point in one pass)."""
    e = _events_daily(spark, sf_dir)
    daily = e.groupBy("day").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("rev")
    )
    g = (
        _calendar(daily.select("day"))
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce(
                (F.col("rev") * 100).cast("long"), F.lit(0).cast("long")
            ).alias("rev_c"),
        )
    )
    return changepoint_from_daily(g)


def changepoint_from_daily(g: DataFrame) -> DataFrame:
    """Retrospective split-day scoring over a prepared (day, rev_c)
    daily-cents frame — factored out of :func:`q_ts_changepoint` so
    a STREAMING daily aggregation (streaming/windows.py::
    windowed_revenue_cents emits exactly this frame shape) can feed
    the same retrospective operator losslessly; the stream==batch
    input equality is pinned in tests/test_streaming.py."""
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cand = g.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.sum("rev_c").over(w).alias("cum"),
        F.sum("rev_c").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).filter(
        (F.col("t") >= _CP_MIN_SEG) & (F.col("t") <= F.col("n") - _CP_MIN_SEG)
    )
    mean_l = F.floor(
        F.col("cum").cast("double") * 100.0 / F.col("t") + F.lit(0.5)
    ).cast("long")
    mean_r = F.floor(
        (F.col("tot") - F.col("cum")).cast("double")
        * 100.0
        / (F.col("n") - F.col("t"))
        + F.lit(0.5)
    ).cast("long")
    scored = cand.select(
        "day",
        "t",
        "n",
        mean_l.alias("ml_fp"),
        mean_r.alias("mr_fp"),
        F.abs(mean_l - mean_r).alias("score"),
    )
    top = scored.orderBy(F.col("score").desc(), F.col("day").asc()).limit(1)
    return top.select(
        F.date_format("day", "yyyy-MM-dd").alias("split_day"),
        F.col("t").cast("long").alias("n_left"),
        (F.col("n") - F.col("t")).cast("long").alias("n_right"),
        F.round(F.col("ml_fp") / 1e4, 4).alias("mean_before"),
        F.round(F.col("mr_fp") / 1e4, 4).alias("mean_after"),
        F.round((F.col("mr_fp") - F.col("ml_fp")) / 1e4, 4).alias("delta"),
    )


QUERIES["q_ts_changepoint"] = q_ts_changepoint
ORACLE["q_ts_changepoint"] = (
    "WITH d AS (SELECT ts::DATE AS day, "
    "  sum(CAST(value AS DECIMAL(18,2))) AS rev FROM events GROUP BY 1), "
    "bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM d), "
    "cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE "
    "  AS day FROM bnd), "
    "g AS (SELECT cal.day, coalesce((rev * 100)::BIGINT, 0) AS rev_c "
    "  FROM cal LEFT JOIN d USING (day)), "
    "c AS (SELECT day, row_number() OVER (ORDER BY day) AS t, "
    "  sum(rev_c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum, "
    "  sum(rev_c) OVER () AS tot, count(*) OVER () AS n FROM g), "
    f"k AS (SELECT * FROM c WHERE t >= {_CP_MIN_SEG} "
    f"  AND t <= n - {_CP_MIN_SEG}), "
    "s AS (SELECT day, t, n, "
    "  floor(cum::DOUBLE * 100.0 / t + 0.5)::BIGINT AS ml_fp, "
    "  floor((tot - cum)::DOUBLE * 100.0 / (n - t) + 0.5)::BIGINT AS mr_fp "
    "  FROM k) "
    "SELECT strftime(day, '%Y-%m-%d') AS split_day, t::BIGINT AS n_left, "
    "(n - t)::BIGINT AS n_right, "
    "round(ml_fp / 1e4, 4) AS mean_before, "
    "round(mr_fp / 1e4, 4) AS mean_after, "
    "round((mr_fp - ml_fp) / 1e4, 4) AS delta "
    "FROM s ORDER BY abs(ml_fp - mr_fp) DESC, day ASC LIMIT 1"
)


_XCORR_MAX_LAG = 7


def q_ts_xcorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between two daily series — does
    click activity LEAD purchases? Pearson r between clicks(t) and
    purchases(t+lag) for lag 0..7 over the zero-filled calendar,
    one row per lag (the correlogram an attribution analyst reads
    for the conversion delay).

    Cross-engine exactness: both series are integer daily COUNTS on
    the shared calendar; every lagged pair set reduces to BIGINT
    power sums (n, Σx, Σy, Σxy, Σx², Σy²) — float enters only in
    the final  (nΣxy−ΣxΣy) / sqrt((nΣx²−(Σx)²)·(nΣy²−(Σy)²)),
    where IEEE sqrt is correctly rounded and the multiply/divide
    order is written identically in both engines; constant series
    emit NULL via nullif (identical both sides).

    Scale: the event scan collapses map-side to two counts per day;
    the lag explode is x8 on the CALENDAR axis (never the data) and
    the per-lag aggregation is 8 groups of power sums — the
    q_ts_gapfill contract end to end."""
    e = _events_daily(spark, sf_dir)
    daily = e.groupBy("day").agg(
        F.sum((F.col("event_type") == "click").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("y"),
    )
    g = (
        _calendar(daily.select("day"))
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    lagged = g.select(
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(_XCORR_MAX_LAG))).alias("lag"),
        F.date_add("day", F.col("lag")).alias("day_y"),
    ).join(
        g.select(F.col("day").alias("day_y"), F.col("y").alias("y")), "day_y"
    )
    sums = lagged.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return sums.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        F.round(num / F.nullif(F.sqrt(vx * vy), F.lit(0.0)), 6).alias(
            "xcorr"
        ),
    )


QUERIES["q_ts_xcorr_daily"] = q_ts_xcorr_daily
ORACLE["q_ts_xcorr_daily"] = (
    "WITH d AS (SELECT ts::DATE AS day, "
    "  sum((event_type = 'click')::BIGINT)::BIGINT AS x, "
    "  sum((event_type = 'purchase')::BIGINT)::BIGINT AS y "
    "  FROM events GROUP BY 1), "
    "bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM d), "
    "cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE "
    "  AS day FROM bnd), "
    "g AS (SELECT cal.day, coalesce(x, 0) AS x, coalesce(y, 0) AS y "
    "  FROM cal LEFT JOIN d USING (day)), "
    f"lags AS (SELECT unnest(range(0, {_XCORR_MAX_LAG} + 1)) AS lag), "
    "p AS (SELECT lags.lag, a.x, b.y FROM g a, lags "
    "  JOIN g b ON true WHERE b.day = a.day + lags.lag::INT), "
    "s AS (SELECT lag, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, "
    "  sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy, "
    "  sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy "
    "  FROM p GROUP BY lag) "
    "SELECT lag::INT AS lag, n AS n_days, "
    "round((n * sxy - sx * sy)::DOUBLE "
    "/ nullif(sqrt((n * sxx - sx * sx)::DOUBLE "
    "* (n * syy - sy * sy)::DOUBLE), 0.0), 6) AS xcorr "
    "FROM s"
)


def q_ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type over the daily-count
    series — the nonparametric "is this series trending" gate that
    completes the r12 stat family (Mann-Whitney compares two
    snapshots; this detects monotonic drift WITHIN one series).
    S = Σ_{i<j} sign(c_j − c_i) over day pairs, tie-corrected
    variance Var = (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18 over
    tied-count groups, z with the ±1 continuity correction.

    Integer-exact cross-engine: the series is DAILY EVENT COUNTS
    (BIGINT — no float enters until the final z), S and both
    variance terms are integer sums, and sign() on integer
    differences is exact; only z divides, once, rounded at 6.

    Scale: two hash aggs (day grid, then tie groups) plus a
    self-join on event_type with day < day — CALENDAR-bounded
    (≤ days²/2 pairs per type, the q_win_rolling_median bound
    class), never event-volume-bound. At 100 TB the day grid per
    type is still ~365 rows/year; the pair join is trivia next to
    the daily agg's one scan."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.signum(F.col("b.c") - F.col("a.c")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    n_days = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    t = F.col("t")
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(F.sum(t * (t - 1) * (2 * t + 5)).alias("tie_term"))
    )
    n = F.col("n_days")
    var = (
        (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("double") / 18.0
    )
    z = F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var)).when(
        F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    return (
        s.join(n_days, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            F.round(z, 6).alias("z_score"),
        )
    )


QUERIES["q_ts_mann_kendall"] = q_ts_mann_kendall
ORACLE["q_ts_mann_kendall"] = (
    "WITH daily AS (SELECT event_type, date_trunc('day', ts)::DATE AS day, "
    "count(*)::BIGINT AS c FROM events GROUP BY 1, 2), "
    "s AS (SELECT a.event_type, "
    "sum(sign(b.c - a.c))::BIGINT AS s_stat "
    "FROM daily a JOIN daily b ON a.event_type = b.event_type "
    "AND a.day < b.day GROUP BY a.event_type), "
    "nd AS (SELECT event_type, count(*)::BIGINT AS n_days FROM daily "
    "GROUP BY event_type), "
    "ties AS (SELECT event_type, "
    "sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term FROM "
    "(SELECT event_type, c, count(*)::BIGINT AS t FROM daily "
    "GROUP BY event_type, c) GROUP BY event_type) "
    "SELECT s.event_type, n_days, s_stat, "
    "round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt((n_days * "
    "(n_days - 1) * (2 * n_days + 5) - tie_term) / 18.0) "
    "WHEN s_stat < 0 THEN (s_stat + 1) / sqrt((n_days * (n_days - 1) "
    "* (2 * n_days + 5) - tie_term) / 18.0) ELSE 0.0 END, 6) AS z_score "
    "FROM s JOIN nd ON s.event_type = nd.event_type "
    "JOIN ties ON s.event_type = ties.event_type"
)


def q_ts_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator per event type over the daily-count
    series — the robust trend MAGNITUDE companion to
    ``q_ts_mann_kendall`` (MK answers "is it trending", Sen's slope
    answers "by how much per day", breakdown point 29%): the median
    of all pairwise slopes (c_j − c_i)/(j − i) over day pairs.

    Cross-engine exactness: every slope is one IEEE division of two
    integers (BIGINT daily counts, integer day gaps) — identical in
    both engines; the median is the EXACT rank-picked middle (avg of
    the two middles on even counts), spelled with row_number in both
    engines rather than engine median() variants whose interpolation
    rules differ. Equal-slope orderings are interchangeable for the
    median, so the sort needs no tie-break.

    Scale: the pair join is CALENDAR-bounded like Mann-Kendall's
    (≤ days²/2 pairs per type — day grids stay ~365 rows/year no
    matter the event volume); the median window runs per type over
    that bounded slope set, never over events."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.c") - F.col("a.c")).cast("double")
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope"),
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("m"),
    )
    # integer DIV, not `/`: Column `/` is float division, which on
    # even m turns the lower-middle test into rn == m/2 + 0.5 (never
    # true) and silently drops one of the two medians
    mid = ranked.filter(
        (F.col("rn") == F.expr("(m + 1) DIV 2"))
        | (F.col("rn") == F.expr("m DIV 2 + 1"))
    )
    return mid.groupBy("event_type").agg(
        F.max("m").alias("n_pairs"),
        F.round(F.avg("slope"), 6).alias("sen_slope"),
    )


QUERIES["q_ts_theilsen"] = q_ts_theilsen
ORACLE["q_ts_theilsen"] = (
    "WITH daily AS (SELECT event_type, date_trunc('day', ts)::DATE AS day, "
    "count(*)::BIGINT AS c FROM events GROUP BY 1, 2), "
    "slopes AS (SELECT a.event_type, "
    "  (b.c - a.c)::DOUBLE / date_diff('day', a.day, b.day) AS slope "
    "  FROM daily a JOIN daily b ON a.event_type = b.event_type "
    "  AND a.day < b.day), "
    "ranked AS (SELECT event_type, slope, "
    "  row_number() OVER (PARTITION BY event_type ORDER BY slope) AS rn, "
    "  count(*) OVER (PARTITION BY event_type) AS m FROM slopes) "
    "SELECT event_type, max(m)::BIGINT AS n_pairs, "
    "round(avg(slope), 6) AS sen_slope FROM ranked "
    "WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1 GROUP BY event_type"
)


# ---------------------------------------------------------------------------
# Periodogram (discrete Fourier power at candidate periods) — "find
# the weekly cycle" over the daily activity series. Cross-engine
# trick: cos/sin never evaluate at runtime — the P distinct phase
# factors per candidate period are PRE-QUANTIZED (×1e6, floor+0.5)
# in Python at import and inlined as the SAME integer literals into
# both engines, so the per-day terms and their sums are exact BIGINT
# arithmetic; float enters only in the final normalize/round.
# Overflow ceiling: |centered| ≤ n_days·max_daily ≈ 1.2e7 at sf1,
# ×1e6 scale ×n_days ≈ 3e16 per sum — comfortably under 2^63 to
# ~sf30 of this fixture (the q_stat_welch_t documented-ceiling
# class; rescale _PGRAM_SCALE for bigger deployments).
# ---------------------------------------------------------------------------

_PGRAM_PERIODS = tuple(range(2, 11))
_PGRAM_SCALE = 10**6


def _pgram_phase_rows() -> list[tuple[int, int, int, int]]:
    import math

    rows = []
    for p in _PGRAM_PERIODS:
        for k in range(p):
            a = 2.0 * math.pi * k / p
            rows.append(
                (
                    p,
                    k,
                    int(math.floor(math.cos(a) * _PGRAM_SCALE + 0.5)),
                    int(math.floor(math.sin(a) * _PGRAM_SCALE + 0.5)),
                )
            )
    return rows


def q_ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram over the daily event-count series: for each
    candidate period P (2..10 days), the fraction of series variance
    concentrated at that frequency —
    ``2·(Σ x̃_t·cos(2πt/P))² + (Σ x̃_t·sin(2πt/P))² / (n·Σ x̃²)``
    with x̃ the exactly-centered series (n·x − Σx, all BIGINT). The
    seasonality detector that picks the period
    ``q_ts_seasonal_decompose`` assumes; a weekly cycle surfaces as
    the P=7 spike.

    Plan: one map-side-collapsing day agg over events, the dense
    calendar join (q_ts_gapfill contract), ONE 1-row totals agg
    broadcast back, a ×|periods| explode on the CALENDAR axis (never
    the data), a broadcast equi-join against the |Σ periods|-row
    phase-literal table, and a |periods|-group hash agg of BIGINT
    sums."""
    from pyspark.sql import types as T

    e = _events_daily(spark, sf_dir)
    daily = e.groupBy("day").agg(F.count(F.lit(1)).alias("x"))
    g = (
        _calendar(daily.select("day"))
        .join(daily, "day", "left")
        .select("day", F.coalesce("x", F.lit(0)).cast("long").alias("x"))
    )
    tot = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.min("day").alias("d0"),
    )
    cent = g.crossJoin(F.broadcast(tot)).select(
        F.datediff("day", "d0").cast("long").alias("t"),
        (F.col("n") * F.col("x") - F.col("sx")).alias("cs"),
        "n",
    )
    phases = spark.createDataFrame(
        _pgram_phase_rows(),
        T.StructType(
            [
                T.StructField("period", T.LongType()),
                T.StructField("phase", T.LongType()),
                T.StructField("c6", T.LongType()),
                T.StructField("s6", T.LongType()),
            ]
        ),
    )
    exploded = cent.select(
        "t",
        "cs",
        "n",
        F.explode(F.array(*[F.lit(p).cast("long") for p in _PGRAM_PERIODS])).alias(
            "period"
        ),
    ).withColumn("phase", F.pmod(F.col("t"), F.col("period")))
    sums = (
        exploded.join(F.broadcast(phases), ["period", "phase"])
        .groupBy("period")
        .agg(
            F.max("n").alias("n_days"),
            F.sum(F.col("cs") * F.col("c6")).alias("sc"),
            F.sum(F.col("cs") * F.col("s6")).alias("ss"),
            F.sum(F.col("cs") * F.col("cs")).alias("scs2"),
        )
    )
    num = (
        F.col("sc").cast("double") * F.col("sc").cast("double")
        + F.col("ss").cast("double") * F.col("ss").cast("double")
    )
    den = (
        F.lit(float(_PGRAM_SCALE) * float(_PGRAM_SCALE))
        * F.col("n_days").cast("double")
        * F.col("scs2").cast("double")
    )
    return sums.select(
        F.col("period").cast("int").alias("period"),
        F.col("n_days").cast("long").alias("n_days"),
        F.round(F.lit(2.0) * num / F.nullif(den, F.lit(0.0)), 6).alias(
            "power_frac"
        ),
    )


QUERIES["q_ts_periodogram"] = q_ts_periodogram


def _pgram_sql() -> str:
    vals = ", ".join(
        f"({p}, {k}, {c6}, {s6})" for p, k, c6, s6 in _pgram_phase_rows()
    )
    return (
        "WITH d AS (SELECT ts::DATE AS day, count(*)::BIGINT AS x "
        "  FROM events GROUP BY 1), "
        "bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM d), "
        "cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE "
        "  AS day FROM bnd), "
        "g AS (SELECT cal.day, coalesce(x, 0)::BIGINT AS x "
        "  FROM cal LEFT JOIN d USING (day)), "
        "tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, "
        "  min(day) AS d0 FROM g), "
        "cent AS (SELECT (g.day - tot.d0)::BIGINT AS t, "
        "  (tot.n * g.x - tot.sx)::BIGINT AS cs, tot.n FROM g CROSS JOIN tot), "
        f"ph(period, phase, c6, s6) AS (VALUES {vals}), "
        "ex AS (SELECT cent.*, ph.period, ph.c6, ph.s6 FROM cent "
        "  JOIN ph ON (cent.t % ph.period) = ph.phase), "
        "s AS (SELECT period, max(n)::BIGINT AS n_days, "
        "  sum(cs * c6)::BIGINT AS sc, sum(cs * s6)::BIGINT AS ss, "
        "  sum(cs * cs)::BIGINT AS scs2 FROM ex GROUP BY period) "
        "SELECT period::INT AS period, n_days, "
        "round(2.0 * (sc::DOUBLE * sc::DOUBLE + ss::DOUBLE * ss::DOUBLE) "
        f"/ nullif({float(_PGRAM_SCALE * _PGRAM_SCALE)!r} * n_days::DOUBLE "
        "* scs2::DOUBLE, 0.0), 6) AS power_frac "
        "FROM s"
    )


ORACLE["q_ts_periodogram"] = _pgram_sql()
