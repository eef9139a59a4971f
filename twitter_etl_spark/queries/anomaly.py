"""Robust outlier detection (SURVEY.md §2 [EXT]).

``q_outliers_robust``: per-segment robust dispersion stats and
outlier counts — median/MAD (the robust z-score) and Tukey IQR
fences — over the event stream. Robust stats, unlike mean/stddev,
don't let the outliers move the fence.

Plan shape: exact percentiles per group (Spark ``percentile`` ≡
DuckDB ``quantile_cont``, shared linear-interpolation definition —
cf. ``extras.q_agg_percentile``), the tiny per-group stats row
broadcast back, then one conditional re-aggregation. Two scans of
the fact (medians cannot fold into one pass with MAD, which needs
|x − median|); at 100 TB swap the exact percentile for
``approx_percentile`` with the same plan — the stats row stays one
row per group either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: robust z-score scale factor (MAD → σ under normality) and fence.
MAD_SIGMA = 1.4826
MAD_K = 3.0
IQR_K = 1.5


def q_outliers_robust(
    spark: SparkSession, sf_dir: str, *, exact: bool = True
) -> DataFrame:
    """``exact=False`` is the RUNNABLE 100 TB path: every percentile
    becomes ``percentile_approx`` (t-digest, mergeable map-side
    partials — the per-group reducer no longer buffers every value;
    the fences move by at most the t-digest rank error), same plan
    shape — pinned fingerprint-identical by
    ``tests/test_plans.py::test_approx_percentile_swap_keeps_plan_shape``.
    The registered/oracle form stays exact for the DuckDB hash
    gate."""
    pct = (
        F.percentile
        if exact
        else (lambda c, q: F.percentile_approx(c, q, F.lit(10000)))
    )
    e = table(spark, sf_dir, "events").select("event_type", "value")
    stats = e.groupBy("event_type").agg(
        pct("value", F.lit(0.5)).alias("med"),
        pct("value", F.lit(0.25)).alias("q1"),
        pct("value", F.lit(0.75)).alias("q3"),
    )
    j = e.join(F.broadcast(stats), "event_type")
    mad = j.groupBy("event_type").agg(
        pct(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    full = e.join(F.broadcast(stats), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    mad_out = (
        F.abs(F.col("value") - F.col("med")) > MAD_K * MAD_SIGMA * F.col("mad")
    ).cast("bigint")
    iqr = F.col("q3") - F.col("q1")
    iqr_out = (
        (F.col("value") < F.col("q1") - IQR_K * iqr)
        | (F.col("value") > F.col("q3") + IQR_K * iqr)
    ).cast("bigint")
    return full.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("med"), 4).alias("med"),
        F.round(F.min("mad"), 4).alias("mad"),
        F.round(F.min("q1"), 4).alias("q1"),
        F.round(F.min("q3"), 4).alias("q3"),
        F.sum(mad_out).alias("n_mad_outliers"),
        F.sum(iqr_out).alias("n_iqr_outliers"),
    )


QUERIES = {"q_outliers_robust": q_outliers_robust}

ORACLE = {
    "q_outliers_robust": (
        "WITH e AS (SELECT event_type, value FROM events), "
        "stats AS (SELECT event_type, "
        "quantile_cont(value, 0.5) AS med, "
        "quantile_cont(value, 0.25) AS q1, "
        "quantile_cont(value, 0.75) AS q3 "
        "FROM e GROUP BY event_type), "
        "madt AS (SELECT e.event_type, "
        "quantile_cont(abs(e.value - s.med), 0.5) AS mad "
        "FROM e JOIN stats s USING (event_type) GROUP BY e.event_type) "
        "SELECT e.event_type, count(*) AS n, "
        "round(min(s.med), 4) AS med, round(min(m.mad), 4) AS mad, "
        "round(min(s.q1), 4) AS q1, round(min(s.q3), 4) AS q3, "
        # sum(BIGINT) -> HUGEINT -> pandas float64; outer ::BIGINT
        # keeps the driver's dtype-sensitive hash aligned with Spark
        f"sum((abs(e.value - s.med) > {MAD_K} * {MAD_SIGMA} * m.mad)"
        "::BIGINT)::BIGINT AS n_mad_outliers, "
        f"sum((e.value < s.q1 - {IQR_K} * (s.q3 - s.q1) "
        f"OR e.value > s.q3 + {IQR_K} * (s.q3 - s.q1))::BIGINT)::BIGINT "
        "AS n_iqr_outliers "
        "FROM e JOIN stats s USING (event_type) "
        "JOIN madt m ON m.event_type = e.event_type "
        "GROUP BY e.event_type"
    ),
}


#: trailing-baseline width (days) for the windowed z-score.
_ANOM_BASELINE = 7


def q_ts_anomaly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scores: each (event_type, day) count
    z-scored against its series' preceding 7 OBSERVED days (a ROWS
    frame — on a sparse series the baseline is the last 7 days the
    type was active, however old; a calendar-bounded variant is the
    same query with day-as-epoch-int ordering and a RANGE frame).
    The ops-monitoring detector (complements q_outliers_robust,
    which scores against the global distribution). Days without a
    full 7-row baseline are not scored; a zero-variance baseline is
    skipped (z undefined).

    Exact-arithmetic contract: daily counts are integers, so the
    trailing Σc and Σc² window sums reduce as exact BIGINTs (the
    q_agg_moments power-sum trick lifted onto a window frame) and
    mean/std/z derive from identical scalars with identical
    expression trees on both engines. One (type, day) hash agg +
    one window partitioned by type — the tiny aggregated frame, the
    corpus never sorts."""
    e = table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-_ANOM_BASELINE, -1)
    )
    k = F.count(F.lit(1)).over(tw)
    s1 = F.sum("c").over(tw)
    s2 = F.sum(F.col("c") * F.col("c")).over(tw)
    w = d.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "c",
        k.alias("k"),
        s1.alias("s1"),
        s2.alias("s2"),
    )
    m = F.col("s1") * 1.0 / F.col("k")
    var = F.col("s2") * 1.0 / F.col("k") - m * m
    return (
        w.where((F.col("k") == _ANOM_BASELINE) & (var > 0))
        .select(
            "event_type",
            "day",
            "c",
            F.round((F.col("c") - m) / F.sqrt(var), 6).alias("zscore"),
        )
    )


QUERIES["q_ts_anomaly_window"] = q_ts_anomaly_window
ORACLE["q_ts_anomaly_window"] = (
    "WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, "
    "  count(*)::BIGINT AS c FROM events GROUP BY 1, 2), "
    "w AS (SELECT *, count(*) OVER tw AS k, "
    "  CAST(sum(c) OVER tw AS BIGINT) AS s1, "
    "  CAST(sum(c * c) OVER tw AS BIGINT) AS s2 "
    "  FROM d WINDOW tw AS (PARTITION BY event_type ORDER BY day "
    f"    ROWS BETWEEN {_ANOM_BASELINE} PRECEDING AND 1 PRECEDING)) "
    "SELECT event_type, strftime(day, '%Y-%m-%d') AS day, c, "
    "round((c - s1 * 1.0 / k) / sqrt(s2 * 1.0 / k - (s1 * 1.0 / k) * (s1 * 1.0 / k)), 6) "
    "  AS zscore "
    f"FROM w WHERE k = {_ANOM_BASELINE} "
    "AND s2 * 1.0 / k - (s1 * 1.0 / k) * (s1 * 1.0 / k) > 0"
)
