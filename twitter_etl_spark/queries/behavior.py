"""Behavioral analytics over the event stream [EXT].

The reference's sink exists to be queried (README.md:3); these are
the canonical product-analytics questions asked of an events table
at warehouse scale — funnel conversion and cohort retention. Both
are single-pass shapes: one shuffle on ``user_id`` (window or agg),
then a small aggregation — no self-joins over the event log, which
is the naive formulation that dies at 100 TB (an events×events join
amplifies by events-per-user).

Oracle-parity notes: timestamps compared as epoch via date_trunc
buckets; counts are exact; every output is scalar-typed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: per step, how many
    users reached it in order (a later step counts only if it
    happens AFTER the user's first occurrence of the previous step).
    One shuffle: per-user min-timestamp per step (hash agg with
    map-side combine), then conditional counts over the tiny
    per-user frame."""
    e = table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    # NOTE: "first click after first view" under-counts users whose
    # only view-preceding click is not their global first click —
    # the standard approximation used by warehouse funnels (one hash
    # agg, cheapest possible plan). The exact ordered-sequence twin
    # is q_funnel_strict below; keep both: this is the scale-default,
    # that is the semantics-exact form.
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & F.col("t_click").isNotNull() & (
        F.col("t_click") >= F.col("t_view")
    )
    reached_purchase = reached_click & F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") >= F.col("t_click")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(reached_view.cast("long")).alias("n_view"),
        F.sum(reached_click.cast("long")).alias("n_click_after_view"),
        F.sum(reached_purchase.cast("long")).alias("n_purchase_after_click"),
    )


def q_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ordered-sequence funnel view -> click -> purchase: the
    qualifying click is the user's FIRST click at-or-after their
    first view (not their globally-first click), and likewise for
    purchase — the semantics-exact twin of q_funnel_conversion's
    min-based approximation.

    Plan: three chained unbounded windows over the SAME user_id
    partitioning — ONE exchange of the event log, no self-joins;
    each window's conditional min references the previous step's
    timestamp, which plain conditional aggregation cannot express in
    one pass. NULL propagation does the sequencing for free: a user
    with no view has t_view NULL, so ``ts >= t_view`` is NULL and
    every later step stays NULL. The per-user roll-up reuses the
    window's hash partitioning (no second shuffle), then a 1-row
    conditional count."""
    return funnel_strict_counts(table(spark, sf_dir, "events"))


def funnel_strict_counts(e: DataFrame) -> DataFrame:
    """Frame-level core of :func:`q_funnel_strict` (any frame with
    user_id/event_type/ts). Greedy-earliest matching is COMPLETE: if
    any view ≤ click ≤ purchase triple exists for a user, then the
    first view ≤ that click, so a first qualifying click exists and
    is ≤ that click, and that purchase still qualifies after it —
    no ordered triple is ever missed."""
    w = Window.partitionBy("user_id")
    staged = (
        e.select("user_id", "event_type", "ts")
        .withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("long")).alias("n_view"),
        F.sum(F.col("t_click").isNotNull().cast("long")).alias(
            "n_click_strict"
        ),
        F.sum(F.col("t_purchase").isNotNull().cast("long")).alias(
            "n_purchase_strict"
        ),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each (cohort_week, activity_week) the count of
    distinct active users. Two hash shuffles (first-event per user,
    then the cohort grid) — never an events-to-events join."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    w = Window.partitionBy("user_id")
    cohorted = e.withColumn("cohort_week", F.min("week").over(w))
    return (
        cohorted.groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .withColumn(
            "week_offset",
            F.datediff(F.col("week"), F.col("cohort_week")) / 7,
        )
        .withColumn("week_offset", F.col("week_offset").cast("long"))
        .select(
            F.unix_timestamp("cohort_week").alias("cohort_epoch"),
            "week_offset",
            "n_active",
        )
    )


def q_attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming attribution join
    (:func:`twitter_etl_spark.streaming.stream_stream_join`): each
    purchase matched to same-user clicks within the prior 30
    minutes; per-user attributed counts and value. The user_id equi
    key anchors a hash join with a time post-filter — never a
    nested-loop over the time condition."""
    e = table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_attributed"),
        F.round(F.sum("value"), 2).alias("attributed_value"),
    )


def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the
    40/20/40 credit model marketing analytics runs beside first/last
    touch: for each purchase, the same-user non-purchase touches in
    the prior 30 minutes (ts, event_id order) split one conversion
    credit as 40% to the first touch, 40% to the last, 20% shared
    by the middles. Reported per channel (touch event_type):
    touches, conversions participated in, and total credit.

    INTEGER credit arithmetic — no float sums to drift cross-engine:
    credits are basis points (n=1 → 10000; n=2 → 5000/5000; n≥3 →
    4000/4000 ends, middles get 2000 DIV (n−2) each with the
    remainder to the EARLIEST middle), summed as BIGINTs; the single
    float division by 10⁴ happens on the final per-channel sum.

    Scale: the user_id equi-join anchors the touch match (time
    post-filter, never a nested loop); the rank/count windows
    partition per PURCHASE (bounded by the 30-min window), and the
    channel rollup is a tiny hash agg."""
    e = table(spark, sf_dir, "events")
    t = e.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("touch_ts"),
        F.col("event_id").alias("touch_id"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = p.join(
        t,
        (p.user_id == t.t_user)
        & (F.col("purchase_ts") >= F.col("touch_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("touch_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    )
    wr = Window.partitionBy("p_id").orderBy("touch_ts", "touch_id")
    wn = Window.partitionBy("p_id")
    ranked = joined.select(
        "p_id",
        "channel",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    n, rn = F.col("n"), F.col("rn")
    mid_base = F.expr("2000 DIV (n - 2)")
    mid_rem = F.expr("2000 % (n - 2)")
    bp = (
        F.when(n == 1, 10000)
        .when(n == 2, 5000)
        .when((rn == 1) | (rn == n), 4000)
        .when(rn == 2, mid_base + mid_rem)
        .otherwise(mid_base)
    )
    return (
        ranked.withColumn("bp", bp.cast("long"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.count_distinct("p_id").alias("n_conversions"),
            F.round(F.sum("bp") / 10000.0, 4).alias("credit"),
        )
    )


def q_behavior_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition counts (the Markov-chain /
    clickstream-path-mining primitive): per user, consecutive
    event-type pairs in (ts, event_id) order, counted globally. One
    window shuffle on user_id, one hash agg on the tiny
    (from, to) grid — never an events self-join."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


QUERIES = {
    "q_funnel_conversion": q_funnel_conversion,
    "q_funnel_strict": q_funnel_strict,
    "q_cohort_retention": q_cohort_retention,
    "q_attribution_batch": q_attribution_batch,
    "q_behavior_transitions": q_behavior_transitions,
}

ORACLE = {
    "q_funnel_conversion": (
        "WITH per_user AS ("
        "  SELECT user_id, "
        "  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view, "
        "  min(CASE WHEN event_type = 'click' THEN ts END) AS t_click, "
        "  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase "
        "  FROM events GROUP BY user_id) "
        "SELECT count(*)::BIGINT AS n_users, "
        "sum((t_view IS NOT NULL)::INT)::BIGINT AS n_view, "
        "sum((t_view IS NOT NULL AND t_click IS NOT NULL "
        "     AND t_click >= t_view)::INT)::BIGINT AS n_click_after_view, "
        "sum((t_view IS NOT NULL AND t_click IS NOT NULL "
        "     AND t_click >= t_view AND t_purchase IS NOT NULL "
        "     AND t_purchase >= t_click)::INT)::BIGINT "
        "  AS n_purchase_after_click "
        "FROM per_user"
    ),
    "q_funnel_strict": (
        "WITH w1 AS (SELECT user_id, event_type, ts, "
        "  min(CASE WHEN event_type = 'view' THEN ts END) "
        "    OVER (PARTITION BY user_id) AS t_view FROM events), "
        "w2 AS (SELECT *, min(CASE WHEN event_type = 'click' "
        "    AND ts >= t_view THEN ts END) "
        "    OVER (PARTITION BY user_id) AS t_click FROM w1), "
        "w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' "
        "    AND ts >= t_click THEN ts END) "
        "    OVER (PARTITION BY user_id) AS t_purchase FROM w2), "
        "u AS (SELECT user_id, min(t_view) AS t_view, "
        "  min(t_click) AS t_click, min(t_purchase) AS t_purchase "
        "  FROM w3 GROUP BY user_id) "
        "SELECT count(*)::BIGINT AS n_users, "
        "sum((t_view IS NOT NULL)::INT)::BIGINT AS n_view, "
        "sum((t_click IS NOT NULL)::INT)::BIGINT AS n_click_strict, "
        "sum((t_purchase IS NOT NULL)::INT)::BIGINT AS n_purchase_strict "
        "FROM u"
    ),
    "q_attribution_batch": (
        "WITH c AS (SELECT user_id AS c_user, ts AS click_ts FROM events "
        "           WHERE event_type = 'click'), "
        "p AS (SELECT user_id, ts AS purchase_ts, value FROM events "
        "      WHERE event_type = 'purchase') "
        "SELECT user_id, count(*)::BIGINT AS n_attributed, "
        "round(sum(value), 2) AS attributed_value "
        "FROM p JOIN c ON user_id = c_user "
        "AND purchase_ts >= click_ts "
        "AND purchase_ts <= click_ts + INTERVAL 30 MINUTE "
        "GROUP BY user_id"
    ),
    "q_cohort_retention": (
        "WITH e AS (SELECT user_id, date_trunc('week', ts) AS week FROM events), "
        "c AS (SELECT user_id, week, "
        "      min(week) OVER (PARTITION BY user_id) AS cohort_week FROM e) "
        "SELECT epoch(cohort_week)::BIGINT AS cohort_epoch, "
        "(date_diff('day', cohort_week, week) / 7)::BIGINT AS week_offset, "
        "count(DISTINCT user_id)::BIGINT AS n_active "
        "FROM c GROUP BY cohort_week, week"
    ),
    "q_behavior_transitions": (
        "WITH seq AS (SELECT user_id, event_type, "
        "  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "    AS next_type FROM events) "
        "SELECT event_type AS from_type, next_type AS to_type, "
        "count(*)::BIGINT AS n FROM seq WHERE next_type IS NOT NULL "
        "GROUP BY 1, 2"
    ),
}


def q_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy (bits) of the event-type mix — the
    behavioral-diversity feature bot/abuse detection scores on (a
    bot hammering one endpoint has entropy ~0; organic users sit
    near the mix entropy).

    Exact-arithmetic contract: each −p·log2(p) term is rounded at 9
    decimals and fixed-pointed to BIGINT BEFORE the per-user sum, so
    the reduction is integer math and engine summation order cannot
    show (the q_text_unigram_logprob trick; p = c/n is IEEE-exact
    identical division in both engines). Two hash aggs — (user,
    type) counts, then the per-user roll-up; no window, no sort."""
    e = table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    n = c.groupBy("user_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.floor(F.round(-p * F.log2(p), 9) * 1e9 + F.lit(0.5)).cast("bigint")
    return (
        c.join(n, "user_id")
        .select("user_id", "n", "n_types", term.alias("term"))
        .groupBy("user_id")
        .agg(
            F.first("n").alias("n_events"),
            F.first("n_types").alias("n_types"),
            F.round(F.sum("term") / 1e9, 6).alias("entropy_bits"),
        )
    )


QUERIES["q_behavior_entropy"] = q_behavior_entropy
ORACLE["q_behavior_entropy"] = (
    "WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS c "
    "  FROM events GROUP BY 1, 2), "
    "n AS (SELECT user_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_types "
    "  FROM c GROUP BY user_id), "
    "t AS (SELECT c.user_id, n.n, n.n_types, "
    "  CAST(floor(round(-(c.c * 1.0 / n.n) * log2(c.c * 1.0 / n.n), 9) "
    "    * 1e9 + 0.5) AS BIGINT) AS term "
    "  FROM c JOIN n USING (user_id)) "
    "SELECT user_id, any_value(n) AS n_events, any_value(n_types) AS n_types, "
    "round(sum(term) / 1e9, 6) AS entropy_bits FROM t GROUP BY user_id"
)


def q_behavior_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's consecutive-day activity streaks
    (start, end, length) — the retention/engagement primitive
    (DAU streak badges, churn-risk features).

    The classic rn-difference trick: within a user, subtracting the
    day's row_number from the day itself is constant across a
    consecutive run, so ``day − rn`` is the streak anchor and one
    hash agg per (user, anchor) finishes the job. Shuffles: the
    distinct (user, day) agg, the per-user window, the anchor agg —
    all keyed on user-sized partitions, no global sort; dates are
    emitted as ISO strings (stable across result-fetch layers)."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.select(
        "user_id",
        "day",
        F.date_sub("day", F.row_number().over(w)).alias("anchor"),
    )
    return g.groupBy("user_id", "anchor").agg(
        F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("day"), "yyyy-MM-dd").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_days"),
    ).drop("anchor")


QUERIES["q_behavior_streaks"] = q_behavior_streaks
ORACLE["q_behavior_streaks"] = (
    "WITH d AS (SELECT DISTINCT user_id, "
    "  CAST(date_trunc('day', ts) AS DATE) AS day FROM events), "
    "r AS (SELECT user_id, day, row_number() OVER ("
    "  PARTITION BY user_id ORDER BY day) AS rn FROM d), "
    "g AS (SELECT user_id, day, day - CAST(rn AS INTEGER) AS anchor FROM r) "
    "SELECT user_id, strftime(min(day), '%Y-%m-%d') AS streak_start, "
    "strftime(max(day), '%Y-%m-%d') AS streak_end, "
    "count(*)::BIGINT AS streak_days "
    "FROM g GROUP BY user_id, anchor"
)


def q_behavior_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU per observed day — trailing 1/7/28-day
    distinct-active-user counts, the canonical engagement dashboard
    triple.

    Rolling COUNT DISTINCT is not sum-decomposable, so the exact
    distributed form explodes each distinct (user, day) to the ≤28
    anchor days it supports, then aggregates the MINIMUM gap per
    (anchor, user) before conditional counting — two plain hash aggs
    instead of a 3-way multi-distinct (which Spark would Expand into
    3× the rows). Anchors are restricted to observed event days
    (broadcast semi-join against the tiny day dimension). Scale: the
    exploded frame is 28 × |distinct user-days| ≪ 28 × |events|,
    partitioned on (anchor, user) — no skew beyond a viral day, no
    global sort; at 100 TB the sketch swap is per-day HLL unioned
    over the window (q_agg_hll_distinct machinery), same plan shape.
    Days emit as ISO strings (the q_behavior_streaks idiom)."""
    e = table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    days = ud.select("day").distinct()
    spans = ud.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.col("day"), F.date_add("day", 27))).alias(
            "anchor"
        ),
    )
    gaps = (
        spans.join(F.broadcast(days.select(F.col("day").alias("anchor"))), "anchor")
        .groupBy("anchor", "user_id")
        .agg(F.min(F.datediff("anchor", "day")).alias("gap"))
    )
    return (
        gaps.groupBy("anchor")
        .agg(
            F.sum((F.col("gap") == 0).cast("long")).alias("dau"),
            F.sum((F.col("gap") <= 6).cast("long")).alias("wau"),
            F.count(F.lit(1)).alias("mau"),
        )
        .select(
            F.date_format("anchor", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            "mau",
        )
    )


QUERIES["q_behavior_dau_wau_mau"] = q_behavior_dau_wau_mau
ORACLE["q_behavior_dau_wau_mau"] = (
    "WITH ud AS (SELECT DISTINCT user_id, "
    "  CAST(date_trunc('day', ts) AS DATE) AS day FROM events), "
    "days AS (SELECT DISTINCT day FROM ud), "
    "spans AS (SELECT user_id, day, day + off::INT AS anchor "
    "  FROM ud, LATERAL (SELECT unnest(range(0, 28)) AS off) u), "
    "gaps AS (SELECT anchor, user_id, min(anchor - spans.day) AS gap "
    "  FROM spans JOIN days ON spans.anchor = days.day "
    "  GROUP BY anchor, user_id) "
    "SELECT strftime(anchor, '%Y-%m-%d') AS day, "
    "sum((gap = 0)::INT)::BIGINT AS dau, "
    "sum((gap <= 6)::INT)::BIGINT AS wau, "
    "count(*)::BIGINT AS mau "
    "FROM gaps GROUP BY anchor"
)


#: RFM snapshot date (after the fixture's last event at every SF).
_RFM_ASOF = "2024-02-01"


def q_behavior_rfm(
    spark: SparkSession, sf_dir: str, *, exact: bool = True
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintile
    scores per user) — the classic CRM / lifecycle-marketing
    segmentation, spelled the SCALE-SAFE way: scores come from
    comparing each user's metrics against the four exact quintile
    THRESHOLDS (a 1-row aggregate, broadcast), not from a global
    ``ntile`` window — so there is no global sort of the user frame
    (the q_win_ntile caveat engineered away; at 100 TB swap the
    exact percentiles for approx_percentile, same plan shape).

    Determinism BY CONSTRUCTION (not margin): monetary sums
    ``value`` as DECIMAL(18,2) — per-row rounding then an EXACT
    decimal reduction, so engine merge order cannot move it even one
    ulp (the q_agg_salted_sum idiom; a raw double sum would be
    order-dependent and could flip a user across a quantile
    threshold). Thresholds are rounded (4) on both engines (Spark
    ``percentile`` and DuckDB ``quantile_cont`` share linear
    interpolation — certified by q_agg_percentile), and
    recency/frequency are integers — so every CASE comparison sees
    identical scalars. Recency scores INVERT (smaller = more recent
    = better). The per-user frame feeds both the threshold agg and
    the scoring join, so it is cached via the one-slot
    ``cacheutil.cache_latest`` (one events scan, no session leak).

    ``exact=False`` is the RUNNABLE 100 TB path: thresholds come
    from ``percentile_approx`` (t-digest, mergeable map-side partial
    aggregation — the 1-row reducer no longer buffers every user's
    metrics), same plan shape otherwise. The registered/oracle form
    stays exact so the driver's hash gate has a DuckDB twin."""
    from ..cacheutil import cache_latest

    e = table(spark, sf_dir, "events")
    u = cache_latest(
        "rfm_user_metrics",
        e.groupBy("user_id").agg(
            F.datediff(
                F.lit(_RFM_ASOF).cast("date"),
                F.to_date(F.date_trunc("day", F.max("ts"))),
            ).alias("recency_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("monetary"),
        ),
    )
    qs = [0.2, 0.4, 0.6, 0.8]
    pct = (
        F.percentile
        if exact
        else (lambda c, q: F.percentile_approx(c, q, F.lit(10000)))
    )
    t = u.agg(
        *[
            F.round(pct(c, F.lit(q)), 4).alias(f"{c[0]}{int(q*10)}")
            for c in ("recency_d", "frequency", "monetary")
            for q in qs
        ]
    )
    j = u.crossJoin(F.broadcast(t))
    r = F.col("recency_d")
    f = F.col("frequency")
    m = F.col("monetary")
    r_score = (
        F.when(r <= F.col("r2"), 5)
        .when(r <= F.col("r4"), 4)
        .when(r <= F.col("r6"), 3)
        .when(r <= F.col("r8"), 2)
        .otherwise(1)
    )
    f_score = (
        F.when(f > F.col("f8"), 5)
        .when(f > F.col("f6"), 4)
        .when(f > F.col("f4"), 3)
        .when(f > F.col("f2"), 2)
        .otherwise(1)
    )
    m_score = (
        F.when(m > F.col("m8"), 5)
        .when(m > F.col("m6"), 4)
        .when(m > F.col("m4"), 3)
        .when(m > F.col("m2"), 2)
        .otherwise(1)
    )
    return j.select(
        "user_id",
        "recency_d",
        "frequency",
        "monetary",
        r_score.cast("long").alias("r_score"),
        f_score.cast("long").alias("f_score"),
        m_score.cast("long").alias("m_score"),
    )


QUERIES["q_behavior_rfm"] = q_behavior_rfm
ORACLE["q_behavior_rfm"] = (
    "WITH u AS (SELECT user_id, "
    f"  date_diff('day', CAST(date_trunc('day', max(ts)) AS DATE), "
    f"            DATE '{_RFM_ASOF}') AS recency_d, "
    "  count(*)::BIGINT AS frequency, "
    "  round(sum(CAST(value AS DECIMAL(18,2)))::DOUBLE, 2) AS monetary "
    "  FROM events GROUP BY user_id), "
    "t AS (SELECT "
    "  round(quantile_cont(recency_d, 0.2), 4) AS r2, "
    "  round(quantile_cont(recency_d, 0.4), 4) AS r4, "
    "  round(quantile_cont(recency_d, 0.6), 4) AS r6, "
    "  round(quantile_cont(recency_d, 0.8), 4) AS r8, "
    "  round(quantile_cont(frequency, 0.2), 4) AS f2, "
    "  round(quantile_cont(frequency, 0.4), 4) AS f4, "
    "  round(quantile_cont(frequency, 0.6), 4) AS f6, "
    "  round(quantile_cont(frequency, 0.8), 4) AS f8, "
    "  round(quantile_cont(monetary, 0.2), 4) AS m2, "
    "  round(quantile_cont(monetary, 0.4), 4) AS m4, "
    "  round(quantile_cont(monetary, 0.6), 4) AS m6, "
    "  round(quantile_cont(monetary, 0.8), 4) AS m8 FROM u) "
    "SELECT u.user_id, u.recency_d, u.frequency, u.monetary, "
    "(CASE WHEN recency_d <= r2 THEN 5 WHEN recency_d <= r4 THEN 4 "
    "      WHEN recency_d <= r6 THEN 3 WHEN recency_d <= r8 THEN 2 "
    "      ELSE 1 END)::BIGINT AS r_score, "
    "(CASE WHEN frequency > f8 THEN 5 WHEN frequency > f6 THEN 4 "
    "      WHEN frequency > f4 THEN 3 WHEN frequency > f2 THEN 2 "
    "      ELSE 1 END)::BIGINT AS f_score, "
    "(CASE WHEN monetary > m8 THEN 5 WHEN monetary > m6 THEN 4 "
    "      WHEN monetary > m4 THEN 3 WHEN monetary > m2 THEN 2 "
    "      ELSE 1 END)::BIGINT AS m_score "
    "FROM u, t"
)


def q_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern matching over per-user
    event journeys — the behavioral-regex operator (SQL:2016 row
    pattern recognition; Spark has no MATCH_RECOGNIZE, so the
    journey is materialized as a STRING and the pattern runs as a
    regex): each user's events in (ts, event_id) order become a
    code string (c/e/p/s/v = the event type's initial — distinct by
    fixture design), and the report counts non-overlapping matches
    of ``v[ce]*p`` — a view that converts to purchase with only
    clicks/errors between (no intervening signup/view resets the
    attempt, exactly the MATCH_RECOGNIZE PATTERN (V (C|E)* P)
    semantics). Output: per-user journey length, match count, and
    the journey digest (md5 keeps the certified frame skinny).

    Determinism: the sort key (ts, event_id) is a total order, the
    code alphabet is 1:1, and greedy leftmost regex matching is
    identical in java.util.regex and RE2 for this pattern class —
    counts hash-match cross-engine.

    Scale: ONE shuffle on user_id (collect_list + sort_array per
    user — no global sort); journey length is per-entity bounded
    (at 100 TB the monitor caps the journey window — e.g. last 10k
    events — the same per-entity cap family as JACCARD_MAX_PIVOT;
    regex cost is linear in journey length)."""
    e = table(spark, sf_dir, "events")
    code = F.substring("event_type", 1, 1)
    j = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", code.alias("c")))
                ),
                lambda x: x["c"],
            ),
            "",
        ).alias("journey"),
    )
    return j.select(
        "user_id",
        "n_events",
        F.size(F.regexp_extract_all("journey", F.lit("v[ce]*p"), F.lit(0)))
        .cast("long")
        .alias("n_matches"),
        F.md5("journey").alias("journey_md5"),
    )


QUERIES["q_seq_pattern"] = q_seq_pattern
ORACLE["q_seq_pattern"] = (
    "WITH j AS (SELECT user_id, count(*)::BIGINT AS n_events, "
    "string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) "
    "AS journey FROM events GROUP BY user_id) "
    "SELECT user_id, n_events, "
    "len(regexp_extract_all(journey, 'v[ce]*p'))::BIGINT AS n_matches, "
    "md5(journey) AS journey_md5 FROM j"
)


#: journey-path prefix length and report size for q_behavior_topk_paths.
_PATH_LEN = 5
_PATH_TOPK = 20


def q_behavior_topk_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k session journey paths — "what do sessions actually do":
    gap-sessionize (the 30-minute q_sessionize_batch rule), take each
    session's first ``_PATH_LEN`` event types in (ts, event_id)
    order as its path string, and report the ``_PATH_TOPK`` most
    common paths with session counts — the product-analytics
    "behavior flows" report (Sankey input), complementing
    q_seq_pattern's regex matcher with the unsupervised view.

    Determinism: (ts, event_id) is a total order, the path prefix is
    a pure function of it, and the top-k key (n_sessions DESC, path
    ASC) is total. Scale: ONE shuffle on user_id (the windows and
    the per-session collect ride the same sort), then a hash agg on
    path strings ≤ _PATH_LEN event-type names long (bounded key) —
    top-k compiles to TakeOrderedAndProject. The _PATH_LEN prefix
    cap is the per-entity bound (JACCARD_MAX_PIVOT family): hot
    sessions can't inflate the path key."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts")), 1
    ).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = e.withColumn("session_id", F.sum(is_new).over(wc))
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    first_n = s.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= _PATH_LEN
    )
    paths = first_n.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts", "event_id", F.col("event_type").alias("t"))
                    )
                ),
                lambda x: x["t"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_PATH_TOPK)
    )


QUERIES["q_behavior_topk_paths"] = q_behavior_topk_paths
ORACLE["q_behavior_topk_paths"] = (
    "WITH g AS (SELECT user_id, ts, event_id, event_type, "
    "  CASE WHEN lag(epoch_us(ts)) OVER "
    "    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
    "  OR epoch_us(ts) - lag(epoch_us(ts)) OVER "
    "    (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000 "
    "  THEN 1 ELSE 0 END AS is_new FROM events), "
    "s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id "
    "  ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "  CURRENT ROW) AS session_id FROM g), "
    "fn AS (SELECT * FROM (SELECT *, row_number() OVER "
    "  (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS rn "
    f"  FROM s) WHERE rn <= {_PATH_LEN}), "
    "paths AS (SELECT user_id, session_id, "
    "  string_agg(event_type, '>' ORDER BY ts, event_id) AS path "
    "  FROM fn GROUP BY user_id, session_id) "
    "SELECT path, count(*)::BIGINT AS n_sessions FROM paths "
    f"GROUP BY path ORDER BY n_sessions DESC, path ASC LIMIT {_PATH_TOPK}"
)


QUERIES["q_attribution_position"] = q_attribution_position

ORACLE["q_attribution_position"] = (
    "WITH t AS (SELECT user_id AS t_user, event_type AS channel, "
    "  ts AS touch_ts, event_id AS touch_id FROM events "
    "  WHERE event_type <> 'purchase'), "
    "p AS (SELECT user_id, event_id AS p_id, ts AS purchase_ts "
    "  FROM events WHERE event_type = 'purchase'), "
    "j AS (SELECT p.p_id, t.channel, t.touch_ts, t.touch_id "
    "  FROM p JOIN t ON p.user_id = t.t_user "
    "  AND p.purchase_ts >= t.touch_ts "
    "  AND p.purchase_ts <= t.touch_ts + INTERVAL 30 MINUTE), "
    "r AS (SELECT p_id, channel, "
    "  row_number() OVER (PARTITION BY p_id ORDER BY touch_ts, touch_id) AS rn, "
    "  count(*) OVER (PARTITION BY p_id)::BIGINT AS n FROM j), "
    "c AS (SELECT p_id, channel, CASE "
    "  WHEN n = 1 THEN 10000 "
    "  WHEN n = 2 THEN 5000 "
    "  WHEN rn = 1 OR rn = n THEN 4000 "
    "  WHEN rn = 2 THEN (2000 // (n - 2)) + (2000 % (n - 2)) "
    "  ELSE 2000 // (n - 2) END::BIGINT AS bp FROM r) "
    "SELECT channel, count(*)::BIGINT AS n_touches, "
    "count(DISTINCT p_id)::BIGINT AS n_conversions, "
    "round(sum(bp) / 10000.0, 4) AS credit "
    "FROM c GROUP BY channel"
)


def q_behavior_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting — the new/retained/resurrected/churned
    weekly user ledger every growth team reports: a user active in
    week w is NEW (first-ever active week), RETAINED (also active in
    w−1) or RESURRECTED (active before, but not in w−1); CHURNED at
    w counts users active in w−1 but not w — identically
    active(w−1) − retained(w), so it needs no per-user anti-join.
    Reported over the DENSE weekly calendar (a week with zero
    activity still shows its churn).

    Scale: one (user, week) dedup agg, one per-USER lag window, one
    weekly hash agg — the event log shuffles once on user_id, never
    self-joins. The dense-grid join and the churn lag ride the
    O(#weeks) calendar axis (q_ts_gapfill contract), and the 1-row
    min/max bounds agg is the documented calendar class."""
    e = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    aw = e.distinct()
    wu = Window.partitionBy("user_id").orderBy("week")
    classed = aw.withColumn("prev", F.lag("week").over(wu)).select(
        "week",
        F.when(F.col("prev").isNull(), "new")
        .when(
            F.col("prev") == F.col("week") - F.expr("INTERVAL 7 DAYS"),
            "retained",
        )
        .otherwise("resurrected")
        .alias("status"),
    )
    weekly = classed.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum((F.col("status") == "new").cast("long")).alias("n_new"),
        F.sum((F.col("status") == "retained").cast("long")).alias(
            "n_retained"
        ),
        F.sum((F.col("status") == "resurrected").cast("long")).alias(
            "n_resurrected"
        ),
    )
    bounds = weekly.agg(F.min("week").alias("w0"), F.max("week").alias("w1"))
    grid = bounds.select(
        F.explode(
            F.sequence("w0", "w1", F.expr("INTERVAL 7 DAYS"))
        ).alias("week")
    )
    dense = grid.join(weekly, "week", "left").select(
        "week",
        *[
            F.coalesce(c, F.lit(0)).cast("long").alias(c)
            for c in ("n_active", "n_new", "n_retained", "n_resurrected")
        ],
    )
    wcal = Window.orderBy("week")
    return dense.select(
        F.unix_timestamp("week").alias("week_epoch"),
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(
            F.lag("n_active").over(wcal) - F.col("n_retained"), F.lit(0)
        )
        .cast("long")
        .alias("n_churned"),
    )


QUERIES["q_behavior_lifecycle"] = q_behavior_lifecycle

ORACLE["q_behavior_lifecycle"] = (
    "WITH aw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week "
    "  FROM events), "
    "cl AS (SELECT week, CASE "
    "  WHEN prev IS NULL THEN 'new' "
    "  WHEN prev = week - INTERVAL 7 DAY THEN 'retained' "
    "  ELSE 'resurrected' END AS status FROM "
    "  (SELECT week, lag(week) OVER (PARTITION BY user_id ORDER BY week) "
    "   AS prev FROM aw)), "
    "weekly AS (SELECT week, count(*)::BIGINT AS n_active, "
    "  sum((status = 'new')::INT)::BIGINT AS n_new, "
    "  sum((status = 'retained')::INT)::BIGINT AS n_retained, "
    "  sum((status = 'resurrected')::INT)::BIGINT AS n_resurrected "
    "  FROM cl GROUP BY week), "
    "bnd AS (SELECT min(week) AS w0, max(week) AS w1 FROM weekly), "
    "grid AS (SELECT unnest(generate_series(w0, w1, INTERVAL 7 DAY)) "
    "  AS week FROM bnd), "
    "dense AS (SELECT grid.week, coalesce(n_active, 0)::BIGINT AS n_active, "
    "  coalesce(n_new, 0)::BIGINT AS n_new, "
    "  coalesce(n_retained, 0)::BIGINT AS n_retained, "
    "  coalesce(n_resurrected, 0)::BIGINT AS n_resurrected "
    "  FROM grid LEFT JOIN weekly ON grid.week = weekly.week) "
    "SELECT epoch(week)::BIGINT AS week_epoch, n_active, n_new, "
    "n_retained, n_resurrected, "
    "coalesce(lag(n_active) OVER (ORDER BY week) - n_retained, 0)::BIGINT "
    "  AS n_churned "
    "FROM dense"
)


#: Markov stationary-mix fixed-point scales and round count.
_MK_SCALE = 10**12
_MK_PSCALE = 10**6
_MK_ROUNDS = 6
_MK_DAMP = 85  # percent


def q_behavior_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state behavior mix — the stationary distribution of
    the first-order event-type Markov chain (the long-run fraction
    of time a user's journey spends in each state, the summary
    number product teams quote from the q_behavior_transitions
    matrix): 6 damped power-iteration rounds (d = 0.85, the
    PageRank treatment of dangling/absorbing states) over the
    transition-probability matrix.

    Cross-engine exactness — the q_graph_pagerank integer
    fixed-point contract, two scales deep: transition probabilities
    are quantized ONCE to ``p_ij = (n_ij·10⁶) DIV n_i`` BIGINTs, and
    each round computes ``rank' = base + 85%·Σ (rank·p_ij DIV 10⁶)``
    in pure BIGINT (max product 10¹²·10⁶ < 2⁶³ — the overflow-proof
    order; multiplying rank by raw n_ij first would overflow at
    ~10⁷ events). Both engines run the identical recurrence, so the
    final ×10⁻¹² round-6 is bit-stable.

    Scale: ONE shuffle of the event log (the per-user lead window),
    then everything lives on the |event types|² matrix — a
    broadcast-size frame at any corpus size; the 1-row state-count
    agg is the documented tiny-frame class."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"),
            F.col("next_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    deg = trans.groupBy("src").agg(F.sum("n").alias("out"))
    edges = trans.join(deg, "src").select(
        "src",
        "dst",
        F.expr(f"(n * {_MK_PSCALE}) DIV out").alias("p"),
    ).localCheckpoint()
    states = (
        edges.select(F.col("src").alias("state"))
        .union(edges.select(F.col("dst").alias("state")))
        .distinct()
        .localCheckpoint()
    )
    n_states = states.agg(F.count(F.lit(1)).alias("ns"))
    rank = states.crossJoin(F.broadcast(n_states)).select(
        "state", F.expr(f"{_MK_SCALE} DIV ns").alias("r"), "ns"
    )
    for _ in range(_MK_ROUNDS):
        flow = (
            edges.join(rank, edges.src == rank.state)
            .groupBy("dst")
            .agg(
                F.sum(F.expr(f"(r * p) DIV {_MK_PSCALE}")).alias("inflow")
            )
        )
        rank = (
            rank.select("state", "ns")
            .join(flow, rank.state == flow.dst, "left")
            .select(
                "state",
                (
                    F.expr(f"(15 * ({_MK_SCALE} DIV ns)) DIV 100")
                    + F.expr(
                        f"({_MK_DAMP} * coalesce(inflow, 0)) DIV 100"
                    )
                ).alias("r"),
                "ns",
            )
        )
    return rank.select(
        F.col("state").alias("event_type"),
        F.round(F.col("r") / F.lit(float(_MK_SCALE)), 6).alias("pi"),
    )


QUERIES["q_behavior_markov_stationary"] = q_behavior_markov_stationary


def _markov_sql() -> str:
    rounds = []
    prev = "r0"
    for t in range(1, _MK_ROUNDS + 1):
        rounds.append(
            f"r{t} AS MATERIALIZED (SELECT s.state, "
            f"(15 * ({_MK_SCALE} // ns.ns)) // 100 + "
            f"({_MK_DAMP} * coalesce(f.inflow, 0)) // 100 AS r "
            "FROM states s CROSS JOIN ns LEFT JOIN ("
            "  SELECT e.dst, sum((p.r * e.p) // "
            f"{_MK_PSCALE})::BIGINT AS inflow "
            f"  FROM edges e JOIN {prev} p ON p.state = e.src "
            "  GROUP BY e.dst) f ON f.dst = s.state)"
        )
        prev = f"r{t}"
    return (
        "WITH trans AS (SELECT event_type AS src, next_type AS dst, "
        "count(*)::BIGINT AS n FROM ("
        "  SELECT user_id, event_type, lead(event_type) OVER "
        "  (PARTITION BY user_id ORDER BY ts, event_id) AS next_type "
        "  FROM events) WHERE next_type IS NOT NULL GROUP BY 1, 2), "
        "deg AS (SELECT src, sum(n)::BIGINT AS out FROM trans GROUP BY src), "
        "edges AS MATERIALIZED (SELECT trans.src, trans.dst, "
        f"(trans.n * {_MK_PSCALE}) // deg.out AS p "
        "FROM trans JOIN deg USING (src)), "
        "states AS (SELECT DISTINCT src AS state FROM edges "
        "UNION SELECT DISTINCT dst FROM edges), "
        "ns AS (SELECT count(*)::BIGINT AS ns FROM states), "
        f"r0 AS (SELECT state, {_MK_SCALE} // ns.ns AS r "
        "FROM states CROSS JOIN ns), "
        + ", ".join(rounds)
        + f" SELECT state AS event_type, round(r / {float(_MK_SCALE)!r}, 6) "
        f"AS pi FROM {prev}"
    )


ORACLE["q_behavior_markov_stationary"] = _markov_sql()


def q_behavior_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion survival (Kaplan & Meier
    1958 — the right-censored estimator product teams fit when not
    every subject has converted by the end of follow-up): the event
    is a user's FIRST purchase, the clock starts at their first
    event, follow-up is administratively truncated at a fixed
    48-hour horizon — users whose first purchase lands at or past
    the horizon are CENSORED there (they leave the risk set without
    converting; naive conversion tables silently call them
    non-converters). At each death time t (hours): S(t) *=
    (n_at_risk − n_deaths) / n_at_risk. Output, one row per death
    time: (t_hours, n_at_risk, n_deaths, n_censored, log_surv).

    Determinism contract: elapsed hours are exact integer
    microsecond arithmetic (unix_micros DIV 3.6e9 — never the
    boundary-crossing date_diff semantics, which disagree between
    engines); per-step −ln terms are fixed-point (round 6, ×1e6,
    BIGINT) BEFORE the cumulative sum (the q_text_unigram_logprob
    convention); log_surv is the exact integer sum ÷ 1e6 — one
    final division, so both engines hash identical doubles. The
    S(t) = 0 step (risk set exhausted, only possible at the last
    death time) emits NULL.

    Scale: ONE user_id hash agg builds both clocks (min ts and
    conditional min purchase ts in the same pass); the per-hour agg
    and the at-risk/cumulative windows ride the O(horizon-hours)
    axis (the q_ts_gapfill calendar-axis contract), never the event
    log; the 1-row totals frame broadcasts."""
    horizon = 48
    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("tp"),
    )
    dh = F.expr("(tp - t0) DIV 3600000000")
    lif = u.select(
        F.when(F.col("tp").isNull() | (dh >= horizon), F.lit(horizon))
        .otherwise(dh)
        .alias("t"),
        (F.col("tp").isNotNull() & (dh < horizon))
        .cast("bigint")
        .alias("death"),
    )
    pt = lif.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_removed"),
        F.sum("death").alias("n_deaths"),
    )
    tot = lif.agg(F.count(F.lit(1)).alias("n_users"))
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    r = pt.crossJoin(F.broadcast(tot)).select(
        "t",
        "n_removed",
        "n_deaths",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_removed").over(wprev), F.lit(0))
        ).alias("n_at_risk"),
    )
    term_fp = (
        F.when(F.col("n_deaths") == 0, F.lit(0))
        .when(F.col("n_at_risk") == F.col("n_deaths"), F.lit(None))
        .otherwise(
            F.floor(
                F.round(
                    F.log(
                        (F.col("n_at_risk") - F.col("n_deaths"))
                        / F.col("n_at_risk")
                    ),
                    6,
                )
                * 1e6
                + F.lit(0.5)
            ).cast("bigint")
        )
    )
    wcum = Window.orderBy("t")
    s = r.withColumn("term_fp", term_fp).withColumn(
        "log_surv",
        F.when(
            F.col("n_at_risk") == F.col("n_deaths"), F.lit(None)
        ).otherwise(F.sum("term_fp").over(wcum) / F.lit(1e6)),
    )
    return s.filter(F.col("n_deaths") > 0).select(
        F.col("t").alias("t_hours"),
        "n_at_risk",
        "n_deaths",
        (F.col("n_removed") - F.col("n_deaths")).alias("n_censored"),
        "log_surv",
    )


QUERIES["q_behavior_survival"] = q_behavior_survival

ORACLE["q_behavior_survival"] = (
    "WITH u AS (SELECT user_id, min(epoch_us(ts))::BIGINT AS t0, "
    "  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)::BIGINT "
    "  AS tp FROM events GROUP BY user_id), "
    "lif AS (SELECT CASE WHEN tp IS NULL OR (tp - t0) // 3600000000 >= 48 "
    "  THEN 48 ELSE (tp - t0) // 3600000000 END AS t, "
    "  (tp IS NOT NULL AND (tp - t0) // 3600000000 < 48)::BIGINT AS death "
    "  FROM u), "
    "pt AS (SELECT t, count(*)::BIGINT AS n_removed, "
    "  sum(death)::BIGINT AS n_deaths FROM lif GROUP BY t), "
    "tot AS (SELECT count(*)::BIGINT AS n_users FROM lif), "
    "r AS (SELECT t, n_removed, n_deaths, "
    "  n_users - coalesce(sum(n_removed) OVER (ORDER BY t "
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk "
    "  FROM pt CROSS JOIN tot), "
    "s AS (SELECT *, CASE WHEN n_deaths = 0 THEN 0 "
    "  WHEN n_at_risk = n_deaths THEN NULL "
    "  ELSE floor(round(ln((n_at_risk - n_deaths)::DOUBLE / n_at_risk), 6) "
    "  * 1e6 + 0.5)::BIGINT END AS term_fp FROM r) "
    "SELECT t::BIGINT AS t_hours, n_at_risk::BIGINT AS n_at_risk, n_deaths, "
    "(n_removed - n_deaths)::BIGINT AS n_censored, "
    "CASE WHEN n_at_risk = n_deaths THEN NULL ELSE "
    "(sum(term_fp) OVER (ORDER BY t))::BIGINT / 1e6 END AS log_surv "
    "FROM s WHERE n_deaths > 0"
)


def q_behavior_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve — the revenue twin of
    ``q_cohort_retention``: users grouped by first-event week; for
    each (cohort, week_offset) the purchase revenue that week, the
    cohort's RUNNING revenue, and the running LTV per cohort member
    (the curve a growth model fits payback periods on).

    Money is exact: ``value`` quantizes ONCE to integer cents
    (floor(v*100 + 0.5) — identical double math in both engines),
    every sum and the cumulative window are pure BIGINT, and the
    per-user LTV divides two integers with DIV (the r13 float-div
    lesson). Scale: one user_id window assigns cohorts, one hash agg
    per (cohort, offset) cell, cohort sizes by one tiny re-agg; the
    cumulative window partitions BY COHORT over the O(#weeks) offset
    axis — parallel across cohorts, never a global sort."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.date_trunc("week", "ts").alias("week"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    w = Window.partitionBy("user_id")
    cohorted = e.withColumn("cohort_week", F.min("week").over(w))
    sizes = cohorted.groupBy("cohort_week").agg(
        F.count_distinct("user_id").alias("cohort_size")
    )
    rev = (
        cohorted.filter(F.col("event_type") == "purchase")
        .groupBy("cohort_week", "week")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
        .withColumn(
            "week_offset",
            F.expr("datediff(week, cohort_week) DIV 7"),
        )
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = rev.join(F.broadcast(sizes), "cohort_week").withColumn(
        "cum_revenue_cents", F.sum("revenue_cents").over(wcum)
    )
    return out.select(
        F.unix_timestamp("cohort_week").alias("cohort_epoch"),
        "week_offset",
        "n_purchases",
        "revenue_cents",
        "cum_revenue_cents",
        "cohort_size",
        F.expr("cum_revenue_cents DIV cohort_size").alias(
            "ltv_cents_per_user"
        ),
    )


QUERIES["q_behavior_cohort_ltv"] = q_behavior_cohort_ltv

ORACLE["q_behavior_cohort_ltv"] = (
    "WITH e AS (SELECT user_id, event_type, "
    "  date_trunc('week', ts) AS week, "
    "  floor(value * 100 + 0.5)::BIGINT AS cents FROM events), "
    "c AS (SELECT *, min(week) OVER (PARTITION BY user_id) AS cohort_week "
    "  FROM e), "
    "sz AS (SELECT cohort_week, count(DISTINCT user_id)::BIGINT AS cohort_size "
    "  FROM c GROUP BY cohort_week), "
    "rev AS (SELECT cohort_week, week, count(*)::BIGINT AS n_purchases, "
    "  sum(cents)::BIGINT AS revenue_cents, "
    "  date_diff('day', cohort_week::DATE, week::DATE) // 7 AS week_offset "
    "  FROM c WHERE event_type = 'purchase' GROUP BY cohort_week, week), "
    "o AS (SELECT rev.*, sz.cohort_size, "
    "  sum(revenue_cents) OVER (PARTITION BY rev.cohort_week "
    "  ORDER BY week_offset ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "  CURRENT ROW)::BIGINT AS cum_revenue_cents "
    "  FROM rev JOIN sz USING (cohort_week)) "
    "SELECT epoch(cohort_week)::BIGINT AS cohort_epoch, "
    "week_offset::BIGINT AS week_offset, n_purchases, revenue_cents, "
    "cum_revenue_cents, cohort_size, "
    "(cum_revenue_cents // cohort_size)::BIGINT AS ltv_cents_per_user FROM o"
)
