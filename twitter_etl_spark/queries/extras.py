"""Breadth extensions beyond the core SURVEY §2 rows: date-range
join, pivot, UDTF-surface posexplode, correlated subquery
(decorrelation), and salted skew-safe aggregation — each with a
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..skew import salted_join, salted_sum
from ..tables import register_views, table
from .tpch import _money_fp
from .dedup import q_dedup_simhash_pairs


def q_join_rangedate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + date-range join: lineitems shipped within 30 days of
    their order's date; per-priority shipping stats. The orderkey
    anchor keeps this a hash join with a range post-filter."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    joined = li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(F.avg(F.datediff("l_shipdate", "o_orderdate")), 4).alias("avg_ship_days"),
    )


def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns per market segment (explicit
    pivot values — no extra distinct-discovery pass)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum(_money_fp(F.col("o_totalprice"))) / 10_000.0, 2))
    )


def q_fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF surface (SURVEY.md §2.7): positional explode of the
    token array — one output row per (doc, position, token)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select("doc_id", F.posexplode(toks).alias("pos", "token"))


def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates to a join):
    customers above their nation's average balance."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT avg(c_acctbal) FROM customer i
            WHERE i.c_nationkey = c.c_nationkey)
        """
    )


def q_agg_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage salted sum per customer (equals the plain
    group-by; the salt spreads hot keys across reducers)."""
    o = table(spark, sf_dir, "orders")
    out = salted_sum(
        o,
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)"),
        out_name="revenue_dec",
    )
    return out.select(
        "o_custkey", F.round(F.col("revenue_dec").cast("double"), 2).alias("revenue")
    )


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi join (orders x customer on custkey,
    salt 8): identical result to the plain join — the oracle IS the
    plain join — with the hot-key work spread over 8 reducers."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joined = salted_join(o, c, "o_custkey", "c_custkey", n_salt=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).alias(
            "revenue"
        ),
    )


def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90) per market segment — Spark
    ``percentile`` and DuckDB ``quantile_cont`` share linear
    interpolation semantics."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("median_bal"),
        F.round(F.percentile("c_acctbal", F.lit(0.9)), 4).alias("p90_bal"),
        F.count(F.lit(1)).alias("n"),
    )


def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregates: richest and poorest customer per nation —
    single hash-agg pass, no window sort. Implemented as max/min of
    a (balance, key) struct rather than bare max_by/min_by: bare
    argmax is NONDETERMINISTIC under value ties (the sf1 decade-up
    drill surfaced this — replicated balances tie and Spark/DuckDB
    then pick different custkeys), while the struct order makes the
    tie-break part of the semantics: smallest custkey wins (the
    balance is negated on the max side so the lexicographic struct
    max prefers the smaller key)."""
    c = table(spark, sf_dir, "customer")
    richest = F.max(
        F.struct(
            F.col("c_acctbal").alias("b"), (-F.col("c_custkey")).alias("k")
        )
    )
    poorest = F.min(
        F.struct(F.col("c_acctbal").alias("b"), F.col("c_custkey").alias("k"))
    )
    return c.groupBy("c_nationkey").agg(
        (-richest["k"]).alias("richest_cust"),
        poorest["k"].alias("poorest_cust"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` ≡ SQL ``IS NOT DISTINCT
    FROM``): NULL keys match each other instead of vanishing — the
    semantics NULL-able dimension keys need. Key is
    ``nullif(n_regionkey, 0)`` so the fixture actually exercises the
    NULL-matches-NULL branch. Still a hash join: null-safe equality
    is a valid equi key (nulls hash to one bucket)."""
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.expr("nullif(n_regionkey, 0)").alias("rk")
    )
    a = n.select(F.col("n_nationkey").alias("nk_a"), F.col("rk").alias("rk_a"))
    b = n.select(F.col("n_nationkey").alias("nk_b"), F.col("rk").alias("rk_b"))
    return (
        a.join(b, a["rk_a"].eqNullSafe(b["rk_b"]) & (a["nk_a"] < b["nk_b"]))
        .select(
            "nk_a",
            "nk_b",
            F.coalesce("rk_a", F.lit(-1)).alias("region_or_null"),
        )
    )


QUERIES = {
    "q_agg_percentile": q_agg_percentile,
    "q_agg_argmax": q_agg_argmax,
    "q_join_nullsafe": q_join_nullsafe,
    "q_join_rangedate": q_join_rangedate,
    "q_agg_pivot": q_agg_pivot,
    "q_fn_posexplode": q_fn_posexplode,
    "q_subquery_correlated": q_subquery_correlated,
    "q_agg_salted_sum": q_agg_salted_sum,
    "q_join_salted": q_join_salted,
    "q_dedup_simhash_pairs": q_dedup_simhash_pairs,  # rows-only
}

ORACLE = {
    "q_join_nullsafe": (
        "WITH n AS (SELECT n_nationkey, nullif(n_regionkey, 0) AS rk "
        "           FROM nation) "
        "SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b, "
        "coalesce(a.rk, -1) AS region_or_null "
        "FROM n a JOIN n b ON a.rk IS NOT DISTINCT FROM b.rk "
        "AND a.n_nationkey < b.n_nationkey"
    ),
    "q_join_salted": (
        "SELECT c_mktsegment, count(*)::BIGINT AS n_orders, "
        "round(sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE, 2) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment"
    ),
    "q_agg_percentile": (
        "SELECT c_mktsegment, "
        "round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal, "
        "round(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal, "
        "count(*)::BIGINT AS n "
        "FROM customer GROUP BY c_mktsegment"
    ),
    # struct-ordered argmax: smallest custkey wins balance ties on
    # both engines (bare arg_max/max_by is tie-nondeterministic)
    "q_agg_argmax": (
        "SELECT c_nationkey, "
        "-((max({'b': c_acctbal, 'k': -c_custkey})).k) AS richest_cust, "
        "(min({'b': c_acctbal, 'k': c_custkey})).k AS poorest_cust, "
        "round(max(c_acctbal), 2) AS max_bal "
        "FROM customer GROUP BY c_nationkey"
    ),
    "q_join_rangedate": (
        "SELECT o_orderpriority, count(*)::BIGINT AS n_lineitems, "
        "round(avg(date_diff('day', CAST(o_orderdate AS DATE), "
        "                    CAST(l_shipdate AS DATE))), 4) AS avg_ship_days "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "AND l_shipdate >= o_orderdate "
        "AND l_shipdate <= o_orderdate + INTERVAL 30 DAY "
        "GROUP BY o_orderpriority"
    ),
    "q_agg_pivot": (
        "SELECT c_mktsegment, "
        "round(sum(floor(round(o_totalprice, 9) * 10000 + 0.5)::BIGINT) FILTER (o_orderstatus = 'F') / 10000.0, 2) AS \"F\", "
        "round(sum(floor(round(o_totalprice, 9) * 10000 + 0.5)::BIGINT) FILTER (o_orderstatus = 'O') / 10000.0, 2) AS \"O\", "
        "round(sum(floor(round(o_totalprice, 9) * 10000 + 0.5)::BIGINT) FILTER (o_orderstatus = 'P') / 10000.0, 2) AS \"P\" "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment"
    ),
    "q_fn_posexplode": (
        "SELECT doc_id, "
        "generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) - 1 AS pos, "
        "unnest(string_split_regex(trim(text), '\\s+')) AS token "
        "FROM documents"
    ),
    "q_subquery_correlated": (
        "SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal "
        "FROM customer c WHERE c_acctbal > ("
        "  SELECT avg(c_acctbal) FROM customer i "
        "  WHERE i.c_nationkey = c.c_nationkey)"
    ),
    "q_agg_salted_sum": (
        "SELECT o_custkey, "
        "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue "
        "FROM orders GROUP BY o_custkey"
    ),
}


def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over a running frame per user (the
    full-partition last needs an explicit unbounded frame)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance, correlation,
    covariance (rounded — both engines use numerically different but
    convergent accumulation).

    The corr/covar pair is (l_quantity, l_extendedprice): in the fixture its
    covar_samp is ~1e3 (rounded at 2 decimals → boundary distance ~5e-3 vs
    accumulation noise ~1e-7) and corr is ~3e-3..8e-3 (rounded at 4 → margin
    ~2e-5 vs noise ~1e-11) — both clear the cross-engine float-accumulation
    noise floor by ≥4 orders of magnitude. The previous (l_discount, l_tax)
    pair had covar_samp ~1e-6, the same order as the 6-decimal rounding ULP,
    and flaked the r6 driver cert (SURVEY §5.3 contract: round so summation
    order can't show)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
    )


def q_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window in batch mode (30-minute gap),
    cross-validated against an independent lag+cumsum formulation in
    the oracle: session end = last event + gap."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("s.start")).alias("start_us"),
            F.unix_micros(F.col("s.end")).alias("end_us"),
            "n_events",
        )
    )


QUERIES.update(
    {
        "q_win_firstlast": q_win_firstlast,
        "q_agg_stats": q_agg_stats,
        "q_session_window_batch": q_session_window_batch,
    }
)

ORACLE.update(
    {
        "q_win_firstlast": (
            "SELECT event_id, user_id, "
            "first_value(event_type) OVER w AS first_type, "
            "last_value(event_type) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "q_agg_stats": (
            "SELECT l_returnflag, "
            "round(stddev_samp(l_quantity), 4) AS sd_qty, "
            "round(var_samp(l_quantity), 4) AS var_qty, "
            "round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price, "
            "round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "q_session_window_batch": (
            "WITH gaps AS ("
            "  SELECT user_id, event_id, ts, "
            "         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "tagged AS (SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000 "
            "           THEN 1 ELSE 0 END AS is_new FROM gaps), "
            "sessions AS (SELECT *, sum(is_new) OVER ("
            "  PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM tagged) "
            "SELECT user_id, epoch_us(min(ts))::BIGINT AS start_us, "
            "epoch_us(max(ts))::BIGINT + 1800000000 AS end_us, "
            "count(*)::BIGINT AS n_events "
            "FROM sessions GROUP BY user_id, sid"
        ),
    }
)


def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row median of daily per-type revenue — a robust
    rolling statistic (the moving-average twin that outliers can't
    drag). Daily totals are decimal-exact before the window; the
    median interpolates between two 2-decimal values, rounded at 4."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("DAY", "ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("total", 2).alias("total"),
        F.round(F.percentile("total", F.lit(0.5)).over(w), 4).alias(
            "rolling_median_7d"
        ),
    )


#: histogram bin count for q_agg_histogram.
N_BINS = 20


def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values: pass 1 computes global
    min/max (1-row frame, broadcast), pass 2 bins every row with
    pure arithmetic — the standard distributed histogram plan (no
    shuffle beyond the two tiny aggs). Top edge folds into the last
    bin (least), as numpy.histogram does."""
    e = table(spark, sf_dir, "events").select("value")
    bounds = e.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    step = (F.col("hi") - F.col("lo")) / N_BINS
    bin_ = F.least(
        F.floor((F.col("value") - F.col("lo")) / step), F.lit(N_BINS - 1)
    ).cast("bigint")
    return (
        e.crossJoin(F.broadcast(bounds))
        .select(
            bin_.alias("bin"),
            F.round(F.col("lo") + bin_ * step, 4).alias("bin_lo"),
            F.round(F.col("lo") + (bin_ + 1) * step, 4).alias("bin_hi"),
        )
        .groupBy("bin", "bin_lo", "bin_hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )


QUERIES.update(
    {
        "q_win_rolling_median": q_win_rolling_median,
        "q_agg_histogram": q_agg_histogram,
    }
)

ORACLE.update(
    {
        "q_win_rolling_median": (
            "WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day, "
            "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total "
            "FROM events GROUP BY event_type, date_trunc('day', ts)) "
            "SELECT event_type, strftime(day, '%Y-%m-%d') AS day, "
            "round(total, 2) AS total, "
            "round(quantile_cont(total, 0.5) OVER (PARTITION BY event_type "
            "ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) "
            "AS rolling_median_7d FROM daily"
        ),
        "q_agg_histogram": (
            "WITH b AS (SELECT min(value) AS lo, max(value) AS hi, "
            "(max(value) - min(value)) / 20 AS step FROM events), "
            "binned AS (SELECT least(floor((value - lo) / step), 19)::BIGINT "
            "AS bin, lo, step FROM events CROSS JOIN b) "
            "SELECT bin, round(lo + bin * step, 4) AS bin_lo, "
            "round(lo + (bin + 1) * step, 4) AS bin_hi, "
            "count(*)::BIGINT AS n FROM binned GROUP BY bin, lo, step"
        ),
    }
)


def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI inverse-distribution syntax: ``percentile_disc(...)
    WITHIN GROUP (ORDER BY ...)`` — the DISCRETE percentile (returns
    an actual data value, never an interpolation; what sliced-SLA
    reporting wants). Complements q_agg_percentile's continuous
    form; same single hash-agg cost."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY c_acctbal)"
        ).alias("median_disc"),
        F.expr(
            "percentile_disc(0.9) WITHIN GROUP (ORDER BY c_acctbal)"
        ).alias("p90_disc"),
        F.count(F.lit(1)).alias("n"),
    )


QUERIES["q_agg_percentile_disc"] = q_agg_percentile_disc
ORACLE["q_agg_percentile_disc"] = (
    "SELECT c_mktsegment, "
    "quantile_disc(c_acctbal, 0.5) AS median_disc, "
    "quantile_disc(c_acctbal, 0.9) AS p90_disc, "
    "count(*)::BIGINT AS n "
    "FROM customer GROUP BY c_mktsegment"
)


def q_agg_boolcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregate family: count_if, bool_and,
    bool_or (ANSI EVERY/ANY) per order priority — the predicates a
    monitoring rollup computes without two passes or CASE scaffolds."""
    o = table(spark, sf_dir, "orders")
    big = F.col("o_totalprice") > 200000.0
    return o.groupBy("o_orderpriority").agg(
        F.count_if(big).alias("n_big"),
        F.bool_and(big).alias("all_big"),
        F.bool_or(big).alias("any_big"),
        F.count(F.lit(1)).alias("n"),
    )


QUERIES["q_agg_boolcount"] = q_agg_boolcount
ORACLE["q_agg_boolcount"] = (
    "SELECT o_orderpriority, "
    "count(*) FILTER (WHERE o_totalprice > 200000.0)::BIGINT AS n_big, "
    "bool_and(o_totalprice > 200000.0) AS all_big, "
    "bool_or(o_totalprice > 200000.0) AS any_big, "
    "count(*)::BIGINT AS n "
    "FROM orders GROUP BY o_orderpriority"
)


def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI LISTAGG (Spark 4) with WITHIN GROUP ordering — the
    deterministic string roll-up (collect_list + array_join needs a
    sort step and an array intermediate; LISTAGG is the standard
    one-shot spelling). Ordered, so cross-engine hash-stable."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT n_nationkey, "
        "listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name) AS suppliers, "
        "count(*) AS n FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "GROUP BY n_nationkey"
    )


QUERIES["q_agg_listagg"] = q_agg_listagg
ORACLE["q_agg_listagg"] = (
    "SELECT n_nationkey, "
    "string_agg(s_name, ',' ORDER BY s_name) AS suppliers, "
    "count(*)::BIGINT AS n FROM supplier "
    "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_nationkey"
)


def q_agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL (Spark ≥ 3.5 ``hll_sketch_agg``):
    approximate distinct customers per priority. Rows-only (the
    estimate is engine-specific) — accuracy vs the exact count is
    pinned in pytest, and the BINARY sketch is the mergeable state
    the HLL rollup (rollup.update_hll_rollup) stores: unlike the
    exact bitmap rollup, HLL state is O(k) regardless of key space —
    the unbounded-id regime (user ids at web scale)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").alias(
            "approx_custs"
        ),
        F.count_distinct("o_custkey").alias("exact_custs"),
    )


QUERIES["q_agg_hll_distinct"] = q_agg_hll_distinct  # rows-only


def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: most frequent l_quantity per
    return flag, smallest value on ties. Spark's built-in ``mode()``
    is non-deterministic on ties, so the contractual spelling is
    count + ``max_by`` over the (count, -value) order key — two
    hash-agg shuffles, both with map-side partial aggregation (a
    window/row_number spelling would sort whole partitions instead).
    The tie-break makes the answer engine-independent."""
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    best = F.max_by(
        F.struct(F.col("l_quantity").alias("q"), F.col("n")),
        F.struct(F.col("n"), (-F.col("l_quantity")).alias("negq")),
    )
    return counts.groupBy("l_returnflag").agg(best.alias("b")).select(
        "l_returnflag",
        F.col("b.q").alias("mode_qty"),
        F.col("b.n").alias("n_occurrences"),
    )


QUERIES["q_agg_mode"] = q_agg_mode
ORACLE["q_agg_mode"] = (
    "WITH c AS (SELECT l_returnflag, l_quantity, count(*)::BIGINT AS n "
    "  FROM lineitem GROUP BY 1, 2), "
    "r AS (SELECT *, row_number() OVER ("
    "  PARTITION BY l_returnflag ORDER BY n DESC, l_quantity ASC) AS rn FROM c) "
    "SELECT l_returnflag, l_quantity AS mode_qty, n AS n_occurrences "
    "FROM r WHERE rn = 1"
)


def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shape aggregates (mean / population variance /
    skewness / excess kurtosis) computed from EXACT integer power
    sums — the mergeable distributed-moments form.

    The built-in ``skewness``/``kurtosis`` can't be oracle-certified:
    Spark returns population (g1/g2) statistics while DuckDB applies
    sample-bias corrections, a systematic ~1/n disagreement; and a
    central-moment accumulation over near-symmetric data is exactly
    the near-cancelling class that flaked q_agg_stats in r6. Instead:
    l_quantity is integral (1..50), so Σx..Σx⁴ fit BIGINT exactly
    (50⁴·|group| ≪ 2⁶³) and both engines reduce identical integers —
    merge-order-proof by construction. The moment formulas then run
    on those exact scalars with IDENTICAL expression trees on both
    sides, so the pre-round doubles are bit-equal. One hash agg."""
    li = table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast("bigint")).alias("s1"),
        F.sum((q * q).cast("bigint")).alias("s2"),
        F.sum((q * q * q).cast("bigint")).alias("s3"),
        F.sum((q * q * q * q).cast("bigint")).alias("s4"),
    )
    n = F.col("n")
    m = F.col("s1") * 1.0 / n
    m2 = F.col("s2") * 1.0 / n
    m3 = F.col("s3") * 1.0 / n
    m4 = F.col("s4") * 1.0 / n
    var = m2 - m * m
    # zero-variance guard (constant group): shape statistics are
    # undefined there and the ANSI-mode division would error — found
    # by the Hypothesis fuzz in tests/test_round3_properties.py
    skew = F.when(
        var > 0, (m3 - 3 * m * m2 + 2 * m * m * m) / (var * F.sqrt(var))
    )
    kurt = F.when(
        var > 0,
        (m4 - 4 * m * m3 + 6 * m * m * m2 - 3 * m * m * m * m) / (var * var)
        - 3,
    )
    return g.select(
        "l_returnflag",
        "n",
        F.round(m, 6).alias("mean_qty"),
        F.round(var, 6).alias("var_pop"),
        F.round(skew, 6).alias("skew_pop"),
        F.round(kurt, 6).alias("kurt_pop"),
    )


QUERIES["q_agg_moments"] = q_agg_moments
ORACLE["q_agg_moments"] = (
    "WITH s AS (SELECT l_returnflag, count(*)::BIGINT AS n, "
    "  sum(CAST(l_quantity AS BIGINT)) AS s1, "
    "  sum(CAST(l_quantity * l_quantity AS BIGINT)) AS s2, "
    "  sum(CAST(l_quantity * l_quantity * l_quantity AS BIGINT)) AS s3, "
    "  sum(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS BIGINT)) "
    "    AS s4 "
    "  FROM lineitem GROUP BY 1), "
    "m AS (SELECT l_returnflag, n, s1 * 1.0 / n AS m1, s2 * 1.0 / n AS m2, "
    "  s3 * 1.0 / n AS m3, s4 * 1.0 / n AS m4 FROM s), "
    "v AS (SELECT *, m2 - m1 * m1 AS var FROM m) "
    "SELECT l_returnflag, n, round(m1, 6) AS mean_qty, "
    "round(var, 6) AS var_pop, "
    "round(CASE WHEN var > 0 THEN "
    "  (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / (var * sqrt(var)) END, 6) "
    "  AS skew_pop, "
    "round(CASE WHEN var > 0 THEN "
    "  (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1) "
    "  / (var * var) - 3 END, 6) AS kurt_pop "
    "FROM v"
)


def q_sql_recursive_bom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4) — the SQL-standard iterate-as-
    dataflow surface, exercised as a BOM explosion: part k is a
    component of part floor(k/2) (a synthetic binary assembly tree
    over the real part table), and the recursion walks the tree from
    part 1, reporting per-depth component counts.

    Each recursive step is one join + union under the hood — the
    same shape as the hand-written iterative operators
    (q_graph_pagerank, q_graph_cc_star, q_dedup_cluster), but driven
    by the engine's recursion operator instead of a Python loop;
    depth is O(log |part|) (~11 at sf0.01), so the plan stays
    shallow. Oracle: DuckDB's native recursive CTE."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "WITH RECURSIVE bom AS ("
        "  SELECT p_partkey AS part, 0 AS depth FROM part WHERE p_partkey = 1"
        "  UNION ALL"
        "  SELECT p.p_partkey, b.depth + 1 FROM part p JOIN bom b"
        "    ON CAST(floor(p.p_partkey / 2) AS BIGINT) = b.part) "
        "SELECT depth, count(*) AS n_parts, "
        "min(part) AS min_part, max(part) AS max_part "
        "FROM bom GROUP BY depth"
    )


QUERIES["q_sql_recursive_bom"] = q_sql_recursive_bom
ORACLE["q_sql_recursive_bom"] = (
    "WITH RECURSIVE bom AS ("
    "  SELECT p_partkey AS part, 0 AS depth FROM part WHERE p_partkey = 1"
    "  UNION ALL"
    "  SELECT p.p_partkey, b.depth + 1 FROM part p JOIN bom b"
    "    ON CAST(floor(p.p_partkey / 2) AS BIGINT) = b.part) "
    "SELECT depth, count(*)::BIGINT AS n_parts, "
    "min(part) AS min_part, max(part) AS max_part "
    "FROM bom GROUP BY depth"
)


def q_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 ``|>``): the linear FROM-first query
    form (filter → aggregate → post-filter) that reads in dataflow
    order — semantically identical to the nested-subquery spelling
    the DuckDB oracle states, and Catalyst compiles both to the same
    plan family (one pushed filter, one hash agg, one HAVING)."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "FROM orders "
        "|> WHERE o_totalprice > 100000 "
        "|> AGGREGATE count(*) AS n, round(sum(o_totalprice), 2) AS total "
        "   GROUP BY o_orderpriority "
        "|> WHERE n > 5"
    )


QUERIES["q_sql_pipe"] = q_sql_pipe
ORACLE["q_sql_pipe"] = (
    "SELECT o_orderpriority, count(*)::BIGINT AS n, "
    "round(sum(o_totalprice), 2) AS total "
    "FROM orders WHERE o_totalprice > 100000 "
    "GROUP BY o_orderpriority HAVING count(*) > 5"
)
