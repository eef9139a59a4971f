"""Aggregation operators (SURVEY.md §2.4 [EXT]).

Float discipline for oracle parity (SURVEY.md §5.3): every
aggregate over computed doubles is rounded on BOTH sides; Spark and
DuckDB both run partial (map-side) + final aggregation, so sums over
doubles can differ in the last ulps — round(2) for price sums,
round(4) for averages. Counts and min/max are exact. All partial
aggregation is automatic (hash aggregate with map-side combine),
which is exactly the shape that scales: per-group state, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import register_views, table
from .tpch import _money_fp


def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate over lineitem (single-row result;
    partial agg on every partition, one tiny final reduce)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.unix_micros(F.min("l_shipdate")).alias("first_ship_us"),
        F.unix_micros(F.max("l_shipdate")).alias("last_ship_us"),
    )


def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary by returnflag + linestatus."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(_money_fp(F.col("l_extendedprice"))) / 10_000.0, 2).alias("sum_base_price"),
            F.round(F.sum(_money_fp(disc_price)) / 10_000.0, 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )


def q_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates in one pass (Catalyst expands to a
    single multi-distinct plan)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate count-distinct (rows-only: sketches are not
    DuckDB-comparable; correctness pinned by the exact-distinct twin
    q_agg_distinct plus a pytest tolerance check)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("n_users_approx")
    )


def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the t-digest-style sketch
    (rows-only: sketch internals are engine-specific; correctness
    pinned by the exact twin q_agg_percentile plus a pytest
    tolerance check). The sketch is mergeable, so the aggregation
    stays one pass with map-side partials — the only percentile
    form that scales to 100 TB groups (exact percentile needs a
    per-group sort)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.approx_percentile("c_acctbal", F.lit(0.5), F.lit(10000)).alias(
            "median_bal_approx"
        ),
        F.approx_percentile("c_acctbal", F.lit(0.9), F.lit(10000)).alias(
            "p90_bal_approx"
        ),
    )


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy subtotals region -> nation over customer accounts."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum(_money_fp(F.col("c_acctbal"))) / 10_000.0, 2).alias("sum_acctbal"),
    )


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations of segment x priority."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    return joined.cube("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(_money_fp(F.col("o_totalprice"))) / 10_000.0, 2).alias("revenue"),
    )


def q_agg_groupingsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping-set list via the SQL surface."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderstatus,
               count(1) AS n_orders,
               round(sum(floor(round(o_totalprice, 9) * 10000 + 0.5)) / CAST(10000.0 AS DOUBLE), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
        """
    )


def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter: prolific customers only."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_money_fp(F.col("o_totalprice"))) / 10_000.0, 2).alias("revenue"),
        )
        .filter(F.col("n_orders") >= 14)
    )


def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-array per group, sorted for determinism."""
    s = table(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        # joined string: hash-stable across result-fetch layers
        F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("suppliers")
    ).withColumnRenamed("s_nationkey", "nationkey")


QUERIES = {
    "q_agg_global": q_agg_global,
    "q_agg_groupby": q_agg_groupby,
    "q_agg_distinct": q_agg_distinct,
    "q_agg_multi_distinct": q_agg_multi_distinct,
    "q_agg_approx_distinct": q_agg_approx_distinct,  # rows-only
    "q_agg_approx_percentile": q_agg_approx_percentile,  # rows-only
    "q_agg_rollup": q_agg_rollup,
    "q_agg_cube": q_agg_cube,
    "q_agg_groupingsets": q_agg_groupingsets,
    "q_agg_having": q_agg_having,
    "q_agg_collect": q_agg_collect,
}

ORACLE = {
    "q_agg_global": (
        "SELECT count(*)::BIGINT AS n_rows, round(sum(l_quantity), 2) AS sum_qty, "
        "round(avg(l_extendedprice), 4) AS avg_price, "
        "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, "
        "epoch_us(min(l_shipdate))::BIGINT AS first_ship_us, "
        "epoch_us(max(l_shipdate))::BIGINT AS last_ship_us "
        "FROM lineitem"
    ),
    "q_agg_groupby": (
        "SELECT l_returnflag, l_linestatus, "
        "round(sum(l_quantity), 2) AS sum_qty, "
        "round(sum(floor(round(l_extendedprice, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS sum_base_price, "
        "round(sum(floor(round(l_extendedprice * (1 - l_discount), 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS sum_disc_price, "
        "round(avg(l_quantity), 4) AS avg_qty, "
        "round(avg(l_extendedprice), 4) AS avg_price, "
        "round(avg(l_discount), 4) AS avg_disc, "
        "count(*)::BIGINT AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "q_agg_distinct": (
        "SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users "
        "FROM events GROUP BY event_type"
    ),
    "q_agg_multi_distinct": (
        "SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users, "
        "count(DISTINCT CAST(ts AS DATE))::BIGINT AS n_days, "
        "count(*)::BIGINT AS n_events "
        "FROM events GROUP BY event_type"
    ),
    "q_agg_rollup": (
        "SELECT r_name, n_name, count(*)::BIGINT AS n_customers, "
        "round(sum(floor(round(c_acctbal, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS sum_acctbal "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY ROLLUP (r_name, n_name)"
    ),
    "q_agg_cube": (
        "SELECT c_mktsegment, o_orderpriority, count(*)::BIGINT AS n_orders, "
        "round(sum(floor(round(o_totalprice, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY CUBE (c_mktsegment, o_orderpriority)"
    ),
    "q_agg_groupingsets": (
        "SELECT c_mktsegment, o_orderstatus, count(*)::BIGINT AS n_orders, "
        "round(sum(floor(round(o_totalprice, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())"
    ),
    "q_agg_having": (
        "SELECT o_custkey, count(*)::BIGINT AS n_orders, "
        "round(sum(floor(round(o_totalprice, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue "
        "FROM orders GROUP BY o_custkey HAVING count(*) >= 14"
    ),
    "q_agg_collect": (
        "SELECT s_nationkey AS nationkey, "
        "array_to_string(array_agg(s_name ORDER BY s_name), ',') AS suppliers "
        "FROM supplier GROUP BY s_nationkey"
    ),
}


def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping_id(): the bitmask that tells a rollup NULL
    ("all segments") apart from a data NULL — without it, cube
    consumers cannot distinguish subtotal rows from null-keyed
    groups. One expand + hash agg, same cost as the plain cube."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    return (
        j.cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping_id("c_mktsegment", "o_orderstatus").alias("gid"),
            F.grouping("c_mktsegment").alias("g_seg"),
        )
    )


QUERIES["q_agg_grouping_id"] = q_agg_grouping_id
ORACLE["q_agg_grouping_id"] = (
    "SELECT c_mktsegment, o_orderstatus, count(*)::BIGINT AS n, "
    "grouping(c_mktsegment, o_orderstatus)::BIGINT AS gid, "
    "grouping(c_mktsegment)::BIGINT AS g_seg "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "GROUP BY CUBE (c_mktsegment, o_orderstatus)"
)
