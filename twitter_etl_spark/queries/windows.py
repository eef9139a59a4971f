"""Window-function operators (SURVEY.md §2.4 [EXT]).

Exact-arithmetic discipline: running/moving sums accumulate
``CAST(x AS DECIMAL(18,2))`` — casting a *raw stored double* to
decimal is deterministic across engines (no stored double sits
exactly on a .xx5 boundary), and decimal accumulation is exact, so
per-row cumulative results hash-match without rounding lotteries.
Averages are emitted as exact-decimal sum / count (double division
of identical operands). Every window order is a total order
(tie-break on the unique key).

Scale: each window is one shuffle on its partition key; none of
these sorts globally except where the operator's semantics require
it (ntile/global ranks), which is flagged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

_DEC = "decimal(18,2)"


def q_win_rownumber(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sequence numbers."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", F.row_number().over(w).alias("seq")
    )


def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank of customers by balance within segment."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance quartiles (global window — a deliberate single-sort
    operator; at scale you shard ntile by a partition column)."""
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select("c_custkey", F.ntile(4).over(w).alias("quartile"))


def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous/next event values and inter-event gap."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1).over(w)).alias(
            "gap_us"
        ),
    )


def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user spend (exact decimal accumulation)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("running_value"),
    )


def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row sliding window: moving sum + moving average."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    msum = F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
    mcnt = F.count(F.lit(1)).over(w)
    return e.select(
        "event_id",
        "user_id",
        msum.alias("moving_sum"),
        (msum / mcnt).alias("moving_avg"),
    )


def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric order: peers within 100.00 below
    each customer's balance, per segment. Balances are 2-decimal
    values, so the frame runs over exact integer cents (Spark's
    rangeBetween takes integral bounds; cents are also
    cross-engine-exact)."""
    c = table(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100, 0).cast("long")
    )
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("bal_cents")
        .rangeBetween(-10000, Window.currentRow)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.count(F.lit(1)).over(w).alias("peers_within_100"),
    )


def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer (rank-filter pattern — the scalable
    top-k: per-key heap in the window sort, no global sort)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


QUERIES = {
    "q_win_rownumber": q_win_rownumber,
    "q_win_rank": q_win_rank,
    "q_win_ntile": q_win_ntile,
    "q_win_lag_lead": q_win_lag_lead,
    "q_win_running": q_win_running,
    "q_win_moving": q_win_moving,
    "q_win_range_frame": q_win_range_frame,
    "q_topk_pergroup": q_topk_pergroup,
}

ORACLE = {
    "q_win_rownumber": (
        "SELECT event_id, user_id, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq "
        "FROM events"
    ),
    "q_win_rank": (
        "SELECT c_custkey, c_mktsegment, "
        "rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_rank, "
        "dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS bal_dense_rank "
        "FROM customer"
    ),
    "q_win_ntile": (
        "SELECT c_custkey, "
        "ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile "
        "FROM customer"
    ),
    "q_win_lag_lead": (
        "SELECT event_id, user_id, "
        "lag(value, 1) OVER w AS prev_value, "
        "lead(value, 1) OVER w AS next_value, "
        "epoch_us(ts)::BIGINT - lag(epoch_us(ts)::BIGINT, 1) OVER w AS gap_us "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
    "q_win_running": (
        "SELECT event_id, user_id, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) OVER ("
        "  PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "AS running_value FROM events"
    ),
    "q_win_moving": (
        "SELECT event_id, user_id, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS moving_sum, "
        "CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) "
        "  / count(*) OVER w AS moving_avg "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
    ),
    "q_win_range_frame": (
        "SELECT c_custkey, c_mktsegment, "
        "count(*) OVER (PARTITION BY c_mktsegment ORDER BY "
        "CAST(round(c_acctbal * 100, 0) AS BIGINT) "
        "RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)::BIGINT "
        "AS peers_within_100 FROM customer"
    ),
    "q_topk_pergroup": (
        "SELECT o_custkey, o_orderkey, o_totalprice, rk FROM ("
        "  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER ("
        "    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk "
        "  FROM orders) WHERE rk <= 2"
    ),
}


def q_win_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over balances per segment (relative
    standing — distribution-shape window functions)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


QUERIES["q_win_pctrank"] = q_win_pctrank
ORACLE["q_win_pctrank"] = (
    "SELECT c_custkey, c_mktsegment, "
    "round(percent_rank() OVER w, 6) AS pct_rank, "
    "round(cume_dist() OVER w, 6) AS cume "
    "FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)"
)


def q_win_ntile_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance quartiles WITHIN each market segment — the sharded
    ntile that :func:`q_win_ntile`'s docstring promises for scale.
    The window partitions on ``c_mktsegment``, so the sort is one
    hash-partitioned exchange with per-shard parallel sorts — no
    SinglePartition exchange anywhere in the plan
    (tests/test_plans.py pins this). Use this form whenever a
    business shard key exists; reserve the global form for frames
    already reduced to driver-scale."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
    )


QUERIES["q_win_ntile_sharded"] = q_win_ntile_sharded
ORACLE["q_win_ntile_sharded"] = (
    "SELECT c_custkey, c_mktsegment, "
    "ntile(4) OVER (PARTITION BY c_mktsegment "
    "ORDER BY c_acctbal DESC, c_custkey) AS quartile "
    "FROM customer"
)


def q_win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / first_value over a full-partition frame: each
    customer sees its segment's top and 2nd-highest balance (the
    window-function family's last uncovered classic). Frame must be
    UNBOUNDED FOLLOWING for nth_value to see the whole partition;
    ties break on custkey so both engines pick the same row."""
    c = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.first_value("c_acctbal").over(w), 2).alias("top_bal"),
        F.round(F.nth_value("c_acctbal", 2).over(w), 2).alias("second_bal"),
    )


QUERIES["q_win_nth"] = q_win_nth
ORACLE["q_win_nth"] = (
    "SELECT c_custkey, c_mktsegment, "
    "round(first_value(c_acctbal) OVER w, 2) AS top_bal, "
    "round(nth_value(c_acctbal, 2) OVER w, 2) AS second_bal "
    "FROM customer WINDOW w AS (PARTITION BY c_mktsegment "
    "ORDER BY c_acctbal DESC, c_custkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
)
