"""Classic TPC-H-shaped benchmark queries adapted to the fixture
schema (FIXTURES.md; the fixtures drop a few TPC-H columns —
``o_shippriority`` -> ``o_orderpriority``, no ``o_comment`` etc.).
These exercise the multi-join + filter + agg + top-k compositions a
warehouse user actually runs, end to end through Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table

_REV = "l_extendedprice * (1 - l_discount)"


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 (shipping priority): unshipped-revenue top-10 orders for
    one segment. Join order left to Catalyst; top-k is
    TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .select(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("orderdate_us"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (local supplier volume): 6-table star join, revenue by
    nation where customer and supplier are co-national. Dims
    broadcast; fact joins shuffle on their keys."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 (forecast revenue change): pure filter + global agg — the
    pushdown/codegen showcase (no shuffle beyond the final reduce)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


QUERIES = {
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q5": q_tpch_q5,
    "q_tpch_q6": q_tpch_q6,
}

ORACLE = {
    "q_tpch_q3": (
        "SELECT l_orderkey, epoch_us(o_orderdate)::BIGINT AS orderdate_us, "
        "o_orderpriority, round(sum(" + _REV + "), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "AND l_shipdate > TIMESTAMP '1998-01-01' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    "q_tpch_q5": (
        "SELECT n_name, round(sum(" + _REV + "), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' GROUP BY n_name"
    ),
    "q_tpch_q6": (
        "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, "
        "count(*)::BIGINT AS n_rows FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount BETWEEN 0.03 AND 0.07 "
        "AND l_quantity < 24"
    ),
}


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 (returned-item reporting, adapted): revenue lost to
    returns per customer, top-20. 4-table join; nation broadcast."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 (large-volume customers, adapted): orders whose total
    quantity exceeds a threshold — agg-filter (HAVING via semi-join
    shape) then enrich + top-k."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("orderdate_us"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("l_orderkey"))
        .limit(100)
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 (pricing summary report): the canonical wide-aggregate scan
    — one pass, map-side partial aggregation into 4 groups, no join.
    Sums rounded at 2, averages at 4 (SURVEY §5.3 float policy)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "2001-09-01"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(charge), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (order priority checking), adapted to the fixture schema:
    no l_commitdate/l_receiptdate, so "late" = at least one lineitem
    shipped more than 60 days after the order date. The shape is the
    point: an EXISTS correlated on both join key AND a cross-table
    inequality, planned as a left-semi hash join — never a
    subquery-per-row."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 (shipping-mode priority classes), adapted: the fixture has
    no l_shipmode, so lines group by l_linestatus instead; the query
    keeps Q12's essence — join + CASE-conditional counts of
    high/low-priority orders among lines shipped in a window."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 (promotion effect): percentage of one ship-month's revenue
    from PROMO parts. The part dim is broadcast (pruned to the two
    columns used) — the fact side never shuffles."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(100.0 * F.sum(promo_rev) / F.sum(rev), 4).alias("promo_revenue_pct"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 (discounted revenue, disjunctive predicates), adapted: no
    p_container/l_shipmode in the fixture, so the three OR-branches
    pair brand with size and quantity bands. The planner test rides
    on the disjunction: per-side conjuncts (p_brand/p_size vs
    l_quantity) must still push to their respective scans, with the
    residual OR evaluated after the broadcast join."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


QUERIES.update(
    {
        "q_tpch_q10": q_tpch_q10,
        "q_tpch_q18": q_tpch_q18,
        "q_tpch_q1": q_tpch_q1,
        "q_tpch_q4": q_tpch_q4,
        "q_tpch_q12": q_tpch_q12,
        "q_tpch_q14": q_tpch_q14,
        "q_tpch_q19": q_tpch_q19,
    }
)

ORACLE.update(
    {
        "q_tpch_q10": (
            "SELECT c_custkey, c_name, n_name, round(sum(" + _REV + "), 2) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE l_returnflag = 'R' "
            "GROUP BY c_custkey, c_name, n_name "
            "ORDER BY revenue DESC, c_custkey LIMIT 20"
        ),
        "q_tpch_q18": (
            "WITH big AS ("
            "  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty "
            "  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 300) "
            "SELECT c_custkey, c_name, l_orderkey, "
            "epoch_us(o_orderdate)::BIGINT AS orderdate_us, o_totalprice, total_qty "
            "FROM big JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "ORDER BY o_totalprice DESC, l_orderkey LIMIT 100"
        ),
        "q_tpch_q1": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base_price, "
            "round(sum(" + _REV + "), 2) AS sum_disc_price, "
            "round(sum(" + _REV + " * (1 + l_tax)), 2) AS sum_charge, "
            "round(avg(l_quantity), 4) AS avg_qty, "
            "round(avg(l_extendedprice), 4) AS avg_price, "
            "round(avg(l_discount), 4) AS avg_disc, "
            "count(*)::BIGINT AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "q_tpch_q4": (
            "SELECT o_orderpriority, count(*)::BIGINT AS order_count "
            "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            "  WHERE l_orderkey = o_orderkey "
            "  AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY o_orderpriority"
        ),
        "q_tpch_q12": (
            # sum(BIGINT) -> HUGEINT -> pandas float64: cast
            "SELECT l_linestatus, "
            "sum((o_orderpriority IN ('1-URGENT', '2-HIGH'))::BIGINT)::BIGINT "
            "AS high_line_count, "
            "sum((o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))::BIGINT)::BIGINT "
            "AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY l_linestatus"
        ),
        "q_tpch_q14": (
            "SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' "
            "THEN " + _REV + " ELSE 0.0 END) / sum(" + _REV + "), 4) "
            "AS promo_revenue_pct, "
            "round(sum(" + _REV + "), 2) AS total_revenue "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-03-01' "
            "AND l_shipdate < TIMESTAMP '1997-04-01'"
        ),
        "q_tpch_q19": (
            "SELECT round(sum(" + _REV + "), 2) AS revenue, "
            "count(*)::BIGINT AS n_lines "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
            "       AND l_quantity BETWEEN 1 AND 11) "
            "   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
            "       AND l_quantity BETWEEN 10 AND 20) "
            "   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 "
            "       AND l_quantity BETWEEN 20 AND 30)"
        ),
    }
)
