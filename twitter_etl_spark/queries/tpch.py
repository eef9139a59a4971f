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


QUERIES.update({"q_tpch_q10": q_tpch_q10, "q_tpch_q18": q_tpch_q18})

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
    }
)
