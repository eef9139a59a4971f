"""Sort / limit / set operators (SURVEY.md §2.4 [EXT]).

Every LIMIT carries a total order (unique tie-break key) so the
result set is deterministic across engines (SURVEY.md §5.3).
``orderBy().limit(k)`` compiles to TakeOrderedAndProject — per-
partition top-k heaps + a k-row driver merge, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table


def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort (asc + desc + nulls-last on a computed
    nullable key) with a limit so order is content-observable."""
    o = table(spark, sf_dir, "orders")
    return (
        o.withColumn("prio", F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")))
        .orderBy(
            F.col("prio").asc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(100)
        .select("o_orderkey", "prio", "o_totalprice")
    )


def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject; no full sort)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two selections (no dedup shuffle)."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "event_type", "user_id")
    errors = e.filter(F.col("event_type") == "error").select("event_id", "event_type", "user_id")
    return clicks.unionByName(errors)


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: customers with F-status or O-status orders."""
    o = table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.union(o_cust).distinct()


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection: customers with BOTH F and O orders."""
    o = table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.intersect(o_cust)


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers with F orders but no O orders."""
    o = table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.subtract(o_cust)


QUERIES = {
    "q_sort_multi": q_sort_multi,
    "q_limit_topk": q_limit_topk,
    "q_union_all": q_union_all,
    "q_union_distinct": q_union_distinct,
    "q_intersect": q_intersect,
    "q_except": q_except,
}

ORACLE = {
    "q_sort_multi": (
        "SELECT o_orderkey, prio, o_totalprice FROM ("
        "  SELECT o_orderkey, nullif(o_orderpriority, '5-LOW') AS prio, o_totalprice "
        "  FROM orders) "
        "ORDER BY prio ASC NULLS LAST, o_totalprice DESC, o_orderkey LIMIT 100"
    ),
    "q_limit_topk": (
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"
    ),
    "q_union_all": (
        "SELECT event_id, event_type, user_id FROM events WHERE event_type = 'click' "
        "UNION ALL "
        "SELECT event_id, event_type, user_id FROM events WHERE event_type = 'error'"
    ),
    "q_union_distinct": (
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
        "UNION "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
    ),
    "q_intersect": (
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
        "INTERSECT "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
    ),
    "q_except": (
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
        "EXCEPT "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
    ),
}
