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
        .agg(F.round(F.sum(_money_fp(rev)) / 10_000.0, 2).alias("revenue"))
        .select(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("orderdate_us"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def _money_fp(term, scale: int = 10_000):
    """Fixed-point money reduction term: the per-row revenue/profit
    expressions are exact 4-decimal values in real arithmetic (2dp
    prices x 2dp discounts/costs), so `floor(round(x, 9) * 1e4 +
    0.5)` recovers the exact integer of 1e4*x from the
    last-ulp-noisy double and the distributed SUM becomes integer
    math — association-order-proof. Raw double sums passed at
    sf<=0.1 but the sf1 decade-up drill caught q5/q9 one cent apart
    across engines (463797812.94 vs .93): at 10x rows the float
    association noise crosses the 2dp rounding boundary. BIGINT
    ceiling: |sum| < 2^63/1e4 ~ 9.2e14 in money units — ~sf200000
    for Q5 revenue."""
    return F.floor(F.round(term, 9) * scale + F.lit(0.5)).cast("long")


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 (local supplier volume): 6-table star join, revenue by
    nation where customer and supplier are co-national. Dims
    broadcast; fact joins shuffle on their keys. Revenue summed
    fixed-point (see :func:`_money_fp`)."""
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
        .agg(F.round(F.sum(_money_fp(rev)) / 10_000.0, 2).alias("revenue"))
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
            F.round(
                F.sum(_money_fp(F.col("l_extendedprice") * F.col("l_discount")))
                / 10_000.0,
                2,
            ).alias("revenue"),
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
        "o_orderpriority, round(sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "AND l_shipdate > TIMESTAMP '1998-01-01' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    "q_tpch_q5": (
        "SELECT n_name, round(sum(floor(round(" + _REV + ", 9) "
        "* 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' GROUP BY n_name"
    ),
    "q_tpch_q6": (
        "SELECT round(sum(floor(round(l_extendedprice * l_discount, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue, "
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
        .agg(F.round(F.sum(_money_fp(rev)) / 10_000.0, 2).alias("revenue"))
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
        F.round(F.sum(_money_fp(F.col("l_extendedprice"))) / 10_000.0, 2).alias("sum_base_price"),
        F.round(F.sum(_money_fp(disc_price)) / 10_000.0, 2).alias("sum_disc_price"),
        F.round(F.sum(_money_fp(charge, 1_000_000)) / 1_000_000.0, 2).alias("sum_charge"),
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
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0 * F.sum(_money_fp(promo_rev)) / F.sum(_money_fp(rev)), 4
        ).alias("promo_revenue_pct"),
        F.round(F.sum(_money_fp(rev)) / 10_000.0, 2).alias("total_revenue"),
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
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(_money_fp(rev)) / 10_000.0, 2).alias("revenue"),
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
            "SELECT c_custkey, c_name, n_name, round(sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue "
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
            "round(sum(floor(round(l_extendedprice, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS sum_base_price, "
            "round(sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS sum_disc_price, "
            "round(sum(floor(round(" + _REV + " * (1 + l_tax), 9) * 1000000 + 0.5)::BIGINT) / 1000000.0, 2) AS sum_charge, "
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
            "THEN floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT ELSE 0 END) / sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT), 4) "
            "AS promo_revenue_pct, "
            "round(sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS total_revenue "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-03-01' "
            "AND l_shipdate < TIMESTAMP '1997-04-01'"
        ),
        "q_tpch_q19": (
            "SELECT round(sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue, "
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


# ---------------------------------------------------------------------------
# Rounds out the TPC-H suite: the 11 queries whose originals need
# columns/tables the fixture lacks (FIXTURES.md). Two adaptation
# conventions, applied uniformly and documented per query:
#
# - No partsupp table -> PARTSUPP IS DERIVED, dbgen-style: each part
#   gets 4 suppliers at offsets i*floor(S/4) (i in 0..3, S =
#   count(supplier), wrapping mod S), with availqty/supplycost from
#   pure integer arithmetic on (p_partkey, i). Both engines compute
#   the identical relation from the base tables, so every
#   partsupp-bearing query stays fully oracle-certified. At real
#   scale partsupp is a stored table; the queries below read the
#   derived frame through the same (ps_partkey, ps_suppkey,
#   ps_availqty, ps_supplycost) schema, so swapping in a stored scan
#   changes one helper.
# - No l_commitdate/l_receiptdate -> "late" follows the q_tpch_q4
#   convention: a line is late when it ships > 60 days after the
#   order date (cross-table inequality, preserving the correlated
#   shape the original tests).
# ---------------------------------------------------------------------------

_PS_COLS = ("ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost")


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp (see block comment above): 4 rows per part,
    supplier picked by wrapped stride so adjacent parts spread over
    the full supplier range exactly like dbgen's PS_SUPPKEY formula.
    The one-row supplier count is broadcast; the 4x explode is
    narrow (no shuffle)."""
    p = table(spark, sf_dir, "part").select("p_partkey")
    scnt = table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("s_cnt")
    )
    ps = p.crossJoin(F.broadcast(scnt)).select(
        "p_partkey",
        "s_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
    )
    step = F.greatest(F.lit(1), F.floor(F.col("s_cnt") / 4))
    return ps.select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") + F.col("i") * step) % F.col("s_cnt"))
        .cast("bigint")
        .alias("ps_suppkey"),
        ((F.col("p_partkey") * 7 + F.col("i") * 13) % 9999 + 1)
        .cast("bigint")
        .alias("ps_availqty"),
        F.round(
            ((F.col("p_partkey") * 31 + F.col("i") * 17) % 90000) / 100.0
            + 100.0,
            2,
        ).alias("ps_supplycost"),
    )


#: DuckDB CTE computing the identical derived partsupp.
_SQL_PARTSUPP = (
    "partsupp AS (SELECT p_partkey AS ps_partkey, "
    "((p_partkey + i * greatest(1, s_cnt // 4)) % s_cnt)::BIGINT AS ps_suppkey, "
    "((p_partkey * 7 + i * 13) % 9999 + 1)::BIGINT AS ps_availqty, "
    "round(((p_partkey * 31 + i * 17) % 90000) / 100.0 + 100.0, 2) "
    "AS ps_supplycost "
    "FROM part "
    "CROSS JOIN (SELECT count(*)::BIGINT AS s_cnt FROM supplier) "
    "CROSS JOIN (SELECT unnest([0, 1, 2, 3])::BIGINT AS i))"
)


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (minimum-cost supplier), adapted: p_mfgr is absent so
    p_name is reported instead, and the part filter is p_size = 15
    AND p_type = 'STANDARD' (the fixture's p_type is a single word).
    The correlated MIN subquery becomes a regional min-cost frame
    joined back on (part, cost) — the decorrelation Catalyst itself
    would pick. Dims (region/nation/supplier) broadcast; the derived
    partsupp never shuffles more than its own group-by."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    ps = _partsupp(spark, sf_dir)
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
    )
    cost = ps.join(
        sn.select("s_suppkey", "s_name", "s_acctbal", "n_name"),
        ps.ps_suppkey == F.col("s_suppkey"),
    )
    # Alias the aggregate's key so the self-join predicate references
    # distinct attributes (avoids Spark's "trivially true equals
    # predicate" dataset-id disambiguation, fragile across versions).
    minc = cost.groupBy(F.col("ps_partkey").alias("m_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        cost.join(F.broadcast(p), cost.ps_partkey == p.p_partkey)
        .join(
            minc,
            (cost.ps_partkey == F.col("m_partkey"))
            & (cost.ps_supplycost == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "ps_supplycost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 (volume shipping): bilateral trade NATION_1 <-> NATION_2 by
    ship year. Both nation dims broadcast; the disjunctive
    nation-pair predicate is evaluated after the (tiny) broadcasts,
    never blocking pushdown of the shipdate range to the fact scan."""
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s.select("s_suppkey", "s_nationkey"),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_money_fp(rev)) / 10_000.0, 2).alias("revenue"))
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 (national market share), adapted: p_type = 'ECONOMY' (one
    word in the fixture), market region ASIA, share of NATION_5
    suppliers. The conditional-share aggregate stays exactly Q8's
    sum(CASE)/sum shape."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = table(spark, sf_dir, "nation")  # customer nation (region filter)
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1.select("n_nationkey", "n_regionkey")),
              c.c_nationkey == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(s.select("s_suppkey", "s_nationkey"),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(_money_fp(share_vol)) / F.sum(_money_fp(vol)), 6
            ).alias("mkt_share"),
            F.round(F.sum(_money_fp(vol)) / 10_000.0, 2).alias("total_volume"),
        )
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (product-type profit), adapted: p_name LIKE 'red%' (the
    fixture's names are '<color> <noun>'; no 'green'). Profit uses
    the derived partsupp's supplycost. Scale shape: partsupp is
    4x|part| — far too big to broadcast at 100 TB — so it is
    semi-filtered by the broadcast 'red%' part keys (~1/10 of part)
    and then SHUFFLE-joined with lineitem on (partkey, suppkey).
    Only part keys and the tiny supplier/nation dims broadcast."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    p_keys = p.select("p_partkey")
    ps_red = ps.join(
        F.broadcast(p_keys), ps.ps_partkey == F.col("p_partkey"), "left_semi"
    ).select("ps_partkey", "ps_suppkey", "ps_supplycost")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p_keys), li.l_partkey == F.col("p_partkey"))
        .join(
            ps_red,
            (li.l_partkey == F.col("ps_partkey"))
            & (li.l_suppkey == F.col("ps_suppkey")),
        )
        .join(s.select("s_suppkey", "s_nationkey"),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(_money_fp(amount)) / 10_000.0, 2).alias(
                "sum_profit"
            )
        )
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (important stock), adapted: derived partsupp, supplier
    nation NATION_3, threshold 0.1% of the nation's total stock
    value (the original's 0.0001/SF knob). The scalar threshold is a
    one-row broadcast cross join — the global total never
    single-partitions the detail frame."""
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = table(spark, sf_dir, "supplier")
    ps = _partsupp(spark, sf_dir)
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    val = F.col("ps_supplycost") * F.col("ps_availqty")
    nat = ps.join(sn, ps.ps_suppkey == F.col("s_suppkey"))
    by_part = nat.groupBy("ps_partkey").agg(F.sum(val).alias("part_value"))
    thresh = by_part.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return (
        by_part.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", F.round("part_value", 2).alias("part_value"))
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 (customer order-count distribution), adapted: the
    excluded-comment predicate becomes o_orderpriority <>
    '4-NOT SPECIFIED'. LEFT join keeps zero-order customers (the
    point of Q13); two hash aggs, no window."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 (top supplier): the revenue view over one ship-quarter,
    then the supplier(s) sitting at the view's max revenue. Output
    keeps (s_suppkey, s_name, total_revenue); the fixture has no
    s_address/s_phone.

    Float-equality note: Q15 is notorious for comparing a float sum
    for equality. Both engines round ``total_revenue`` to 2 decimals
    INSIDE the view, before the max and the equality, so the compare
    is between engine-independent values (SURVEY §5.3) — cross-engine
    accumulation noise (~1e-9 at this magnitude) sits ~6 orders below
    the half-cent rounding boundary.

    Plan: the view is ONE hash aggregate on l_suppkey (map-side
    partial combine — bounded by #suppliers, not #lines); the max is
    a 1-row broadcast joined back onto the *view* (never a second
    lineitem scan); the supplier dim is broadcast. The lineitem scan
    carries the shipdate pushdown."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(_money_fp(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            / 10_000.0,
            2,
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        # no orderBy: the winner set is typically 1 row and the
        # correctness compare is order-insensitive — a global sort
        # here would put a rangepartitioning exchange on the plan
        # for nothing (tests/test_plans.py sweep)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 (parts/supplier relationship), adapted: brand <>
    'Brand#5', p_type <> 'PROMO' (vs NOT LIKE 'MEDIUM POLISHED%'),
    the classic size IN-list, and the complaints exclusion becomes
    s_acctbal < 0 (no s_comment in the fixture) via a broadcast
    anti-join — the same NOT IN (subquery) shape."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 33)
    )
    bad_s = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = _partsupp(spark, sf_dir)
    return (
        ps.join(bad_s, ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 (small-quantity-order revenue), adapted: the container
    filter becomes p_size <= 10 alongside p_brand = 'Brand#23'. The
    correlated 0.2*avg(quantity) subquery decorrelates to a per-part
    aggregate joined back — both sides restricted to the filtered
    parts first, so the avg never scans unrelated lines."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem")
    lp = li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
    avg_q = lp.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        lp.join(F.broadcast(avg_q), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum(_money_fp(F.col("l_extendedprice"))) / 10_000.0 / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (potential part promotion), adapted: p_name LIKE 'blue%',
    supplier nation NATION_4, ship year 1997, derived partsupp. The
    nested EXISTS chain decorrelates to: per-(part,supplier) shipped
    quantity -> availqty > half of it -> semi-join up to suppliers.
    Output keeps s_acctbal in place of the absent s_address."""
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("blue%")
    ).select("p_partkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    ps = _partsupp(spark, sf_dir)
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.sum("l_quantity") * 0.5).alias("half_qty"))
    )
    promo_supp = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(promo_supp, s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (suppliers who kept orders waiting), adapted: "late"
    follows the q_tpch_q4 convention (shipped > 60 days after order
    date). Keeps the full EXISTS / NOT-EXISTS double correlation:
    multi-supplier 'F' orders where THIS NATION_6 supplier is the
    ONLY late one. Both correlates are semi/anti hash joins on
    l_orderkey with a suppkey-inequality residual — never
    subquery-per-row."""
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_6")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    base = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .filter(late)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    all_lines = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    late_lines = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .filter(late)
        .select(
            F.col("l_orderkey").alias("y_orderkey"),
            F.col("l_suppkey").alias("y_suppkey"),
        )
    )
    waited = (
        base.join(
            all_lines,
            (base.l_orderkey == F.col("x_orderkey"))
            & (base.l_suppkey != F.col("x_suppkey")),
            "left_semi",
        ).join(
            late_lines,
            (base.l_orderkey == F.col("y_orderkey"))
            & (base.l_suppkey != F.col("y_suppkey")),
            "left_anti",
        )
    )
    return (
        waited.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 (global sales opportunity), adapted: no c_phone, so the
    country code is c_custkey % 7 (IN (1, 3, 5)). Keeps Q22's whole
    shape: scalar avg-balance subquery (one-row broadcast), positive
    -balance filter, NOT EXISTS orders anti-join, per-code rollup."""
    c = table(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_custkey") % 7).cast("int")
    ).filter(F.col("cntrycode").isin(1, 3, 5))
    o = table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_money_fp(F.col("c_acctbal"))) / 10_000.0, 2).alias("totacctbal"),
        )
    )


QUERIES.update(
    {
        "q_tpch_q2": q_tpch_q2,
        "q_tpch_q7": q_tpch_q7,
        "q_tpch_q8": q_tpch_q8,
        "q_tpch_q9": q_tpch_q9,
        "q_tpch_q11": q_tpch_q11,
        "q_tpch_q13": q_tpch_q13,
        "q_tpch_q15": q_tpch_q15,
        "q_tpch_q16": q_tpch_q16,
        "q_tpch_q17": q_tpch_q17,
        "q_tpch_q20": q_tpch_q20,
        "q_tpch_q21": q_tpch_q21,
        "q_tpch_q22": q_tpch_q22,
    }
)

ORACLE.update(
    {
        "q_tpch_q2": (
            "WITH " + _SQL_PARTSUPP + ", "
            "cost AS (SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, "
            "  n_name FROM partsupp "
            "  JOIN supplier ON ps_suppkey = s_suppkey "
            "  JOIN nation ON s_nationkey = n_nationkey "
            "  JOIN region ON n_regionkey = r_regionkey "
            "  WHERE r_name = 'EUROPE'), "
            "minc AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost "
            "  FROM cost GROUP BY ps_partkey) "
            "SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost "
            "FROM cost JOIN part ON ps_partkey = p_partkey "
            "JOIN minc USING (ps_partkey) "
            "WHERE p_size = 15 AND p_type = 'STANDARD' "
            "AND ps_supplycost = min_cost "
            "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
        ),
        "q_tpch_q7": (
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "year(l_shipdate)::BIGINT AS l_year, "
            "round(sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
            "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
            "  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
            "GROUP BY supp_nation, cust_nation, l_year"
        ),
        "q_tpch_q8": (
            "SELECT year(o_orderdate)::BIGINT AS o_year, "
            "round(sum(CASE WHEN n2.n_name = 'NATION_5' THEN floor(round(" + _REV
            + ", 9) * 10000 + 0.5)::BIGINT ELSE 0 END) / sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT), 6) AS mkt_share, "
            "round(sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS total_volume "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
            "JOIN region ON n1.n_regionkey = r_regionkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
            "WHERE r_name = 'ASIA' AND p_type = 'ECONOMY' "
            "AND o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY o_year"
        ),
        "q_tpch_q9": (
            "WITH " + _SQL_PARTSUPP + " "
            "SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year, "
            "round(sum(floor(round(" + _REV + " - ps_supplycost * l_quantity"
            ", 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) "
            "AS sum_profit "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE p_name LIKE 'red%' "
            "GROUP BY n_name, year(o_orderdate)"
        ),
        "q_tpch_q11": (
            "WITH " + _SQL_PARTSUPP + ", "
            "nat AS (SELECT ps_partkey, ps_supplycost * ps_availqty AS val "
            "  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey "
            "  JOIN nation ON s_nationkey = n_nationkey "
            "  WHERE n_name = 'NATION_3'), "
            "by_part AS (SELECT ps_partkey, sum(val) AS part_value "
            "  FROM nat GROUP BY ps_partkey) "
            "SELECT ps_partkey, round(part_value, 2) AS part_value FROM by_part "
            "WHERE part_value > (SELECT sum(part_value) * 0.001 FROM by_part)"
        ),
        "q_tpch_q13": (
            "WITH per_cust AS (SELECT c_custkey, count(o_orderkey)::BIGINT "
            "AS c_count FROM customer "
            "LEFT JOIN orders ON c_custkey = o_custkey "
            "AND o_orderpriority <> '4-NOT SPECIFIED' "
            "GROUP BY c_custkey) "
            "SELECT c_count, count(*)::BIGINT AS custdist FROM per_cust "
            "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
        ),
        "q_tpch_q15": (
            "WITH revenue0 AS ("
            "  SELECT l_suppkey AS supplier_no, "
            "  round(sum(floor(round(" + _REV + ", 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS total_revenue "
            "  FROM lineitem "
            "  WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "  AND l_shipdate < TIMESTAMP '1997-04-01' "
            "  GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total_revenue "
            "FROM supplier JOIN revenue0 ON s_suppkey = supplier_no "
            "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue0) "
            "ORDER BY s_suppkey"
        ),
        "q_tpch_q16": (
            "WITH " + _SQL_PARTSUPP + " "
            "SELECT p_brand, p_type, p_size, "
            "count(DISTINCT ps_suppkey)::BIGINT AS supplier_cnt "
            "FROM partsupp JOIN part ON ps_partkey = p_partkey "
            "WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' "
            "AND p_size IN (1, 4, 9, 14, 19, 24, 28, 33) "
            "AND ps_suppkey NOT IN "
            "  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY p_brand, p_type, p_size"
        ),
        "q_tpch_q17": (
            "WITH p AS (SELECT p_partkey FROM part "
            "  WHERE p_brand = 'Brand#23' AND p_size <= 10), "
            "lp AS (SELECT l_partkey, l_quantity, l_extendedprice "
            "  FROM lineitem JOIN p ON l_partkey = p_partkey), "
            "cut AS (SELECT l_partkey, avg(l_quantity) * 0.2 AS qty_cut "
            "  FROM lp GROUP BY l_partkey) "
            "SELECT round(sum(floor(round(l_extendedprice, 9) * 10000 + 0.5)::BIGINT) / 10000.0 / 7.0, 2) AS avg_yearly, "
            "count(*)::BIGINT AS n_lines "
            "FROM lp JOIN cut USING (l_partkey) WHERE l_quantity < qty_cut"
        ),
        "q_tpch_q20": (
            "WITH " + _SQL_PARTSUPP + ", "
            "shipped AS (SELECT l_partkey, l_suppkey, "
            "  sum(l_quantity) * 0.5 AS half_qty FROM lineitem "
            "  JOIN part ON l_partkey = p_partkey "
            "  WHERE p_name LIKE 'blue%' "
            "  AND l_shipdate >= TIMESTAMP '1997-01-01' "
            "  AND l_shipdate < TIMESTAMP '1998-01-01' "
            "  GROUP BY l_partkey, l_suppkey) "
            "SELECT s_name, s_acctbal FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_4' AND s_suppkey IN "
            "  (SELECT ps_suppkey FROM partsupp "
            "   JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey "
            "   WHERE ps_availqty > half_qty)"
        ),
        "q_tpch_q21": (
            "WITH sn AS (SELECT s_suppkey, s_name FROM supplier "
            "  JOIN nation ON s_nationkey = n_nationkey "
            "  WHERE n_name = 'NATION_6'), "
            "fo AS (SELECT o_orderkey, o_orderdate FROM orders "
            "  WHERE o_orderstatus = 'F'), "
            "base AS (SELECT l_orderkey, l_suppkey, s_name "
            "  FROM lineitem JOIN fo ON l_orderkey = o_orderkey "
            "  JOIN sn ON l_suppkey = s_suppkey "
            "  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY), "
            "late AS (SELECT l_orderkey, l_suppkey "
            "  FROM lineitem JOIN fo ON l_orderkey = o_orderkey "
            "  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY) "
            "SELECT s_name, count(*)::BIGINT AS numwait FROM base b "
            "WHERE EXISTS (SELECT 1 FROM lineitem x "
            "  WHERE x.l_orderkey = b.l_orderkey AND x.l_suppkey <> b.l_suppkey) "
            "AND NOT EXISTS (SELECT 1 FROM late y "
            "  WHERE y.l_orderkey = b.l_orderkey AND y.l_suppkey <> b.l_suppkey) "
            "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
        ),
        "q_tpch_q22": (
            "WITH cc AS (SELECT c_custkey, c_acctbal, "
            "  (c_custkey % 7)::INT AS cntrycode FROM customer "
            "  WHERE (c_custkey % 7)::INT IN (1, 3, 5)) "
            "SELECT cntrycode, count(*)::BIGINT AS numcust, "
            "round(sum(floor(round(c_acctbal, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS totacctbal FROM cc "
            "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cc "
            "  WHERE c_acctbal > 0.0) "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
            "GROUP BY cntrycode"
        ),
    }
)
