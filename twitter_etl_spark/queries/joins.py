"""Join operators (SURVEY.md §2.4 [EXT]) over the TPC-H-ish fixtures.

Scale notes (100 TB posture), per query:

- Dim tables (region 5, nation 25) are ALWAYS broadcast — an
  explicit ``F.broadcast`` hint so the plan never sort-merge-shuffles
  a 5-row table against a fact table.
- Fact-fact equi joins (orders x customer, orders x lineitem) are
  shuffle hash / sort-merge on the key; AQE handles skew splitting.
- The theta join is equi-anchored (nationkey) + range predicate, so
  Catalyst plans a hash join with a post-filter instead of a
  broadcast-nested-loop over the full cross product.
- The as-of join avoids a join explosion entirely: union the two
  event roles and take ``last(click_ts) IGNORE NULLS`` over an
  ordered per-user window — one shuffle by user_id, no range probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table
from .tpch import _money_fp


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders x customer on custkey."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, orders where they exist."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer: mirror of left (kept distinct to pin semantics)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_mktsegment", "o_orderkey"
    )


def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two partially-overlapping subsets, so both
    sides contribute unmatched rows."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 == 0)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_custkey", "n_orders"
    )


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi: customers that have at least one urgent order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti: customers with no urgent order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-dim broadcast: nation+region shipped to every executor
    (explicit hint; at 100 TB the fact side never shuffles)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3+-table star join with aggregation:
    region -> nation -> customer -> orders revenue rollup."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_money_fp(F.col("o_totalprice"))) / 10_000.0, 2).alias("revenue"),
        )
    )


def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join anchored on an equi key: supplier x
    customer in the same nation where the supplier out-balances the
    customer. The nationkey anchor keeps the plan a hash join +
    filter, not a nested-loop cross product."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    joined = s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        "inner",
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(s.s_acctbal - c.c_acctbal), 4).alias("avg_gap"),
    ).withColumnRenamed("s_nationkey", "nationkey")


def q_join_selfasof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest STRICTLY
    prior click by the same user (``p.ts > c.ts`` on both engines —
    strict rather than >= so a click sharing a purchase's exact
    timestamp is excluded identically in Spark and DuckDB; with >=
    the Spark window's secondary sort key decided same-ts visibility
    while DuckDB's ASOF matched on ts alone, a latent cross-engine
    tie divergence flagged by the r10 advisor).

    Spark-native scalable form: union the two roles, one window sort
    per user ordered by (ts, is_click) so same-ts clicks land AFTER
    purchases and outside the cumulative frame, then
    ``last(click_ts) IGNORE NULLS`` — no range-join explosion,
    single shuffle. Oracle: DuckDB ASOF LEFT JOIN ON p.ts > c.ts.
    """
    e = table(spark, sf_dir, "events")
    clicks_purchases = e.filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", _is_click_last(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = clicks_purchases.withColumn(
        "click_ts", F.when(F.col("event_type") == "click", F.col("ts"))
    ).withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts")).alias("purchase_us"),
            F.unix_micros(F.col("last_click_ts")).alias("click_us"),
        )
    )


_ASOF_TOL_US = 6 * 3600 * 1_000_000  # 6h attribution window


def _is_click_last():
    """Secondary as-of sort key: clicks AFTER purchases at equal ts,
    so the cumulative ``last(click_ts)`` frame of a purchase cannot
    see a same-timestamp click — the window-form equivalent of the
    oracle's strict ``p.ts > c.ts`` ASOF predicate."""
    return F.when(F.col("event_type") == "click", 1).otherwise(0)


def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound — pandas ``merge_asof(...,
    tolerance=...)`` / attribution-window semantics: each purchase
    matched to the latest STRICTLY prior click by the same user
    ONLY if it landed within the 6-hour window, else NULL
    (nearest-within-tolerance ≡ nearest-then-bound, since the as-of
    pick is already the nearest candidate; strict ``p.ts > c.ts``
    on both engines per the same tie rationale as
    :func:`q_join_selfasof`).

    Spark-native scalable form: same union + one-per-user-window
    ``last IGNORE NULLS`` as :func:`q_join_selfasof` (single
    shuffle, no range-join explosion), with the bound applied as a
    post-pick expression. Oracle: DuckDB ASOF LEFT JOIN + the same
    CASE bound — two genuinely different engines AND formulations
    agreeing on the nullable attribution column."""
    e = table(spark, sf_dir, "events")
    cp = e.filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", _is_click_last(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = cp.withColumn(
        "click_ts", F.when(F.col("event_type") == "click", F.col("ts"))
    ).withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))
    return tagged.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("purchase_us"),
        F.when(
            gap <= _ASOF_TOL_US, F.unix_micros(F.col("last_click_ts"))
        ).alias("click_us"),
        F.coalesce((gap <= _ASOF_TOL_US).cast("int"), F.lit(0)).alias(
            "attributed"
        ),
    )


def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two (tiny) dim tables."""
    return (
        table(spark, sf_dir, "region")
        .crossJoin(table(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNANCHORED interval-overlap join, made scale-safe by bin
    bucketing. High-value events (value > 300) open a 1-hour "alert
    window" [ts, ts+1h); every event from ANY user falling inside
    any window is matched to it — there is no equi key between the
    two sides, the textbook case where a naive range join degrades
    to BroadcastNestedLoop at scale.

    The bin trick: both sides map time to 1-hour bins. An interval
    exactly one bin wide touches at most 2 bins, so the alert side
    explodes to ≤2 rows and the join becomes an EQUI join on the bin
    id followed by the exact overlap filter. Each event lives in
    exactly ONE bin, so a (event, alert) pair can match only once —
    no post-join dedup. Shuffle volume is |events| + 2|alerts| rows
    hashed on the bin key; bin width should match the interval scale
    (wider intervals -> explode to ceil(len/width)+1 bins). Alert
    count scales with SF, so neither side is broadcast-hinted — AQE
    decides (SCALE.md hint policy)."""
    e = table(spark, sf_dir, "events")
    hour_bin = (F.unix_timestamp("ts") / 3600).cast("long")
    alerts = e.filter(F.col("value") > 300.0).select(
        F.col("event_id").alias("alert_id"),
        F.col("ts").alias("a_ts"),
        hour_bin.alias("bin0"),
    )
    a_bins = alerts.select(
        "alert_id",
        "a_ts",
        F.explode(F.array(F.col("bin0"), F.col("bin0") + 1)).alias("bin"),
    )
    e_bins = e.select(
        "event_id", "ts", "user_id", hour_bin.alias("bin")
    )
    joined = e_bins.join(a_bins, "bin").filter(
        (F.col("ts") >= F.col("a_ts"))
        & (F.col("ts") < F.col("a_ts") + F.expr("INTERVAL 1 HOUR"))
        & (F.col("event_id") != F.col("alert_id"))
    )
    return joined.groupBy("alert_id").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        F.count_distinct("user_id").alias("n_users"),
    )


def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived-table join: each customer's single
    highest-value order via a per-row subquery with ORDER BY+LIMIT —
    the SQL-standard spelling of top-1-per-key. Catalyst decorrelates
    it (DomainJoin rewrite) into a join + per-key limit rather than
    executing a subquery per row; the window rank-filter
    (q_topk_pergroup) is the same plan family written by hand."""
    from ..tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT c_custkey, o.o_orderkey, o.o_totalprice FROM customer, "
        "LATERAL (SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_custkey = c_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o"
    )


QUERIES = {
    "q_join_inner": q_join_inner,
    "q_join_lateral": q_join_lateral,
    "q_join_left": q_join_left,
    "q_join_right": q_join_right,
    "q_join_full": q_join_full,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_broadcast": q_join_broadcast,
    "q_join_multiway": q_join_multiway,
    "q_join_theta": q_join_theta,
    "q_join_selfasof": q_join_selfasof,
    "q_join_asof_tolerance": q_join_asof_tolerance,
    "q_join_cross": q_join_cross,
    "q_join_interval": q_join_interval,
}

ORACLE = {
    "q_join_inner": (
        "SELECT o_orderkey, c_custkey, c_name, o_totalprice "
        "FROM orders JOIN customer ON o_custkey = c_custkey"
    ),
    "q_join_left": (
        "SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM customer "
        "LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o "
        "ON c_custkey = o.o_custkey"
    ),
    "q_join_right": (
        "SELECT c_custkey, c_mktsegment, o_orderkey "
        "FROM (SELECT * FROM orders WHERE o_totalprice > 400000.0) o "
        "RIGHT JOIN customer ON o.o_custkey = c_custkey"
    ),
    "q_join_full": (
        "SELECT c_custkey, c_name, o_custkey, n_orders "
        "FROM (SELECT * FROM customer WHERE c_custkey % 2 = 0) c "
        "FULL JOIN (SELECT o_custkey, count(*)::BIGINT AS n_orders FROM orders "
        "           WHERE o_orderkey % 3 = 0 GROUP BY o_custkey) o "
        "ON c.c_custkey = o.o_custkey"
    ),
    "q_join_semi": (
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS ("
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderpriority = '1-URGENT')"
    ),
    "q_join_anti": (
        "SELECT c_custkey, c_mktsegment FROM customer WHERE NOT EXISTS ("
        "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderpriority = '1-URGENT')"
    ),
    "q_join_broadcast": (
        "SELECT c_custkey, n_name, r_name FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey"
    ),
    "q_join_multiway": (
        "SELECT r_name, n_name, count(*)::BIGINT AS n_orders, "
        "round(sum(floor(round(o_totalprice, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name, n_name"
    ),
    "q_join_theta": (
        "SELECT s_nationkey AS nationkey, count(*)::BIGINT AS n_pairs, "
        "round(avg(s_acctbal - c_acctbal), 4) AS avg_gap "
        "FROM supplier JOIN customer "
        "ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal "
        "GROUP BY s_nationkey"
    ),
    "q_join_selfasof": (
        "SELECT p.event_id, p.user_id, "
        "epoch_us(p.ts)::BIGINT AS purchase_us, "
        "epoch_us(c.ts)::BIGINT AS click_us "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts > c.ts"
    ),
    "q_join_asof_tolerance": (
        "SELECT p.event_id, p.user_id, "
        "epoch_us(p.ts)::BIGINT AS purchase_us, "
        "CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 21600000000 "
        "THEN epoch_us(c.ts)::BIGINT END AS click_us, "
        "coalesce((epoch_us(p.ts) - epoch_us(c.ts) <= 21600000000)::INT, 0) "
        "AS attributed "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON p.user_id = c.user_id AND p.ts > c.ts"
    ),
    "q_join_cross": "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "q_join_lateral": (
        "SELECT c_custkey, o.o_orderkey, o.o_totalprice FROM customer, "
        "LATERAL (SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_custkey = c_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o"
    ),
    # the oracle states the overlap predicate directly (DuckDB's
    # IEJoin handles it at fixture scale); the Spark side's bin-
    # bucketed equi-join must produce the identical match set
    "q_join_interval": (
        "WITH a AS (SELECT event_id AS alert_id, ts AS a_ts "
        "  FROM events WHERE value > 300.0) "
        "SELECT alert_id, count(*)::BIGINT AS n_overlap, "
        "count(DISTINCT user_id)::BIGINT AS n_users "
        "FROM a JOIN events e ON e.ts >= a.a_ts "
        "AND e.ts < a.a_ts + INTERVAL 1 HOUR "
        "AND e.event_id <> a.alert_id "
        "GROUP BY alert_id"
    ),
}


# Bloom semi-join prefilter geometry: m = 2^16 bit positions, one
# md5 hash (a k=1 Bloom filter IS a hash-bucket presence filter —
# one broadcast join per probe row instead of a k-way explode). At
# the sf0.1 dim subset (403 selective parts) fill is ~0.6%, so the
# prefilter passes ~2.6% of the fact side into the shuffle.
_JB_M = 1 << 16


def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered fact-dim join — revenue by brand for
    size-15 parts, with the fact side pruned BEFORE the join
    exchange by a broadcast bit-position filter built from the
    selective dim subset (the classic selective-star-join trick;
    Spark's runtime row-group bloom does this adaptively, this is
    the explicit engine-independent spelling). The main join takes
    a SHUFFLE_HASH hint to model the 100 TB regime where the full
    dim no longer broadcasts (q_join_salted precedent) — the point
    is that the BIT SET still broadcasts when the dim cannot: ≤ m
    rows of one long, regardless of dim width or count.

    The oracle is the SAME join WITHOUT the filter: certifying
    equality proves the prefilter is transparent — a Bloom filter
    admits false positives (the exact join removes them) but never
    drops a qualifying row. Per-row cost on the fact side is one
    md5 + one broadcast hash probe; the filter cuts shuffle input
    ~40x at fixture selectivity."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)

    def pos(key) -> Column:
        return F.pmod(
            F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
            .cast("long"),
            F.lit(_JB_M),
        )

    bits = p.select(pos(F.col("p_partkey")).alias("pos")).distinct()
    pre = li.withColumn("pos", pos(F.col("l_partkey"))).join(
        F.broadcast(bits), "pos"
    )
    joined = pre.join(
        p.hint("shuffle_hash"), pre.l_partkey == p.p_partkey
    )
    # fixed-point revenue sum (tpch._money_fp): the sf1 drill caught
    # the raw double sum one cent off across engines at 10x rows
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(_money_fp(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            / 10_000.0,
            2,
        ).alias("revenue"),
    )


QUERIES["q_join_bloom"] = q_join_bloom

ORACLE["q_join_bloom"] = (
    # deliberately NO bloom: the unfiltered join is the semantic
    # contract the prefilter must preserve
    "SELECT p_brand, count(*)::BIGINT AS n_items, "
    "round(sum(floor(round(l_extendedprice * (1 - l_discount), 9) "
    "* 10000 + 0.5)::BIGINT) / 10000.0, 2) AS revenue "
    "FROM lineitem JOIN part ON l_partkey = p_partkey "
    "WHERE p_size = 15 GROUP BY p_brand"
)
