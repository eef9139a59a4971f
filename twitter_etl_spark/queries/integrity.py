"""Table-integrity operators: snapshot diff and content
fingerprinting (SURVEY.md §2 [EXT]).

- **snapshot diff** (``q_snapshot_diff``): the table-versioning
  primitive — classify every key as added / removed / changed /
  unchanged between two snapshots via ONE full-outer join on the
  key (never two anti-joins + an inner join = three scans). The
  "v2" snapshot is derived in-query from orders by deterministic
  rules (deletes: ``key % 97 = 0``; updates: ``key % 100 < 10``;
  inserts: shifted keys), so both engines see identical inputs.
- **content fingerprint** (``q_table_fingerprint``): an
  ORDER-INDEPENDENT whole-table checksum per table —
  ``bit_xor`` of a 60-bit md5 integer of each row's canonical
  string. XOR is commutative/associative, so the fingerprint is
  invariant under partitioning and row order (a ``sum`` would
  overflow int64; engine-native ``hash()`` differs across engines
  — md5 is the only portable row hash, cf. the md5-SimHash note in
  ``corpus.py``). Floats enter the canonical string as exact cent
  integers (``round(x*100)``): decimal-to-string rendering is NOT
  identical across engines, integers are. This is the cheap answer
  to "did replication/compaction/migration lose a row?" at 100 TB:
  one scan, one 8-byte accumulator per partition, merge by XOR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table


def _orders_v2(o: DataFrame) -> DataFrame:
    """Deterministic second snapshot: drop key%97==0, bump
    totalprice for key%100<10, insert shifted keys for key%200==0."""
    kept = o.where(F.col("o_orderkey") % 97 != 0)
    updated = kept.select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 100 < 10,
            F.round(F.col("o_totalprice"), 2) + 1.0,
        )
        .otherwise(F.round(F.col("o_totalprice"), 2))
        .alias("price"),
    )
    inserted = o.where(F.col("o_orderkey") % 200 == 0).select(
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        "o_custkey",
        F.round(F.col("o_totalprice"), 2).alias("price"),
    )
    return updated.unionByName(inserted)


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class row counts of the v1 → v2 orders diff."""
    o = table(spark, sf_dir, "orders")
    v1 = o.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
    )
    v2 = _orders_v2(o)
    j = v1.alias("a").join(
        v2.alias("b"),
        F.col("a.o_orderkey") == F.col("b.o_orderkey"),
        "full_outer",
    )
    cls = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("removed"))
        .when(
            (F.col("a.o_custkey") != F.col("b.o_custkey"))
            | (F.col("a.price") != F.col("b.price")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(cls.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _md5_60(col) -> F.Column:
    """60-bit md5 prefix as a signed-safe BIGINT (both engines)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum of three tables."""
    return fingerprint_tables(
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "customer"),
    )


def fingerprint_tables(o: DataFrame, li: DataFrame, c: DataFrame) -> DataFrame:
    """bit_xor-of-row-hash fingerprint over the given frames; the
    xor aggregate is commutative/associative, so the result is
    invariant under row order, partitioning, and shuffle — the
    property the repartition test asserts directly."""

    def fp(df: DataFrame, name: str, canon) -> DataFrame:
        return df.select(_md5_60(canon).alias("h")).agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("fingerprint"),
        )

    o_canon = F.concat_ws(
        "|",
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint"),
    )
    l_canon = F.concat_ws(
        "|",
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("bigint"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint"),
    )
    c_canon = F.concat_ws(
        "|",
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint"),
    )
    return (
        fp(o, "orders", o_canon)
        .unionByName(fp(li, "lineitem", l_canon))
        .unionByName(fp(c, "customer", c_canon))
    )


QUERIES = {
    "q_snapshot_diff": q_snapshot_diff,
    "q_table_fingerprint": q_table_fingerprint,
}

_V1 = (
    "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price "
    "FROM orders"
)

_V2 = (
    "SELECT o_orderkey, o_custkey, "
    "CASE WHEN o_orderkey % 100 < 10 "
    "THEN round(o_totalprice, 2) + 1.0 "
    "ELSE round(o_totalprice, 2) END AS price "
    "FROM orders WHERE o_orderkey % 97 <> 0 "
    "UNION ALL "
    "SELECT o_orderkey + 1000000000, o_custkey, "
    "round(o_totalprice, 2) FROM orders WHERE o_orderkey % 200 = 0"
)


def _fp_sql(tbl: str, canon: str) -> str:
    return (
        f"SELECT '{tbl}' AS table_name, count(*) AS n_rows, "
        "bit_xor((('0x' || substr(md5(" + canon + "), 1, 15))"
        "::UBIGINT)::BIGINT) AS fingerprint FROM " + tbl
    )


ORACLE = {
    "q_snapshot_diff": (
        "WITH v1 AS (" + _V1 + "), v2 AS (" + _V2 + "), "
        "j AS (SELECT a.o_orderkey AS k1, b.o_orderkey AS k2, "
        "a.o_custkey AS c1, b.o_custkey AS c2, "
        "a.price AS p1, b.price AS p2 "
        "FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey) "
        "SELECT CASE WHEN k1 IS NULL THEN 'added' "
        "WHEN k2 IS NULL THEN 'removed' "
        "WHEN c1 <> c2 OR p1 <> p2 THEN 'changed' "
        "ELSE 'unchanged' END AS change_type, count(*) AS n "
        "FROM j GROUP BY 1"
    ),
    "q_table_fingerprint": (
        _fp_sql(
            "orders",
            "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, "
            "round(o_totalprice * 100)::BIGINT)",
        )
        + " UNION ALL "
        + _fp_sql(
            "lineitem",
            "concat_ws('|', l_orderkey, l_partkey, l_suppkey, "
            "l_quantity::BIGINT, round(l_extendedprice * 100)::BIGINT)",
        )
        + " UNION ALL "
        + _fp_sql(
            "customer",
            "concat_ws('|', c_custkey, c_name, c_nationkey, "
            "round(c_acctbal * 100)::BIGINT)",
        )
    ),
}
