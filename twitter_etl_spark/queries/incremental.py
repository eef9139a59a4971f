"""Incremental-pipeline operators ([EXT]): changelog merge (the
batch ``MERGE INTO`` shape), wide->long unpivot, and the CSV landing
source.

Scale design:

- **Latest-wins merge**: union the base snapshot with the changelog
  and take the max-version row per key in ONE hash aggregation
  (``max_by`` over a struct) — no window sort, no join. This is the
  skew-robust shape (same argument as the flagship keep-first dedup,
  ``pipeline.py``): partial aggregation collapses hot keys map-side.
  At cluster scale the base table is bucketed by the merge key so
  only the (small) changelog shuffles; table formats implement
  ``MERGE INTO`` with exactly this co-partitioned plan.
- **Unpivot**: a generator expression per row (k rows out per row
  in), no shuffle at all.
- **CSV source**: schema supplied explicitly — inference would scan
  the data twice and guess types per-file at scale.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .tpch import _money_fp
from .ref_parity import _scratch


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic changelog over ``orders``: every
    order with ``o_orderkey % 100 < 10`` got a price restatement
    (+10%) at version 2. Derived, not random, so the oracle can
    reproduce it."""
    o = table(spark, sf_dir, "orders")
    # round-then-add: both engines round the SAME stored double (no
    # freshly-computed ties near .005, where their rounding rules
    # diverge), then the +1.0 is bit-identical IEEE arithmetic
    return o.filter(F.col("o_orderkey") % 100 < 10).select(
        "o_orderkey",
        "o_custkey",
        (F.round(F.col("o_totalprice"), 2) + F.lit(1.0)).alias("o_totalprice"),
        F.lit(2).alias("version"),
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins merge of a changelog into the base snapshot
    (CDC/upsert): one union + one ``max_by(struct, version)`` hash
    agg per key. Restated orders surface version 2; untouched orders
    keep version 1."""
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(1).alias("version"),
    )
    merged = base.union(_changelog(spark, sf_dir))
    winner = F.max_by(
        F.struct("o_custkey", "o_totalprice", "version"), F.col("version")
    )
    return (
        merged.groupBy("o_orderkey")
        .agg(winner.alias("w"))
        .select(
            "o_orderkey",
            F.col("w.o_custkey").alias("o_custkey"),
            F.col("w.o_totalprice").alias("o_totalprice"),
            F.col("w.version").alias("version"),
        )
    )


def _cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic CDC changelog over ``orders`` with
    all three op kinds (derived, not random, so the oracle
    reproduces it): keys %100 in [0,10) get a v2 price update (U),
    keys %100 in [10,16) get a v2 tombstone (D), and key %100 == 10
    is RE-INSERTED at v3 (I) — the delete-then-reinsert sequence
    that breaks naive delete-wins merges."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 100
    upd = o.filter(k < 10).select(
        "o_orderkey",
        "o_custkey",
        (F.round(F.col("o_totalprice"), 2) + F.lit(1.0)).alias("o_totalprice"),
        F.lit(2).alias("version"),
        F.lit("U").alias("op"),
    )
    dele = o.filter((k >= 10) & (k < 16)).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(2).alias("version"),
        F.lit("D").alias("op"),
    )
    reins = o.filter(k == 10).select(
        "o_orderkey",
        "o_custkey",
        (F.round(F.col("o_totalprice"), 2) + F.lit(2.0)).alias("o_totalprice"),
        F.lit(3).alias("version"),
        F.lit("I").alias("op"),
    )
    return upd.union(dele).union(reins)


def q_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge WITH DELETES (r13 verdict #4) — the full batch
    ``MERGE INTO`` / changelog-compaction shape real lakehouse
    pipelines run daily: ops I/U/D, latest-version-wins INCLUDING
    tombstones, rows whose last op is D vanish from the snapshot,
    and a later re-insert resurrects the key. Emits the surviving
    snapshot with the winning version and ``last_op`` for lineage.

    Same skew-robust plan as :func:`q_merge_upsert`: one union +
    one ``max_by(struct, version)`` hash agg per key (map-side
    partials collapse hot keys), then a post-agg tombstone filter —
    no window sort, no join. At cluster scale the base is bucketed
    on the merge key so only the changelog shuffles."""
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.lit(1).alias("version"),
        F.lit("I").alias("op"),
    )
    merged = base.union(_cdc_changelog(spark, sf_dir))
    winner = F.max_by(
        F.struct("o_custkey", "o_totalprice", "version", "op"),
        F.col("version"),
    )
    return (
        merged.groupBy("o_orderkey")
        .agg(winner.alias("w"))
        .filter(F.col("w.op") != "D")
        .select(
            "o_orderkey",
            F.col("w.o_custkey").alias("o_custkey"),
            F.col("w.o_totalprice").alias("o_totalprice"),
            F.col("w.version").alias("version"),
            F.col("w.op").alias("last_op"),
        )
    )


def q_fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt: per-status order metrics unpivoted to
    (status, metric, value) — ``DataFrame.unpivot`` generates k rows
    per input row with no shuffle beyond the preceding agg."""
    wide = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.round(F.sum(_money_fp(F.col("o_totalprice"))) / 10_000.0, 2).alias("total_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["n_orders", "total_price", "avg_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


def q_source_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV landing round trip: land ``nation`` as headered CSV,
    re-read with the explicit schema (never inferred), return the
    parsed rows. Companion to the NDJSON source
    (``q_source_ndjson``); the reference's landing zone is
    file-format-agnostic (``main.R:55-66``)."""
    path = _scratch(spark, "q_source_csv")
    shutil.rmtree(path, ignore_errors=True)
    n = table(spark, sf_dir, "nation")
    n.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(n.schema).option("header", True).csv(path)


QUERIES = {
    "q_merge_upsert": q_merge_upsert,
    "q_merge_cdc": q_merge_cdc,
    "q_fn_unpivot": q_fn_unpivot,
    "q_source_csv": q_source_csv,
}

_CDC_MERGED_CTE = (
    "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice, "
    "1 AS version, 'I' AS op FROM orders "
    "UNION ALL "
    "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) + 1.0, 2, 'U' "
    "FROM orders WHERE o_orderkey % 100 < 10 "
    "UNION ALL "
    "SELECT o_orderkey, o_custkey, round(o_totalprice, 2), 2, 'D' "
    "FROM orders WHERE o_orderkey % 100 >= 10 AND o_orderkey % 100 < 16 "
    "UNION ALL "
    "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) + 2.0, 3, 'I' "
    "FROM orders WHERE o_orderkey % 100 = 10"
)

_MERGED_CTE = (
    "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice, "
    "1 AS version FROM orders "
    "UNION ALL "
    "SELECT o_orderkey, o_custkey, round(o_totalprice, 2) + 1.0, 2 "
    "FROM orders WHERE o_orderkey % 100 < 10"
)

ORACLE = {
    "q_merge_upsert": (
        "WITH merged AS (" + _MERGED_CTE + ") "
        "SELECT o_orderkey, arg_max(o_custkey, version) AS o_custkey, "
        "arg_max(o_totalprice, version) AS o_totalprice, "
        "max(version) AS version FROM merged GROUP BY o_orderkey"
    ),
    "q_merge_cdc": (
        "WITH merged AS (" + _CDC_MERGED_CTE + "), "
        "w AS (SELECT o_orderkey, arg_max(o_custkey, version) AS o_custkey, "
        "arg_max(o_totalprice, version) AS o_totalprice, "
        "max(version) AS version, arg_max(op, version) AS last_op "
        "FROM merged GROUP BY o_orderkey) "
        "SELECT * FROM w WHERE last_op <> 'D'"
    ),
    "q_fn_unpivot": (
        "WITH wide AS (SELECT o_orderstatus, count(*)::DOUBLE AS n_orders, "
        "round(sum(floor(round(o_totalprice, 9) * 10000 + 0.5)::BIGINT) / 10000.0, 2) AS total_price, "
        "round(avg(o_totalprice), 4) AS avg_price "
        "FROM orders GROUP BY o_orderstatus) "
        "SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM wide "
        "UNION ALL SELECT o_orderstatus, 'total_price', total_price FROM wide "
        "UNION ALL SELECT o_orderstatus, 'avg_price', avg_price FROM wide"
    ),
    "q_source_csv": (
        "SELECT n_nationkey, n_name, n_regionkey FROM nation"
    ),
}
