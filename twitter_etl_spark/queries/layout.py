"""Data-layout operators (SURVEY.md §2 [EXT]): Z-order clustering
diagnostics — the query side of :mod:`twitter_etl_spark.zorder`
(morton writer + box-probe). See that module's docstring for why
Morton layout is the 100 TB lever for multi-dimensional pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from ..zorder import ZBITS, ZBLOCK_SHIFT, morton_key, morton_sql


def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering report over lineitem on the 2-D key
    (l_partkey mod 2^10, l_suppkey mod 2^10): Morton-interleave the
    bits, group rows by the key's top bits (the ``zblock`` a
    Z-ordered writer would use as its file boundary), and emit each
    block's row count plus its (x, y) bounding box — the min/max
    stats a scan planner would consult. The bbox area column is the
    whole point: every block covers an aligned 128x128 rectangle
    (16,384 cells of a 1,048,576-cell space), so a box predicate on
    EITHER dimension — or both — prunes most blocks. The companion
    writer/probe (``zorder.zorder_write`` / ``zorder_probe_box``)
    materializes this layout and ``tests/test_zorder.py`` pins the
    pruning in the plan.

    Pure integer bit arithmetic end-to-end (interleave, shift,
    min/max) — bit-identical on both engines. One scan, one hash agg
    on zblock (bounded at 2^(2·ZBITS−ZBLOCK_SHIFT) = 64 groups —
    map-side partials collapse everything before the shuffle)."""
    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % (1 << ZBITS)).alias("x"),
        (F.col("l_suppkey") % (1 << ZBITS)).alias("y"),
    )
    z = li.select(
        "x", "y", morton_key(F.col("x"), F.col("y")).alias("zkey")
    ).withColumn("zblock", F.shiftright(F.col("zkey"), ZBLOCK_SHIFT))
    return z.groupBy("zblock").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        (
            (F.max("x") - F.min("x") + 1) * (F.max("y") - F.min("y") + 1)
        ).alias("bbox_area"),
    )


QUERIES = {
    "q_layout_zorder": q_layout_zorder,
}

_Z = morton_sql("x", "y")

ORACLE = {
    "q_layout_zorder": (
        "WITH k AS (SELECT l_partkey % {n} AS x, l_suppkey % {n} AS y "
        "FROM lineitem), "
        "z AS (SELECT x, y, ({z} >> {shift}) AS zblock FROM k) "
        "SELECT zblock, count(*)::BIGINT AS n_rows, "
        "min(x) AS min_x, max(x) AS max_x, "
        "min(y) AS min_y, max(y) AS max_y, "
        "(max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS bbox_area "
        "FROM z GROUP BY zblock"
    ).format(n=1 << ZBITS, z=_Z, shift=ZBLOCK_SHIFT)
}
