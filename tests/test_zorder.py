"""Z-order layout (zorder.py + queries/layout.py): correctness of
the Morton math, the locality property the layout exists for, and
the plan-visible pruning of the box probe."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from twitter_etl_spark.tables import table
from twitter_etl_spark.zorder import (
    ZBITS,
    ZBLOCK_SHIFT,
    morton_key,
    zblocks_for_box,
    zorder_probe_box,
    zorder_write,
)

SF = "/root/testdata/sf0.01"


def _py_morton(x: int, y: int, bits: int = ZBITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_morton_key_matches_python(spark):
    """The expression-tree interleave equals the reference bit loop
    on a grid that exercises every bit position."""
    vals = [0, 1, 2, 3, 127, 128, 511, 512, 1023]
    rows = [(x, y) for x in vals for y in vals]
    df = spark.createDataFrame(rows, "x int, y int").withColumn(
        "zkey", morton_key(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["zkey"] == _py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_write_probe_prunes_and_matches_bruteforce(spark, tmp_path):
    """zorder_write + zorder_probe_box: (1) the probe's rows equal a
    brute-force filter of the raw table; (2) the block list computed
    from the box alone is a small subset of all 64 blocks (the
    locality claim, quantified); (3) the probe plan carries
    PartitionFilters on zblock — the scan never opens non-matching
    partitions."""
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    path = os.path.join(str(tmp_path), "li_z")
    zorder_write(li, path, "l_partkey", "l_suppkey")

    # fixture ranges: l_partkey mod 1024 covers 0..1023 but l_suppkey
    # only 0..99, so the y window must sit below 100 to be non-empty
    x_lo, x_hi, y_lo, y_hi = 200, 300, 40, 60
    probe = zorder_probe_box(
        spark, path, x_lo, x_hi, y_lo, y_hi, "l_partkey", "l_suppkey"
    )
    got = {
        (r["l_orderkey"], r["l_partkey"], r["l_suppkey"])
        for r in probe.collect()
    }
    want = {
        (r["l_orderkey"], r["l_partkey"], r["l_suppkey"])
        for r in li.where(
            (F.col("l_partkey") % (1 << ZBITS)).between(x_lo, x_hi)
            & (F.col("l_suppkey") % (1 << ZBITS)).between(y_lo, y_hi)
        ).collect()
    }
    assert got == want and len(got) > 0

    n_blocks = 1 << (2 * ZBITS - ZBLOCK_SHIFT)
    blocks = zblocks_for_box(x_lo, x_hi, y_lo, y_hi)
    # a 101x21-cell box out of 1024x1024 cells: at 128x128 blocks it
    # can straddle at most a 2x1 block neighborhood
    assert 0 < len(blocks) <= 2 < n_blocks

    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "zblock" in plan


def test_zblocks_for_box_is_sound(spark):
    """Soundness of the box->blocks math against the data: every
    zblock that actually CONTAINS a matching row must be in the
    computed list (pruning may over-approximate, never drop)."""
    li = table(spark, SF, "lineitem")
    x = (F.col("l_partkey") % (1 << ZBITS)).alias("x")
    y = (F.col("l_suppkey") % (1 << ZBITS)).alias("y")
    z = li.select(x, y).withColumn(
        "zblock", F.shiftright(morton_key(F.col("x"), F.col("y")), ZBLOCK_SHIFT)
    )
    for box in [(0, 50, 0, 50), (100, 900, 30, 80), (1000, 1023, 0, 1023)]:
        x_lo, x_hi, y_lo, y_hi = box
        have = {
            r["zblock"]
            for r in z.where(
                F.col("x").between(x_lo, x_hi)
                & F.col("y").between(y_lo, y_hi)
            )
            .select("zblock")
            .distinct()
            .collect()
        }
        assert have <= set(zblocks_for_box(x_lo, x_hi, y_lo, y_hi)), box
