"""Z-order (Morton) data layout — the multi-dimensional clustering
primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` and the reason
a 100 TB table can serve 2-D box predicates without a full scan.

A Morton key interleaves the bits of two (here) bounded integer keys
so that rows close in BOTH dimensions land close in the one-
dimensional sort order. Writing the table range-partitioned and
sorted by that key means every file/partition covers a small
bounding BOX in (x, y) space, so parquet min/max stats (and, in the
partitioned form below, partition pruning) skip everything outside a
query box — in either dimension, with one layout. A single-column
sort gives pruning on that column only; Z-order gives it on both at
a small per-column cost (the classic trade).

Everything here is exact integer bit arithmetic — no float, no RNG —
so the companion query (``queries/layout.py::q_layout_zorder``) is
DuckDB-certifiable, and the writer's locality claim is pinned by
``tests/test_zorder.py`` (box probes touch a small, plan-asserted
subset of partitions).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: bits per dimension (keys are taken modulo 2**ZBITS).
ZBITS = 10
#: the block id is the Morton key's top (2*ZBITS - ZBLOCK_SHIFT)
#: bits — 64 blocks at the defaults, each a 128x128 cell rectangle.
ZBLOCK_SHIFT = 14


def morton_key(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave ``bits`` low bits of two non-negative integer
    columns: x's bit i lands at position 2i+1, y's at 2i. Pure
    JVM-side bit arithmetic — whole-stage-codegen friendly, exact
    on both engines."""
    xm = x.bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.bitwiseAND(F.lit((1 << bits) - 1))
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return functools.reduce(lambda a, b: a + b, terms).alias("zkey")


def morton_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The identical interleave as ANSI SQL (DuckDB oracle side)."""
    xm = f"({x} & {(1 << bits) - 1})"
    ym = f"({y} & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` Z-ordered on (xcol, ycol): rows are range-
    partitioned AND sorted by the Morton key, and the key's top bits
    become a ``zblock`` partition column. Range partitioning gives
    each output file a contiguous zkey span (so file-level min/max
    stats are tight); the partition column makes the pruning
    observable in the plan (PartitionFilters) without relying on
    row-group stat skipping, which local-mode plans don't surface.

    At 100 TB this is the periodic OPTIMIZE job: one shuffle
    (repartitionByRange on zkey — sampled range bounds, so skewed
    key distributions still yield balanced files), one sorted write.
    """
    keyed = df.withColumn(
        "zkey", morton_key(F.col(xcol), F.col(ycol))
    ).withColumn("zblock", F.shiftright(F.col("zkey"), ZBLOCK_SHIFT))
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .partitionBy("zblock")
        .parquet(path)
    )


def zblocks_for_box(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, bits: int = ZBITS
) -> list[int]:
    """The set of zblock ids whose Morton range can intersect the
    inclusive box [x_lo,x_hi] x [y_lo,y_hi] — computed from the BOX
    alone (driver-side bit math over the block grid, no data read),
    which is exactly what a query planner does with file-level
    zkey min/max. Blocks are (2*ZBITS - ZBLOCK_SHIFT)-bit prefixes;
    a block intersects iff its cell rectangle overlaps the box."""

    def _deinterleave(z: int) -> tuple[int, int]:
        x = y = 0
        for i in range(bits):
            x |= ((z >> (2 * i + 1)) & 1) << i
            y |= ((z >> (2 * i)) & 1) << i
        return x, y

    out = []
    n_blocks = 1 << (2 * bits - ZBLOCK_SHIFT)
    # with an even ZBLOCK_SHIFT the free low bits split evenly, so a
    # block's cells form an axis-aligned square of this side length
    side = 1 << (ZBLOCK_SHIFT // 2)
    for b in range(n_blocks):
        lo_x, lo_y = _deinterleave(b << ZBLOCK_SHIFT)
        if lo_x + side - 1 < x_lo or lo_x > x_hi:
            continue
        if lo_y + side - 1 < y_lo or lo_y > y_hi:
            continue
        out.append(b)
    return out


def zorder_probe_box(
    spark: SparkSession,
    path: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    xcol: str,
    ycol: str,
) -> DataFrame:
    """Read a 2-D box from a Z-ordered table touching only the
    partitions whose block rectangle intersects the box (the block
    list comes from :func:`zblocks_for_box` — box-only math), then
    apply the exact residual predicate. The plan shows
    PartitionFilters on zblock; the residual filter is pushed to the
    scan."""
    blocks = zblocks_for_box(x_lo, x_hi, y_lo, y_hi)
    return (
        spark.read.parquet(path)
        .where(F.col("zblock").isin(blocks))
        .where(
            (F.col(xcol) % (1 << ZBITS)).between(x_lo, x_hi)
            & (F.col(ycol) % (1 << ZBITS)).between(y_lo, y_hi)
        )
    )
