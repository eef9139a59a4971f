"""Split-projection experiment for the phash expression tree
(r12 verdict #9).

q_multimodal_phash_dedup's dHash is one unrolled 120-term projection
(64 ascii/substring pixel samples feeding 56 shifted comparisons).
That single expression exceeds the JVM codegen method limit, so the
projection evaluates INTERPRETED (documented at multimodal_q.py) —
measured 30x faster than the HOF twin and still scan-bound, but the
verdict asks for one more variant: a two-stage staging that keeps
each stage under the method limit WITHOUT Catalyst re-collapsing it.

Variants measured (best-of-N wall to materialize the (doc_id, phash)
frame via localCheckpoint, same terminal op as production):

- ``unrolled``  — the shipped form: one 120-term projection.
- ``staged``    — stage 1 projects the 64 pixel columns (64 small
  independent exprs, method-splittable, codegen'd), BARRIER via
  localCheckpoint (the only reliable anti-collapse fence — struct or
  array staging is undone by SimplifyExtractValueOps / CollapseProject,
  and an un-fenced double select wedges analysis on the duplicated
  tree), stage 2 assembles the 56 comparison bits (small, codegen'd).
  Cost of the fence: materializing 64 ints/doc.

Keep whichever measures faster; record the numbers in SCALE.md either
way.

Usage: python tools/exp_phash_split.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from twitter_etl_spark.queries.multimodal_q import (  # noqa: E402
    _PH_COLS,
    _PH_PIX,
    _PH_ROWS,
    phash_frame,
)
from twitter_etl_spark.session import get_spark  # noqa: E402
from twitter_etl_spark.tables import table  # noqa: E402


def phash_frame_staged(d):
    """Two-stage variant: pixel projection || fence || bit assembly."""
    ln = F.length("text")
    stride = F.greatest(F.floor(ln / _PH_PIX).cast("int"), F.lit(1))
    pix = d.select(
        "doc_id",
        *[
            F.ascii(
                F.substring(
                    F.col("text"), ((F.lit(i) * stride) % ln + 1).cast("int"), 1
                )
            ).alias(f"p{i}")
            for i in range(_PH_PIX)
        ],
    ).localCheckpoint()
    bit_terms = []
    k = 0
    for r in range(_PH_ROWS):
        for c in range(_PH_COLS - 1):
            bit_terms.append(
                F.shiftleft(
                    (
                        F.col(f"p{r * _PH_COLS + c}")
                        > F.col(f"p{r * _PH_COLS + c + 1}")
                    ).cast("long"),
                    k,
                )
            )
            k += 1
    phash = sum(bit_terms[1:], bit_terms[0])
    return pix.select("doc_id", phash.alias("phash")).localCheckpoint()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("exp-phash-split")
    d = table(spark, args.sf, "documents")
    n = d.count()  # warm the scan
    results = {}
    for name, fn in (("unrolled", phash_frame), ("staged", phash_frame_staged)):
        best = math.inf
        for _ in range(args.runs):
            t0 = time.time()
            h = fn(d)
            h.count()
            best = min(best, time.time() - t0)
            h.unpersist()
        results[name] = best
        print(f"{name}: best-of-{args.runs} {best:.3f}s over {n} docs", flush=True)
    # sanity: identical hashes
    a = phash_frame(d).withColumnRenamed("phash", "ha")
    b = phash_frame_staged(d).withColumnRenamed("phash", "hb")
    diff = a.join(b, "doc_id").where(F.col("ha") != F.col("hb")).count()
    print(f"hash agreement: {'OK' if diff == 0 else f'{diff} DIFFER'}")
    win = min(results, key=results.get)
    print(f"winner: {win} ({results[win]:.3f}s vs {max(results.values()):.3f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
