"""sf1 -> sf10 cap-bound drill for q_dedup_semantic (r12 verdict #5).

The one standing scaling flag is q_dedup_semantic's 1.31 decade
slope at sf0.1 -> sf1. Root cause (recorded in SCALE.md): the
decade-up fixture replicates vectors but KEEPS their labels, so the
coarse cells grow 10x in OCCUPANCY (218 -> 2,180) while staying
under the MAX_BLOCK_SIZE=4096 hot-cell cap — within-cell exact
pairing is quadratic in occupancy by design, so the fixture's
fixed-K growth is the stress case and the superlinear slope is the
pair stage doing exactly what it documents. The claim that retires
the flag: ONE more decade pushes every cell over the cap, the pair
stage hands off to the ANN path (over-cap cells pass through kept),
and the query's cost collapses to scan + the tiny cell-size agg.

This tool MEASURES that claim. It builds embeddings-only fixtures at
x10 (sf1-equivalent) and x100 (sf10-equivalent) of sf0.1 with the
exact perturbation scheme of tools/gen_sf_scale.py, then reports per
scale:

- max / p50 cell occupancy, and how many of the fixture's cells are
  under the 4096 cap (i.e. still enter the pair stage);
- the pair-stage candidate row count (0 once every cell is over-cap);
- best-of-N wall time for the full q_dedup_semantic plan and the
  resulting decade slopes.

Expected shape: slope(sf0.1 -> sf1) ~ 1.3 (the known flag), then
slope(sf1 -> sf10) far BELOW 1.0 because the quadratic term is gone
— the cap bounding the pair stage, shown with numbers rather than
argued. Writes the table to stdout for SCALE.md.

Usage: python tools/drill_semdedup_cap.py [--runs N]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from twitter_etl_spark.queries.similarity import (  # noqa: E402
    MAX_BLOCK_SIZE,
    q_dedup_semantic,
    q_sim_embedding_neardup,
)
from twitter_etl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def gen_embeddings(dst_dir: str, n: int) -> None:
    """Embeddings-only replica of gen_sf_scale.py (same perturbation)."""
    os.makedirs(dst_dir, exist_ok=True)
    out = os.path.join(dst_dir, "embeddings.parquet")
    if os.path.exists(out):
        return
    con = duckdb.connect()
    emb = con.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    vid = max(r[0] for r in emb) + 1
    dim = len(emb[0][1])
    base = np.asarray([r[1] for r in emb], dtype=np.float32)
    ids0 = np.asarray([r[0] for r in emb], dtype=np.int64)
    labels0 = np.asarray([r[2] for r in emb], dtype=np.int32)
    j = np.arange(dim, dtype=np.int64)
    ids, vecs, labels = [], [], []
    for r in range(n):
        new_ids = ids0 + r * vid
        a = base
        if r > 0:
            pert = (
                ((new_ids[:, None] * 31 + j[None, :] * 17 + r) % 997) - 498
            ).astype(np.float32) * np.float32(1e-5)
            a = (base + pert).astype(np.float32)
        ids.append(new_ids)
        vecs.append(a)
        labels.append(labels0)
    allv = np.concatenate(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(ids), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in allv], pa.list_(pa.float32())
                ),
                "label": pa.array(np.concatenate(labels), pa.int32()),
            }
        ),
        out,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    scales = [
        ("sf0.1", SRC, None),
        ("sf1e", os.path.join(ROOT, ".sfscale", "embx10"), 10),
        ("sf10e", os.path.join(ROOT, ".sfscale", "embx100"), 100),
    ]
    for _, d, n in scales[1:]:
        t0 = time.time()
        gen_embeddings(d, n)
        print(f"fixture {d} (x{n}): {time.time() - t0:.1f}s", flush=True)

    spark = get_spark("drill-semdedup-cap")
    rows = []
    for name, d, _ in scales:
        # cell-occupancy profile + cells entering the pair stage
        prof = (
            spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            .groupBy("label")
            .count()
            .toPandas()
        )
        under = prof[prof["count"] <= MAX_BLOCK_SIZE]
        n_pairs_candidates = int(
            (under["count"] * (under["count"] - 1) // 2).sum()
        )
        pair_rows = q_sim_embedding_neardup(spark, d).count()
        best = math.inf
        for _ in range(args.runs):
            t0 = time.time()
            q_dedup_semantic(spark, d).count()
            best = min(best, time.time() - t0)
        rows.append(
            {
                "scale": name,
                "n_vecs": int(prof["count"].sum()),
                "cells": int(len(prof)),
                "cells_under_cap": int(len(under)),
                "max_cell": int(prof["count"].max()),
                "cand_dot_products": n_pairs_candidates,
                "pair_rows_emitted": int(pair_rows),
                "best_s": round(best, 3),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print("\n| scale | vecs | cells | under cap | max cell | cand dots | pairs | best s | slope |")
    print("|---|---|---|---|---|---|---|---|---|")
    prev = None
    for r in rows:
        slope = (
            round(math.log10(r["best_s"] / prev["best_s"]), 3)
            if prev and prev["best_s"] > 0
            else ""
        )
        print(
            f"| {r['scale']} | {r['n_vecs']} | {r['cells']} | "
            f"{r['cells_under_cap']} | {r['max_cell']} | "
            f"{r['cand_dot_products']} | {r['pair_rows_emitted']} | "
            f"{r['best_s']} | {slope} |"
        )
        prev = r
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
