"""Deterministic decade-up fixture generator (sf0.1 -> sf1 drill).

Replicates a driver-generated sf directory N times (default 10) with
key-range shifts that preserve referential integrity, so the full
oracle suite can be executed at 10x volume — the r10 verdict's
"sf1 decade-up oracle drill" (execute the documented fixed-point /
2^53 ceilings instead of arguing them). The output is NOT the
driver's own sf1 distribution (no generator was shipped); it does
not need to be: the drill's property is Spark and DuckDB agreeing
on the SAME 10x parquet, with aggregate magnitudes (fixed-point
sums, sketch register sums, window counts) 10x larger.

Shifts (replica r in [0, N)):
  customer.c_custkey   += r * max(c_custkey)
  supplier.s_suppkey   += r * max(s_suppkey)
  part.p_partkey       += r * max(p_partkey)
  orders.o_orderkey    += r * max(o_orderkey), o_custkey shifted
  lineitem             l_orderkey / l_partkey / l_suppkey shifted
  events.event_id      += r * max(event_id), user_id shifted
  documents.doc_id     += r * max(doc_id); text of replica r > 0 is
      perturbed by inserting a replica marker token every 16 tokens
      (position-dependent, content-independent: within-replica
      duplicate/near-duplicate relations are preserved exactly, all
      cross-replica 20-token windows are broken — dedup workloads
      scale as 10 independent corpora, ~linear, not quadratic);
      n_chars recomputed.
  embeddings.vec_id    += r * max(vec_id); replica r > 0 embeddings
      get a deterministic +/-5e-3-scale float32 perturbation keyed
      on (vec_id, dim) so cross-replica vectors are near but not
      bit-identical (no degenerate exact-tie top-k geometry).
  region / nation: copied as-is (fixed dims).

Timestamps are unchanged: per-day / per-user densities grow 10x,
which is the stress a 100 TB ingest actually applies.

Usage: python tools/gen_sf_scale.py [SRC] [DST] [N]
Defaults: /root/testdata/sf0.1  .sfscale/sf1  10
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MARK_EVERY = 16  # < substring window (20 tokens): breaks all cross-replica windows


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".sfscale/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def mx(table, col):
        return con.sql(f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    ck, sk, pk, ok = (
        mx("customer", "c_custkey"),
        mx("supplier", "s_suppkey"),
        mx("part", "p_partkey"),
        mx("orders", "o_orderkey"),
    )
    uid, eid, did, vid = (
        mx("events", "user_id"),
        mx("events", "event_id"),
        mx("documents", "doc_id"),
        mx("embeddings", "vec_id"),
    )

    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")

    plan = {
        "customer": {"c_custkey": ck},
        "supplier": {"s_suppkey": sk},
        "part": {"p_partkey": pk},
        "orders": {"o_orderkey": ok, "o_custkey": ck},
        "lineitem": {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk},
        "events": {"event_id": eid, "user_id": uid},
    }
    for t, shifts in plan.items():
        cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
        ]
        sel = ", ".join(
            f"({c} + r.r * {shifts[c]})::BIGINT AS {c}" if c in shifts else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' "
            f"CROSS JOIN (SELECT range AS r FROM range({n})) r "
            f"ORDER BY r.r) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: x{n}")

    # documents: position-keyed marker insertion for replicas > 0
    docs = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for r in range(n):
        for doc_id, text, lang, source in docs:
            if r > 0:
                toks = text.split(" ")
                marked = []
                for j, tk in enumerate(toks):
                    if j and j % MARK_EVERY == 0:
                        marked.append(f"zrep{r}m{j // MARK_EVERY}")
                    marked.append(tk)
                text = " ".join(marked)
            out["doc_id"].append(doc_id + r * did)
            out["text"].append(text)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(text))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
                "lang": pa.array(out["lang"], pa.string()),
                "source": pa.array(out["source"], pa.string()),
                "n_chars": pa.array(out["n_chars"], pa.int64()),
            }
        ),
        f"{dst}/documents.parquet",
    )
    print(f"documents: x{n} (marker every {MARK_EVERY} tokens)")

    # embeddings: deterministic float32 perturbation for replicas > 0
    emb = con.sql(
        f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    dim = len(emb[0][1])
    ids, vecs, labels = [], [], []
    for r in range(n):
        for vec_id, v, label in emb:
            a = np.asarray(v, dtype=np.float32)
            if r > 0:
                new_id = vec_id + r * vid
                j = np.arange(dim, dtype=np.int64)
                pert = (((new_id * 31 + j * 17 + r) % 997) - 498).astype(np.float32) * np.float32(1e-5)
                a = (a + pert).astype(np.float32)
            ids.append(vec_id + r * vid)
            vecs.append(a.tolist())
            labels.append(label)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{dst}/embeddings.parquet",
    )
    print(f"embeddings: x{n} (perturbed, dim={dim})")
    print(f"done -> {dst}")


if __name__ == "__main__":
    main()
