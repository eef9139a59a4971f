"""Spark-side sf1 drill for q_llm_curation_neardup (q_geo_dbscan
posture: the DuckDB oracle's recursive label-spread CTE is
prohibitive at the sf1 decade because replica corpora MERGE near-dup
components across replicas, so the certifiable sf1 contract is an
independent Spark-side pin):

1. build the keeper frame and the verified banded-MinHash pair set,
2. run ``graph.star_components`` over it (the funnel's CC stage),
3. union-find the SAME collected pair set in pure Python,
4. assert label-for-label equality (component minima),
5. recompute the funnel counts from the labels + keeper flags and
   assert they equal ``q_llm_curation_neardup``'s output.

Usage: python tools/drill_neardup_cc.py [SF_DIR]   (default .sfscale/sf1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def union_find_labels(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Min-label connected components by path-compressed union-find."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by MIN root so the representative is the min id
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def main() -> int:
    from pyspark.sql import functions as F

    from twitter_etl_spark.queries.corpus import (
        _keeper_frame,
        _neardup_clusters,
        minhash_banded_pairs,
        q_llm_curation_neardup,
    )
    from twitter_etl_spark.queries.dedup import _shingles
    from twitter_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".sfscale/sf1"
    spark = get_spark("drill-neardup-cc")
    t0 = time.time()
    g = _keeper_frame(spark, sf_dir).localCheckpoint()
    sh = g.select(
        "doc_id", F.split(F.trim("nm"), r"\s+").alias("toks")
    ).select("doc_id", _shingles().alias("s")).filter(F.size("s") > 0)
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_banded_pairs(sh)
        .select("doc_a", "doc_b")
        .collect()
    ]
    got = {
        r["node"]: r["cluster_id"]
        for r in _neardup_clusters(g).collect()
    }
    want = union_find_labels(pairs)
    assert got == want, (
        f"star_components diverges from union-find: "
        f"{len(got)} vs {len(want)} nodes, "
        f"{sum(1 for k in got if got[k] != want.get(k))} label mismatches"
    )
    # funnel recomputation from labels + keeper flags
    from twitter_etl_spark.curation import MIN_TOKENS
    from twitter_etl_spark.queries.sampling import hash_bucket
    from twitter_etl_spark.queries.similarity import q_dedup_semantic_adaptive

    sem = {
        r["vec_id"]: r["kept"]
        for r in q_dedup_semantic_adaptive(spark, sf_dir)
        .select("vec_id", "kept")
        .collect()
    }
    ks = g.select(
        "doc_id",
        "cnt",
        (F.size(F.split(F.trim("nm"), r"\s+")) >= MIN_TOKENS)
        .cast("int")
        .alias("qflag"),
        F.when(hash_bucket(F.col("dg")) < 80, "train")
        .when(hash_bucket(F.col("dg")) < 90, "val")
        .otherwise("test")
        .alias("split"),
    ).collect()
    funnel = {"input": 0, "exact_dedup": 0, "neardup_dedup": 0,
              "semantic_dedup": 0, "quality": 0,
              "split_train": 0, "split_val": 0, "split_test": 0}
    for r in ks:
        funnel["input"] += r["cnt"]
        funnel["exact_dedup"] += 1
        nd = 1 if want.get(r["doc_id"], r["doc_id"]) == r["doc_id"] else 0
        funnel["neardup_dedup"] += nd
        sk = nd * sem.get(r["doc_id"], 1)
        funnel["semantic_dedup"] += sk
        q = sk * r["qflag"]
        funnel["quality"] += q
        if q:
            funnel[f"split_{r['split']}"] += 1
    got_funnel = {
        r["stage"]: r["n_docs"]
        for r in q_llm_curation_neardup(spark, sf_dir).collect()
    }
    assert got_funnel == funnel, (got_funnel, funnel)
    print(
        f"OK {sf_dir}: {len(pairs)} verified pairs, "
        f"{len(got)} clustered nodes, funnel {got_funnel}, "
        f"{round(time.time() - t0, 1)}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
