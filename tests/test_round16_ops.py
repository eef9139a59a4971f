"""Round-16 operator pins.

Covers the r15 ADVICE fixes and the r16-new operators: out-of-order
curation absorption (the left_anti merge kept the FIRST-absorbed
keeper, silently diverging from one-shot curate() when a batch
arrived out of doc_id order), plus pins added as r16 ops land.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_curation_rollup_out_of_order_batches(spark, tmp_path):
    """r15 advice (rollup.py update_curation_rollup): absorbing the
    HIGH doc_id half before the low half must still elect the global
    min-doc_id keeper per digest — the merge re-elects
    min_by(doc_id) across prev ∪ fresh, so curation_keeplist is
    row-identical to one-shot curate() in ANY batch order, not just
    the append-only monotone shape."""
    from twitter_etl_spark.curation import curate
    from twitter_etl_spark.queries.similarity import q_dedup_semantic_adaptive
    from twitter_etl_spark.rollup import (
        curation_keeplist,
        update_curation_rollup,
    )
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    embs = table(spark, sf, "embeddings")
    mid = 250
    d = str(tmp_path / "cur_ooo")
    # reversed order: high half first
    update_curation_rollup(
        spark, d, docs.filter(F.col("doc_id") >= mid),
        embs.filter(F.col("vec_id") >= mid),
    )
    update_curation_rollup(
        spark, d, docs.filter(F.col("doc_id") < mid),
        embs.filter(F.col("vec_id") < mid),
    )
    got = sorted(
        (r["doc_id"], r["norm_digest"], r["split"])
        for r in curation_keeplist(spark, d).collect()
    )
    keep = q_dedup_semantic_adaptive(spark, sf).select("vec_id", "kept")
    want = sorted(
        (r["doc_id"], r["norm_digest"], r["split"])
        for r in curate(docs, semantic_keep=keep)
        .select("doc_id", "norm_digest", "split")
        .collect()
    )
    assert got == want
    assert len(got) > 0
