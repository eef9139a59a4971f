"""Similarity math vs numpy; multimodal decode plumbing."""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import functions as F

from twitter_etl_spark.multimodal import (
    attach_binary_payload,
    decode_features,
    _decode_one,
)
from twitter_etl_spark.queries.similarity import _as_double, cosine


def test_cosine_matches_numpy(spark):
    a = [0.1, -0.2, 0.3, 0.4]
    b = [0.4, 0.1, -0.2, 0.9]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(
        cosine(_as_double(F.col("a")), _as_double(F.col("b"))).alias("c")
    ).first()["c"]
    want = float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    )
    assert math.isclose(got, want, rel_tol=1e-12)


def test_neardup_hot_block_cap(spark):
    """Labels whose block exceeds max_block are excluded from exact
    pairing (their recall is the ANN path's job); small blocks are
    unaffected, and the diagnostic names the dropped label."""
    import os
    import tempfile

    from twitter_etl_spark.queries.similarity import (
        neardup_dropped_labels,
        q_sim_embedding_neardup,
    )

    unit = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, unit, 1) for i in range(1, 5)]  # hot label 1: block of 4
    rows += [(10, [0.0, 1.0, 0.0, 0.0], 2), (11, [0.0, 0.9, 0.1, 0.0], 2)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    capped = q_sim_embedding_neardup(spark, d, max_block=3)
    assert {(r["vec_a"], r["vec_b"]) for r in capped.collect()} == {(10, 11)}

    full = q_sim_embedding_neardup(spark, d)  # default cap: untouched
    assert full.count() == 1 + 6  # label-2 pair + all label-1 pairs

    dropped = neardup_dropped_labels(spark, d, max_block=3).collect()
    assert [(r["label"], r["block_size"]) for r in dropped] == [(1, 4)]


def test_decode_one_deterministic_and_guarded():
    assert _decode_one(b"") == [0.0, 0.0, 0.0, 0.0]
    f = _decode_one(b"abcd")
    assert f == [4.0, float(ord("a")), float(ord("d")), float(sum(b"abcd") % 997)]
    assert _decode_one(b"abcd") == f


def test_decode_one_uses_real_codec_when_present(monkeypatch):
    """With a (fake) PIL importable, _decode_one must take the
    real-codec path — decode, no raise (the r6 guard raised
    NotImplementedError in exactly this case) — and must fall back
    to the byte stub when that codec rejects the payload."""
    import sys
    import types

    class FakeImg:
        size = (64, 32)

        def convert(self, mode):
            return self

        def resize(self, wh):
            return self

        def getdata(self):
            return [10] * 63 + [20]

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    calls = {}

    def fake_open(buf):
        calls["opened"] = True
        if buf.getvalue() == b"not-an-image":
            raise OSError("cannot identify image file")
        return FakeImg()

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = fake_open
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    feats = _decode_one(b"\x89PNG-ish")
    assert calls["opened"]
    # width, height, mean of 8x8 gray, spread
    assert feats == [64.0, 32.0, (10 * 63 + 20) / 64.0, 10.0]
    # codec present but payload undecodable -> byte-stub fallback, no raise
    stub = _decode_one(b"not-an-image")
    assert stub[0] == float(len(b"not-an-image"))


def test_multimodal_pipeline_schema(spark):
    df = spark.createDataFrame(
        [(1, "hello world", "en", "s", 11)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = decode_features(attach_binary_payload(df))
    row = out.first()
    assert row["modality"] == "text-as-bytes"
    assert row["n_bytes"] == 11
    assert len(row["features"]) == 4
    assert row["features"][0] == 11.0


def test_semantic_dedup_consistent_with_neardup_pairs(spark):
    """q_dedup_semantic's drop-set must be exactly the distinct
    higher-id side of the near-dup pair list, every vector must
    appear exactly once, and the rule is greedy-by-id: dropped iff
    similar to ANY lower id (not only to surviving ones)."""
    from twitter_etl_spark.queries.similarity import (
        q_dedup_semantic,
        q_sim_embedding_neardup,
    )
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    out = q_dedup_semantic(spark, sf).collect()
    n_vecs = table(spark, sf, "embeddings").count()
    assert len(out) == n_vecs
    dropped = {r["vec_id"] for r in out if r["kept"] == 0}
    pair_bs = {
        r["vec_b"] for r in q_sim_embedding_neardup(spark, sf).collect()
    }
    assert dropped == pair_bs


def test_semantic_dedup_overcap_cell_marked_unjudged(spark):
    """r13 verdict #2: a cell past MAX_BLOCK_SIZE passes its vectors
    through kept=1 — that hand-off must now be OBSERVABLE as
    judged=0 (previously a silent no-dedup cliff). Under-cap cells
    keep judged=1 and still dedup exact twins."""
    import os
    import tempfile

    from twitter_etl_spark.queries.similarity import (
        MAX_BLOCK_SIZE,
        q_dedup_semantic,
    )

    hot = [(i, [1.0, 0.0, 0.0, 0.0], 7) for i in range(MAX_BLOCK_SIZE + 5)]
    cold = [(100000, [0.0, 1.0, 0.0, 0.0], 8), (100001, [0.0, 1.0, 0.0, 0.0], 8)]
    df = spark.createDataFrame(
        hot + cold, ["vec_id", "embedding", "label"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    out = q_dedup_semantic(spark, d).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(out) == len(hot) + 2
    # over-cap cell: every vector unjudged and passed through kept
    for i in range(MAX_BLOCK_SIZE + 5):
        assert by_id[i]["judged"] == 0 and by_id[i]["kept"] == 1
    # under-cap cell: judged, and the exact twin dropped
    assert by_id[100000]["judged"] == 1 and by_id[100000]["kept"] == 1
    assert by_id[100001]["judged"] == 1 and by_id[100001]["kept"] == 0


def test_kmeans_matches_numpy_replica(spark):
    """q_sim_kmeans vs a step-for-step NumPy Lloyd replica (same
    deterministic init, same tie-break, same empty-cluster rule):
    cluster sizes must match exactly, mean-d2 and centroid norms to
    the rounding the query emits, and total SSE must be monotonely
    non-increasing across the Spark-side rounds."""
    from twitter_etl_spark.queries.similarity import (
        _KMEANS_ITERS,
        _KMEANS_K,
        _kmeans_assign,
        q_sim_kmeans,
    )
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = (
        table(spark, sf, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = sorted((r["vec_id"], np.array(r["embedding"], dtype=np.float64)) for r in rows)
    X = np.stack([v for _, v in by_id])
    cents = X[: _KMEANS_K].copy()

    def assign(C):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1), d2.min(axis=1)  # argmin -> lowest cid on ties

    sses = []
    for _ in range(_KMEANS_ITERS):
        lab, d2 = assign(cents)
        sses.append(d2.sum())
        for c in range(_KMEANS_K):
            if (lab == c).any():
                cents[c] = X[lab == c].mean(axis=0)
    lab, d2 = assign(cents)
    sses.append(d2.sum())
    assert all(b <= a + 1e-9 for a, b in zip(sses, sses[1:]))

    got = {r["cluster"]: r for r in q_sim_kmeans(spark, sf).collect()}
    import collections

    want_sizes = collections.Counter(lab.tolist())
    assert {c: r["n_vecs"] for c, r in got.items()} == dict(want_sizes)
    for c, r in got.items():
        assert math.isclose(
            r["mean_d2"], round(float(d2[lab == c].mean()), 4), abs_tol=2e-4
        )
        assert math.isclose(
            r["centroid_norm"],
            round(float(np.linalg.norm(cents[c])), 4),
            abs_tol=2e-4,
        )


def test_pq_trained_matches_numpy_replica(spark):
    """q_sim_ann_pq_trained vs a step-for-step NumPy PQ replica:
    per-subspace Lloyd training with the same deterministic init
    (ksub lowest-vec_id subvectors), same argmin-lowest-cid
    tie-break, same empty-cluster rule; then identical code
    assignment, ADC scoring against the reconstruction, shortlist
    and exact refine. Codes must match exactly; pq_score/cos_sim to
    float-association tolerance; per-query top-10 overlap >= 9/10
    (boundary ties may reorder across float op orders). Also records
    the recall-vs-exact number SCALE.md quotes."""
    from twitter_etl_spark.queries.similarity import (
        _PQ_ITERS,
        _PQ_KSUB,
        _PQ_M,
        q_sim_ann_pq_trained,
    )
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = (
        table(spark, sf, "embeddings").select("vec_id", "embedding").collect()
    )
    by_id = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64)) for r in rows
    )
    ids = np.array([i for i, _ in by_id])
    X = np.stack([v for _, v in by_id])
    dim = X.shape[1]
    d_sub = dim // _PQ_M

    # --- replica training (per subspace) ---
    book = []
    for j in range(_PQ_M):
        S = X[:, j * d_sub : (j + 1) * d_sub]
        C = S[:_PQ_KSUB].copy()
        for _ in range(_PQ_ITERS):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            lab = d2.argmin(axis=1)  # argmin -> lowest cid on ties
            for c in range(_PQ_KSUB):
                if (lab == c).any():
                    C[c] = S[lab == c].mean(axis=0)
        book.append(C)

    def encode(x):
        return [
            int(
                (
                    (book[j] - x[j * d_sub : (j + 1) * d_sub]) ** 2
                ).sum(axis=1).argmin()
            )
            for j in range(_PQ_M)
        ]

    def reconstruct(codes):
        return np.concatenate([book[j][codes[j]] for j in range(_PQ_M)])

    qmask, cmask = ids < 5, ids >= 5
    out = []
    for qi, qv in zip(ids[qmask], X[qmask]):
        qn = np.linalg.norm(qv)
        scored = []
        for ci, cv in zip(ids[cmask], X[cmask]):
            rec = reconstruct(encode(cv))
            pq = round(float(qv @ rec / (qn * np.linalg.norm(rec))), 6)
            cos = round(float(qv @ cv / (qn * np.linalg.norm(cv))), 6)
            scored.append((ci, pq, cos))
        sl = sorted(scored, key=lambda t: (-t[1], t[0]))[:100]
        top = sorted(sl, key=lambda t: (-t[2], t[0]))[:10]
        out.extend(
            (int(qi), int(ci), pq, cos, rk + 1)
            for rk, (ci, pq, cos) in enumerate(top)
        )
    want = {(q, c): (pq, cos, rk) for q, c, pq, cos, rk in out}

    got = q_sim_ann_pq_trained(spark, sf).collect()
    assert len(got) == len(want) == 50
    by_q_got: dict = {}
    for r in got:
        by_q_got.setdefault(r["query_id"], set()).add(r["cand_id"])
    by_q_want: dict = {}
    for q, c, *_ in out:
        by_q_want.setdefault(q, set()).add(c)
    for q in by_q_want:
        assert len(by_q_got[q] & by_q_want[q]) >= 9  # ulp-tie tolerance
    for r in got:
        key = (r["query_id"], r["cand_id"])
        if key in want:
            pq, cos, _ = want[key]
            assert abs(r["pq_score"] - pq) < 1e-4
            assert abs(r["cos_sim"] - cos) < 1e-5

    # recall vs exact top-10 (the SCALE.md number): exact = top-10
    # by true cosine over ALL candidates
    recalls = []
    for qi, qv in zip(ids[qmask], X[qmask]):
        qn = np.linalg.norm(qv)
        cos_all = sorted(
            (
                (
                    -round(float(qv @ cv / (qn * np.linalg.norm(cv))), 6),
                    int(ci),
                )
                for ci, cv in zip(ids[cmask], X[cmask])
            ),
        )[:10]
        exact = {c for _, c in cos_all}
        recalls.append(len(by_q_got[int(qi)] & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.8  # trained 16-code book


def test_rhp_lsh_refine_sound_and_recall_pinned(spark):
    """q_sim_lsh_rhp: every emitted pair really clears the cosine
    threshold (candidate generation may be approximate; the refine
    is exact), and the banded geometry recovers >= 75% of the exact
    label-blocked twin's pairs at the oracle scale — the measured
    recall for 8x4 banding in this fixture's weak (theta ~ 69 deg)
    regime, deterministic because the hyperplanes are fixed
    literals."""
    from tests.conftest import SF_ORACLE
    from twitter_etl_spark.queries.similarity import (
        _RHP_THRESHOLD,
        q_sim_embedding_neardup,
        q_sim_lsh_rhp,
    )

    got = q_sim_lsh_rhp(spark, SF_ORACLE).collect()
    assert got
    assert all(r["cos_sim"] >= _RHP_THRESHOLD for r in got)
    truth = {
        (r["vec_a"], r["vec_b"])
        for r in q_sim_embedding_neardup(spark, SF_ORACLE).collect()
    }
    found = {(r["vec_a"], r["vec_b"]) for r in got}
    recall = len(found & truth) / len(truth)
    assert recall >= 0.75, f"recall {recall:.3f} below the 8x4-band pin"


def test_lsh_rhp_strict_recalls_twins_and_prunes(spark):
    """q_sim_lsh_rhp_strict (r8 verdict #8): the 0.9-regime config
    must (a) emit ONLY true 0.9+ pairs — on this fixture exactly the
    deterministic perturbed twins, since no natural pair exceeds
    cos 0.61 — and (b) recall >= 0.9 of them (6 long 8-bit bands at
    twin cosine ~0.95 predict ~0.96; sf0.1 measured 0.9675 with a
    15x candidate-admission collapse vs the weak 8x4 config,
    SCALE.md r9)."""
    from tests.conftest import SF_ORACLE
    from twitter_etl_spark.queries.similarity import (
        _RHP_S_THRESHOLD,
        _RHP_TWIN_OFFSET,
        q_sim_lsh_rhp_strict,
    )
    from twitter_etl_spark.tables import table

    got = q_sim_lsh_rhp_strict(spark, SF_ORACLE).collect()
    assert got
    assert all(r["cos_sim"] >= _RHP_S_THRESHOLD for r in got)
    # every emitted pair is an (original, twin) pair
    assert all(r["vec_b"] - r["vec_a"] == _RHP_TWIN_OFFSET for r in got)
    n_vec = table(spark, SF_ORACLE, "embeddings").count()
    recall = len(got) / n_vec
    assert recall >= 0.9, f"strict recall {recall:.3f} below the 6x8-band pin"


def test_ann_lsh_self_audit_recall_column(spark):
    """The self-auditing recall column (r10 verdict stretch): every
    q_sim_ann_lsh row carries its query's recall@10 vs the exact
    cosine top-10 computed inside the query. Pin >= 0.9 per query
    (measured: 0.9-1.0 at sf0.01, deterministic) so the driver's
    rows-only record itself proves quality."""
    from twitter_etl_spark.queries.similarity import q_sim_ann_lsh

    rows = q_sim_ann_lsh(spark, "/root/testdata/sf0.01").collect()
    per_q = {r["query_id"]: r["recall_at_10"] for r in rows}
    assert len(per_q) == 5
    assert all(v >= 0.9 for v in per_q.values()), per_q


def test_paired_shard_manifest_and_writer(spark, tmp_path):
    """The cross-modal pair contract, end to end: (1) in the
    manifest, every doc contributes exactly one payload and one
    caption entry with the SAME (pack_group, shard_seq) — a sample
    never splits across tars — and the caption starts exactly where
    the payload ends; (2) export_paired_shards lays partitions out
    so reading any one (pack_group, shard_seq) directory yields both
    kinds for every doc_id in it, in byte_offset order, with content
    lengths matching the manifest byte counts."""
    from twitter_etl_spark.multimodal import export_paired_shards
    from twitter_etl_spark.queries.multimodal_q import (
        q_multimodal_pair_manifest,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_multimodal_pair_manifest(spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["kind"]] = r
    for doc_id, kinds in by_doc.items():
        assert set(kinds) == {"payload", "caption"}, doc_id
        p, c = kinds["payload"], kinds["caption"]
        assert (p["pack_group"], p["shard_seq"]) == (
            c["pack_group"],
            c["shard_seq"],
        ), doc_id
        assert c["byte_offset"] == p["byte_offset"] + p["n_bytes"], doc_id
    # shards actually roll over within at least one pack group
    assert len({(r["pack_group"], r["shard_seq"]) for r in rows}) > len(
        {r["pack_group"] for r in rows}
    )

    out = str(tmp_path / "paired_shards")
    export_paired_shards(
        spark.read.parquet(f"{sf}/documents.parquet"), out
    )
    back = spark.read.parquet(out)
    # partition columns survive and every entry carries content of
    # exactly the manifest's byte count
    got = back.select(
        "doc_id", "kind", "n_bytes", "byte_offset",
        F.octet_length("content").alias("clen"),
        "pack_group", "shard_seq",
    ).collect()
    assert len(got) == len(rows)
    for r in got:
        assert r["clen"] == r["n_bytes"], (r["doc_id"], r["kind"])
    # spot-read ONE shard directory partition-pruned: both kinds per doc
    any_r = got[0]
    one = spark.read.parquet(out).where(
        (F.col("pack_group") == any_r["pack_group"])
        & (F.col("shard_seq") == any_r["shard_seq"])
    )
    per_doc = (
        one.groupBy("doc_id").agg(F.collect_set("kind").alias("kinds"))
    ).collect()
    assert per_doc and all(set(r["kinds"]) == {"payload", "caption"} for r in per_doc)


def test_semantic_adaptive_equals_oneshot_when_cells_small(spark):
    """With every coarse cell at or under _SEM_TARGET_OCC the
    adaptive grid does not refine (divisor 256 -> prefix 0), so
    q_dedup_semantic_adaptive must be ROW-IDENTICAL to
    q_dedup_semantic — the fixture-independence claim's base case.
    The precondition is asserted, not assumed."""
    from twitter_etl_spark.queries.similarity import (
        _SEM_TARGET_OCC,
        q_dedup_semantic,
        q_dedup_semantic_adaptive,
    )
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    occ = (
        table(spark, sf, "embeddings").groupBy("label").count().collect()
    )
    assert max(r["count"] for r in occ) <= _SEM_TARGET_OCC
    a = {
        (r["vec_id"], r["label"], r["kept"])
        for r in q_dedup_semantic_adaptive(spark, sf).collect()
    }
    oneshot = q_dedup_semantic(spark, sf).collect()
    b = {(r["vec_id"], r["label"], r["kept"]) for r in oneshot}
    assert a == b
    # every cell under cap here, so the one-shot judged everything
    assert all(r["judged"] == 1 for r in oneshot)


def test_semantic_adaptive_refines_hot_cell_and_keeps_exact_twins(spark):
    """A coarse cell pushed past _SEM_TARGET_OCC must (a) actually
    split — its pair stage runs on strictly smaller refined cells —
    and (b) NEVER separate exact-duplicate vectors: identical
    embeddings have identical sign bits, so twin pairs survive any
    refinement depth and the duplicate is still dropped. This is
    the recall floor the LSH hand-off note promises."""
    import os
    import tempfile

    import numpy as np

    from twitter_etl_spark.queries.similarity import (
        _SEM_TARGET_OCC,
        q_dedup_semantic_adaptive,
    )

    rng = np.random.RandomState(7)
    n = _SEM_TARGET_OCC + 88  # one hot label -> 1 refinement bit
    base = rng.randn(n, 64).astype(np.float32)
    # orthogonalize-ish: scale so most random pairs are < 0.35 cos
    rows = [(i, base[i].tolist(), 1) for i in range(n)]
    # exact twins: 5 duplicates of the first 5 vectors, higher ids
    rows += [(1000 + i, base[i].tolist(), 1) for i in range(5)]
    df = spark.createDataFrame(
        rows, ["vec_id", "embedding", "label"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))

    out = {r["vec_id"]: r["kept"] for r in q_dedup_semantic_adaptive(spark, d).collect()}
    assert len(out) == n + 5
    for i in range(5):  # every exact twin dropped, original kept
        assert out[1000 + i] == 0, f"twin of {i} escaped refinement"
        assert out[i] == 1

    # (a) the hot cell ACTUALLY splits (r13 advice: twin recall alone
    # would stay green if the divisor ladder regressed to never
    # refine). NumPy replica of the plan's cell assignment: occupancy
    # n+5 in (TARGET, 2*TARGET] -> 1 refinement bit -> divisor 128,
    # so the sign-prefix must land vectors in >1 distinct refined
    # cell for this rng (which it does — pinned here).
    from twitter_etl_spark.queries.similarity import SEM_REFINE_PLANES

    assert _SEM_TARGET_OCC < n + 5 <= 2 * _SEM_TARGET_OCC
    eq = np.floor(base.astype(np.float64) * 1000 + 0.5)
    planes = np.array(SEM_REFINE_PLANES, dtype=np.float64)  # (8, dim)
    bits = (eq @ planes.T > 0).astype(np.int64)  # (n, 8)
    weights = 1 << np.arange(7, -1, -1)
    refined = (bits @ weights) // 128  # divisor for 1-bit refinement
    assert len(set(refined.tolist())) > 1, "hot cell did not split"
