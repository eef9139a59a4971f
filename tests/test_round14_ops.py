"""Round-14 operator tests: adaptive semantic-dedup rollup/probe,
CDC merge with deletes, mutual-kNN cluster resolution, cross-modal
alignment scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_semdedup_adaptive_rollup_keeplist_equals_oneshot(spark, tmp_path):
    """Absorbing the sf0.001 embeddings in two chunks and
    regenerating the keep-list from the persisted adaptive state
    must be ROW-IDENTICAL to q_dedup_semantic_adaptive over the full
    table — the stream ≡ batch contract of the declared production
    spelling. Re-absorption is idempotent (pure-function state)."""
    from twitter_etl_spark.queries.similarity import q_dedup_semantic_adaptive
    from twitter_etl_spark.rollup import (
        read_version,
        semdedup_adaptive_keeplist,
        update_semdedup_adaptive_rollup,
    )
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    e = table(spark, sf, "embeddings")
    d = str(tmp_path / "sema")
    update_semdedup_adaptive_rollup(spark, d, e.filter(F.col("vec_id") % 2 == 0))
    update_semdedup_adaptive_rollup(spark, d, e.filter(F.col("vec_id") % 2 == 1))
    got = sorted(
        (r["vec_id"], r["label"], r["kept"])
        for r in semdedup_adaptive_keeplist(spark, d).collect()
    )
    want = sorted(
        (r["vec_id"], r["label"], r["kept"])
        for r in q_dedup_semantic_adaptive(spark, sf).collect()
    )
    assert got == want
    assert any(k == 0 for _, _, k in got)  # non-vacuous: dups exist
    n_before = read_version(spark, d).count()
    update_semdedup_adaptive_rollup(spark, d, e.filter(F.col("vec_id") % 2 == 0))
    assert read_version(spark, d).count() == n_before


def test_semdedup_adaptive_probe_equals_oneshot_on_batch(spark, tmp_path):
    """Probing a NEW batch against the persisted adaptive state
    (without absorbing) must equal the one-shot adaptive query over
    the union restricted to batch rows — the pairwise-drop-rule
    argument, now under occupancy-adaptive cells whose ladder counts
    state ∪ batch."""
    from twitter_etl_spark.queries.similarity import q_dedup_semantic_adaptive
    from twitter_etl_spark.rollup import (
        probe_semdedup_adaptive_rollup,
        update_semdedup_adaptive_rollup,
    )
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    e = table(spark, sf, "embeddings")
    base = e.filter(F.col("vec_id") % 3 != 0)
    batch = e.filter(F.col("vec_id") % 3 == 0)
    d = str(tmp_path / "sema_probe")
    update_semdedup_adaptive_rollup(spark, d, base)
    got = sorted(
        (r["vec_id"], r["label"], r["kept"])
        for r in probe_semdedup_adaptive_rollup(spark, d, batch).collect()
    )
    batch_ids = {r["vec_id"] for r in batch.select("vec_id").collect()}
    want = sorted(
        (r["vec_id"], r["label"], r["kept"])
        for r in q_dedup_semantic_adaptive(spark, sf).collect()
        if r["vec_id"] in batch_ids
    )
    assert got == want


def test_merge_cdc_tombstones_and_reinsert(spark):
    """q_merge_cdc: keys whose LAST op is a delete vanish from the
    snapshot; updated keys surface v2 with last_op U; the
    delete-then-reinsert key (%100 == 10) is resurrected at v3 with
    the +2.0 restated price; untouched keys stay v1/I."""
    from twitter_etl_spark.queries.incremental import q_merge_cdc
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    out = {r["o_orderkey"]: r for r in q_merge_cdc(spark, sf).collect()}
    base = {
        r["o_orderkey"]: round(r["o_totalprice"], 2)
        for r in table(spark, sf, "orders").collect()
    }
    n_deleted = n_upd = n_reins = 0
    for key, price in base.items():
        m = key % 100
        if 11 <= m < 16:
            assert key not in out, key  # tombstone won
            n_deleted += 1
        elif m == 10:
            r = out[key]  # deleted at v2, re-inserted at v3
            assert r["version"] == 3 and r["last_op"] == "I"
            assert r["o_totalprice"] == pytest.approx(price + 2.0)
            n_reins += 1
        elif m < 10:
            r = out[key]
            assert r["version"] == 2 and r["last_op"] == "U"
            assert r["o_totalprice"] == pytest.approx(price + 1.0)
            n_upd += 1
        else:
            r = out[key]
            assert r["version"] == 1 and r["last_op"] == "I"
    assert n_deleted and n_upd and n_reins  # fixture exercises all ops
    assert len(out) == len(base) - n_deleted


def test_knn_clusters_match_unionfind_replica(spark):
    """q_sim_knn_clusters vs a plain union-find over the collected
    q_sim_knn_graph edges: identical (vec_id -> component-min)
    mapping, sizes consistent, exactly one canon per cluster and it
    IS the minimum member."""
    from twitter_etl_spark.queries.similarity import (
        q_sim_knn_clusters,
        q_sim_knn_graph,
    )

    sf = "/root/testdata/sf0.001"
    edges = [
        (r["vec_a"], r["vec_b"]) for r in q_sim_knn_graph(spark, sf).collect()
    ]
    assert edges  # non-vacuous
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for node in parent:
        comp.setdefault(find(node), []).append(node)
    want = {}
    for root, members in comp.items():
        m = min(members)
        for node in members:
            want[node] = (m, len(members))
    rows = q_sim_knn_clusters(spark, sf).collect()
    got = {r["vec_id"]: (r["cluster_id"], r["cluster_size"]) for r in rows}
    assert got == want
    canons = [r for r in rows if r["canon"] == 1]
    assert len(canons) == len(comp)
    assert all(r["vec_id"] == r["cluster_id"] for r in canons)


def test_markov_stationary_matches_integer_replica(spark):
    """q_behavior_markov_stationary vs a step-for-step Python
    integer replica of the damped fixed-point recurrence (same
    quantized p_ij, same DIV floors, same round count) on the
    collected sf0.001 transition counts — and the result behaves
    like a distribution: every pi > 0 and Σ pi ≈ 1 (integer floors
    and dangling leak bound the gap)."""
    from twitter_etl_spark.queries.behavior import (
        _MK_DAMP,
        _MK_PSCALE,
        _MK_ROUNDS,
        _MK_SCALE,
        q_behavior_markov_stationary,
        q_behavior_transitions,
    )

    sf = "/root/testdata/sf0.001"
    trans = q_behavior_transitions(spark, sf).collect()
    out_deg: dict = {}
    for r in trans:
        out_deg[r["from_type"]] = out_deg.get(r["from_type"], 0) + r["n"]
    edges = [
        (r["from_type"], r["to_type"], (r["n"] * _MK_PSCALE) // out_deg[r["from_type"]])
        for r in trans
    ]
    states = sorted({s for e in edges for s in e[:2]})
    ns = len(states)
    rank = {s: _MK_SCALE // ns for s in states}
    for _ in range(_MK_ROUNDS):
        inflow = {s: 0 for s in states}
        for src, dst, p in edges:
            inflow[dst] += (rank[src] * p) // _MK_PSCALE
        rank = {
            s: (15 * (_MK_SCALE // ns)) // 100 + (_MK_DAMP * inflow[s]) // 100
            for s in states
        }
    want = {s: round(r / float(_MK_SCALE), 6) for s, r in rank.items()}
    got = {
        r["event_type"]: r["pi"]
        for r in q_behavior_markov_stationary(spark, sf).collect()
    }
    assert got == want
    assert all(v > 0 for v in got.values())
    assert 0.9 <= sum(got.values()) <= 1.000001


def test_align_score_replica_and_decile(spark):
    """q_multimodal_align_score vs a per-row Python replica of the
    stub features (byte-sample row sums x caption ascii%8 histogram)
    on a handful of docs, plus the flag contract: at least 10% of
    rows are flagged (percentile_disc includes the threshold row)
    and every flagged score <= every unflagged score."""
    import math

    from twitter_etl_spark.queries.multimodal_q import (
        _ALIGN_DIM,
        _PAIR_CAPTION_CHARS,
        _PH_COLS,
        _PH_PIX,
        q_multimodal_align_score,
    )
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = q_multimodal_align_score(spark, sf).collect()
    docs = {
        r["doc_id"]: (r["text"], r["lang"])
        for r in table(spark, sf, "documents").collect()
    }
    assert len(rows) == sum(1 for t, _ in docs.values() if t and len(t) > 0)

    def replica(text, lang):
        L = len(text)
        s = max(L // _PH_PIX, 1)
        px = [ord(text[(i * s) % L]) for i in range(_PH_PIX)]
        img = [
            sum(px[r * _PH_COLS + c] for c in range(_PH_COLS))
            for r in range(_ALIGN_DIM)
        ]
        cap = f"{lang}: {text[:_PAIR_CAPTION_CHARS]}"
        hist = [0] * _ALIGN_DIM
        for ch in cap:
            # explicit printable-ASCII classes (the r14 regex form):
            # chars outside 32..126 count nowhere
            if 32 <= ord(ch) <= 126:
                hist[ord(ch) % _ALIGN_DIM] += 1
        dot = sum(i * h for i, h in zip(img, hist))
        ni = math.sqrt(sum(i * i for i in img))
        nc = math.sqrt(sum(h * h for h in hist))
        return round(dot / (ni * nc), 6)

    for r in rows[:25]:
        text, lang = docs[r["doc_id"]]
        assert r["align_score"] == pytest.approx(replica(text, lang), abs=1e-6)
    flagged = [r["align_score"] for r in rows if r["low_align"] == 1]
    clear = [r["align_score"] for r in rows if r["low_align"] == 0]
    assert len(flagged) >= 0.10 * len(rows)
    assert max(flagged) <= min(clear)
