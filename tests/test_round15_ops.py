"""Round-15 operator tests: deterministic rollup survivors (r14
advice), plus the new composition/classifier/tokenizer operators as
they land."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_llm_curation_semantic_funnel_consistent(spark):
    """q_llm_curation_semantic: the funnel must be monotone
    (input >= exact >= semantic >= quality = train+val+test), the
    semantic stage must actually drop documents (non-vacuous on the
    fixture — dup embeddings exist), and curate(semantic_keep=…)
    must produce exactly the documents the query's quality stage
    counts (the module composition ≡ the certified query)."""
    from twitter_etl_spark.curation import curate
    from twitter_etl_spark.queries.corpus import q_llm_curation_semantic
    from twitter_etl_spark.queries.similarity import q_dedup_semantic_adaptive
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    funnel = {
        r["stage"]: r["n_docs"]
        for r in q_llm_curation_semantic(spark, sf).collect()
    }
    assert (
        funnel["input"]
        >= funnel["exact_dedup"]
        >= funnel["semantic_dedup"]
        >= funnel["quality"]
    )
    assert funnel["semantic_dedup"] < funnel["exact_dedup"]  # non-vacuous
    assert funnel["quality"] == (
        funnel["split_train"] + funnel["split_val"] + funnel["split_test"]
    )
    keep = q_dedup_semantic_adaptive(spark, sf).select("vec_id", "kept")
    curated = curate(table(spark, sf, "documents"), semantic_keep=keep)
    got = {
        r["split"]: r["n"]
        for r in curated.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {
        "train": funnel["split_train"],
        "val": funnel["split_val"],
        "test": funnel["split_test"],
    }


def test_nb_score_separates_rule_classes(spark):
    """q_quality_nb_score is trained ON the Gopher rule labels, so at
    minimum it must reproduce their signal: both classes present on
    the fixture, and the mean score of rule-passing docs strictly
    above the mean score of rule-failing docs (the continuum ranks
    the way the binary rules point)."""
    from twitter_etl_spark.queries.webcorpus import q_quality_nb_score

    rows = q_quality_nb_score(spark, "/root/testdata/sf0.001").collect()
    pos = [r["nb_score"] for r in rows if r["label"] == 1]
    neg = [r["nb_score"] for r in rows if r["label"] == 0]
    assert pos and neg  # non-vacuous: both classes exist
    assert sum(pos) / len(pos) > sum(neg) / len(neg)


def test_hll_distinct_within_tolerance(spark):
    """r14 verdict #4: q_agg_hll_distinct's docstring claims a pytest
    accuracy pin — make it true. The DataSketches HLL estimate must
    track the op's own exact_custs column within 5% (lgK default 12
    → ~1.6% rsd; 5% avoids flakiness, same margin as
    test_approx_distinct_within_tolerance)."""
    from conftest import SF_ORACLE
    from twitter_etl_spark.queries.extras import q_agg_hll_distinct

    rows = q_agg_hll_distinct(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        e, a = r["exact_custs"], r["approx_custs"]
        assert abs(a - e) <= max(1, 0.05 * e), (r["o_orderpriority"], e, a)


def _toy_embeddings(spark, dim=64):
    """Two batches that RE-ABSORB vec_id 1 with a CHANGED embedding —
    the exact case where dropDuplicates picks an arbitrary survivor."""
    rows_a = [(1, [1.0] * dim, 0), (2, [0.5] * dim, 1)]
    rows_b = [(1, [2.0] * dim, 0), (3, [0.25] * dim, 1)]
    schema = "vec_id bigint, embedding array<double>, label int"
    return (
        spark.createDataFrame(rows_a, schema),
        spark.createDataFrame(rows_b, schema),
    )


def test_semdedup_rollup_survivor_is_batch_order_independent(spark, tmp_path):
    """r14 advice (rollup.py): union + dropDuplicates(vec_id) keeps
    an ARBITRARY row when a vec_id is re-absorbed with a changed
    embedding. Both semdedup rollups now keep the min-digest row, so
    absorbing the same two batches in EITHER order publishes the
    identical state."""
    from twitter_etl_spark.rollup import (
        read_version,
        update_semdedup_adaptive_rollup,
        update_semdedup_rollup,
    )

    a, b = _toy_embeddings(spark)
    for update in (update_semdedup_rollup, update_semdedup_adaptive_rollup):
        d_ab = str(tmp_path / f"{update.__name__}_ab")
        d_ba = str(tmp_path / f"{update.__name__}_ba")
        update(spark, d_ab, a)
        update(spark, d_ab, b)
        update(spark, d_ba, b)
        update(spark, d_ba, a)
        got_ab = sorted(
            (r["vec_id"], r["label"], tuple(r["v"]))
            for r in read_version(spark, d_ab).collect()
        )
        got_ba = sorted(
            (r["vec_id"], r["label"], tuple(r["v"]))
            for r in read_version(spark, d_ba).collect()
        )
        assert got_ab == got_ba
        assert len(got_ab) == 3  # vec_ids 1,2,3 — one survivor each
        # and the survivor for vec_id 1 is the min-digest row, not
        # whichever batch happened to be absorbed last
        v1 = [v for vid, _, v in got_ab if vid == 1]
        assert len(v1) == 1


def _unigram_replica(spark, sf):
    """Step-for-step Python replica of the unigram-LM prune-EM
    trainer over the collected (word, count) vocabulary — the
    q_text_bpe_merge pin pattern. Integer scores end-to-end, so the
    comparison is exact equality."""
    import re

    from twitter_etl_spark.queries.text import (
        UNIGRAM_EM_ROUNDS,
        UNIGRAM_KEEP,
        UNIGRAM_SEED_K,
        UNIGRAM_SEED_MAX_LEN,
        _unigram_lp,
        _unigram_viterbi,
    )
    from twitter_etl_spark.tables import table

    docs = table(spark, sf, "documents").select("doc_id", "text").collect()
    wc: dict[str, int] = {}
    doc_words: dict[int, list[str]] = {}
    for r in docs:
        words = [w for w in re.split(r"\s+", r["text"].strip()) if w != ""]
        doc_words[r["doc_id"]] = words
        for w in words:
            wc[w] = wc.get(w, 0) + 1
    seed: dict[str, int] = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for L in range(1, min(UNIGRAM_SEED_MAX_LEN, len(w) - i) + 1):
                p = w[i : i + L]
                seed[p] = seed.get(p, 0) + n
    top = dict(
        sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))[:UNIGRAM_SEED_K]
    )
    chars = {p: n for p, n in seed.items() if len(p) == 1}
    counts = {**top, **chars}
    char_keys = sorted(chars)
    for _ in range(UNIGRAM_EM_ROUNDS):
        lp = _unigram_lp(counts)
        new: dict[str, int] = {}
        for w, n in wc.items():
            for p in _unigram_viterbi(w, lp):
                new[p] = new.get(p, 0) + n
        counts = dict(
            sorted(new.items(), key=lambda kv: (-kv[1], kv[0]))[:UNIGRAM_KEEP]
        )
        for c in char_keys:
            counts.setdefault(c, 1)
    final_lp = _unigram_lp(counts)
    vocab_rows = [
        (p, n, final_lp[p])
        for p, n in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    encode = {
        doc_id: (
            len(words),
            sum(len(_unigram_viterbi(w, final_lp)) for w in words),
        )
        for doc_id, words in doc_words.items()
        if words
    }
    return vocab_rows, encode


def test_unigram_tok_matches_python_replica(spark):
    """q_text_unigram_tok / q_text_unigram_encode (rows-only) must
    match the step-for-step Python replica EXACTLY: same final vocab
    (pieces, counts, fixed-point logprobs) and same per-doc piece
    counts — and the learned vocab must be non-trivial (multi-char
    pieces survive the prune)."""
    from twitter_etl_spark.queries.text import (
        q_text_unigram_encode,
        q_text_unigram_tok,
    )

    sf = "/root/testdata/sf0.001"
    want_vocab, want_encode = _unigram_replica(spark, sf)
    got_vocab = [
        (r["piece"], r["n"], r["lp_fp"])
        for r in q_text_unigram_tok(spark, sf).collect()
    ]
    assert got_vocab == want_vocab
    assert any(len(p) > 1 for p, _, _ in got_vocab)  # non-vacuous
    got_encode = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in q_text_unigram_encode(spark, sf).collect()
    }
    assert got_encode == want_encode


def test_curation_rollup_equals_oneshot(spark, tmp_path):
    """Ingest-time curation: absorbing the sf0.001 corpus in two
    doc_id-ordered batches (docs + embeddings) and regenerating the
    curated set from the persisted state must be ROW-IDENTICAL to
    the one-shot curate(union, semantic_keep=adaptive flags) — the
    chunks ≡ one-shot contract every rollup in the module carries.
    Re-absorbing a batch must not change the state (at-least-once
    safety without an HWM)."""
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
    mid = 250  # doc_id/vec_id range is 0..499: two ordered halves
    d = str(tmp_path / "cur")
    update_curation_rollup(
        spark, d, docs.filter(F.col("doc_id") < mid),
        embs.filter(F.col("vec_id") < mid),
    )
    update_curation_rollup(
        spark, d, docs.filter(F.col("doc_id") >= mid),
        embs.filter(F.col("vec_id") >= mid),
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
    n_before = len(got)
    update_curation_rollup(
        spark, d, docs.filter(F.col("doc_id") < mid),
        embs.filter(F.col("vec_id") < mid),
    )
    assert len(curation_keeplist(spark, d).collect()) == n_before


def test_behavior_survival_km_invariants(spark):
    """q_behavior_survival: the KM estimator's structural invariants
    on the fixture — at-risk counts strictly decrease over death
    times, log-survival is nonincreasing (it's a sum of nonpositive
    terms), censoring is non-vacuous (the 48-hour horizon truncates
    some users' follow-up), and every row's at-risk >= deaths."""
    from twitter_etl_spark.queries.behavior import q_behavior_survival

    rows = sorted(
        q_behavior_survival(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["t_hours"],
    )
    assert rows
    # censoring is non-vacuous: after the last death, survivors
    # remain (they were censored at the horizon, not dead)
    last = max(rows, key=lambda r: r["t_hours"])
    assert last["n_at_risk"] > last["n_deaths"]
    assert sum(r["n_deaths"] for r in rows) < rows[0]["n_at_risk"]
    prev_risk, prev_ls = None, 0.0
    for r in rows:
        assert r["n_at_risk"] >= r["n_deaths"] > 0
        if prev_risk is not None:
            assert r["n_at_risk"] < prev_risk
        if r["log_surv"] is not None:
            assert r["log_surv"] <= prev_ls + 1e-12
            prev_ls = r["log_surv"]
        prev_risk = r["n_at_risk"]


def test_multimodal_dedup_cluster_consistent_with_pairs(spark):
    """q_multimodal_dedup_cluster: every clustered doc appears in
    the phash pair set, each cluster has exactly one keeper (its
    min doc_id), and both endpoints of every pair land in the same
    cluster."""
    from twitter_etl_spark.queries.multimodal_q import (
        q_multimodal_dedup_cluster,
        q_multimodal_phash_dedup,
    )

    sf = "/root/testdata/sf0.001"
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in q_multimodal_phash_dedup(spark, sf).collect()
    ]
    assert pairs  # non-vacuous on the fixture
    cl = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in q_multimodal_dedup_cluster(spark, sf).collect()
    }
    nodes = {d for p in pairs for d in p}
    assert set(cl) == nodes
    by_cluster: dict[int, list[int]] = {}
    for doc, (cid, keep) in cl.items():
        by_cluster.setdefault(cid, []).append(doc)
        assert keep == (1 if doc == cid else 0)
    for cid, members in by_cluster.items():
        assert cid == min(members)
    for a, b in pairs:
        assert cl[a][0] == cl[b][0]


@pytest.mark.slow
def test_stream_feeds_curation_rollup_matches_one_shot(spark):
    """The stream ≡ batch contract extended to the curation
    rollup: an availableNow foreachBatch loop lands document
    micro-batches with their paired embeddings, absorbing each into
    rollup.update_curation_rollup with neardup=True (r16: the FULL
    funnel — exact + lexical near-dup + semantic); the curated set
    regenerated from the persisted state equals the one-shot
    curate(union, semantic_keep=adaptive flags, neardup_keep=
    neardup_keep_flags)."""
    import json
    import os
    import tempfile

    from pyspark.sql import types as T

    from twitter_etl_spark import rollup
    from twitter_etl_spark.curation import curate
    from twitter_etl_spark.queries.similarity import q_dedup_semantic_adaptive
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    base = tempfile.mkdtemp()
    landing = os.path.join(base, "landing")
    rollup_dir = os.path.join(base, "cur_rollup")
    os.makedirs(landing)

    docs = sorted(
        table(spark, sf, "documents").collect(), key=lambda r: r["doc_id"]
    )
    k = len(docs) // 3
    ranges = [docs[:k], docs[k : 2 * k], docs[2 * k :]]
    for n, chunk in enumerate(ranges):
        with open(os.path.join(landing, f"b{n}.json"), "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {"doc_id": int(r["doc_id"]), "text": r["text"]}
                    )
                    + "\n"
                )

    embs = table(spark, sf, "embeddings")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    versions = []

    def _absorb(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        ids = [r["doc_id"] for r in batch_df.select("doc_id").collect()]
        lo, hi = min(ids), max(ids)
        batch_embs = embs.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") <= hi)
        )
        versions.append(
            rollup.update_curation_rollup(
                spark, rollup_dir, batch_df, batch_embs, neardup=True
            )
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(landing)
        .writeStream.foreachBatch(_absorb)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(versions) == 3  # one publish per micro-batch

    got = sorted(
        (r["doc_id"], r["norm_digest"], r["split"])
        for r in rollup.curation_keeplist(spark, rollup_dir).collect()
    )
    from twitter_etl_spark.queries.corpus import neardup_keep_flags

    keep = q_dedup_semantic_adaptive(spark, sf).select("vec_id", "kept")
    nd = neardup_keep_flags(spark, sf)
    want = sorted(
        (r["doc_id"], r["norm_digest"], r["split"])
        for r in curate(
            table(spark, sf, "documents"),
            semantic_keep=keep,
            neardup_keep=nd,
        )
        .select("doc_id", "norm_digest", "split")
        .collect()
    )
    assert got == want
    assert got  # non-vacuous


def test_cohort_ltv_monotone_and_consistent(spark):
    """q_behavior_cohort_ltv: running revenue is nondecreasing
    within each cohort, the weekly pieces sum to the final
    cumulative, and LTV-per-user never exceeds the cohort's
    cumulative revenue."""
    from twitter_etl_spark.queries.behavior import q_behavior_cohort_ltv

    rows = q_behavior_cohort_ltv(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_epoch"], []).append(r)
    for parts in by_cohort.values():
        parts.sort(key=lambda r: r["week_offset"])
        cum = 0
        for r in parts:
            cum += r["revenue_cents"]
            assert r["cum_revenue_cents"] == cum
            assert r["ltv_cents_per_user"] <= r["cum_revenue_cents"]
            assert r["cohort_size"] >= 1


def test_drift_jsd_bounds_and_ranking(spark):
    """q_drift_jsd: every divergence lies in [0, ln 2], and a
    synthetic check — the source whose token distribution is closest
    to the corpus mix cannot rank above one with heavy exclusive
    vocabulary. On the fixture we just assert the bound plus
    non-degeneracy (not all sources identical)."""
    import math

    from twitter_etl_spark.queries.dq import q_drift_jsd

    rows = q_drift_jsd(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 1
    vals = [r["jsd"] for r in rows]
    for v in vals:
        assert -1e-9 <= v <= math.log(2) + 1e-9
    assert max(vals) > min(vals)  # non-degenerate


def test_pack_length_bucket_exact_masses(spark):
    """q_pack_length_bucket: per (lang, cap) cell the padded mass
    equals cap×n_docs, waste = padded − real, every doc's real token
    count fits its cap, and the cell masses re-add to the corpus
    token total."""
    from twitter_etl_spark.queries.llmprep import q_pack_length_bucket
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    rows = q_pack_length_bucket(spark, sf).collect()
    assert rows
    for r in rows:
        if r["cap"] > 0:
            assert r["padded_sum"] == r["cap"] * r["n_docs"]
            assert r["waste_tokens"] == r["padded_sum"] - r["tok_sum"]
            assert r["tok_sum"] <= r["padded_sum"]
            assert 0 <= r["waste_bp"] <= 10000
    total = (
        table(spark, sf, "documents")
        .select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r["tok_sum"] for r in rows) == total


def test_recall_audits_sane(spark):
    """The two r15 recall-audit ops: recall_bp in [0, 10000], hit
    counts bounded by exact counts, and non-vacuous exact sets. The
    IVF audit must also cover every query vector (5 on the
    fixture)."""
    from twitter_etl_spark.queries.corpus import (
        q_dedup_minhash_recall,
        q_sim_ivf_recall,
    )

    sf = "/root/testdata/sf0.001"
    ivf = q_sim_ivf_recall(spark, sf).collect()
    assert len(ivf) == 5
    for r in ivf:
        assert 0 < r["n_exact"] <= 10
        assert 0 <= r["n_hits"] <= r["n_exact"]
        assert 0 <= r["recall_bp"] <= 10000
    mh = q_dedup_minhash_recall(spark, sf).collect()
    assert len(mh) == 1
    r = mh[0]
    assert r["n_exact"] > 0
    assert 0 <= r["n_found"] <= r["n_exact"]
    assert 0 <= r["recall_bp"] <= 10000


def test_er_cluster_consistent_with_pairs(spark):
    """q_er_cluster: every matched custkey appears in the fuzzy pair
    set, exactly one canonical per cluster (its min custkey),
    n_members matches the cluster's row count, and both endpoints of
    every pair share a cluster."""
    from twitter_etl_spark.queries.dq import (
        q_er_cluster,
        q_er_fuzzy_blocked,
    )

    sf = "/root/testdata/sf0.001"
    pairs = [
        (r["custkey_a"], r["custkey_b"])
        for r in q_er_fuzzy_blocked(spark, sf).collect()
    ]
    assert pairs
    rows = q_er_cluster(spark, sf).collect()
    cl = {r["custkey"]: r for r in rows}
    assert set(cl) == {k for p in pairs for k in p}
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["custkey"])
        assert r["is_canonical"] == (1 if r["custkey"] == r["cluster_id"] else 0)
    for cid, members in by_cluster.items():
        assert cid == min(members)
        for m in members:
            assert cl[m]["n_members"] == len(members)
    for a, b in pairs:
        assert cl[a]["cluster_id"] == cl[b]["cluster_id"]
