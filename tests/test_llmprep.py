"""Semantic + plan tests for the LLM-prep operator family
(``twitter_etl_spark/queries/llmprep.py``): sequence packing, RAG
chunking, BM25, Gopher quality gates, SCD2, skew diagnostics.

Oracle parity is covered by the harness; these tests pin the
*semantics* (invariants on synthetic rows) and the *scale posture*
(partitioned windows, broadcast stats, shuffle-free projections).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_etl_spark.queries import llmprep
from twitter_etl_spark.queries.llmprep import (
    BM25_TERMS,
    CHUNK_S,
    CHUNK_W,
    PACK_CTX,
)

from conftest import SF_ORACLE, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- sequence packing ---------------------------------------------------------


def test_pack_conserves_tokens_and_is_contiguous(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    packs = llmprep.q_pack_sequences(spark, SF_ORACLE)
    rows = packs.collect()
    assert sum(r.n_tokens for r in rows) == total
    # pack ids per source are contiguous from 0 (concat-and-chunk
    # leaves no empty pack: every PACK_CTX boundary is crossed by
    # some doc's first token or absorbed into the previous pack)
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r.pack_id)
    for ids in by_source.values():
        assert sorted(ids) == list(range(len(ids)))


def test_pack_window_is_partitioned_not_global(spark):
    p = _plan(llmprep.q_pack_sequences(spark, SF_SMOKE))
    # the running sum shuffles on the shard key only; a global
    # (single-partition) exchange would serialize packing at 100 TB
    assert "hashpartitioning(source" in p
    assert "SinglePartition" not in p


# -- RAG chunking -------------------------------------------------------------


def test_chunk_geometry(spark):
    n = 80  # tokens in synthetic doc
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.parquet(
            f"{tmp}/documents.parquet"
        )
        rows = llmprep.q_text_chunk_overlap(spark, tmp).orderBy(
            "chunk_ix"
        ).collect()
    # starts at 1, 1+S, ... <= n  ->  floor((n-1)/S)+1 chunks
    assert len(rows) == (n - 1) // CHUNK_S + 1
    # all chunks except trailing ones are full width
    full = [r for r in rows if r.chunk_ix * CHUNK_S + CHUNK_W <= n]
    assert all(r.n_chunk_tokens == CHUNK_W for r in full)
    # chunk_ix is dense from 0
    assert [r.chunk_ix for r in rows] == list(range(len(rows)))


def test_chunk_plan_is_shuffle_free(spark):
    p = _plan(llmprep.q_text_chunk_overlap(spark, SF_SMOKE))
    assert "Exchange" not in p  # pure projection + generate


# -- BM25 ---------------------------------------------------------------------


def test_bm25_stats_are_broadcast_single_pass(spark):
    p = _plan(llmprep.q_text_bm25(spark, SF_SMOKE))
    assert "BroadcastExchange" in p  # 1-row corpus stats broadcast
    assert "SortMergeJoin" not in p  # never a big-side shuffle join


def test_bm25_monotonic_in_tf(spark):
    # two docs, same length; doc 2 has more query-term hits -> higher
    import tempfile

    pad = " ".join(f"x{i}" for i in range(8))
    rows = [
        (1, f"spark {pad}"),
        (2, f"spark spark {pad[: len(pad) - 3]} y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as tmp:
        df.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.parquet(
            f"{tmp}/documents.parquet"
        )
        out = {
            r.doc_id: r.bm25
            for r in llmprep.q_text_bm25(spark, tmp).collect()
        }
    assert out[2] > out[1] > 0


# -- Gopher quality gates -----------------------------------------------------


def test_gopher_rules_on_synthetic_rows(spark):
    import tempfile

    good = "the quick brown fox and the lazy dog walk to the old town " * 2
    too_short = "tiny doc"
    symbols = "the of and is in to " + "@#$%^&*!~ " * 20
    rows = [(1, good), (2, too_short), (3, symbols)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with tempfile.TemporaryDirectory() as tmp:
        df.withColumn("lang", F.lit("en")).withColumn(
            "source", F.concat(F.lit("s"), F.col("doc_id"))
        ).withColumn("n_chars", F.length("text")).write.parquet(
            f"{tmp}/documents.parquet"
        )
        out = {
            r.source: r for r in llmprep.q_quality_gopher(spark, tmp).collect()
        }
    assert out["s1"].n_pass_all == 1
    assert out["s2"].n_words_ok == 0  # under 10 words
    assert out["s3"].n_symbol_ok == 0  # symbol-heavy
    assert out["s3"].n_stop_ok == 1  # but stopwords present


# -- SCD2 ---------------------------------------------------------------------


def test_scd2_intervals_abut_and_single_current(spark):
    out = llmprep.q_scd2_history(spark, SF_ORACLE)
    rows = out.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: r.version)
        # exactly one open (current) interval per user, and it is last
        assert sum(r.is_current for r in user_rows) == 1
        assert user_rows[-1].is_current == 1
        for a, b in zip(user_rows, user_rows[1:]):
            assert a.valid_to_us == b.valid_from_us  # no gaps/overlap
        # change-point compaction: consecutive versions differ
        for a, b in zip(user_rows, user_rows[1:]):
            assert a.event_type != b.event_type


def test_scd2_window_partitioned_by_user(spark):
    p = _plan(llmprep.q_scd2_history(spark, SF_SMOKE))
    assert "hashpartitioning(user_id" in p
    assert "SinglePartition" not in p


# -- skew diagnostics ---------------------------------------------------------


def test_skew_report_shape(spark):
    rows = llmprep.q_skew_diagnose(spark, SF_ORACLE).collect()
    assert len(rows) == 10
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(r.skew_ratio >= 1.0 for r in rows)  # heaviest >= mean


def test_skew_topk_is_take_ordered(spark):
    p = _plan(llmprep.q_skew_diagnose(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p


# -- run-length squeeze --------------------------------------------------------


def test_squeeze_runs_semantics(spark):
    rows = llmprep.q_text_squeeze_runs(spark, SF_ORACLE).collect()
    assert all(r.n_after <= r.n_before for r in rows)
    assert any(r.n_after < r.n_before for r in rows)  # fixture has runs
    import tempfile

    df = spark.createDataFrame(
        [(1, "a a b b b c a")], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.parquet(
            f"{tmp}/documents.parquet"
        )
        r = llmprep.q_text_squeeze_runs(spark, tmp).first()
    assert (r.n_before, r.n_after) == (7, 4)  # a b c a


# -- FFD packing ---------------------------------------------------------------


def test_pack_bestfit_matches_reference_ffd(spark):
    from twitter_etl_spark.tables import table as _table

    docs = (
        _table(spark, SF_ORACLE, "documents")
        .select(
            "source",
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        )
        .collect()
    )
    by_source = {}
    for r in docs:
        by_source.setdefault(r.source, []).append((r.n_tok, r.doc_id))
    expect = {}
    for src, items in by_source.items():
        items.sort(key=lambda p: (-p[0], p[1]))
        bins = []
        for tok, _ in items:
            for b in bins:
                if b[0] >= tok:
                    b[0] -= tok
                    b[1] += 1
                    b[2] += tok
                    break
            else:
                bins.append([llmprep.PACK_CTX - tok, 1, tok])
        expect[src] = [(b[1], b[2]) for b in bins]

    got = {}
    for r in llmprep.q_pack_bestfit(spark, SF_ORACLE).collect():
        got.setdefault(r.source, {})[r.pack_id] = (r.n_docs, r.n_tokens)
    for src, bins in expect.items():
        assert [got[src][i] for i in range(len(bins))] == bins
    # capacity invariant: multi-doc packs never exceed the window
    for src, packs in got.items():
        for n_docs, n_tokens in packs.values():
            assert n_docs == 1 or n_tokens <= llmprep.PACK_CTX


def test_curate_webcorpus_end_to_end(spark, tmp_path):
    """The composed r7 pipeline (span dedup -> quality -> DSIR/CCNet
    annotation -> leakage-safe split -> shards): audit counts are
    consistent, splits partition the kept set, shard dirs exist per
    split, and a second run returns the identical report
    (determinism — no RNG anywhere in the pipeline)."""
    import os

    from twitter_etl_spark.curation import curate_webcorpus

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus")
    rep = curate_webcorpus(spark, sf, out)
    assert rep["docs_in"] == 500
    assert rep["docs_kept"] + rep["docs_dropped"] == rep["docs_in"]
    assert rep["train"] + rep["val"] + rep["test"] == rep["docs_kept"]
    assert rep["spans_dropped"] >= 0 and rep["docs_kept"] > 0
    for s in ("train", "val", "test"):
        assert os.path.isdir(os.path.join(out, s)), s
    rep2 = curate_webcorpus(spark, sf, str(tmp_path / "corpus2"))
    assert rep2 == rep
