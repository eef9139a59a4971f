"""Rows-only pins for iterative text operators (SURVEY §5.3: every
rows-only query carries an independent exactness pin)."""

from __future__ import annotations

import pytest

import re
from collections import Counter

from twitter_etl_spark.queries.text import BPE_MERGES, q_text_bpe_merge
from twitter_etl_spark.tables import table

SF = "/root/testdata/sf0.001"


def _replica_bpe(word_counts: Counter, rounds: int):
    """Step-for-step BPE trainer: same statistic (pair counts
    weighted by word frequency over the distinct-word vocabulary),
    same argmax total order (n desc, sym_a asc, sym_b asc), same
    greedy left-to-right merge fold."""
    vocab = {w: (list(w), n) for w, n in word_counts.items()}
    out = []
    for rnd in range(1, rounds + 1):
        pairs: Counter = Counter()
        for syms, n in vocab.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rnd, a, b, a + b, n))
        for w, (syms, cnt) in vocab.items():
            merged = []
            for x in syms:
                if merged and merged[-1] == a and x == b:
                    merged[-1] = a + b
                else:
                    merged.append(x)
            vocab[w] = (merged, cnt)
    return out, vocab


@pytest.mark.slow
def test_bpe_merge_matches_python_replica(spark):
    """q_text_bpe_merge equals the Python trainer exactly — integer
    counts and a total tie order leave no tolerance to grant."""
    docs = table(spark, SF, "documents").select("text").collect()
    wc: Counter = Counter()
    for r in docs:
        for w in re.split(r"\s+", r["text"].strip()):
            if w:
                wc[w] += 1
    want, _ = _replica_bpe(wc, BPE_MERGES)

    got = [
        (r["merge_round"], r["sym_a"], r["sym_b"], r["merged"], r["n"])
        for r in q_text_bpe_merge(spark, SF).orderBy("merge_round").collect()
    ]
    assert got == want
    assert len(got) == BPE_MERGES
    # (at sf0.01 round 6 already consumes an earlier round's output
    # symbol — m+er->mer; the sf0.001 vocabulary merges single chars
    # for longer, so no structural assert on multi-char sides here)


def test_bpe_encode_round_trips_with_trainer_replica(spark):
    """q_text_bpe_encode == the Python trainer's own encoding of
    every document: train the replica to the same BPE_MERGES rules,
    encode each doc word-by-word with the replica's final vocabulary,
    and the per-doc (n_words, n_bpe_tokens) must match EXACTLY —
    integer counts, no tolerance. Also pins the monotonicity every
    merge rule guarantees: n_bpe_tokens never exceeds total chars
    and never undercuts the word count."""
    from twitter_etl_spark.queries.text import q_text_bpe_encode

    docs = table(spark, SF, "documents").select("doc_id", "text").collect()
    wc: Counter = Counter()
    toks = {}
    for r in docs:
        ws = [w for w in re.split(r"\s+", r["text"].strip()) if w]
        toks[r["doc_id"]] = ws
        for w in ws:
            wc[w] += 1
    _, vocab = _replica_bpe(wc, BPE_MERGES)

    want = {
        doc_id: (len(ws), sum(len(vocab[w][0]) for w in ws))
        for doc_id, ws in toks.items()
        if ws
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in q_text_bpe_encode(spark, SF).collect()
    }
    assert got == want
    for doc_id, (n_words, n_bpe) in got.items():
        n_chars = sum(len(w) for w in toks[doc_id])
        assert n_words <= n_bpe <= n_chars, doc_id
    # non-vacuous: at least one document actually compressed
    assert any(
        n_bpe < sum(len(w) for w in toks[d]) for d, (_, n_bpe) in got.items()
    )
