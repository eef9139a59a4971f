"""Cross-engine fuzz: the cleaning chain must behave identically in
Spark (Java regex) and DuckDB (RE2) on adversarial inputs — URLs,
mentions, weird whitespace, punctuation. Guards the dialect-pinning
rule (SURVEY.md §4.3.3) far beyond the word-soup fixtures.

Known (documented) divergence kept OUT of the agreement set: Java's
``\\b`` is Unicode-aware, RE2's is ASCII-only, so *accented*
stopwords at word edges differ (``¿qué?``). For those inputs we pin
the Spark behavior to the reference-faithful (Unicode/tm) expectation
instead — see ``cleaning.py`` module docs.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from twitter_etl_spark import cleaning

# inputs where Java regex and RE2 provably agree (ASCII at all
# boundary-relevant positions)
CASES_AGREE = [
    "",
    "   ",
    "Hola  MUNDO",
    "de la que el en y a los del se",
    "visit http://a.b/c and https://x.y/z?q=1&r=2 end",
    "ftp://files.server/path more",
    "bare httpx:// notaurl",
    "@user1 @User_2 @@double email@host.com",
    "tabs\tand\nnewlines\r\nmixed",
    "punct!... (paren) [brack] el, la; que.",
    "UPPER lower MiXeD",
    "word-with-dash under_score dot.word",
    "desde dedo dedos destino",
    "a" * 500,
    "palabra " * 50,
    "https://spark.apache.org/docs/latest/api/python/ @pyspark #tag",
    "el.la,que;el:en y|a los/del\\se",
    "  leading and trailing  ",
    "000 123 el 456 la 789",
]


@pytest.mark.parametrize(
    "step",
    ["lower", "strip_urls", "strip_mentions", "strip_stopwords", "squish", "clean_chain"],
)
def test_cleaning_steps_match_duckdb(spark, step):
    spark_fn = getattr(cleaning, step)
    sql_fn = getattr(
        cleaning, f"sql_{step}" if step != "clean_chain" else "sql_clean_chain"
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES_AGREE)], ["i", "t"]
    )
    got_spark = {
        r["i"]: r["c"]
        for r in df.select("i", spark_fn(F.col("t")).alias("c")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE cases (i INT, t VARCHAR)")
    con.executemany("INSERT INTO cases VALUES (?, ?)", list(enumerate(CASES_AGREE)))
    got_duck = dict(con.execute(f"SELECT i, {sql_fn('t')} FROM cases").fetchall())

    mismatches = {
        i: (got_spark[i], got_duck[i])
        for i in got_spark
        if got_spark[i] != got_duck[i]
    }
    assert not mismatches, mismatches


def test_accented_stopwords_follow_reference_semantics(spark):
    """On the divergent (non-ASCII boundary) inputs, the ENGINE must
    behave like the reference (Unicode word chars, tm::removeWords):
    accented stopwords are removed even against punctuation, and
    stopword prefixes of longer accented words do NOT fire."""
    cases = {
        "¿qué? ¡sí!": "¿? ¡!",
        "él vs el.": "vs .",
        "esta está estás estáis": "",
        # 'está' must not fire inside 'estáis'-like longer tokens
        "estático": "estático",
    }
    df = spark.createDataFrame(list(cases.items()), ["t", "want"])
    out = df.select(
        "t",
        "want",
        F.trim(F.regexp_replace(cleaning.strip_stopwords(F.col("t")), r"\s+", " ")).alias("got"),
    ).collect()
    bad = {r["t"]: (r["got"], r["want"]) for r in out if r["got"] != r["want"]}
    assert not bad, bad


def test_bigram_lm_matches_python_reference(spark):
    """q_text_bigram_lm against a pure-Python add-0.5 bigram LM on
    the smoke fixture: same vocabulary, same conditional counts,
    same fixed-point rounding chain."""
    import math
    from collections import Counter

    from conftest import SF_SMOKE
    from twitter_etl_spark.queries.webcorpus import (
        _BIGRAM_ALPHA,
        q_text_bigram_lm,
    )
    from twitter_etl_spark.tables import table

    docs = {
        r["doc_id"]: r["text"].strip().split()
        for r in table(spark, SF_SMOKE, "documents").collect()
    }
    c2: Counter = Counter()
    vocab = set()
    for toks in docs.values():
        vocab.update(toks)
        c2.update(zip(toks, toks[1:]))
    c1: Counter = Counter()
    for (p, _), n in c2.items():
        c1[p] += n
    v = len(vocab)

    def fp(p, c):
        pr = (c2[(p, c)] + _BIGRAM_ALPHA) / (c1[p] + _BIGRAM_ALPHA * v)
        return math.floor(round(-math.log(pr), 6) * 1e6 + 0.5)

    expected = {}
    for doc_id, toks in docs.items():
        bgs = list(zip(toks, toks[1:]))
        if not bgs:
            continue
        expected[doc_id] = (
            len(bgs),
            round(sum(fp(p, c) for p, c in bgs) / len(bgs) / 1e6, 4),
        )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_neglogp2"])
        for r in q_text_bigram_lm(spark, SF_SMOKE).collect()
    }
    assert got == expected
