"""Property-based hardening of the cleaning chain (SURVEY.md §5.2).

Hypothesis generates adversarial corpora; each example is evaluated
in ONE Spark job over a many-row DataFrame (a job per string would
be prohibitively slow), comparing a column expression against its
re-application. Properties:

- ``squish`` is idempotent, and its output never has leading /
  trailing / doubled whitespace;
- stopword removal is a fixpoint (removing again changes nothing —
  deletion leaves boundaries, it never splices new words together);
- the full five-step chain is idempotent, so re-cleaning already
  clean data (a re-run of a batch, the reference's at-least-once
  replays) is a no-op.

Alphabet includes whitespace runs, punctuation, accented vowels
(the Unicode-``\\b`` territory documented in ``cleaning.py``), ``@``
and URL-ish fragments — Spark-side only, so no ASCII constraint.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from twitter_etl_spark.cleaning import clean_chain, squish, strip_stopwords

_ALPHABET = st.sampled_from(
    list("abcdez áéíñú@#./:¿?!,-_|") + ["  ", "\t", "\n", "de", "la", "qué",
                                        "más", "http://x.co/y", "hola"]
)
_TEXT = st.lists(_ALPHABET, max_size=30).map("".join)
_CORPUS = st.lists(_TEXT, min_size=1, max_size=40)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,  # Spark job latency is not a property failure
    suppress_health_check=[HealthCheck.too_slow],
)


def _counterexamples(spark, corpus, once_fn, twice_fn):
    """Rows where applying twice differs from applying once."""
    df = spark.createDataFrame([(t,) for t in corpus], ["t"])
    once = once_fn(F.col("t"))
    return (
        df.select("t", once.alias("once"), twice_fn(once).alias("twice"))
        .filter(~F.col("once").eqNullSafe(F.col("twice")))
        .collect()
    )


@settings(**_SETTINGS)
@given(corpus=_CORPUS)
def test_squish_idempotent(spark, corpus):
    assert _counterexamples(spark, corpus, squish, squish) == []


@settings(**_SETTINGS)
@given(corpus=_CORPUS)
def test_squish_normal_form(spark, corpus):
    df = spark.createDataFrame([(t,) for t in corpus], ["t"])
    bad = df.select(squish(F.col("t")).alias("s")).filter(
        F.col("s").rlike(r"^\s|\s$|\s\s")
    )
    assert bad.collect() == []


@settings(**_SETTINGS)
@given(corpus=_CORPUS)
@pytest.mark.slow
def test_stopword_removal_fixpoint(spark, corpus):
    assert (
        _counterexamples(spark, corpus, strip_stopwords, strip_stopwords) == []
    )


@settings(**_SETTINGS)
@given(corpus=_CORPUS)
@pytest.mark.slow
def test_clean_chain_idempotent(spark, corpus):
    assert _counterexamples(spark, corpus, clean_chain, clean_chain) == []
