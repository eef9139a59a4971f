"""Cleaning-chain semantics (reference ``main.R:96-103`` parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_etl_spark import cleaning


def _clean_one(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(cleaning.clean_chain(F.col("t")).alias("c")).first()["c"]


def _apply(spark, fn, text: str) -> str:
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(fn(F.col("t")).alias("c")).first()["c"]


def test_url_strip(spark):
    assert _apply(spark, cleaning.strip_urls, "see http://x.co/abc now") == "see now"
    assert _apply(spark, cleaning.strip_urls, "ftp://files.example/x y") == " y"
    # https form with path
    assert "spark" not in _apply(
        spark, cleaning.strip_urls, "docs https://spark.apache.org/latest here"
    )


def test_mention_strip(spark):
    assert _apply(spark, cleaning.strip_mentions, "hi @user_1 and @Dev2!") == "hi  and !"


def test_stopword_whole_word_only(spark):
    # 'de' removed as a word; 'desde' is itself a stopword; but a
    # non-stopword containing one ('dedo') must survive
    out = _apply(spark, cleaning.strip_stopwords, "de dedo desde")
    assert out.split() == ["dedo"]


def test_squish_idempotent(spark):
    s = "  a   b\t\tc  "
    once = _apply(spark, cleaning.squish, s)
    twice = _apply(spark, cleaning.squish, once)
    assert once == "a b c"
    assert twice == once


def test_chain_idempotent_on_clean_text(spark):
    """The full chain is a fixpoint on already-clean lowercase text
    with no URLs/mentions/stopwords."""
    s = "fast merge batch window"
    assert _clean_one(spark, s) == s
    assert _clean_one(spark, _clean_one(spark, s)) == _clean_one(spark, s)


def test_chain_order_matters_like_reference(spark):
    """Stopwords are removed AFTER lowercasing (reference order):
    'De' matches only because lower() ran first."""
    assert _clean_one(spark, "De la CASA") == "casa"


def test_observed_transform_collects_metrics_in_one_pass(spark):
    """Observation metrics arrive with the action itself: rows_in /
    rows_es / chars_in match independently-computed values, and the
    transform output is unchanged by the instrumentation."""
    from pyspark.sql import functions as F

    from twitter_etl_spark.pipeline import observed_transform, transform_documents
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    out, obs = observed_transform(docs)
    n_out = out.count()  # the action that populates the observation
    m = obs.get
    assert m["rows_in"] == docs.count()
    assert m["rows_es"] == docs.filter(F.col("lang") == "es").count()
    assert m["chars_in"] == docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert n_out == transform_documents(docs).count()
