"""Python-UDTF semantics and schema-evolution robustness."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from twitter_etl_spark.queries import llmprep, udtf_ops

from conftest import SF_ORACLE


def test_udtf_runs_consistent_with_squeeze(spark):
    """The UDTF's runs and the expression-form squeeze must agree:
    sum(run_len) == token count, run count == squeezed count."""
    runs = (
        udtf_ops.q_udtf_runlength(spark, SF_ORACLE)
        .groupBy("doc_id")
        .agg(
            F.sum("run_len").alias("total"),
            F.count(F.lit(1)).alias("n_runs"),
        )
    )
    sq = llmprep.q_text_squeeze_runs(spark, SF_ORACLE).select(
        "doc_id", "n_before", "n_after"
    )
    j = runs.join(sq, "doc_id").collect()
    assert j
    for r in j:
        assert r.total == r.n_before
        assert r.n_runs == r.n_after


def test_mergeschema_reads_evolved_sink(spark):
    """Appending a widened schema must not break readers: with
    mergeSchema the union schema comes back, old rows NULL-fill."""
    with tempfile.TemporaryDirectory() as tmp:
        v1 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, name string"
        )
        v1.write.mode("append").parquet(f"{tmp}/t")
        v2 = spark.createDataFrame(
            [(3, "c", 1.5)], "id long, name string, score double"
        )
        v2.write.mode("append").parquet(f"{tmp}/t")
        out = spark.read.option("mergeSchema", "true").parquet(f"{tmp}/t")
        assert set(out.columns) == {"id", "name", "score"}
        rows = {r.id: r for r in out.collect()}
        assert rows[1].score is None and rows[3].score == 1.5
