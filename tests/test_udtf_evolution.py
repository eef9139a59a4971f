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


def test_arrow_python_udf_matches_pickled_udf(spark):
    """Spark 4 Arrow-optimized Python UDFs (useArrow=True): identical
    results to the classic pickled form on the same function — the
    batch-serialized fast path the UDF policy (SURVEY §2.7) says to
    prefer when per-row Python is unavoidable."""
    from pyspark.sql import functions as F
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"

    def sig(s: str) -> str:
        return f"{len(s)}:{s[:3]}"

    arrow_udf = F.udf(sig, "string", useArrow=True)
    plain_udf = F.udf(sig, "string", useArrow=False)
    d = table(spark, sf, "documents").select("doc_id", "text")
    a = {r["doc_id"]: r["s"] for r in d.select("doc_id", arrow_udf("text").alias("s")).collect()}
    b = {r["doc_id"]: r["s"] for r in d.select("doc_id", plain_udf("text").alias("s")).collect()}
    assert a == b and len(a) == 500


def test_map_in_arrow_matches_map_in_pandas(spark):
    """mapInArrow operates on raw Arrow RecordBatches (no pandas
    conversion cost) — same per-partition batch contract as
    mapInPandas, pinned equivalent on a byte-length feature."""
    import pyarrow as pa

    from pyspark.sql import functions as F
    from twitter_etl_spark.tables import table

    sf = "/root/testdata/sf0.001"
    d = table(spark, sf, "documents").select("doc_id", "text")

    def arrow_fn(batches):
        for b in batches:
            ids = b.column("doc_id")
            lens = pa.compute.binary_length(
                pa.compute.cast(b.column("text"), pa.binary())
            )
            yield pa.RecordBatch.from_arrays(
                [ids, pa.compute.cast(lens, pa.int64())], ["doc_id", "n_bytes"]
            )

    def pandas_fn(pdfs):
        for pdf in pdfs:
            pdf = pdf.copy()
            pdf["n_bytes"] = pdf["text"].str.encode("utf-8").str.len()
            yield pdf[["doc_id", "n_bytes"]]

    schema = "doc_id long, n_bytes long"
    a = {r["doc_id"]: r["n_bytes"] for r in d.mapInArrow(arrow_fn, schema).collect()}
    b = {r["doc_id"]: r["n_bytes"] for r in d.mapInPandas(pandas_fn, schema).collect()}
    assert a == b and len(a) == 500
