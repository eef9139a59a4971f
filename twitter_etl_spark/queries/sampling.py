"""Deterministic sampling & vector aggregation [EXT].

Training-data pipelines need *reproducible* samples and splits: the
same row must land in the same split on every run, on any cluster
layout, with no RNG state to ship. The standard technique is
hash-bucketing — bucket = ``int(md5(key)[:8]) % 100`` — which both
Spark (``conv(substring(md5(x),1,8),16,10)``) and the DuckDB oracle
(``('0x' || substr(md5(x),1,8))::UBIGINT``) compute identically, so
every operator here is fully oracle-checkable (unlike
``df.sample()``/``TABLESAMPLE``, whose RNG is engine-specific).

Scale: bucketing is a per-row projection (codegen'd, no shuffle);
the stratified variant adds one window shuffle on the stratum key —
the same cost profile as any per-group top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table


def hash_bucket(c: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of a key
    column — the reproducible-sampling primitive."""
    return (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % n_buckets
    )


def _sql_bucket(e: str, n_buckets: int = 100) -> str:
    return f"(('0x' || substr(md5({e}), 1, 8))::UBIGINT % {n_buckets})"


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample of documents: rows whose text-hash
    bucket < 10. Same rows on every run and every partitioning."""
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn("bucket", hash_bucket(F.col("text")))
        .filter(F.col("bucket") < 10)
        .select("doc_id", "lang", "bucket")
    )


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test assignment, reported as
    per-(lang, split) counts — the shape a dataset card needs."""
    d = table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("text"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sample: the 5 hash-smallest docs per
    lang. Deterministic (hash order with doc_id tie-break), one
    window shuffle on the stratum key."""
    d = table(spark, sf_dir, "documents").withColumn(
        "bucket", hash_bucket(F.col("text"))
    )
    w = Window.partitionBy("lang").orderBy("bucket", "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "rk", "doc_id", "bucket")
    )


def q_sim_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors, long form
    (label, pos, c): posexplode to (position, value), one hash agg.
    The IVF coarse-quantizer update step, as a plain aggregation."""
    e = table(spark, sf_dir, "embeddings").select(
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos0", "val"
        ),
    )
    return (
        e.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg("val"), 4).alias("c"))
    )


#: weighted-sample size.
_WEIGHTED_K = 50


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis 2006 via exponential keys): each document
    draws key = −ln(u)/w from a hash-derived uniform u and its
    weight w (here ``n_chars`` — longer docs proportionally more
    likely), and the ``_WEIGHTED_K`` smallest keys are the sample.
    The mixture-sampling primitive of training-data curation
    (sample-by-quality-score) with zero RNG state: the same docs
    win on every run and every cluster layout.

    Cross-engine contract: u = (md5-bucket ∈ [0,1e9) + 1)/(1e9+1) is
    an exact integer-derived double in both engines; ln/divide are
    transcendental, so the key is rounded at 9 decimals with the
    doc_id tie-break making the cut a total order (the q_geo_knn
    idiom). Scale: a per-row projection + TakeOrderedAndProject —
    per-partition top-k then a k-merge, no global sort, no
    shuffle of the corpus."""
    d = table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
        % F.lit(1_000_000_000)
        + 1
    ) / F.lit(1_000_000_001.0)
    w = F.greatest(F.col("n_chars"), F.lit(1))
    key = F.round(-F.log(u) / w, 9)
    return (
        d.select(
            "doc_id",
            "lang",
            w.cast("long").alias("weight"),
            key.alias("sample_key"),
        )
        # NULLS LAST pins Spark to DuckDB's ASC default: a NULL text
        # (NULL md5 -> NULL key) must lose, not win, the sample slots
        .orderBy(
            F.asc_nulls_last("sample_key"), F.asc_nulls_last("doc_id")
        )
        .limit(_WEIGHTED_K)
    )


QUERIES = {
    "q_sample_hash": q_sample_hash,
    "q_sample_weighted": q_sample_weighted,
    "q_sample_split": q_sample_split,
    "q_sample_stratified": q_sample_stratified,
    "q_sim_centroid": q_sim_centroid,
}

_SQL_U = (
    "((('0x' || substr(md5(text), 1, 8))::UBIGINT % 1000000000 + 1) "
    "/ 1000000001.0)"
)

ORACLE = {
    "q_sample_weighted": (
        "SELECT doc_id, lang, greatest(n_chars, 1)::BIGINT AS weight, "
        f"round(-ln({_SQL_U}) / greatest(n_chars, 1), 9) AS sample_key "
        "FROM documents "
        f"ORDER BY sample_key, doc_id LIMIT {_WEIGHTED_K}"
    ),
    "q_sample_hash": (
        "SELECT doc_id, lang, "
        f"{_sql_bucket('text')}::BIGINT AS bucket "
        f"FROM documents WHERE {_sql_bucket('text')} < 10"
    ),
    "q_sample_split": (
        "SELECT lang, CASE "
        f"WHEN {_sql_bucket('text')} < 80 THEN 'train' "
        f"WHEN {_sql_bucket('text')} < 90 THEN 'val' "
        "ELSE 'test' END AS split, count(*)::BIGINT AS n_docs "
        "FROM documents GROUP BY 1, 2"
    ),
    "q_sample_stratified": (
        "SELECT lang, rk, doc_id, bucket FROM ("
        "  SELECT lang, doc_id, "
        f"  {_sql_bucket('text')}::BIGINT AS bucket, "
        "  row_number() OVER (PARTITION BY lang "
        f"    ORDER BY {_sql_bucket('text')}, doc_id) AS rk "
        "  FROM documents) WHERE rk <= 5"
    ),
    "q_sim_centroid": (
        "SELECT label, pos, round(avg(val), 4) AS c FROM ("
        "  SELECT label, "
        "  UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val, "
        "  UNNEST(range(1, len(embedding) + 1)) AS pos FROM embeddings) "
        "GROUP BY label, pos"
    ),
}
