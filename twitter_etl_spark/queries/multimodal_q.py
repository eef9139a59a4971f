"""Multimodal pipeline queries (SURVEY.md §2.6; rows-only).

The decode step is a deterministic stub (no codec libs in the
container) so these are rows-only for the driver, with the metadata
half additionally pinned by an oracle twin: digests/lengths are
computable in pure SQL on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import attach_binary_payload, decode_features
from ..tables import table


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct -> Arrow-batched feature
    extraction (stubbed codec; real mapInPandas plumbing)."""
    from ..session import ship_package_to_executors

    ship_package_to_executors(spark)
    d = table(spark, sf_dir, "documents")
    return decode_features(attach_binary_payload(d))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only projection over the multimodal frame — must
    never read the payload bytes at scale (column pruning); digest
    and byte length are oracle-checkable."""
    d = table(spark, sf_dir, "documents")
    mm = attach_binary_payload(d)
    return mm.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
    )


QUERIES = {
    "q_multimodal_decode": q_multimodal_decode,  # rows-only
    "q_multimodal_meta": q_multimodal_meta,
}

ORACLE = {
    "q_multimodal_meta": (
        "SELECT doc_id, 'text-as-bytes' AS modality, "
        "length(text)::INT AS n_bytes, md5(text) AS digest FROM documents"
    ),
}
