"""Multimodal columns: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.6, BASELINE.json north_star): images/audio/
video travel as ``BinaryType`` columns next to a typed metadata
struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row
objects. The actual codec step is STUBBED (no image/audio libs in
this container): ``decode_features`` tries the real library import
and falls back to a deterministic byte-level feature extractor, so
the Spark-side plumbing — schema, batching, partition-size control —
is real and tested end-to-end.

At 100 TB: payloads dominate partition size, so repartition by
byte-budget (``maxPartitionBytes`` / explicit repartition on a
size-bucketed key) before the decode stage; metadata-only queries
never touch the binary column thanks to Parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: decoded-feature schema emitted by the mapInPandas stage
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Make a documents-shaped frame multimodal: text bytes as the
    opaque payload + a typed metadata struct (the shape a real
    image/audio ingest would produce via the binaryFile source)."""
    payload = F.col(text_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit("text-as-bytes").alias("modality"),
            F.length(payload).alias("n_bytes"),
            F.md5(F.col(text_col)).alias("digest"),
        ),
    )


def _decode_one(payload: bytes) -> list[float]:
    """STUB decode: deterministic byte-level 'features'.

    Real deployments replace this body with e.g. PIL/torchvision
    decode + model features; the import guard keeps the pipeline
    runnable in minimal containers.
    """
    try:  # pragma: no cover - real codec path, absent in container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode not wired in this build; deterministic "
            "fake features are used instead"
        )
    except ImportError:
        pass
    if payload is None or len(payload) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        float(len(payload)),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:16]) % 997),
    ]


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over (doc_id, payload,
    meta) -> FEATURE_SCHEMA rows. Batches arrive as pandas frames,
    so per-batch vectorized work is possible; the per-payload codec
    call is the only Python-level loop."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "digest": [m["digest"] for m in pdf["meta"]],
                    "features": [_decode_one(p) for p in pdf["payload"]],
                }
            )

    return df.select("doc_id", "payload", "meta").mapInPandas(
        _decode, schema=FEATURE_SCHEMA
    )
