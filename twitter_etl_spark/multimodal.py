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


def _decode_real(payload: bytes) -> list[float] | None:
    """Real-codec extension point: decode ``payload`` as an image via
    PIL when it is importable, returning 4 features (width, height,
    mean, spread of an 8x8 grayscale thumbnail). Returns ``None`` —
    never raises — when PIL is absent OR the payload isn't decodable
    as an image, so the caller can fall back to the byte-level stub.
    Swap/extend this function for other codecs (audio, video frames).
    """
    try:
        import io

        import PIL.Image
    except ImportError:
        return None
    try:  # pragma: no cover - exercised via fake-PIL monkeypatch test
        with PIL.Image.open(io.BytesIO(payload)) as img:
            w, h = img.size
            px = list(img.convert("L").resize((8, 8)).getdata())
        mean = sum(px) / len(px)
        spread = max(px) - min(px)
        return [float(w), float(h), float(mean), float(spread)]
    except Exception:
        # present codec but non-image payload: stub fallback, not a crash
        return None


def _decode_one(payload: bytes) -> list[float]:
    """Decode one payload: real codec when available (see
    ``_decode_real``), else a deterministic byte-level STUB — same
    4-feature shape either way, so the pipeline schema is identical
    in minimal and codec-equipped containers.
    """
    if payload is None or len(payload) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    real = _decode_real(payload)
    if real is not None:
        return real
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


def export_paired_shards(docs: DataFrame, path: str) -> None:
    """Write the cross-modal paired shards a multimodal training
    reader consumes: parquet partitioned by (pack_group, shard_seq),
    each partition holding its entries in byte_offset order with the
    content bytes inline — payload and caption ADJACENT in the same
    shard per the pair contract (``queries.multimodal_q.
    q_multimodal_pair_manifest`` decides placement; this writer just
    joins content back onto the manifest and lays files out).

    Scale: the manifest is metadata-only; content joins back on
    doc_id (one shuffle of the payload bytes — unavoidable when
    physically packing), then ``repartition(pack_group)`` gives each
    writer task its own groups and ``sortWithinPartitions`` lays
    entries in stream order. Partition-pruned readers can open any
    (pack_group, shard_seq) subset."""
    from pyspark.sql import functions as F

    from .queries.multimodal_q import _PAIR_CAPTION_CHARS, pair_manifest_frame

    manifest = pair_manifest_frame(docs)
    cap = F.concat(
        F.col("lang"),
        F.lit(": "),
        F.substring(F.col("text"), 1, _PAIR_CAPTION_CHARS),
    )
    content = docs.select(
        "doc_id",
        F.col("text").alias("payload_content"),
        cap.alias("caption_content"),
    )
    rows = (
        manifest.join(content, "doc_id")
        .select(
            "doc_id",
            "pack_group",
            "shard_seq",
            "kind",
            "n_bytes",
            "byte_offset",
            F.when(F.col("kind") == "payload", F.col("payload_content"))
            .otherwise(F.col("caption_content"))
            .alias("content"),
        )
    )
    (
        rows.repartition("pack_group")
        .sortWithinPartitions("pack_group", "shard_seq", "byte_offset")
        .write.mode("overwrite")
        .partitionBy("pack_group", "shard_seq")
        .parquet(path)
    )
