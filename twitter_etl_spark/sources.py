"""Sources: NDJSON landing zone, nested tweet payloads, binary files.

The reference lands raw stream payloads as newline-delimited JSON
files in a timestamp-named landing directory (``main.R:49-70``) and
parses them later. The Spark-native equivalent is a (streaming or
batch) JSON file source over the landing directory with an
**explicit schema** — schema inference is forbidden at scale and
unavailable in ``readStream``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: documents-shaped NDJSON schema (FIXTURES.md).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

#: Nested tweet-status schema for raw stream payloads — the shape the
#: reference's ``rtweet::parse_stream`` flattens (``main.R:81``).
#: Nested structs + arrays; free-form extras stay a JSON string and
#: are parsed on demand with ``from_json``/``get_json_object``.
TWEET_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("id_str", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(
            "user",
            T.StructType(
                [
                    T.StructField("screen_name", T.StringType()),
                    T.StructField("location", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "entities",
            T.StructType(
                [
                    T.StructField(
                        "hashtags",
                        T.ArrayType(
                            T.StructType([T.StructField("text", T.StringType())])
                        ),
                    )
                ]
            ),
        ),
        T.StructField(
            "quoted_status",
            T.StructType(
                [
                    T.StructField("text", T.StringType()),
                    T.StructField(
                        "user",
                        T.StructType([T.StructField("screen_name", T.StringType())]),
                    ),
                ]
            ),
        ),
        T.StructField("extra_props", T.StringType()),
    ]
)


def read_ndjson(spark: SparkSession, path: str, schema: T.StructType = DOCUMENTS_SCHEMA) -> DataFrame:
    """Batch-read an NDJSON landing file/dir with an explicit schema."""
    return spark.read.schema(schema).json(path)


def read_ndjson_robust(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Malformed-line-tolerant NDJSON read: PERMISSIVE mode parses
    what it can and lands each broken raw line in ``corrupt_col``
    instead of failing the job. A live tweet stream ships truncated
    and garbage lines (the reference's ``parse_stream`` silently
    drops them, ``main.R:81``); at scale you neither crash the batch
    (FAILFAST) nor silently lose evidence (DROPMALFORMED) — you
    quarantine, count, and alert."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def split_quarantine(
    df: DataFrame, corrupt_col: str = "_corrupt_record"
) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (parsed rows sans corrupt col,
    quarantined raw lines). The df is cached first: Spark disallows
    filtering on the internal corrupt column straight off a raw
    file scan (SPARK-21610), and the cache also makes the two
    branches share one parse."""
    from pyspark.sql import functions as F

    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return good, bad


def read_ndjson_stream(
    spark: SparkSession, landing_dir: str, schema: T.StructType = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Streaming JSON file source over the landing directory
    (Spark-native form of the reference's landing zone,
    ``main.R:55-66``). ``maxFilesPerTrigger=1`` reproduces the
    one-file-per-micro-batch cadence."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(landing_dir)
    )


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as an NDJSON landing directory (the write
    side of the landing zone, ``main.R:55-66``)."""
    df.write.mode(mode).json(path)


def read_rate_stream(
    spark: SparkSession, rows_per_second: int = 50
) -> DataFrame:
    """Genuinely unbounded source playing the live-HTTP-stream role
    (``main.R:60-66``): the built-in ``rate`` source never ends, so
    a ``processingTime`` trigger keeps producing micro-batches for
    as long as the query runs — unlike the file-landing source,
    which drains. Rows are mapped onto the documents shape so the
    same per-batch transform runs unchanged; in production the
    mapping would be a Kafka/socket payload parse instead."""
    from pyspark.sql import functions as F

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    text = F.concat(F.lit("hola mundo numero "), F.col("value").cast("string"))
    return rate.select(
        F.col("value").alias("doc_id"),
        text.alias("text"),
        F.when(F.col("value") % 5 == 0, "en").otherwise("es").alias("lang"),
        F.concat(F.lit("src"), (F.col("value") % 3).cast("string")).alias("source"),
        F.length(text).alias("n_chars"),
    )


def read_socket_stream(
    spark: SparkSession,
    host: str = "127.0.0.1",
    port: int = 9999,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Live TCP socket source parsed as NDJSON — the Spark-native
    stand-in for the reference's blocking live HTTP stream
    (``main.R:60-66``): one JSON payload per line, unbounded, parsed
    with the explicit schema via ``from_json`` (inference is
    unavailable in ``readStream``). Lines that fail to parse yield
    NULL fields but keep the raw line under ``_raw`` — the streaming
    twin of :func:`read_ndjson_robust`'s quarantine.

    The ``socket`` source is a dev/test source (no replay, no
    offsets, single reader); production swaps ``format("socket")``
    for ``format("kafka")`` and the downstream parse is UNCHANGED —
    both present a string ``value`` column per record."""
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return raw.select(
        F.col("value").alias("_raw"),
        F.from_json("value", schema).alias("j"),
    ).select("_raw", "j.*")


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Multimodal ingestion: opaque binary payloads + typed metadata
    via Spark's ``binaryFile`` source -> columns
    (path, modificationTime, length, content: binary)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def landing_file_name(ts_compact: str) -> str:
    """Timestamp-named landing file, reference convention
    ``stream_%Y%m%d_%H%M%S.json`` (``main.R:55-58``)."""
    return f"stream_{ts_compact}.json"


def ensure_landing_dir(path: str) -> str:
    """Create the landing dir on demand (``main.R:50-53``)."""
    os.makedirs(path, exist_ok=True)
    return path
