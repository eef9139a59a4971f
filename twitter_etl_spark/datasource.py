"""Custom Python DataSource (Spark 4 DataSource API): the
extensibility story for sources the built-ins don't cover — internal
services, bespoke formats, synthetic load generators — written in
pure Python yet PARTITIONED like a real connector (each partition is
read by a separate task; Arrow moves the rows).

The concrete source here is a deterministic synthetic documents
generator (``format("synthetic_docs")``): same seed → same corpus on
any cluster layout, ids strided per partition so readers never
coordinate. The same class shape (DataSource → partitions() →
read(partition)) is how a real HTTP/queue connector plugs in —
cf. the reference's rtweet stream source (main.R:49-70), which this
API could host natively instead of spooling through a landing dir.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WORDS = (
    "data spark table row scan merge batch value key part query "
    "window join filter sort group agg stream line fast slow big "
    "small the a customer vector error order column hash"
).split()


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        step = -(-self.n // self.parts)  # ceil
        return [
            _Partition(i, min(i + step, self.n))
            for i in range(0, self.n, step)
        ]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            # deterministic word salad: LCG on the doc id, no RNG state
            x = doc_id * 6364136223846793005 + 1442695040888963407
            words = []
            for _ in range(10 + doc_id % 20):
                x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
                words.append(_WORDS[x % len(_WORDS)])
            text = " ".join(words)
            yield (doc_id, text, "en" if doc_id % 3 else "es", f"src{doc_id % 5}", len(text))


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
                StructField("lang", StringType()),
                StructField("source", StringType()),
                StructField("n_chars", IntegerType()),
            ]
        )

    def reader(self, schema):
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)


def register(spark) -> None:
    """Register the source; afterwards
    ``spark.read.format("synthetic_docs").option("n", ...).load()``."""
    spark.dataSource.register(SyntheticDocsDataSource)


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Simple streaming reader (Spark 4
    ``SimpleDataSourceStreamReader``): offsets are document ids;
    each micro-batch emits the next ``batch_rows`` documents using
    the SAME deterministic generator as the batch reader — so the
    stream is replayable from any offset (the property checkpoint
    recovery depends on). This is the reference's live-stream
    ingest (main.R:49-70) as a NATIVE Python connector: no
    spool-to-landing-dir hop, offsets instead of file names."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 50))

    def initialOffset(self):
        return {"doc_id": 0}

    def read(self, start):
        lo = start["doc_id"]
        hi = lo + self.batch_rows
        rows = list(SyntheticDocsReader({"n": hi}).read(_Partition(lo, hi)))
        return (iter(rows), {"doc_id": hi})

    def readBetweenOffsets(self, start, end):
        # replay path (checkpoint recovery): regenerate exactly
        return iter(
            SyntheticDocsReader({"n": end["doc_id"]}).read(
                _Partition(start["doc_id"], end["doc_id"])
            )
        )

    def commit(self, end):
        pass
