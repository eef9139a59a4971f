"""Fixture table access.

All queries read the driver-generated parquet fixtures
(``TESTDATA.md``): TPC-H-ish star schema + ``events`` stream table +
``documents``/``embeddings`` LLM-pipeline tables. Reads go through
``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning, and (on partitioned layouts) partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _pin_parquet_confs(spark: SparkSession) -> None:
    """Pin parquet timestamp semantics (runtime SQL confs):

    - ``nanosAsLong``: the ``events`` fixture stores TIMESTAMP(NANOS),
      which Spark's vectorized reader rejects; read as long and
      convert below (exact integer division, no double round-trip).
    - ``inferTimestampNTZ`` off: fixture timestamps are naive-UTC; we
      want plain TIMESTAMP under the UTC session zone so epoch
      functions line up with the DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # calendar-dependent outputs (to_date/year/hour) must read the
    # naive-UTC fixtures under UTC even on a driver-provided session
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    _pin_parquet_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos -> micros via integer division (`div`), then to timestamp
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
