"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship transform_tweets-parity query
(reference ``/root/reference/main.R:74-109``) at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator inventory
(SURVEY.md §2) implemented in :mod:`twitter_etl_spark.queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from twitter_etl_spark.pipeline import transform_documents
from twitter_etl_spark.queries import ALL_ORACLES, ALL_QUERIES
from twitter_etl_spark.session import tune_for_session
from twitter_etl_spark.tables import table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    return transform_documents(table(spark, SMOKE_SF_DIR, "documents"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; rows-only ops omitted."""
    return dict(ALL_ORACLES)
