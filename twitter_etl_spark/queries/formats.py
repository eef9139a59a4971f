"""Columnar-format round trips beyond parquet (SURVEY.md §2.1).

``q_source_orc``: land ``nation`` as ORC and re-read it with the
explicit schema — same contract as the CSV/NDJSON landing sources
(``incremental.q_source_csv``, ``ref_parity.q_source_ndjson``); the
reference's landing zone is format-agnostic (main.R:55-66). The
oracle reads the SOURCE rows (DuckDB has no ORC reader): the check
certifies the round trip loses nothing.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from ..tables import table
from .incremental import _scratch


def q_source_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch(spark, "q_source_orc")
    shutil.rmtree(path, ignore_errors=True)
    n = table(spark, sf_dir, "nation")
    n.write.mode("overwrite").orc(path)
    return spark.read.schema(n.schema).orc(path)


QUERIES = {"q_source_orc": q_source_orc}

ORACLE = {
    "q_source_orc": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
}
