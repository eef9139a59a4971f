"""ANSI error-handling surface: the ``try_*`` function family
(SURVEY.md §2.4 [EXT]).

Spark 4 runs ANSI mode by default: division by zero, bad casts and
integer overflow are runtime ERRORS — at 100 TB one malformed row
must not kill a 6-hour job, so production expressions use the
``try_*`` forms, which return NULL instead of raising. This query
pins that contract for divide / cast / add-overflow (the DuckDB
twins: ``NULLIF`` guard, ``TRY_CAST``, and an explicit CASE for
the overflow row — DuckDB errors on bigint overflow with no try
form, so the oracle states the expected NULL directly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table

_I64_MAX = 9223372036854775807


def q_fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.round(
            F.try_divide(F.col("n_regionkey"), F.col("n_nationkey") % 3), 6
        ).alias("safe_div"),
        # the decimal parse result is cast to BIGINT: a DecimalType
        # output column is a driver hash hazard even when (as here)
        # every value is NULL — see test_plans.py::test_no_decimal_type_outputs
        F.try_to_number(F.col("n_name"), F.lit("999")).cast("bigint").alias("bad_cast"),
        F.try_add(
            F.lit(_I64_MAX), F.col("n_nationkey").cast("bigint")
        ).alias("overflow_add"),
    )


QUERIES = {"q_fn_try_arith": q_fn_try_arith}

ORACLE = {
    "q_fn_try_arith": (
        "SELECT n_nationkey, "
        "round(n_regionkey / nullif(n_nationkey % 3, 0), 6) AS safe_div, "
        "TRY_CAST(n_name AS DECIMAL(3, 0))::BIGINT AS bad_cast, "
        f"CASE WHEN n_nationkey = 0 THEN {_I64_MAX} "
        "ELSE NULL END::BIGINT AS overflow_add "
        "FROM nation"
    ),
}
