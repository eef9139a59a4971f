"""Custom stateful streaming operator (SURVEY.md §2.5/§2.7):
``applyInPandasWithState`` — arbitrary per-key state maintained by
the engine across micro-batches, checkpoint-durable.

The demonstrator keeps per-user running totals (count + sum) and
emits the updated totals for every user seen in a batch. State is a
2-tuple per key — O(#users) total, engine-managed, recoverable from
the checkpoint after a restart (tested with two bounded runs).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    # state keeps the EXACT running sum; rounding happens only on the
    # emitted row, so the total can't drift as batch count grows
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum) across ALL batches — the custom
    stateful shape that windowed aggregation can't express (no
    window boundary: state lives for the life of the stream)."""
    from ..session import ship_package_to_executors

    ship_package_to_executors(stream.sparkSession)
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",  # emitted rows are final per batch (file sinks are append-only)
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
