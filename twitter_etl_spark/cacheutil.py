"""One-slot persistent-cache helper for query-internal reuse.

Several queries materialize an intermediate frame that feeds two or
more downstream aggregations (q_text_dsir's hashed feature frame,
q_behavior_rfm's per-user metrics). ``persist()`` alone leaks: each
invocation registers a fresh cached RDD that lives until session end,
so a 200-query cert run or an n-run bench accumulates copies. This
helper keeps ONE live cached frame per slot key — persisting a new
frame unpersists the previous holder first — bounding session cache
usage at one copy per operator regardless of how many times it runs.
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}
_LOCK = threading.Lock()


def cache_latest(
    slot: str,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` under ``slot``, releasing the slot's previous
    cached frame (non-blocking — Spark recomputes it if a stale plan
    is still running, which only costs time, never correctness).
    The swap is lock-guarded so concurrent invocations (a threaded
    bench) cannot interleave and orphan a persisted frame."""
    out = df.persist(level)
    with _LOCK:
        prev = _SLOTS.get(slot)
        _SLOTS[slot] = out
    if prev is not None and prev is not out:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass  # session may have restarted since
    return out
