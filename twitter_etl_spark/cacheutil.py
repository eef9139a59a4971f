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


def clear_slots() -> None:
    """Release every slot (plan-fingerprint determinism hook): a
    persisted slot makes the NEXT build of the same logical plan
    explain as InMemoryRelation instead of its real subtree, so any
    tool that fingerprints physical plans must reset slot state (plus
    ``spark.catalog.clearCache()``) to see the cache-independent cold
    form — otherwise the fingerprint depends on what ran earlier in
    the session (the r13 q_text_bpe_encode snapshot flake)."""
    with _LOCK:
        slots = list(_SLOTS.values())
        _SLOTS.clear()
    for df in slots:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
