"""Arbitrary stateful streaming via ``transformWithStateInPandas``
(Spark 4's StatefulProcessor API — SURVEY.md §2.5 [EXT]).

Where ``applyInPandasWithState`` gives one opaque state tuple per
key (``stateful.py``), the Spark-4 processor API gives TYPED,
composable state primitives per key — here a ``ValueState`` for the
running (count, sum) and a ``MapState`` for per-event-type counts —
each independently checkpointed, plus timers/TTL for state expiry.
This is the API a 100 TB streaming job wants: state lives in the
RocksDB state store (spillable, changelog-checkpointed, not
heap-bound), and per-key state size stays O(#distinct event types).

The demonstrator keeps per-user running totals AND the per-type
breakdown, emitting one row per user per batch. Restart recovery is
tested end-to-end with two bounded runs over one checkpoint
(``tests/test_streaming.py``). The TWS state-server protocol needs
``google.protobuf`` in every Spark-spawned python process; this
container ships none, so the test env vendors the cloud-sdk's
bundled pure-Python protobuf via ``tests/tws_shim/sitecustomize.py``
(the test still self-skips in a container where that shim can't
resolve a working protobuf). The ``applyInPandasWithState`` twin
(``stateful.py``) carries shim-independent stateful coverage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_types", T.LongType()),
        T.StructField("top_type", T.StringType()),
    ]
)

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class UserActivityProcessor(StatefulProcessor):
    """Per-user running totals (ValueState) + per-event-type counts
    (MapState). The exact running sum stays in state; rounding only
    on emit (no cross-batch drift)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n BIGINT, total DOUBLE")
        self._by_type = handle.getMapState(
            "by_type", "event_type STRING", "c BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            for t, c in pdf["event_type"].value_counts().items():
                prev = (
                    self._by_type.getValue((t,))[0]
                    if self._by_type.containsKey((t,))
                    else 0
                )
                self._by_type.updateValue((t,), (prev + int(c),))
        self._totals.update((n, total))
        per_type = {k[0]: v[0] for k, v in self._by_type.iterator()}
        # deterministic top type: max count, then lexicographic
        top = sorted(per_type.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "n_types": [len(per_type)],
                "top_type": [top],
            }
        )

    def close(self) -> None:
        pass


def running_user_activity(stream: DataFrame) -> DataFrame:
    """Per-user running totals + event-type breakdown across ALL
    batches via the Spark-4 StatefulProcessor. Requires the RocksDB
    state store (set here; it is the store this API — and any
    at-scale stateful job — is designed for)."""
    from ..session import ship_package_to_executors

    spark = stream.sparkSession
    ship_package_to_executors(spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserActivityProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )

FLUSH_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_flushed", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


class InactivityFlushProcessor(StatefulProcessor):
    """Buffer per-user event values in a ListState and flush them
    when the user goes quiet: every input batch (re)arms a
    processing-time timer ``timeout_ms`` ahead; when it expires with
    no newer activity, ``handleExpiredTimer`` emits one summary row
    and clears the buffer. Demonstrates the three TWS primitives the
    always-runnable ``applyInPandasWithState`` twin cannot express
    separately: ListState, per-key timers, and state TTL (the seen
    ValueState carries ``ttlDurationMs`` — RocksDB drops it without
    a tombstone pass; the buffer itself must NOT have a TTL or a
    flush could lose late buffers).

    At scale this is the write-behind pattern for sessionized
    feature stores: state is per-key bounded (buffer resets on
    flush), timers live in the RocksDB timer column family, and no
    global watermark stalls an idle key's flush."""

    def __init__(self, timeout_ms: int = 1500) -> None:
        self._timeout_ms = timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._buf = handle.getListState("buf", "v DOUBLE")
        # TTL'd marker state: proves the ttlDurationMs path end to
        # end (1 h — semantics-neutral for the flush logic)
        self._seen = handle.getValueState(
            "seen", "n BIGINT", ttlDurationMs=3_600_000
        )
        self._handle = handle

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        vals = []
        for pdf in rows:
            vals.extend(float(v) for v in pdf["value"])
        if vals:
            self._buf.appendList([(v,) for v in vals])
        n = (self._seen.get()[0] if self._seen.exists() else 0) + len(vals)
        self._seen.update((n,))
        # re-arm: drop any older timer so exactly one is pending
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._timeout_ms
        )
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        vals = [row[0] for row in self._buf.get()]
        self._buf.clear()
        if vals:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_flushed": [len(vals)],
                    "total_value": [round(sum(vals), 2)],
                }
            )

    def close(self) -> None:
        pass


def inactivity_flush(stream: DataFrame, timeout_ms: int = 1500) -> DataFrame:
    """Per-user buffered values flushed by processing-time
    inactivity timers (see :class:`InactivityFlushProcessor`)."""
    from ..session import ship_package_to_executors

    spark = stream.sparkSession
    ship_package_to_executors(spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=InactivityFlushProcessor(timeout_ms),
        outputStructType=FLUSH_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


KMV_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_state", T.LongType()),
        T.StructField("kmv_est", T.DoubleType()),
    ]
)


class KMinSketchProcessor(StatefulProcessor):
    """Per-event-type k-minimum-values sketch as a ``ListState``:
    state is the k smallest distinct 60-bit user-hash values seen so
    far — O(k) longs per key REGARDLESS of user cardinality (the
    strictly-bounded streaming form of the certifiable KMV family;
    queries/sketches.py::kmv_estimate is the batch twin whose
    estimator math this emits). Merge with each micro-batch is the
    lossless k-min union the rollup layer pins."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._kmin = handle.getListState("kmin", "h BIGINT")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        from ..queries.sketches import _KMV_K, _KMV_M

        cur = {int(t[0]) for t in self._kmin.get()}
        for pdf in rows:
            cur.update(int(h) for h in pdf["h"])
        kmin = sorted(cur)[:_KMV_K]
        self._kmin.put([(h,) for h in kmin])
        n = len(kmin)
        est = (
            float(n)
            if n < _KMV_K
            else float(_KMV_K - 1) * (_KMV_M / kmin[_KMV_K - 1])
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_state": [n],
                "kmv_est": [round(est, 4)],
            }
        )

    def close(self) -> None:
        pass


def running_kmv_distinct(stream: DataFrame) -> DataFrame:
    """Running distinct-user estimate per event type with O(k)
    state per key: the stream carries only (event_type, h) where h
    is the SAME md5-prefix hash as the batch sketch, so the emitted
    estimate after the last micro-batch equals
    ``kmv_estimate(kmv_hash_rows(union))`` exactly (test-pinned).
    Contrast with windowed_distinct_users (exact, state O(distinct))
    and the foreachBatch→update_kmv_rollup handoff (state in the
    rollup): this keeps the bounded sketch INSIDE the stream."""
    from pyspark.sql import functions as F

    from ..session import ship_package_to_executors

    spark = stream.sparkSession
    ship_package_to_executors(spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    hashed = stream.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    return hashed.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=KMinSketchProcessor(),
        outputStructType=KMV_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


PANE_SCHEMA = T.StructType(
    [
        T.StructField("day", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("h", T.LongType()),
    ]
)


class DayKMinPaneProcessor(StatefulProcessor):
    """Per-DAY k-minimum-values pane as ``ListState`` — the
    streaming producer of the per-day panes that
    ``q_ts_sliding_distinct_kmv`` (queries/timeseries.py) merges
    into trailing-window distinct estimates. State per day is the k
    smallest distinct 60-bit user-hash values — O(k) longs per day
    REGARDLESS of user cardinality — plus a ``ValueState`` emission
    counter so a downstream reader (and the equality-pin test) can
    select each day's LATEST pane from an append-mode sink: every
    micro-batch that touches a day re-emits that day's full current
    pane with a bumped ``seq``. Because the k-min union is lossless
    (the rollup.py KMV merge contract), the final streamed pane
    equals the batch pane over the same rows, and the 7-day merged
    estimator downstream equals the batch op's exactly."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._kmin = handle.getListState("kmin", "h BIGINT")
        self._seq = handle.getValueState("seq", "seq BIGINT")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        from ..queries.sketches import _KMV_K

        cur = {int(t[0]) for t in self._kmin.get()}
        for pdf in rows:
            cur.update(int(h) for h in pdf["h"])
        kmin = sorted(cur)[:_KMV_K]
        self._kmin.put([(h,) for h in kmin])
        seq = (int(self._seq.get()[0]) if self._seq.exists() else 0) + 1
        self._seq.update((seq,))
        yield pd.DataFrame(
            {
                "day": [key[0]] * len(kmin),
                "seq": [seq] * len(kmin),
                "h": kmin,
            }
        )

    def close(self) -> None:
        pass


def windowed_kmv_panes(stream: DataFrame) -> DataFrame:
    """Per-day KMV pane rows (day, seq, h) with O(k) state per day:
    the streaming half of the sliding-window distinct estimator.
    The stream carries only (day, h) where h is the SAME md5-prefix
    hash as the batch sketch (queries/sketches.py::kmv_hash_rows),
    so each day's latest emitted pane equals the batch per-day
    k-min pane over the union of all ingested events, and merging
    panes across a trailing window reproduces
    ``q_ts_sliding_distinct_kmv``'s estimator exactly
    (test-pinned)."""
    from pyspark.sql import functions as F

    from ..session import ship_package_to_executors

    spark = stream.sparkSession
    ship_package_to_executors(spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    hashed = stream.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    return hashed.groupBy("day").transformWithStateInPandas(
        statefulProcessor=DayKMinPaneProcessor(),
        outputStructType=PANE_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


QPANE_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("h", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


class BottomKValuePaneProcessor(StatefulProcessor):
    """Per-event-type bottom-k (hash, value) pane as ``ListState``
    — the streaming producer of the uniform sample that
    ``q_agg_quantile_bottomk`` (queries/sketches.py) computes its
    discrete percentiles over. State per key is the k pairs with
    the smallest row hashes — O(k) REGARDLESS of stream length —
    merged losslessly across micro-batches (the bottom-k union
    contract, same as the KMV panes but carrying the sampled VALUE
    alongside the hash). Emits the full current pane with a bumped
    ``seq`` each batch; a downstream reader selects max-seq per
    type and takes quantiles — equal to the batch op's sample
    estimates over the same rows (test-pinned)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        # State is keyed on (h, event_id), not h alone: the batch
        # sample's window orders by (h, event_id), so two distinct
        # event_ids colliding on the 60-bit hash BOTH survive there
        # — the pane must keep both (and tiebreak the k-boundary on
        # event_id) or the stream==batch pin silently breaks on the
        # first collision.
        self._pane = handle.getListState("pane", "h BIGINT, eid BIGINT, value DOUBLE")
        self._seq = handle.getValueState("seq", "seq BIGINT")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        from ..queries.sketches import _BK_K

        cur = {(int(t[0]), int(t[1])): float(t[2]) for t in self._pane.get()}
        for pdf in rows:
            for h, eid, v in zip(pdf["h"], pdf["event_id"], pdf["value"]):
                cur[(int(h), int(eid))] = float(v)
        kmin = sorted(cur.items())[:_BK_K]
        self._pane.put([(h, eid, v) for (h, eid), v in kmin])
        seq = (int(self._seq.get()[0]) if self._seq.exists() else 0) + 1
        self._seq.update((seq,))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(kmin),
                "seq": [seq] * len(kmin),
                "h": [h for (h, _), _ in kmin],
                "value": [v for _, v in kmin],
            }
        )

    def close(self) -> None:
        pass


def running_bottomk_sample(stream: DataFrame) -> DataFrame:
    """Per-event-type bottom-k uniform sample with O(k) state: the
    stream carries (event_type, h=md5-prefix(event_id), value), the
    SAME row hash as the batch quantile sketch, so the latest
    emitted pane per type equals the batch sample over the union of
    all ingested events and quantiles over it equal
    ``q_agg_quantile_bottomk``'s estimates exactly (test-pinned)."""
    from pyspark.sql import functions as F

    from ..session import ship_package_to_executors

    spark = stream.sparkSession
    ship_package_to_executors(spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    hashed = stream.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("value").cast("double").alias("value"),
    )
    return hashed.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=BottomKValuePaneProcessor(),
        outputStructType=QPANE_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
