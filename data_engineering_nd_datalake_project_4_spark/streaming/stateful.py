"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.2 J: the escape hatch when built-in windows/dedup can't
express the state machine).

NOTE: no ``from __future__ import annotations`` — pandas-facing signatures
stay real types. State is per-key and partition-local; Spark shuffles by
the grouping key, so state size is bounded by (distinct keys × state row),
not by stream length.
"""

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

RUNNING_COUNT_STATE = StructType([StructField("n", LongType())])
RUNNING_COUNT_OUT = StructType(
    [StructField("key", LongType()), StructField("running_n", LongType())]
)


def running_count_per_key(grouped_stream, key_col: str = "user_id") -> DataFrame:
    """Monotone running event count per key across micro-batches.

    The built-in ``groupBy().count()`` in update mode gives the same
    numbers — this exists to exercise the arbitrary-state surface (the
    pattern generalizes to sessionization with custom logic, CDC merge,
    online feature accumulation).
    """

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev = state.get[0] if state.exists else 0
        batch_n = sum(len(pdf) for pdf in pdfs)
        total = prev + batch_n
        state.update((total,))
        yield pd.DataFrame({"key": [key[0]], "running_n": [total]})

    return grouped_stream.applyInPandasWithState(
        update,
        outputStructType=RUNNING_COUNT_OUT,
        stateStructType=RUNNING_COUNT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4.0+): the successor API to
# applyInPandasWithState — typed named state handles (value/list/map state),
# timers, TTL. Gated behind an import-try so the module stays importable on
# older runtimes; the operator below raises if the API is absent.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - availability depends on the runtime
    # the state-server protocol needs protobuf, an optional pyspark dep —
    # absent protobuf the driver worker crashes at plan time, so gate on it
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment]
    HAS_TWS = False

RUNNING_STATS_OUT = StructType(
    [
        StructField("key", LongType()),
        StructField("running_n", LongType()),
        StructField("running_max", LongType()),
    ]
)


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running (count, max) across micro-batches via ValueState.

    The same accumulation as ``running_count_per_key`` but on the
    transformWithState surface: state is a named, typed handle the runtime
    owns (RocksDB-backed on a real cluster), so state size per key is a
    fixed row regardless of stream length — the 100 TB-stream design is
    keys × O(1), never buffered rows.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "stats", StructType([StructField("n", LongType()), StructField("mx", LongType())])
        )

    def handleInputRows(self, key, rows, timerValues):
        n, mx = (self._state.get() or (0, None)) if self._state.exists() else (0, None)
        for pdf in rows:
            n += len(pdf)
            # pd.notna, not len(): an all-NULL value column arrives as
            # float64 NaN and int(NaN) would kill the streaming query
            batch_max = pdf["value"].max() if len(pdf) else None
            if batch_max is not None and pd.notna(batch_max):
                batch_max = int(batch_max)
                mx = batch_max if mx is None else max(mx, batch_max)
        self._state.update((n, mx))
        yield pd.DataFrame(
            {"key": [key[0]], "running_n": [n], "running_max": [mx]}
        )

    def close(self) -> None:
        pass


def running_stats_per_key(grouped_stream) -> DataFrame:
    """transformWithStateInPandas wrapper (raises if the runtime lacks it)."""
    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires PySpark >= 4.0"
        )
    return grouped_stream.transformWithStateInPandas(
        RunningStatsProcessor(),
        outputStructType=RUNNING_STATS_OUT,
        outputMode="Update",
        timeMode="None",
    )


IDLE_SESSION_OUT = StructType(
    [
        StructField("key", LongType()),
        StructField("n_events", LongType()),
        StructField("evicted", LongType()),
    ]
)


class IdleSessionEvictionProcessor(StatefulProcessor):
    """Per-key idle-session eviction: processing-time timers + state TTL
    on the transformWithState surface (the two features
    applyInPandasWithState's GroupStateTimeout can't express separately).

    Semantics: every batch a key appears in emits a live update row
    (``evicted=0``) and re-arms a sliding idle timer ``idle_ms`` ahead
    (the previous timer is deleted — one live timer per key). When the
    timer fires — the key has been idle past the threshold — the final
    count is emitted with ``evicted=1`` and the state is CLEARED, so a
    later event for the key restarts from 1. ``state_ttl_ms`` additionally
    puts a runtime-owned TTL on the count state itself: the belt-and-
    braces eviction for keys whose timer is lost to a checkpoint rewind
    (TTL state silently expires server-side; reads return None).

    100 TB posture: state per key is two fixed rows (count + armed-timer
    echo) and one registered timer — keys × O(1), RocksDB-backed on a
    real cluster; eviction keeps the live key set bounded by the idle
    horizon instead of the stream's lifetime key universe.
    """

    def __init__(self, idle_ms: int = 1000, state_ttl_ms=None):
        self._idle_ms = idle_ms
        self._ttl_ms = state_ttl_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._count = handle.getValueState(
            "n",
            StructType([StructField("n", LongType())]),
            ttlDurationMs=self._ttl_ms,
        )
        # echo of the armed expiry so re-arming can delete the old timer
        self._armed = handle.getValueState(
            "armed", StructType([StructField("t", LongType())])
        )

    def handleInputRows(self, key, rows, timerValues):
        n = self._count.get()[0] if self._count.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._count.update((n,))
        if self._armed.exists():
            self._handle.deleteTimer(self._armed.get()[0])
        expiry = timerValues.getCurrentProcessingTimeInMs() + self._idle_ms
        self._handle.registerTimer(expiry)
        self._armed.update((expiry,))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "evicted": [0]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        n = self._count.get()[0] if self._count.exists() else 0
        self._count.clear()
        self._armed.clear()
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "evicted": [1]})

    def close(self) -> None:
        pass


def idle_evicting_session_counts(
    grouped_stream, idle_ms: int = 1000, state_ttl_ms=None
) -> DataFrame:
    """transformWithStateInPandas timer/TTL wrapper (raises if the runtime
    lacks the API — same gate as :func:`running_stats_per_key`)."""
    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires PySpark >= 4.0 with protobuf"
        )
    return grouped_stream.transformWithStateInPandas(
        IdleSessionEvictionProcessor(idle_ms=idle_ms, state_ttl_ms=state_ttl_ms),
        outputStructType=IDLE_SESSION_OUT,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
