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
