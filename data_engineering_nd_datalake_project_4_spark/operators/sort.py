"""Sort / limit / top-k (SURVEY.md §2.2 F).

``top_k`` compiles to TakeOrderedAndProject: each partition keeps a k-heap,
the driver merges k·partitions rows — no global sort shuffle. A global
``orderBy`` without limit range-partitions (sampling pass + shuffle); avoid
it at 100 TB unless the output truly must be totally ordered.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def ordered(df: DataFrame, order_by: Sequence[Column]) -> DataFrame:
    return df.orderBy(*order_by)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Total order must include a unique tie-break column so the selected
    k rows are deterministic (SURVEY.md §2.3 rule 3)."""
    return df.orderBy(*order_by).limit(k)
