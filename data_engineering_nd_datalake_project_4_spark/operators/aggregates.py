"""Aggregation operators (SURVEY.md §2.2 D).

Everything compiles to partial+final HashAggregate (map-side combine → one
shuffle of partials). ``grouping_sets`` / rollup / cube expand in the plan,
not in storage. ``approx_count_distinct`` is the scale path for distinct
counts (HLL sketch, mergeable, no exact shuffle of the key universe).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.groupBy(*keys).agg(*aggs)


def having(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column], predicate: Column) -> DataFrame:
    """GROUP BY ... HAVING — the predicate filters the aggregated rows."""
    return df.groupBy(*keys).agg(*aggs).filter(predicate)


def rollup(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube(df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def count_distinct(df: DataFrame, cols: Sequence[str], exact: bool = True, rsd: float = 0.05) -> DataFrame:
    """Exact (shuffling) or HLL-approximate distinct counts per column.

    At 100 TB prefer ``exact=False``: approx_count_distinct is a fixed-size
    mergeable sketch — one narrow shuffle regardless of key cardinality.
    """
    fn = F.countDistinct if exact else (lambda c: F.approx_count_distinct(c, rsd))
    return df.agg(*[fn(c).alias(f"n_{c}") for c in cols])
