"""Join operators (SURVEY.md §2.2 C).

Thin, typed builders over ``DataFrame.join`` that make the physical strategy
explicit where it matters at 100 TB:

- dimension joins broadcast the small side (no fact-table shuffle);
- large equi-joins shuffle on their keys and lean on AQE skew splitting;
- range joins are expressed as an equi-conjunct + range predicate so the
  planner can still hash/sort-merge on the equi part (a pure theta join
  would degrade to BroadcastNestedLoop).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """inner/left/right/full/semi/anti equi-join; optionally broadcast the
    right side (use for dims ≲ a few hundred MB — skips the fact shuffle)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on if isinstance(on, Column) else list(on), how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """EXISTS: rows of ``left`` with ≥1 match. Never duplicates left rows."""
    return equi_join(left, right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match."""
    return equi_join(left, right, on, "left_anti")


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    return left.crossJoin(right)


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Column,
    range_pred: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join + range predicate (e.g. ship date within 30 days of order
    date). The equi conjunct keeps the join hash-partitionable; the range
    predicate is applied as a post-join filter by the planner."""
    return left.join(right, equi & range_pred, how)
