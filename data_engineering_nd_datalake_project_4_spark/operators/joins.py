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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """As-of join: for every left row, the right row with the greatest
    ``right_ts <= left_ts`` within the same ``key`` (inclusive, LEFT
    semantics — unmatched left rows keep NULLs).

    Spark-first plan (Spark has no native ASOF): tag and union both sides,
    sort per key by (ts, side) with right rows first at equal ts, and fill
    ``right_cols`` forward with ``last(ignorenulls)`` over a running frame —
    ONE shuffle on the key, no range nested-loop, state bounded by the
    window. The classic alternative (range-condition theta join) degrades
    to BNLJ and O(L·R) comparisons.

    Ties on ``right_ts`` within a key are the caller's to resolve (dedupe
    the right side first); matches DuckDB ``ASOF LEFT JOIN`` semantics —
    including NULLs: right rows with NULL ``right_ts`` never match, and a
    matched right row's NULL column value stays NULL (the right columns are
    forward-filled as ONE struct, so a non-null older row can't bleed into
    individual fields).
    """
    from pyspark.sql import Window

    lcols = [c for c in left.columns]
    clashes = set(right_cols) & set(lcols)
    if clashes:
        raise ValueError(
            f"right_cols {sorted(clashes)} collide with left columns — "
            "alias them on the right side before the asof join"
        )
    rtypes = dict(right.dtypes)
    struct_t = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in right_cols) + ">"
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        F.lit(None).cast(struct_t).alias("__r"),
    )
    r_tagged = (
        right.filter(F.col(right_ts).isNotNull())  # NULL ts never matches
        .select(
            *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols if c != key],
            F.col(key),
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__is_l"),
            F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
        )
        .select(*lcols, "__ts", "__is_l", "__r")
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("__ts"), F.asc("__is_l"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__is_l",
        F.last("__r", ignorenulls=True).over(w).alias("__rf"),
    )
    return (
        filled.filter(F.col("__is_l") == 1)
        .select(*lcols, *[F.col("__rf")[c].alias(c) for c in right_cols])
    )


def interval_point_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_point: str,
    bin_width: int,
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key, made hash-partitionable
    by binning: each interval explodes to the bins it overlaps, each point
    maps to exactly one bin, the join is equi on bin id + exact containment
    filter. A point matches inside one specific bin of an interval, so no
    dedup pass is needed.

    Columns must be LONG (for timestamps: ``unix_micros`` first, with
    ``bin_width`` in the same unit). Without this, Spark plans a pure range
    predicate as BroadcastNestedLoopJoin — O(L·R) comparisons; binned, the
    cost is O((L·avg_bins + R) shuffle + per-bin candidates). Choose
    ``bin_width`` ≈ the typical interval length so avg_bins stays ~2.
    """
    l = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(left_start) / bin_width).cast("long"),
                (F.col(left_end) / bin_width).cast("long"),
            )
        ),
    )
    r = right.withColumn("__bin", (F.col(right_point) / bin_width).cast("long"))
    return (
        l.join(r, "__bin")
        .filter(
            (F.col(right_point) >= F.col(left_start))
            & (F.col(right_point) <= F.col(left_end))
        )
        .drop("__bin")
    )
