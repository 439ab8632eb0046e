"""Mergeable sketch operators: Count-Min frequency estimation.

Completes the engine's sketch family (HLL distinct counts via
``approx_count_distinct`` — q45; rank/percentile sketch via
``approx_percentile`` — q60) with a frequency sketch. The point of a CMS
at 100 TB: the sketch table is a FIXED ``depth × width`` grid of counters
(kilobytes) built in one scan with map-side partial aggregation; point
queries after that are O(depth) lookups against the tiny table — no
second scan of the data, and sketches from separate partitions/days merge
by cell-wise addition.

Pure Catalyst: the d hash rows come from ``xxhash64(col, seed_i)`` (the
extra literal argument reseeds the hash), bucketing via ``pmod``. No UDF,
no driver-side state.

The reference has no sketches (it has no aggregates beyond MAX —
/root/reference/etl.py:143); this is a north-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_cms(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 5,
) -> DataFrame:
    """One-scan Count-Min sketch: DataFrame[row, bucket, cnt] with
    ``depth`` hash rows of ``width`` buckets. Error: overestimate only,
    ≤ e/width · N with probability 1 - e^-depth."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(F.col(col).alias("__v"))
        .select("__v", rows)
        .select(
            "row",
            F.pmod(F.xxhash64(F.col("__v"), F.col("row")), F.lit(width)).alias(
                "bucket"
            ),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, depth): cell-wise
    addition — the property that makes CMS distributable (per-partition /
    per-day sketches combine without touching row data)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 5,
) -> DataFrame:
    """Estimated frequency for each distinct value in ``items[col]``:
    min over the depth hash rows of the matching bucket counters. The
    sketch side is broadcast (it is depth × width rows at most)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    probes = (
        items.select(F.col(col).alias("item"))
        .distinct()
        .select("item", rows)
        .select(
            "item",
            "row",
            F.pmod(F.xxhash64(F.col("item"), F.col("row")), F.lit(width)).alias(
                "bucket"
            ),
        )
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("item")
        .agg(F.min("cnt").alias("est"))
    )
