"""Operator surface: thin, typed builders over DataFrame transformations.

Every operator is a pure DataFrame→DataFrame function: no ``collect()`` on
the data path, no driver-side row loops — scale is delegated to Catalyst,
AQE and the shuffle machinery (SURVEY.md §2.2 design rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_map_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a narrow input across the cluster before a compute-dense map
    stage (shingling, MinHash lanes, SimHash bit votes, per-pair GEMM).

    A small table read from one parquet row group arrives as ONE
    unsplittable partition, serializing the expensive projection onto a
    single core no matter how many the session has. At 100 TB the scan
    already yields thousands of splits and this is a no-op; below the
    target, one round-robin repartition moves only the narrow input
    (id + text/vector) and unlocks full map parallelism. Compute-dense
    operators call this on their input — a shuffle whose payload is tiny
    relative to the map work it distributes.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
