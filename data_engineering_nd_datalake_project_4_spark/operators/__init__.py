"""Operator surface: thin, typed builders over DataFrame transformations.

Every operator is a pure DataFrame→DataFrame function: no ``collect()`` on
the data path, no driver-side row loops — scale is delegated to Catalyst,
AQE and the shuffle machinery (SURVEY.md §2.2 design rule).
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

_SIZE_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}


def _parse_byte_conf(value: str, default: int = 128 << 20) -> int:
    """Parse a Spark byte-size conf string ('134217728b', '128m', '1g')."""
    v = value.strip().lower()
    mult = 1
    while v and v[-1] in _SIZE_SUFFIX:
        mult = _SIZE_SUFFIX[v[-1]]
        v = v[:-1]
        if mult != 1:
            break
    try:
        return int(v) * mult
    except ValueError:
        return default


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Planner-cost-free estimate of the scan's split count from the file
    listing alone (``inputFiles`` touches only the already-built file
    index — no plan→RDD conversion, no job). Returns None when the plan is
    not a local file scan (then the caller pays the accurate RDD probe).

    PRECONDITION: valid only for a SINGLE-file-scan plan. On a multi-source
    plan (join/union of scans) ``inputFiles()`` returns the union of every
    scan's files, so the estimate would describe no real stage — detected
    by counting leaf scans in the optimized plan and returning None (→ the
    caller's accurate RDD probe) when there is more than one.

    Mirrors Spark's own packing: each file contributes
    ``size + openCostInBytes`` and chunks bin-pack into partitions of
    ``maxPartitionBytes`` — so MANY SMALL FILES correctly estimate as the
    FEW coalesced partitions they actually become (a bare file count would
    skip a needed repartition there), and one big file still counts as
    ``size/maxPartitionBytes`` splits.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    try:
        # multi-scan guard: inputFiles() unions ALL scans' files, so a
        # join/union plan would mis-estimate — detect via leaf count
        if df._jdf.queryExecution().optimizedPlan().collectLeaves().size() > 1:
            return None
    except Exception:
        pass  # non-JVM backend: rely on the documented precondition
    conf = df.sparkSession.conf
    max_bytes = _parse_byte_conf(
        conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    open_cost = _parse_byte_conf(
        conf.get("spark.sql.files.openCostInBytes", "4194304b"), default=4 << 20
    )
    total = 0
    for f in files:
        parsed = urlparse(f)
        if parsed.scheme not in ("", "file"):
            return None  # remote store: can't stat cheaply, use RDD probe
        try:
            total += os.path.getsize(unquote(parsed.path)) + open_cost
        except OSError:
            return None
    return max(1, math.ceil(total / max_bytes))


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

    The no-op decision itself must be free at scale: the probe reads the
    scan's file listing (count + local sizes vs ``maxPartitionBytes``)
    instead of materializing the plan's RDD — ``df.rdd`` forces full
    physical planning per call and reports the pre-AQE static number
    anyway. Only non-file-scan inputs (in-memory, post-shuffle) fall back
    to the RDD probe, and those are exactly the plans that were already
    materialized once.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    est = _estimated_scan_splits(df)
    if est is None:
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df
