"""SparkSession factory.

Replaces the reference's ``spark_setup.py`` (see /root/reference/spark_setup.py:3-26)
which hard-coded 16g heaps, hour-long heartbeats and the deprecated ``s3n``
connector. Here: AQE on, sane shuffle partitioning, Arrow enabled for the
Pandas-UDF surface, ``s3a`` for object storage.

Scale notes (100 TB / multi-executor):
- AQE (coalesce partitions + skew-join splitting + runtime broadcast) is the
  single most important knob and is ON by default.
- ``spark.sql.shuffle.partitions`` is a *default*; large jobs should rely on
  AQE coalescing from a high initial number rather than a hand-tuned one.
- No memory sizes are pinned here — cluster managers own that. Local test
  runs inherit the JVM default, which is plenty at test scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session_builder(
    app_name: str = "data_engineering_nd_datalake_project_4_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession.Builder:
    """Builder with engine defaults; caller may override anything before build."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.session.timeZone", "UTC")
        # object storage: s3a (modern), never s3n (reference anti-pattern,
        # /root/reference/spark_setup.py:20-23)
        .config("spark.hadoop.fs.s3a.impl", "org.apache.hadoop.fs.s3a.S3AFileSystem")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )


def get_spark(**kwargs) -> SparkSession:
    """Get-or-create a session with engine defaults."""
    return session_builder(**kwargs).getOrCreate()
