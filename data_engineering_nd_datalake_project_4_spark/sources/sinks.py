"""Sinks (SURVEY.md §2.2 A; reference R05-R07).

Partitioned snappy parquet, written natively — including to s3a:// — never
via an ``aws s3 cp`` subprocess side-channel (reference anti-pattern,
/root/reference/etl.py:239-251).

Scale notes: dynamic partition overwrite only rewrites touched partitions;
``max_records_per_file`` bounds file sizes so a skewed partition key cannot
produce multi-GB files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
    max_records_per_file: int | None = None,
    dynamic_partition_overwrite: bool = False,
    cluster_by_partitions: bool = True,
) -> None:
    """``cluster_by_partitions`` repartitions on the partition columns before
    a partitioned write so each output directory is produced by ONE task —
    without it every task touches every directory it holds rows for, and a
    high-cardinality partition key (e.g. the reference's ``artist_id``
    layout, etl.py:107) explodes into tasks×dirs tiny files. Costs one
    shuffle; at scale that shuffle is far cheaper than the small-file storm.
    """
    if partition_by and cluster_by_partitions:
        df = df.repartition(*partition_by)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if dynamic_partition_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed identically on their join key join WITHOUT a
    shuffle (both sides already hash-partitioned on disk) — at 100 TB this
    turns the recurring fact⋈fact join from the dominant cost into a local
    merge. Requires the session catalog (saveAsTable), not a bare path.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
