"""Source readers (SURVEY.md §2.2 A; reference R01-R04).

Explicit schemas always (skips the inference scan — the one good performance
decision the reference made, /root/reference/etl.py:85,95). Recursive lookup
for nested directory fan-outs (the song_data ``A/<L1>/<L2>/`` layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    recursive: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """JSON scan with a declared schema. ``recursive`` handles per-day /
    nested-dir fan-outs (reference R01/R02, /root/reference/etl.py:83-95)."""
    reader = spark.read.option("recursiveFileLookup", str(recursive).lower())
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader.schema(schema).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    return (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .schema(schema)
        .csv(path)
    )


def read_parquet(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Parquet scan (local or object storage via s3a://). Predicate pushdown,
    column pruning and partition pruning all apply — keep plans declarative.

    ``merge_schema=True`` unions the schemas of all footers (schema
    evolution: batches written with added columns read back as one table,
    missing columns NULL-filled). Off by default — merging reads every
    footer up front, which matters at 100k-file scale; evolved tables
    should flip it on explicitly or maintain a metastore schema."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (Spark's native ORC reader is vectorized and stats-pruned)."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Line-per-row (or whole-file-per-row) text scan into a single
    ``value`` string column — the raw-ingest entry for unstructured data."""
    return spark.read.text(path, wholetext=whole)
