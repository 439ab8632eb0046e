"""Catalog: load the driver testdata tables and register them as temp views.

Replaces the reference's ad-hoc ``createOrReplaceTempView`` scatter
(/root/reference/etl.py:132,160,162,197) with one registration point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY scale factor — their
#: cardinality is fixed (region=5, nation=25) or grows sublinearly. Joins
#: against these must never shuffle the fact side.
BROADCAST_DIMS = frozenset({"region", "nation"})


#: Timestamp columns whose parquet physical type has varied across testdata
#: generations: TIMESTAMP(NANOS) (read as int64 nanos via the legacy conf and
#: truncated to µs) or TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
#: TIMESTAMP_NTZ). Either way we normalize to session-TZ TIMESTAMP (UTC
#: session, SURVEY.md §2.3 rule 4) so `unix_micros`/`F.window`/date fns and
#: the DuckDB oracle (naive µs) all see identical values.
_NORMALIZE_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Column pruning + predicate pushdown are left to
    Catalyst — callers express plans declaratively."""
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception as e:  # PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS)
        # Only fall back to the legacy nanos-as-long conf for tables we
        # explicitly normalize: the conf is session-global and must STAY set
        # for the lazy scan to execute, so setting it eagerly for every load
        # would make any OTHER nanos-typed column silently read as bigint
        # instead of failing loudly here (ADVICE r1).
        if name not in _NORMALIZE_TS_COLS or "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    for col in _NORMALIZE_TS_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(col)
        if dtype == "bigint":
            # integer `div` — a double division would lose precision on
            # epoch-nanos (~1.7e18 > 2^53)
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif dtype == "timestamp_ntz":
            # session TZ is pinned to UTC, so this cast is value-preserving
            # and matches DuckDB's naive-timestamp reading of the same file
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view for the SQL surface."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
