"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship multi-way-join revenue query at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full declared contract
(SURVEY.md §2.3 Q01-Q32 + LLM-pipeline extensions Q33+) from
``data_engineering_nd_datalake_project_4_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_nd_datalake_project_4_spark import queries as _q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q5-shaped multi-way join revenue (q08)."""
    return _q.REGISTRY["q08"].spark_fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
