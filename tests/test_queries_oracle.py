"""Every oracle-checkable query from the declared contract, Spark vs DuckDB
at sf0.001 — the local mirror of the driver's t2 gate (which runs sf0.01)."""

from __future__ import annotations

import pytest

from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY

from tests.oracle_util import compare, duck_con

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, con, name):
    # oracle_sql() (not the raw .oracle) — the driver gets the
    # decimal-cast-aligned SQL, so the test must exercise the same string
    from data_engineering_nd_datalake_project_4_spark.queries import oracle_sql

    q = REGISTRY[name]
    compare(q.spark_fn(spark, sf_dir), con, oracle_sql()[name])


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_executes(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark_fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
