"""Spark-vs-DuckDB comparison harness mirroring the driver's correctness
check: row count, column names, and order-insensitive value comparison
(columns sorted by name, rows sorted, values canonicalized)."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from data_engineering_nd_datalake_project_4_spark.catalog import TABLES

_REL_TOL = 1e-9


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return r"\N"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize()) if v != 0 else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(row[i]) for i in order) for row in data]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=_REL_TOL, abs_tol=1e-12)
    if isinstance(a, float) and isinstance(b, (int, decimal.Decimal)):
        return math.isclose(a, float(b), rel_tol=_REL_TOL, abs_tol=1e-12)
    if isinstance(b, float) and isinstance(a, (int, decimal.Decimal)):
        return math.isclose(float(a), b, rel_tol=_REL_TOL, abs_tol=1e-12)
    if isinstance(a, decimal.Decimal) or isinstance(b, decimal.Decimal):
        return decimal.Decimal(str(a)) == decimal.Decimal(str(b))
    if isinstance(a, int) and isinstance(b, int):
        return a == b
    return a == b

def compare(spark_df, con, sql: str, float_tol: bool = True) -> None:
    sdata = spark_df.collect()
    scols = spark_df.columns
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    odata = res.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols), (
        f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(sdata) == len(odata), f"row count: spark={len(sdata)} oracle={len(odata)}"

    srows = _rows([c.lower() for c in scols], [tuple(r) for r in sdata])
    orows = _rows([c.lower() for c in ocols], odata)
    mismatches = []
    for i, (sr, orr) in enumerate(zip(srows, orows)):
        for sv, ov in zip(sr, orr):
            if not _values_equal(sv, ov):
                mismatches.append((i, sr, orr))
                break
    assert not mismatches, f"{len(mismatches)} mismatched rows; first: {mismatches[0]}"
