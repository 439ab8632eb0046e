"""Spark-vs-DuckDB comparison harness mirroring the driver's correctness
check: row count, column names, and order-insensitive value comparison
(columns sorted by name, rows sorted, values canonicalized).

``compare`` is STRICT by default: values must render to identical canonical
strings (the driver sha256-hashes canonical CSV — no tolerance exists there).
Round-1 lesson: a tolerant local compare passed all queries while the driver
failed 9, because Spark DECIMAL(18,2) renders "995.80" where the DuckDB side
renders the float "995.8". Strict mode also REJECTS DecimalType in the Spark
output schema outright — final projections must be double/int/string/date
(see functions.dec_sum_d)."""

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

def _strict_canon(v):
    """Render a value exactly as a canonical-CSV hasher would: one string per
    cell, no tolerance. Floats use repr (shortest round-trip — identical for
    bit-identical doubles); Decimals are rendered at their own scale so a
    scale-rendering difference between engines IS a failure."""
    if v is None:
        return r"\N"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_strict_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def compare_strict(spark_df, con, sql: str) -> None:
    """Exact canonical-string comparison — the driver's hash gate, observable.

    Fails if the Spark schema still contains DecimalType (decimals render
    scale-dependently across engines' client paths) or if any cell's
    canonical string differs."""
    from pyspark.sql.types import DecimalType

    decs = [f.name for f in spark_df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not decs, (
        f"DecimalType in final output {decs}: render-unsafe under the driver's "
        "canonical-CSV hash — cast to double (functions.dec_sum_d)"
    )

    sdata = spark_df.collect()
    scols = spark_df.columns
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    odata = res.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in ocols), (
        f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(sdata) == len(odata), f"row count: spark={len(sdata)} oracle={len(odata)}"

    sorder = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    oorder = sorted(range(len(ocols)), key=lambda i: ocols[i].lower())
    srows = sorted(
        tuple(_strict_canon(row[i]) for i in sorder) for row in (tuple(r) for r in sdata)
    )
    orows = sorted(tuple(_strict_canon(row[i]) for i in oorder) for row in odata)
    mismatches = [
        (i, sr, orr) for i, (sr, orr) in enumerate(zip(srows, orows)) if sr != orr
    ]
    assert not mismatches, (
        f"{len(mismatches)} strictly-mismatched rows; first: {mismatches[0]}"
    )


def compare(spark_df, con, sql: str, float_tol: bool = True) -> None:
    """Default comparison = strict canonical strings (the only bar that
    matches the driver). ``float_tol=True`` additionally falls back to a
    tolerant numeric diff on failure purely to produce a better error
    message distinguishing value bugs from rendering bugs."""
    try:
        compare_strict(spark_df, con, sql)
        return
    except AssertionError:
        if not float_tol:
            raise
    # Strict failed — run the tolerant comparison to classify the failure.
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
    if mismatches:
        raise AssertionError(
            f"VALUE mismatch ({len(mismatches)} rows, beyond tolerance); "
            f"first: {mismatches[0]}"
        )
    raise AssertionError(
        "RENDERING mismatch: values numerically equal but canonical strings "
        "differ (decimal scale / float repr divergence) — would fail the "
        "driver hash"
    )
