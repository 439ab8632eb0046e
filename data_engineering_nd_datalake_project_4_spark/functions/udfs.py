"""Pandas UDF surface (SURVEY.md §2.2 K).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
the eval type from REAL type hints; string-ified hints raise
UNSUPPORTED_SIGNATURE.

Arrow-batched vectorized UDFs are the sanctioned Python path (~10-100×
over row-at-a-time ``F.udf``); still JVM→Python→JVM, so only for logic
built-ins can't express.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def poly_quantity(q: pd.Series) -> pd.Series:
    """0.5·q² + 2·q, vectorized over the whole Arrow batch (numpy ops)."""
    return 0.5 * q * q + 2.0 * q


def grouped_zscore(df, value_col: str, group_cols: list):
    """Grouped pandas transform via applyInPandas: per-group z-score.
    Demonstrates the grouped-map UDF surface; one shuffle on the group key.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", zscore double"

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf[value_col]
        sd = s.std(ddof=0)
        pdf = pdf.copy()
        pdf["zscore"] = (s - s.mean()) / sd if sd > 0 else 0.0
        return pdf

    return df.groupBy(*group_cols).applyInPandas(zscore, out_schema)


@udtf(returnType="chunk_idx int, start int, chunk string")
class ChunkTokensUDTF:
    """Python UDTF (table function) emitting overlapping token windows per
    input row — the UDF-surface twin of the pure-Catalyst
    ``operators.text.chunk_tokens`` (which is the production path: UDTFs
    cross the Python boundary per row; the Catalyst version stays in
    codegen). Kept for API completeness + as a cross-check in tests."""

    def eval(self, text: str, size: int, stride: int):
        if text is None:
            return
        toks = text.split(" ")
        idx = 0
        for start in range(0, max(len(toks) - 1, 0) + 1, stride):
            yield idx, start, " ".join(toks[start : start + size])
            idx += 1


def grouped_running_cents(df, key: str, ts_col: str, id_col: str, value_col: str):
    """Grouped applyInPandas running total in EXACT integer cents.

    The one grouped-UDF shape that can sit behind an exact-hash oracle:
    value → DECIMAL(18,2)·100 → int64 cents happens in Catalyst (both
    engines agree on the cast), the pandas side only sorts and cumsums
    int64 — exact, no float anywhere. Oracle twin: SUM(cents) OVER
    (PARTITION BY key ORDER BY ts, id).

    Each group is one Arrow batch; state never crosses groups, so the
    shuffle is the same single exchange a window aggregate needs.
    """
    from pyspark.sql import functions as F

    from data_engineering_nd_datalake_project_4_spark.functions import dec

    prepared = df.select(
        F.col(key),
        F.col(ts_col).alias("__ts"),
        F.col(id_col),
        (dec(value_col) * 100).cast("long").alias("__cents"),
    )

    def cumsum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ts", id_col])
        # SQL running-SUM NULL semantics (nulls soak): NULL values are
        # skipped (the total carries through a NULL row), but rows before
        # the first non-NULL value get NULL. A bare .cumsum() would emit
        # NaN at every NULL row instead — and Arrow hands NULL int64 over
        # as float64, so route through nullable Int64 to stay exact.
        c = pdf["__cents"].astype("Int64")
        run = c.fillna(0).cumsum()
        seen = c.notna().cumsum() > 0
        pdf["running_cents"] = run.where(seen, other=pd.NA).astype("Int64")
        return pdf[[key, id_col, "running_cents"]]

    out_schema = f"{key} int, {id_col} int, running_cents long"
    return prepared.groupBy(key).applyInPandas(cumsum, out_schema)
