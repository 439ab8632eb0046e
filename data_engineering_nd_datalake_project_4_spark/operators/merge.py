"""MERGE INTO as a DataFrame composition (the batch upsert the warehouse
surface needs; Delta/Iceberg compile their MERGE to exactly this shape:
one full-outer join on the key, then per-branch projection).

Scale notes: the join shuffles both sides on the merge key (AQE handles
skew); with a bucketed target table (``sinks.write_bucketed_table``) the
target side's shuffle disappears. No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_set: dict[str, Column],
    insert_values: dict[str, Column] | None = None,
    delete_condition: Column | None = None,
) -> DataFrame:
    """SQL MERGE semantics over DataFrames; returns the merged table.

    - matched (key in both): apply ``update_set`` (columns not listed keep
      the target value); if ``delete_condition`` (evaluated on the joined
      row) is true, the row is dropped instead.
    - not matched by source (target only): row kept unchanged.
    - not matched by target (source only): ``insert_values`` builds the new
      row (required if inserts are possible; unlisted columns are NULL).

    ``source`` must be unique on ``key`` (SQL MERGE raises on multiple
    matches; this compilation would instead fan matched target rows out) —
    pre-aggregate or dropDuplicates the source side if it is not. A NULL
    ``delete_condition`` keeps the row (SQL WHEN-clause semantics: only a
    TRUE condition deletes).

    ``update_set`` / ``insert_values`` expressions may reference source
    columns (prefixed ``__src_``) and target columns by their own names —
    use :func:`src` to reference the source side.
    """
    src_pref = source.select(
        F.col(key).alias("__src_key"),
        *[F.col(c).alias(f"__src_{c}") for c in source.columns if c != key],
    )
    j = target.join(src_pref, F.col(key) == F.col("__src_key"), "full_outer")
    matched = F.col(key).isNotNull() & F.col("__src_key").isNotNull()
    src_only = F.col(key).isNull() & F.col("__src_key").isNotNull()

    if delete_condition is not None:
        # coalesce: a NULL condition must KEEP the row (~(matched & NULL)
        # is NULL, which filter would drop — SQL only deletes on TRUE).
        j = j.filter(~(matched & F.coalesce(delete_condition, F.lit(False))))

    out_cols = []
    for c in target.columns:
        updated = update_set.get(c)
        ins = (insert_values or {}).get(
            c, F.col("__src_key") if c == key else F.lit(None)
        )
        col = F.col(c)
        if updated is not None:
            col = F.when(matched, updated).otherwise(col)
        out_cols.append(F.when(src_only, ins).otherwise(col).alias(c))
    return j.select(*out_cols)


def src(col: str) -> Column:
    """Reference a source-side column inside merge_into expressions."""
    return F.col(f"__src_{col}")
