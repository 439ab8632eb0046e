"""Deequ-style declarative data-quality constraints.

A real lakehouse pipeline validates every batch before it reaches
training/analytics (the reference's ETL loads blind —
/root/reference/etl.py has no validation stage; AWS Deequ / dbt tests are
the published shape of this operator). One call = ONE aggregate pass over
the table: every rule compiles to conditional-count expressions inside a
single groupBy().agg(), so a 100-TB validation costs one scan + one
1-row partial+final aggregate — no per-rule jobs, no driver-side data.

Metrics are exact integer-count ratios (one IEEE division each —
cross-engine deterministic, oracle-checkable). Supported rule kinds:

- ``not_null``:        metric = count(col) / count(*)
- ``unique``:          metric = countDistinct(col) / count(col)
  (distinctness over non-null values; NULLs are not_null's business)
- ``in_range``:        metric = fraction of NON-NULL values in [lo, hi]
- ``accepted_values``: metric = fraction of NON-NULL values in the set
- ``min_rows``:        metric = count(*), passed = count >= lo

``passed`` = metric >= threshold (default 1.0 — every row must comply;
lower it for tolerance-style rules). Empty-input convention: ratio rules
pass vacuously (0/0 → metric NULL → passed true), min_rows fails.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = ("not_null", "unique", "in_range", "accepted_values", "min_rows")


def _metric(rule: dict) -> Column:
    kind, col = rule["kind"], rule.get("col")
    # try_divide, not `/`: under ANSI mode a 0-row input would make the
    # ratio 0/0 THROW; try_divide yields NULL, which the passed-column
    # COALESCE turns into the vacuous pass
    if kind == "not_null":
        return F.try_divide(F.count(F.col(col)).cast("double"), F.count(F.lit(1)))
    if kind == "unique":
        return F.try_divide(
            F.countDistinct(F.col(col)).cast("double"), F.count(F.col(col))
        )
    if kind == "in_range":
        lo, hi = rule["lo"], rule["hi"]
        ok = F.when(F.col(col).between(F.lit(lo), F.lit(hi)), 1)
        return F.try_divide(F.count(ok).cast("double"), F.count(F.col(col)))
    if kind == "accepted_values":
        ok = F.when(F.col(col).isin(list(rule["values"])), 1)
        return F.try_divide(F.count(ok).cast("double"), F.count(F.col(col)))
    if kind == "min_rows":
        return F.count(F.lit(1)).cast("double")
    raise ValueError(f"unknown rule kind {kind!r}; expected one of {_KINDS}")


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` in ONE aggregate pass. Each rule is a dict with
    ``name`` (output label), ``kind`` (see module docstring), ``col``
    (except min_rows), kind-specific params (``lo``/``hi``/``values``),
    and optional ``threshold`` (default 1.0; for min_rows the bound is
    ``lo``). Returns ``(rule string, metric double, passed boolean)``,
    one row per rule, in rule order.

    Shape: all metrics compute in one agg (multiple distinct aggregates
    plan through Spark's Expand — still a single scan); the 1-row result
    unpivots map-side to rule rows. Nothing is collected.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    names = [r["name"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names in {names}")
    agg_row = df.agg(*[_metric(r).alias(f"__m{i}") for i, r in enumerate(rules)])
    entries = []
    for i, r in enumerate(rules):
        m = F.col(f"__m{i}")
        if r["kind"] == "min_rows":
            passed = m >= F.lit(float(r["lo"]))
        else:
            thr = float(r.get("threshold", 1.0))
            # vacuous pass on 0/0 (NULL metric): no values to violate
            passed = F.coalesce(m >= F.lit(thr), F.lit(True))
        entries.append(
            F.struct(
                F.lit(r["name"]).alias("rule"),
                m.alias("metric"),
                passed.alias("passed"),
            )
        )
    return agg_row.select(
        F.explode(F.array(*entries)).alias("__r")
    ).select("__r.rule", "__r.metric", "__r.passed")
