"""tools/plan_lint.py — the interactive runner over the plan-audit
classes. The audits themselves are red-case-tested in test_plans.py;
these pin the tool's wiring: findings are counted, clean plans report
zero, and the codegen metric comes from a fresh rebuild (the
order-sensitivity fix)."""

from __future__ import annotations

import importlib.util
import pathlib

from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.catalog import load_table
from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY

_TOOL = pathlib.Path(__file__).resolve().parent.parent / "tools" / "plan_lint.py"


def _mod():
    spec = importlib.util.spec_from_file_location("plan_lint", _TOOL)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_lint_flags_wide_group_key(spark, sf_dir, capsys):
    pl = _mod()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bad = docs.groupBy("text").count()
    n = pl.lint(bad, label="red-case")
    out = capsys.readouterr().out
    assert n >= 1
    assert "wide payload on keyed shuffle" in out


def test_lint_clean_query_reports_zero_and_fresh_codegen(spark, sf_dir, capsys):
    pl = _mod()
    q = REGISTRY["q02"]
    df = q.spark_fn(spark, sf_dir)
    # poison the cached plan the way an interactive session would (an
    # explain before the lint); the rebuild hook must still yield a
    # correct codegen count
    df.explain()
    df._lint_rebuild = lambda: q.spark_fn(spark, sf_dir)
    n = pl.lint(df, label="q02")
    out = capsys.readouterr().out
    assert n == 0
    assert "clean" in out
    assert "codegen stages: 0" not in out


def test_lint_at_scale_uses_rebuild_and_restores_conf(spark, sf_dir, capsys):
    pl = _mod()
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    agg = emb.groupBy("vec_id").agg(F.first("embedding").alias("embedding"))
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    n = pl.lint(
        agg,
        label="vec-agg",
        at_scale=True,
        rebuild=lambda: emb.groupBy("vec_id").agg(
            F.first("embedding").alias("embedding")
        ),
    )
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    # a vector-carrying keyed aggregate flags in both tiers
    assert n >= 2


def test_lint_at_scale_without_rebuild_raises(spark, sf_dir):
    # the silent-fallback hole: at_scale over a cached plan would re-audit
    # tier 1 and report clean — the API must refuse instead
    import pytest

    pl = _mod()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    with pytest.raises(ValueError, match="rebuild"):
        pl.lint(docs.groupBy("doc_id").count(), label="no-thunk", at_scale=True)
