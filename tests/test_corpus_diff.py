"""Corpus snapshot diff — operators.incremental.corpus_diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators.incremental import corpus_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_all_four_statuses(spark):
    old = _df(spark, [(1, "alpha"), (2, "beta"), (3, "gamma"), (5, None)])
    new = _df(spark, [(2, "beta"), (3, "gamma EDITED"), (4, "delta"), (5, None)])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "added",
        5: "unchanged",  # NULL on both sides is the same (absent) content
    }


def test_null_vs_text_is_changed_and_identity_diff_is_all_unchanged(spark):
    old = _df(spark, [(1, None), (2, "x")])
    new = _df(spark, [(1, "now present"), (2, None)])
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed", 2: "changed"}
    same = _df(spark, [(i, f"doc {i}") for i in range(50)])
    assert corpus_diff(same, same).filter("status != 'unchanged'").count() == 0


def test_every_id_from_either_side_appears_once(spark):
    old = _df(spark, [(i, f"v1 {i}") for i in range(0, 30)])
    new = _df(spark, [(i, f"v1 {i}" if i % 3 else f"v2 {i}") for i in range(10, 40)])
    out = corpus_diff(old, new)
    assert out.count() == 40
    assert out.select("doc_id").distinct().count() == 40
    counts = {
        r["status"]: r["cnt"]
        for r in out.groupBy("status").agg(F.count("*").alias("cnt")).collect()
    }
    # overlap 10..29; i%3==0 in that range: 12,15,18,21,24,27 -> changed
    assert counts == {"removed": 10, "added": 10, "changed": 6, "unchanged": 14}
