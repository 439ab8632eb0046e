"""Unit tests for the round-6 session additions: CDC changelog compaction /
apply (operators.incremental), domain-quota sampling (operators.dedup) and
regular-grid LOCF resampling (operators.timeseries)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators.dedup import domain_quota_sample
from data_engineering_nd_datalake_project_4_spark.operators.incremental import (
    apply_changelog,
    compact_changelog,
)
from data_engineering_nd_datalake_project_4_spark.operators.timeseries import resample_locf


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, bal double"
    )


def _ch(spark, rows):
    return spark.createDataFrame(
        rows, "id long, op string, seq long, name string, bal double"
    )


def test_compact_changelog_last_wins(spark):
    ch = _ch(spark, [(1, "U", 1, "x", 1.0), (1, "U", 3, "z", 3.0), (1, "D", 2, None, None)])
    out = compact_changelog(ch, "id", ["seq"]).collect()
    assert len(out) == 1 and out[0].op == "U" and out[0].name == "z" and out[0].bal == 3.0


def test_apply_changelog_paths(spark):
    # id 1: net update; id 2: net delete; id 3: untouched; id 9: fresh insert
    ch = _ch(
        spark,
        [
            (1, "U", 1, "a1", 11.0),
            (2, "U", 1, "b1", 21.0),
            (2, "D", 2, None, None),
            (9, "I", 1, "new", 99.0),
        ],
    )
    out = {r.id: r for r in apply_changelog(_snap(spark), ch, "id", ["seq"]).collect()}
    assert set(out) == {1, 3, 9}
    assert out[1].name == "a1" and out[1].bal == 11.0
    assert out[3].name == "c" and out[3].bal == 30.0
    assert out[9].name == "new" and out[9].bal == 99.0


def test_apply_changelog_nonpayload_column_semantics(spark):
    # snapshot has a column the changelog doesn't carry: kept on update,
    # NULL on fresh insert
    snap = spark.createDataFrame([(1, "a", "KEEP")], "id long, name string, extra string")
    ch = spark.createDataFrame(
        [(1, "U", 1, "a2"), (5, "I", 1, "e")], "id long, op string, seq long, name string"
    )
    out = {r.id: r for r in apply_changelog(snap, ch, "id", ["seq"]).collect()}
    assert out[1].extra == "KEEP" and out[1].name == "a2"
    assert out[5].extra is None and out[5].name == "e"


def test_apply_changelog_delete_absent_key_noop_and_idempotent(spark):
    ch = _ch(spark, [(42, "D", 1, None, None), (1, "U", 1, "a1", 11.0)])
    once = apply_changelog(_snap(spark), ch, "id", ["seq"])
    assert {r.id for r in once.collect()} == {1, 2, 3}
    # re-applying the same compacted feed is a fixpoint (U upserts the
    # same values, D keys already gone)
    twice = apply_changelog(once, ch, "id", ["seq"])
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, once.collect()))


def test_apply_changelog_unknown_op_fails_loudly(spark):
    ch = _ch(spark, [(1, "X", 1, "a1", 11.0)])
    with pytest.raises(Exception, match="unknown op|ASSERT"):
        apply_changelog(_snap(spark), ch, "id", ["seq"]).collect()


def test_apply_changelog_null_op_fails_loudly(spark):
    # a NULL op on a CHANGE row used to silently DELETE the key (the
    # three-valued `~(has_chg & (op == 'D'))` filter dropped it before the
    # assert_true guard ran); it must trip the guard instead
    ch = _ch(spark, [(1, None, 1, "a1", 11.0)])
    with pytest.raises(Exception, match="unknown op|ASSERT"):
        apply_changelog(_snap(spark), ch, "id", ["seq"]).collect()


def test_domain_quota_exact_counts_and_determinism(spark):
    rows = [(i, f"d{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_quota_sample(df, "source", 5, "doc_id")
    got = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"d0": 5, "d1": 5, "d2": 5}
    # deterministic: same rows on rerun, a subset of the input
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in domain_quota_sample(df, "source", 5, "doc_id").collect())
    assert a == b
    # small domains survive whole; different seeds draw different samples
    tiny = spark.createDataFrame([(1, "only")], "doc_id long, source string")
    assert domain_quota_sample(tiny, "source", 5, "doc_id").count() == 1
    c = sorted(r.doc_id for r in domain_quota_sample(df, "source", 5, "doc_id", seed=1).collect())
    assert a != c


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_resample_locf_grid_and_fill(spark):
    # obs at t=0s and t=25s, 10s grid -> instants 0,10,20,30
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0, 100), (1, _ts(25), 2.0, 101)],
        "k long, ts timestamp, v double, eid long",
    )
    out = resample_locf(df, "k", "ts", "v", 10, tie_break="eid").orderBy("ts").collect()
    assert [r.ts.second for r in out] == [0, 10, 20, 30]
    assert [r.v for r in out] == [1.0, 1.0, 1.0, 2.0]


def test_resample_locf_tie_break_and_null_obs(spark):
    # same-second collision: higher eid wins; NULL value is no-observation
    df = spark.createDataFrame(
        [(1, _ts(0), 1.0, 1), (1, _ts(0), 5.0, 2), (1, _ts(10), None, 3)],
        "k long, ts timestamp, v double, eid long",
    )
    out = resample_locf(df, "k", "ts", "v", 10, tie_break="eid").orderBy("ts").collect()
    # NULL obs dropped up front -> span collapses to the single real instant
    assert len(out) == 1 and out[0].v == 5.0
