"""Deequ-style constraint checker (operators.constraints): rule semantics
on planted violations, empty-input conventions, and the one-scan plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators.constraints import check_constraints


@pytest.fixture()
def dirty(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (2, "c", -5.0),   # duplicate id, out-of-range value
        (None, "a", 30.0),  # null id
        (5, "zz", None),  # unaccepted category, null value
    ]
    return spark.createDataFrame(rows, "id long, cat string, val double")


def test_planted_violations_fail_their_rules(dirty):
    out = check_constraints(
        dirty,
        [
            {"name": "id_not_null", "kind": "not_null", "col": "id"},
            {"name": "id_unique", "kind": "unique", "col": "id"},
            {"name": "val_range", "kind": "in_range", "col": "val", "lo": 0, "hi": 100},
            {"name": "cat_ok", "kind": "accepted_values", "col": "cat", "values": ["a", "b", "c"]},
            {"name": "enough", "kind": "min_rows", "lo": 3},
        ],
    )
    got = {r.rule: (r.metric, r.passed) for r in out.collect()}
    assert got["id_not_null"] == (pytest.approx(4 / 5), False)
    assert got["id_unique"] == (pytest.approx(3 / 4), False)  # {1,2,5} of 4 non-null
    assert got["val_range"] == (pytest.approx(3 / 4), False)
    assert got["cat_ok"] == (pytest.approx(4 / 5), False)
    assert got["enough"] == (5.0, True)


def test_thresholds_tolerate_violations(dirty):
    out = check_constraints(
        dirty,
        [{"name": "mostly_in_range", "kind": "in_range", "col": "val",
          "lo": 0, "hi": 100, "threshold": 0.7}],
    )
    assert out.collect()[0].passed


def test_empty_input_conventions(spark):
    empty = spark.createDataFrame([], "id long, cat string, val double")
    out = check_constraints(
        empty,
        [
            {"name": "id_not_null", "kind": "not_null", "col": "id"},
            {"name": "enough", "kind": "min_rows", "lo": 1},
        ],
    )
    got = {r.rule: r.passed for r in out.collect()}
    assert got["id_not_null"] is True   # vacuous 0/0 pass
    assert got["enough"] is False


def test_validation_errors():
    with pytest.raises(ValueError, match="non-empty"):
        check_constraints(None, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_constraints(None, [
            {"name": "x", "kind": "min_rows", "lo": 1},
            {"name": "x", "kind": "min_rows", "lo": 2},
        ])


def test_unknown_kind_rejected(dirty):
    with pytest.raises(ValueError, match="unknown rule kind"):
        check_constraints(dirty, [{"name": "x", "kind": "mystery", "col": "id"}])


def test_single_scan_plan(dirty):
    from data_engineering_nd_datalake_project_4_spark import plans

    out = check_constraints(
        dirty,
        [
            {"name": "id_not_null", "kind": "not_null", "col": "id"},
            {"name": "val_range", "kind": "in_range", "col": "val", "lo": 0, "hi": 100},
            {"name": "enough", "kind": "min_rows", "lo": 1},
        ],
    )
    plan = plans.explain_str(out, "simple")
    # one aggregate pass: a single Scan and no Join in the plan
    assert plan.count("Scan") <= 1, plan
    assert "Join" not in plan, plan


def test_mad_outliers_hand_check(spark):
    """Group A [10,20,30,40,1000]: median 30, MAD 10 -> only 1000 exceeds
    3*MAD. Group B [1,1,1,100]: MAD 0 -> every non-median value flagged
    (the documented MAD=0 caveat). NULL value excluded; NULL group is a
    real group."""
    from data_engineering_nd_datalake_project_4_spark.operators.constraints import mad_outliers

    rows = [("A", i, v) for i, v in enumerate([10.0, 20.0, 30.0, 40.0, 1000.0])]
    rows += [("B", 10 + i, v) for i, v in enumerate([1.0, 1.0, 1.0, 100.0])]
    rows += [("A", 99, None), (None, 50, 5.0), (None, 51, 5.0), (None, 52, 500.0)]
    df = spark.createDataFrame(rows, "seg STRING, cid LONG, bal DOUBLE")
    out = {r["cid"]: r for r in mad_outliers(df, "seg", "cid", "bal", k=3).collect()}
    assert set(out) == {4, 13, 52}
    assert out[4]["grp_median"] == 30.0 and out[4]["grp_mad"] == 10.0
    assert out[13]["grp_mad"] == 0.0
    assert out[52]["seg"] is None and out[52]["grp_mad"] == 0.0


def test_mad_outliers_validation(spark):
    from data_engineering_nd_datalake_project_4_spark.operators.constraints import mad_outliers

    df = spark.createDataFrame([("A", 1, 1.0)], "seg STRING, cid LONG, bal DOUBLE")
    with pytest.raises(ValueError, match="positive"):
        mad_outliers(df, "seg", "cid", "bal", k=0)
