"""GROUPS-frame rewrite semantics: whole peer groups in/out of the frame,
PRECEDING and FOLLOWING, single shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark import plans
from data_engineering_nd_datalake_project_4_spark.operators.windows import groups_between


def _framed(spark, preceding, following=0):
    # k=1: values 10,10,20,30,30 → peer groups [10,10],[20],[30,30]
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20), (1, 30), (1, 30), (2, 5)], "k INT, v INT"
    )
    out = groups_between(
        df,
        {"s": F.sum("v"), "n": F.count(F.lit(1))},
        ["k"],
        [F.col("v")],
        preceding=preceding,
        following=following,
    )
    return sorted(map(tuple, out.select("k", "v", "s", "n").collect()))


def test_groups_one_preceding(spark):
    # frame = previous peer group + current peer group, whole groups only
    assert _framed(spark, preceding=1) == [
        (1, 10, 20, 2),  # both 10s: frame [10,10]
        (1, 10, 20, 2),
        (1, 20, 40, 3),  # frame [10,10,20]
        (1, 30, 80, 3),  # both 30s: frame [20,30,30]
        (1, 30, 80, 3),
        (2, 5, 5, 1),
    ]


def test_groups_preceding_and_following(spark):
    assert _framed(spark, preceding=0, following=1) == [
        (1, 10, 40, 3),  # frame [10,10,20]
        (1, 10, 40, 3),
        (1, 20, 80, 3),  # frame [20,30,30]
        (1, 30, 60, 2),  # frame [30,30]
        (1, 30, 60, 2),
        (2, 5, 5, 1),
    ]


def test_groups_single_shuffle(spark):
    df = spark.createDataFrame([(1, 10), (1, 20)], "k INT, v INT")
    out = groups_between(df, {"s": F.sum("v")}, ["k"], [F.col("v")], 1)
    # dense_rank pass and frame pass share the partitioning: one exchange
    assert plans.explain_str(out, "simple").count("Exchange hashpartitioning") == 1
