"""asof_join direction/tolerance vs pandas.merge_asof (the semantics it
mirrors) on randomized numeric series, plus timestamp-tolerance units."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators.joins import asof_join


def _frames(spark, seed=0, n_left=60, n_right=40):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 3, n_left),
        "lts": rng.integers(0, 500, n_left).astype("int64"),
        "lid": np.arange(n_left),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 3, n_right),
        "rts": rng.integers(0, 500, n_right).astype("int64"),
        "val": rng.integers(0, 1000, n_right).astype("int64"),
    })
    # merge_asof requires unique match candidates per (k, ts) for a
    # deterministic tie-free model; dedupe right on (k, rts)
    right = right.drop_duplicates(["k", "rts"]).reset_index(drop=True)
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    return left, right, sl, sr


@pytest.mark.parametrize("direction,tolerance", [
    ("backward", None), ("forward", None),
    ("backward", 50), ("forward", 50), ("forward", 0),
])
def test_matches_pandas_merge_asof(spark, direction, tolerance):
    left, right, sl, sr = _frames(spark)
    got = asof_join(
        sl, sr, "k", "lts", "rts", ["val"],
        direction=direction, tolerance=tolerance,
    ).collect()
    expect = pd.merge_asof(
        left.sort_values("lts"), right.sort_values("rts"),
        left_on="lts", right_on="rts", by="k",
        direction=direction,
        tolerance=None if tolerance is None else tolerance,
        allow_exact_matches=True,
    ).set_index("lid")["val"]
    for r in got:
        e = expect.loc[r.lid]
        if pd.isna(e):
            assert r.val is None, (r.lid, r.val, e)
        else:
            assert r.val == int(e), (r.lid, r.val, e)


def test_timestamp_tolerance_in_seconds(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")],
        "k long, lt string",
    ).select("k", F.col("lt").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 7)], "k long, rt string, val long"
    ).select("k", F.col("rt").cast("timestamp").alias("rts"), "val")
    # 30-minute gap: tolerance 1800s matches the 10:00 row only
    out = {
        r.lts.hour: r.val
        for r in asof_join(
            left, right, "k", "lts", "rts", ["val"], tolerance=1800.0
        ).collect()
    }
    assert out == {10: 7, 12: None}


@pytest.mark.parametrize("direction,tolerance", [
    ("backward", None), ("forward", None),
    ("backward", 50), ("forward", 50),
])
def test_null_left_ts_never_matches(spark, direction, tolerance):
    # pandas merge_asof / DuckDB ASOF both yield NO match for a NULL left
    # ts. The forward no-tolerance case used to match the earliest right
    # row (NULLS FIRST put the row ahead of every right row in the
    # following-frame fill).
    left = spark.createDataFrame(
        [(1, None, 0), (1, 100, 1)], "k long, lts long, lid long"
    )
    right = spark.createDataFrame(
        [(1, 50, 7), (1, 150, 9)], "k long, rts long, val long"
    )
    out = {
        r.lid: r.val
        for r in asof_join(
            left, right, "k", "lts", "rts", ["val"],
            direction=direction, tolerance=tolerance,
        ).collect()
    }
    assert out[0] is None, (direction, tolerance, out)
    assert out[1] == (7 if direction == "backward" else 9)


def test_direction_validation(spark):
    left, right, sl, sr = _frames(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(sl, sr, "k", "lts", "rts", ["val"], direction="nearest")
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(sl, sr, "k", "lts", "rts", ["val"], tolerance=-1)
