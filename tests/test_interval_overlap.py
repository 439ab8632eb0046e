"""Pure interval-overlap join — operators.joins.interval_overlap_join.

The canonical-cell emission must produce each overlapping pair EXACTLY
once regardless of how many grid cells the pair shares — the hypothesis
test checks pair-set AND multiplicity against brute force.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_nd_datalake_project_4_spark.operators.joins import interval_overlap_join


def _sides(spark, lrows, rrows):
    l = spark.createDataFrame(lrows, "id_a long, a_s long, a_e long")
    r = spark.createDataFrame(rrows, "id_b long, b_s long, b_e long")
    return l, r


def _join(spark, lrows, rrows, w):
    l, r = _sides(spark, lrows, rrows)
    out = interval_overlap_join(l, r, "a_s", "a_e", "b_s", "b_e", bin_width=w)
    return sorted((row["id_a"], row["id_b"]) for row in out.collect())


def test_touching_nested_disjoint_and_multicell(spark):
    lrows = [(1, 0, 10), (2, 100, 200), (3, 50, 51)]
    rrows = [
        (10, 10, 20),   # touches interval 1 at a single point (closed)
        (20, 120, 130), # nested inside interval 2
        (30, 300, 310), # disjoint from everything
        (40, 0, 999),   # spans EVERY cell — must pair once with each left
    ]
    got = _join(spark, lrows, rrows, w=7)
    assert got == [(1, 10), (1, 40), (2, 20), (2, 40), (3, 40)]


def test_validation_and_column_clash(spark):
    l, r = _sides(spark, [(1, 0, 1)], [(2, 0, 1)])
    with pytest.raises(ValueError, match="bin_width"):
        interval_overlap_join(l, r, "a_s", "a_e", "b_s", "b_e", bin_width=0)
    with pytest.raises(ValueError, match="inner"):
        interval_overlap_join(l, r, "a_s", "a_e", "b_s", "b_e", 7, how="left")
    clash = l.withColumnRenamed("id_a", "id_b")
    with pytest.raises(ValueError, match="share column names"):
        interval_overlap_join(clash, r, "a_s", "a_e", "b_s", "b_e", 7)


INTERVALS = st.lists(
    st.tuples(st.integers(0, 60), st.integers(0, 15)), min_size=1, max_size=10
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(INTERVALS, INTERVALS, st.integers(1, 12))
def test_matches_brute_force_with_exact_multiplicity(lint, rint, w):
    from data_engineering_nd_datalake_project_4_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    lrows = [(i, s, s + d) for i, (s, d) in enumerate(lint)]
    rrows = [(i, s, s + d) for i, (s, d) in enumerate(rint)]
    want = sorted(
        (la, rb)
        for la, ls, le in lrows
        for rb, rs, re in rrows
        if ls <= re and rs <= le
    )
    got = _join(spark, lrows, rrows, w)
    assert got == want  # sorted WITH duplicates: multiplicity must be 1
