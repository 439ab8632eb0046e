"""SymSpell fuzzy string self-join — operators.dedup.fuzzy_string_pairs.

The completeness claim (deletion-neighborhood candidates = brute-force
pairs at distance <= 1) is the whole point — the hypothesis test checks it
against a python DP levenshtein on random corpora.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_nd_datalake_project_4_spark.operators.dedup import fuzzy_string_pairs


def _df(spark, names):
    return spark.createDataFrame(list(enumerate(names)), "id long, name string")


def _pairs(spark, names):
    out = fuzzy_string_pairs(_df(spark, names), "name", "id")
    return {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}


def test_each_edit_kind_found_and_distance_two_excluded(spark):
    names = [
        "warehouse-42",   # 0
        "warehouse-43",   # 1: substitution -> dist 1
        "warehouse-421",  # 2: insertion   -> dist 1
        "warehouse-4",    # 3: deletion    -> dist 1
        "warehouse-42",   # 4: identical   -> dist 0
        "storehouse-99",  # 5: far away
        "warehouse-539",  # 6: dist 2 from #0 -> excluded
    ]
    got = _pairs(spark, names)
    assert got[(0, 1)] == 1 and got[(0, 2)] == 1 and got[(0, 3)] == 1
    assert got[(0, 4)] == 0
    assert not any(5 in p for p in got)
    assert (0, 6) not in got


def test_null_and_empty_strings(spark):
    got = _pairs(spark, [None, "", "a", "ab", None])
    # "" vs "a" is one insertion; "a" vs "ab" too; "" vs "ab" is 2
    assert got == {(1, 2): 1, (2, 3): 1}


def test_max_dist_other_than_one_refused(spark):
    with pytest.raises(ValueError, match="max_dist=1"):
        fuzzy_string_pairs(_df(spark, ["a"]), "name", "id", max_dist=2)


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.text(alphabet="ab", min_size=0, max_size=6), min_size=2, max_size=10)
)
def test_matches_brute_force_levenshtein(names):
    from data_engineering_nd_datalake_project_4_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    want = {
        (i, j): _lev(a, b)
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if i < j and _lev(a, b) <= 1
    }
    assert _pairs(spark, names) == want
