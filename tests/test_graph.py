"""PageRank (operators.graph): structural properties on toy graphs and a
hand-replicated mass-passing check."""

from __future__ import annotations

import pytest


def _ranks(spark, edges, **kw):
    from data_engineering_nd_datalake_project_4_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_matches_hand_replication(spark):
    # star: 1->3, 2->3, 3->1  (node 3 collects from two sources)
    edges = [(1, 3), (2, 3), (3, 1)]
    got = _ranks(spark, edges, iters=2, damping=0.85)
    n, d = 3, 0.85
    t = (1.0 - d) / n
    r = {1: 1.0 / n, 2: 1.0 / n, 3: 1.0 / n}
    for _ in range(2):
        r = {
            1: t + d * (r[3] / 1),
            2: t,                      # no in-edges
            3: t + d * (r[1] / 1 + r[2] / 1),
        }
    for node in (1, 2, 3):
        assert got[node] == pytest.approx(r[node], abs=1e-12)


def test_sink_collects_more_than_source(spark):
    got = _ranks(spark, [(1, 3), (2, 3), (3, 1)])
    assert got[3] > got[1] > got[2]


def test_duplicate_edges_add_no_mass(spark):
    a = _ranks(spark, [(1, 2), (2, 1)])
    b = _ranks(spark, [(1, 2), (1, 2), (1, 2), (2, 1)])
    assert a == b


def test_total_mass_bounded_by_one(spark):
    # dangling node 4 leaks mass: total < 1, every rank >= teleport
    got = _ranks(spark, [(1, 2), (2, 3), (3, 4)])
    assert sum(got.values()) < 1.0 + 1e-12
    teleport = 0.15 / 4
    assert all(v >= teleport - 1e-15 for v in got.values())


def test_empty_edge_list_returns_empty_frame(spark):
    # used to raise an opaque ZeroDivisionError from the teleport term
    from data_engineering_nd_datalake_project_4_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src long, dst long")
    out = pagerank(df)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_symmetric_cycle_is_uniform(spark):
    got = _ranks(spark, [(1, 2), (2, 3), (3, 1)])
    vals = list(got.values())
    assert max(vals) - min(vals) < 1e-15
    assert sum(vals) == pytest.approx(1.0, abs=1e-12)
