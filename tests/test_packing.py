"""Sequence packing invariants: partition preservation, contiguity,
capacity (first-fit), straddle accounting (greedy), packer agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.catalog import load_table
from data_engineering_nd_datalake_project_4_spark.operators import packing

TARGET = 256
SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_first_fit_respects_capacity(spark, docs):
    """No pack exceeds target unless a single doc alone does."""
    packed = packing.pack_first_fit(docs, "text", "doc_id", TARGET, SHARDS)
    over = (
        packed.groupBy("shard_id", "pack_id")
        .agg(F.sum("n_tok").alias("tot"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("tot") > TARGET) & (F.col("n") > 1))
        .count()
    )
    assert over == 0


def test_first_fit_preserves_every_doc_once(spark, docs):
    packed = packing.pack_first_fit(docs, "text", "doc_id", TARGET, SHARDS)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_first_fit_packs_are_contiguous_id_runs(spark, docs):
    """Within a shard, pack_id must be non-decreasing in doc_id order —
    a doc can never land in an earlier pack than its predecessor."""
    packed = packing.pack_first_fit(docs, "text", "doc_id", TARGET, SHARDS)
    rows = packed.orderBy("shard_id", "doc_id").collect()
    last = {}
    for r in rows:
        prev = last.get(r["shard_id"], -1)
        assert r["pack_id"] >= prev, r
        last[r["shard_id"]] = r["pack_id"]


def test_greedy_contiguous_matches_manual_cumsum(spark, docs):
    """The greedy pack assignment equals a driver-side replay of the
    cumulative-sum rule on the same shard/order."""
    packed = packing.pack_greedy_contiguous(docs, "text", "doc_id", TARGET, SHARDS)
    rows = packed.orderBy("shard_id", "doc_id").collect()
    cum = {}
    for r in rows:
        start = cum.get(r["shard_id"], 0)
        assert r["start_tok"] == start, r
        assert r["pack_id"] == start // TARGET, r
        cum[r["shard_id"]] = start + r["n_tok"]


def test_packers_agree_when_nothing_straddles(spark):
    """On docs whose sizes divide the target exactly, greedy and first-fit
    produce identical assignments (no straddle, no early close)."""
    rows = [(i, " ".join(["w"] * 64)) for i in range(32)]  # 64 tokens each
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    g = packing.pack_greedy_contiguous(df, "text", "doc_id", TARGET, SHARDS)
    f = packing.pack_first_fit(df, "text", "doc_id", TARGET, SHARDS)
    ga = {(r["doc_id"], r["shard_id"], r["pack_id"]) for r in g.collect()}
    fa = {(r["doc_id"], r["shard_id"], r["pack_id"]) for r in f.collect()}
    assert ga == fa


def test_oversized_doc_gets_its_own_pack(spark):
    rows = [
        (0, " ".join(["w"] * 100)),
        (8, " ".join(["w"] * 999)),   # same shard (id % 8 == 0), oversized
        (16, " ".join(["w"] * 100)),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    f = {r["doc_id"]: r["pack_id"] for r in
         packing.pack_first_fit(df, "text", "doc_id", TARGET, SHARDS).collect()}
    assert f[0] == 0 and f[8] == 1 and f[16] == 2


def test_invalid_target_raises(spark, docs):
    with pytest.raises(ValueError):
        packing.pack_greedy_contiguous(docs, "text", "doc_id", 0)
    with pytest.raises(ValueError):
        packing.pack_first_fit(docs, "text", "doc_id", -5)
