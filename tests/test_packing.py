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


def test_budget_subsample_respects_stratum_budgets(spark, docs):
    picked = packing.token_budget_subsample(
        docs, "text", "doc_id", budget_tokens=10_000,
        order_by=[F.desc("n_chars"), F.asc("doc_id")], by="source",
    )
    # per-stratum token totals never exceed the proportional budget
    t = docs.withColumn("n_tok", F.size(F.split("text", " ")))
    mass = {r["source"]: r["s"] for r in
            t.groupBy("source").agg(F.sum("n_tok").alias("s")).collect()}
    total = sum(mass.values())
    used = {r["source"]: r["u"] for r in
            picked.groupBy("source").agg(F.sum("n_tok").alias("u")).collect()}
    for src, u in used.items():
        assert u <= (10_000 * mass[src]) // total + 1  # floor boundary
    assert sum(used.values()) <= 10_000


def test_budget_subsample_is_order_prefix(spark, docs):
    """The selection must be a PREFIX of the declared quality order within
    each stratum — no cherry-picking around a too-big document."""
    picked = packing.token_budget_subsample(
        docs, "text", "doc_id", budget_tokens=10_000,
        order_by=[F.desc("n_chars"), F.asc("doc_id")], by="source",
    )
    chosen = {r["doc_id"] for r in picked.collect()}
    rows = docs.select("doc_id", "source", "n_chars").collect()
    by_src = {}
    for r in sorted(rows, key=lambda r: (-r["n_chars"], r["doc_id"])):
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    for src, ordered in by_src.items():
        flags = [d in chosen for d in ordered]
        # once a doc is excluded, everything after it in the order is too
        assert flags == sorted(flags, reverse=True), (src, flags[:10])


def test_budget_subsample_global(spark):
    rows = [(i, " ".join(["w"] * 10)) for i in range(10)]  # 10 tokens each
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    picked = packing.token_budget_subsample(
        df, "text", "doc_id", budget_tokens=35,
        order_by=[F.asc("doc_id")],
    )
    assert sorted(r["doc_id"] for r in picked.collect()) == [0, 1, 2]


def test_budget_subsample_invalid_budget(spark, docs):
    with pytest.raises(ValueError):
        packing.token_budget_subsample(
            docs, "text", "doc_id", 0, order_by=[F.asc("doc_id")]
        )


def test_epoch_shuffle_deterministic_and_shard_partitioned(spark, docs):
    a = packing.epoch_shuffle(docs, "doc_id", seed=42, epoch=1).select(
        "doc_id", "shuffle_key", "shard_id", "pos"
    )
    b = packing.epoch_shuffle(docs, "doc_id", seed=42, epoch=1).select(
        "doc_id", "shuffle_key", "shard_id", "pos"
    )
    rows_a = sorted(map(tuple, a.collect()))
    assert rows_a == sorted(map(tuple, b.collect()))  # replay-identical
    # every doc exactly once, keys in [0, 2^31)
    ids = [r[0] for r in rows_a]
    assert ids == sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert all(0 <= r[1] < packing.SHUFFLE_MOD for r in rows_a)
    # pos is a contiguous 1..n ranking within each shard, ordered by key
    by_shard = {}
    for doc_id, key, shard, pos in rows_a:
        by_shard.setdefault(shard, []).append((pos, key, doc_id))
    for shard, entries in by_shard.items():
        entries.sort()
        assert [p for p, _, _ in entries] == list(range(1, len(entries) + 1))
        assert [(k, i) for _, k, i in entries] == sorted((k, i) for _, k, i in entries)
    # a different epoch must produce a different order (same doc set)
    c = packing.epoch_shuffle(docs, "doc_id", seed=42, epoch=2)
    order_1 = [r["doc_id"] for r in a.orderBy("shard_id", "pos").collect()]
    order_2 = [r["doc_id"] for r in c.orderBy("shard_id", "pos").collect()]
    assert sorted(order_1) == sorted(order_2)
    assert order_1 != order_2


def test_epoch_sample_rate_determinism_and_decorrelation(spark, docs):
    n = docs.count()
    s1 = packing.epoch_sample(docs, "doc_id", seed=7, epoch=0, fraction=0.25)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids1_again = {r["doc_id"] for r in
                  packing.epoch_sample(docs, "doc_id", seed=7, epoch=0, fraction=0.25)
                  .select("doc_id").collect()}
    assert ids1 == ids1_again  # deterministic
    assert 0.1 * n < len(ids1) < 0.4 * n  # near the 25% rate
    ids2 = {r["doc_id"] for r in
            packing.epoch_sample(docs, "doc_id", seed=7, epoch=1, fraction=0.25)
            .select("doc_id").collect()}
    assert ids1 != ids2  # epochs decorrelate
    # boundary fractions: 1.0 keeps everything, 0.0 nothing
    assert packing.epoch_sample(docs, "doc_id", seed=7, fraction=1.0).count() == n
    assert packing.epoch_sample(docs, "doc_id", seed=7, fraction=0.0).count() == 0
    with pytest.raises(ValueError, match="fraction"):
        packing.epoch_sample(docs, "doc_id", seed=7, fraction=1.5)


class TestTrainValTestSplit:
    def test_partition_is_disjoint_and_exhaustive(self, spark, sf_dir):
        from data_engineering_nd_datalake_project_4_spark.catalog import load_table
        from data_engineering_nd_datalake_project_4_spark.operators.packing import train_val_test_split

        d = load_table(spark, sf_dir, "documents")
        out = train_val_test_split(d, "doc_id")
        assert out.count() == d.count()  # every row labeled exactly once
        by = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(by) <= {"train", "val", "test"}
        n = d.count()
        # 80/10/10 within loose hash-binomial tolerance
        assert abs(by.get("train", 0) / n - 0.8) < 0.1

    def test_append_stability(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.packing import train_val_test_split

        small = spark.range(100).withColumnRenamed("id", "doc_id")
        grown = spark.range(200).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in train_val_test_split(small, "doc_id").collect()}
        b = {r.doc_id: r.split for r in train_val_test_split(grown, "doc_id").collect()}
        # appending rows never moves a previously-assigned row (no val->train leak)
        assert all(b[k] == v for k, v in a.items())

    def test_seed_changes_assignment(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.packing import train_val_test_split

        d = spark.range(500).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: r.split for r in train_val_test_split(d, "doc_id", seed=0).collect()}
        b = {r.doc_id: r.split for r in train_val_test_split(d, "doc_id", seed=1).collect()}
        assert a != b

    def test_fraction_validation(self, spark):
        import pytest as _pytest

        from data_engineering_nd_datalake_project_4_spark.operators.packing import train_val_test_split

        d = spark.range(10).withColumnRenamed("id", "doc_id")
        with _pytest.raises(ValueError, match="sum to 1"):
            train_val_test_split(d, "doc_id", (0.5, 0.2, 0.2))
        with _pytest.raises(ValueError, match="non-negative"):
            train_val_test_split(d, "doc_id", (1.2, -0.1, -0.1))


def test_greedy_contiguous_rows_semantics_under_duplicate_ids(spark):
    """The duprows trap, pinned at unit level: with exact duplicate rows
    the ROWS-pinned cumsum must admit copies ONE AT A TIME — each copy
    occupies its own token span — never all order-key peers at once
    (Spark's default RANGE frame). The output multiset equals a
    driver-side ROWS replay regardless of which copy got which span."""
    rows = [(0, "a b c"), (0, "a b c"), (8, "d e f g"), (16, "h i")] * 2
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packed = packing.pack_greedy_contiguous(df, "text", "doc_id", 5, 1)
    got = sorted((r["doc_id"], r["start_tok"], r["n_tok"], r["pack_id"])
                 for r in packed.collect())
    # driver replay: same id order, ROWS semantics (one row per instance)
    inst = sorted(rows)
    cum, want = 0, []
    for doc_id, text in inst:
        n = len(text.split(" "))
        want.append((doc_id, cum, n, cum // 5))
        cum += n
    assert got == sorted(want)


def test_budget_subsample_rows_semantics_under_duplicate_ids(spark):
    """Same pin for the token budget: under RANGE the duplicated head doc
    would be admitted as a 2-copy block (both or neither); under ROWS
    exactly as many copies fit as the budget allows."""
    rows = [(1, "a b c d"), (1, "a b c d"), (2, "e f g h")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = packing.token_budget_subsample(
        df, "text", "doc_id", budget_tokens=6, order_by=[F.asc("doc_id")]
    ).collect()
    # ROWS: first copy of doc 1 (cum 4) fits, second (cum 8) exceeds 6
    assert [(r["doc_id"], r["cum_tok"]) for r in out] == [(1, 4)]
