"""Measured shuffle volume (plans.observed_shuffle_bytes): the plan
audits pin what exchanges CARRY; this pins how much they MOVED. The lane
invariant under test — shuffle bytes grow no faster than input rows —
is the number that separates "shuffles keys" from "shuffles the dataset"
at 100 TB (tools/bench_scale.py --bytes annotates the sf0.1→sf1.0 lane
with the same measurement)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark import plans
from data_engineering_nd_datalake_project_4_spark.catalog import load_table
from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY

SF_SMALL = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.01"  # 10x fact rows (lineitem/orders/events)
# documents/embeddings only grow at sf0.1 (500 rows at both sf0.001 and
# sf0.01) — corpus-table growth tests must step to here
SF_DOCS_BIG = "/root/testdata/sf0.1"


def _bytes(spark, name, sf):
    return plans.observed_shuffle_bytes(REGISTRY[name].spark_fn(spark, sf))


def test_shuffle_bytes_growth_within_row_growth(spark):
    """The three representative lane queries (VERDICT r9 task 3): a
    snowflake join+agg (q08 — exchange carries nation-bounded aggregates),
    semantic dedup (q142 — 16-byte band keys, vectors rejoin once per
    side), and grouped heavy hitters (q167 — CMS-cell-bounded state).
    Each steps across the scale pair where ITS input table actually grows
    (documents/embeddings are flat until sf0.1). Invariant: shuffle bytes
    grow <= 1.3 * input-row growth — and these three are chosen to be
    state/key-bounded, so the observed growth should sit well UNDER the
    budget (the 100 TB design claim made measurable; a corpus-carrying
    regression would blow straight through it)."""
    for name, small_sf, big_sf, input_growth in (
        ("q08", SF_SMALL, SF_BIG, 10.0),  # lineitem 6k -> 60k
        ("q142_semantic_dedup", SF_BIG, SF_DOCS_BIG, 4.0),  # emb 500 -> 2k
        ("q167_grouped_heavy_hitters", SF_BIG, SF_DOCS_BIG, 10.0),  # docs 500 -> 5k
    ):
        small = _bytes(spark, name, small_sf)
        big = _bytes(spark, name, big_sf)
        growth = big["written"] / max(small["written"], 1)
        rec_growth = big["records"] / max(small["records"], 1)
        # volume budget: keyed shuffle bytes may track input rows or the
        # operator's own record fan-out (q142's LSH candidate-pair set
        # grows with band collision density — 16-byte id pairs, ~7
        # B/record compressed), never more. RoundRobin compute-spreads
        # are excluded by the measurement itself (self-disabling at
        # scale — ensure_map_parallelism).
        assert growth <= 1.3 * max(input_growth, rec_growth), (
            f"{name}: shuffle bytes grew {growth:.1f}x on "
            f"{input_growth:.0f}x rows / {rec_growth:.1f}x records "
            f"({small['written']} -> {big['written']})"
        )
        # payload-width gate, PER matched exchange: a shuffled row must
        # not get WIDER with scale (text/vector sneaking into a payload
        # would widen its exchange ~100x; aggregate width would hide it
        # behind mix shift between exchanges)
        assert len(small["per_exchange"]) == len(big["per_exchange"]), name
        for es, eb in zip(small["per_exchange"], big["per_exchange"]):
            ws = es["written"] / max(es["records"], 1)
            wb = eb["written"] / max(eb["records"], 1)
            assert wb <= 1.3 * max(ws, 32.0), (
                f"{name}: exchange payload widened {ws:.1f} -> {wb:.1f} "
                f"B/record ({es} -> {eb})"
            )


def test_observed_shuffle_bytes_detects_corpus_moving(spark):
    """Red case: the measurement is not flat by construction. A plan that
    keys a shuffle on doc_id while CARRYING text moves the corpus — its
    bytes must track the 10x input step (this is exactly the regression
    the lane annotation exists to catch), and must dwarf the hashed
    equivalent's bytes at the same scale."""
    def bad(sf):
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        return docs.repartition(8, "doc_id")

    def good(sf):
        docs = load_table(spark, sf, "documents").select(
            "doc_id", F.xxhash64("text").alias("h")
        )
        return docs.repartition(8, "doc_id")

    small = plans.observed_shuffle_bytes(bad(SF_SMALL))
    big = plans.observed_shuffle_bytes(bad(SF_DOCS_BIG))
    growth = big["written"] / max(small["written"], 1)
    assert growth > 5.0, f"corpus-moving shuffle only grew {growth:.1f}x"

    hashed = plans.observed_shuffle_bytes(good(SF_DOCS_BIG))
    assert hashed["written"] < big["written"] / 3


def test_observed_shuffle_bytes_zero_for_scan_only_plan(spark):
    docs = load_table(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 10)
    b = plans.observed_shuffle_bytes(docs)
    assert (b["written"], b["read"], b["records"], b["exchanges"]) == (0, 0, 0, 0)
    assert b["per_exchange"] == [] and b["roundrobin_written"] == 0


def test_observed_shuffle_bytes_roundrobin_totaled_separately(spark):
    """ensure_map_parallelism's compute spread must not pollute the keyed
    totals (it self-disables at scale); its volume is still visible."""
    from data_engineering_nd_datalake_project_4_spark.operators import ensure_map_parallelism

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    spread = ensure_map_parallelism(docs).select(
        "doc_id", F.length("text").alias("n")
    )
    b = plans.observed_shuffle_bytes(spread)
    assert b["exchanges"] == 0 and b["written"] == 0
    assert b["roundrobin_written"] > 0
