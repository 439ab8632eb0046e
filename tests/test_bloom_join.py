"""Bloom-filter semi-join reduction — operators.joins.bloom_prefilter_join.

The contract: exact equality to the plain join (no false negatives), real
shuffle reduction (the probe-side filter actually rejects most
non-matching keys), bounded driver state, loud refusal of outer types.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.catalog import load_table
from data_engineering_nd_datalake_project_4_spark.operators import joins


def test_equals_plain_inner_join(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    # a sparse build side: ~2% of orders
    orders = load_table(spark, sf_dir, "orders").where("o_orderkey % 50 = 0")
    build = orders.select("o_orderkey").withColumnRenamed("o_orderkey", "l_orderkey")
    plain = lineitem.join(build, "l_orderkey").select("l_orderkey", "l_linenumber")
    bloomed = joins.bloom_prefilter_join(
        lineitem, build, "l_orderkey", num_bits=1 << 14
    ).select("l_orderkey", "l_linenumber")
    assert sorted(map(tuple, bloomed.collect())) == sorted(map(tuple, plain.collect()))


def test_semi_join_variant_and_probe_reduction(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    build = (
        load_table(spark, sf_dir, "orders")
        .where("o_orderkey % 100 = 0")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    semi = joins.bloom_prefilter_join(
        lineitem, build, "l_orderkey", how="left_semi", num_bits=1 << 14
    )
    plain_semi = lineitem.join(build, "l_orderkey", "left_semi")
    assert semi.count() == plain_semi.count()
    # the filter must actually reduce the probe side: with a 16Kbit bloom
    # over ~150 keys, false positives are rare — the filtered probe should
    # be well under 10% of the input (it is ~1% matching + fp)
    words = joins.build_bloom_words(build, "l_orderkey", num_bits=1 << 14)
    kept = lineitem.where(
        joins.bloom_might_contain(words, F.col("l_orderkey"))
    ).count()
    assert kept < lineitem.count() * 0.10, (kept, lineitem.count())


def test_no_false_negatives_every_build_key_probes_true(spark):
    df = spark.range(0, 5000).select((F.col("id") * 7919 + 13).alias("k"))
    words = joins.build_bloom_words(df, "k", num_bits=1 << 16, num_hashes=7)
    misses = df.where(~joins.bloom_might_contain(words, F.col("k"), num_hashes=7))
    assert misses.count() == 0


def test_empty_build_side_filters_everything(spark):
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    empty = probe.where("k < 0")
    out = joins.bloom_prefilter_join(probe, empty, "k", num_bits=1 << 10)
    assert out.count() == 0


def test_bitmap_is_bounded_and_sign_bit_safe(spark):
    # bit 63 of a word must be usable (1L << 63 is the long sign bit)
    df = spark.range(0, 20000).select(F.col("id").alias("k"))
    words = joins.build_bloom_words(df, "k", num_bits=1 << 12)
    assert len(words) == (1 << 12) // 64
    assert any(w < 0 for w in words), "sign bit never set across 20k keys x 5 hashes"
    assert df.where(~joins.bloom_might_contain(words, F.col("k"))).count() == 0


def test_outer_join_refused_and_validation(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="match-only"):
        joins.bloom_prefilter_join(df, df, "k", how="left")
    with pytest.raises(ValueError, match="num_bits"):
        joins.build_bloom_words(df, "k", num_bits=100)
    with pytest.raises(ValueError, match="num_hashes"):
        joins.build_bloom_words(df, "k", num_hashes=0)
