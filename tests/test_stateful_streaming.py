"""applyInPandasWithState: running counts accumulate across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.streaming.stateful import running_count_per_key


def test_running_count_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    os.makedirs(src)
    # two single-file batches on disk; maxFilesPerTrigger=1 → two micro-batches
    # in one availableNow run (memory sink cannot recover a checkpoint, so
    # cross-micro-batch state is the testable surface)
    spark.createDataFrame([(1,), (1,), (2,)], "user_id LONG").coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame([(1,)], "user_id LONG").coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema("user_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    out = running_count_per_key(stream.groupBy("user_id"))
    q = (
        out.writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("running_counts").collect()
    emitted = {(r["key"], r["running_n"]) for r in rows}
    # user 1 was emitted at 2 (after its first batch) and 3 (after the second)
    assert (1, 3) in emitted and (2, 1) in emitted, emitted
    latest = {}
    for r in rows:
        latest[r["key"]] = max(latest.get(r["key"], 0), r["running_n"])
    assert latest == {1: 3, 2: 1}


def test_grouped_zscore_pandas_udf(spark, sf_dir):
    from data_engineering_nd_datalake_project_4_spark.catalog import load_table
    from data_engineering_nd_datalake_project_4_spark.functions.udfs import grouped_zscore

    c = load_table(spark, sf_dir, "customer")
    z = grouped_zscore(c, "c_acctbal", ["c_mktsegment"])
    stats = z.groupBy("c_mktsegment").agg(
        F.round(F.avg("zscore"), 6).alias("mu"), F.round(F.stddev_pop("zscore"), 3).alias("sd")
    )
    for r in stats.collect():
        assert abs(r["mu"]) < 1e-6
        assert abs(r["sd"] - 1.0) < 0.01


def test_transform_with_state_running_stats(spark, tmp_path):
    import pytest

    from data_engineering_nd_datalake_project_4_spark.streaming.stateful import (
        HAS_TWS,
        running_stats_per_key,
    )

    if not HAS_TWS:
        pytest.skip("transformWithStateInPandas requires PySpark >= 4.0")
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, 10), (1, 30), (2, 5)], "user_id LONG, value LONG"
    ).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(
        [(1, 20), (2, 50)], "user_id LONG, value LONG"
    ).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema("user_id LONG, value LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    out = running_stats_per_key(stream.groupBy("user_id"))
    q = (
        out.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("running_stats").collect()
    latest = {}
    for r in rows:
        if r["key"] not in latest or r["running_n"] > latest[r["key"]][0]:
            latest[r["key"]] = (r["running_n"], r["running_max"])
    # user 1: 3 events, max 30 (state survives the micro-batch boundary);
    # user 2: 2 events, max 50
    assert latest == {1: (3, 30), 2: (2, 50)}, rows


def test_tws_timer_ttl_idle_eviction(spark, tmp_path):
    """Timer/TTL eviction on transformWithStateInPandas — written under the
    protobuf gate so an environment upgrade measures it immediately (the
    only §2.2-adjacent surface with no executable coverage today). When
    HAS_TWS: key 1 goes idle after batch 1 → its sliding processing-time
    timer fires during a later batch, emitting the final count with
    evicted=1 and CLEARING state, so key 1's post-eviction event restarts
    the count at 1 (not 3)."""
    import time

    import pytest

    from data_engineering_nd_datalake_project_4_spark.streaming.stateful import (
        HAS_TWS,
        idle_evicting_session_counts,
    )

    if not HAS_TWS:
        pytest.skip("transformWithStateInPandas requires protobuf-enabled PySpark >= 4.0")

    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    os.makedirs(src)
    schema = "user_id LONG, value LONG"

    def run_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/{name}")
        spark.catalog.refreshByPath(src)
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        out = idle_evicting_session_counts(stream.groupBy("user_id"), idle_ms=1)
        q = (
            out.writeStream.format("memory")
            .queryName("idle_evict")
            .outputMode("update")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: key 1 twice, key 2 once — all live updates
    run_batch("b1", [(1, 10), (1, 30), (2, 5)])
    # wall-clock idle past the 1ms threshold, then a batch touching ONLY
    # key 2: key 1's timer fires here (processing-time timers are
    # evaluated per micro-batch)
    time.sleep(0.05)
    run_batch("b2", [(2, 7)])
    rows = [r.asDict() for r in spark.table("idle_evict").collect()]
    evictions = [r for r in rows if r["evicted"] == 1 and r["key"] == 1]
    assert evictions and evictions[-1]["n_events"] == 2
    # post-eviction: key 1 returns — count restarts at 1 (state cleared)
    time.sleep(0.05)
    run_batch("b3", [(1, 99)])
    rows = [r.asDict() for r in spark.table("idle_evict").collect()]
    revived = [r for r in rows if r["evicted"] == 0 and r["key"] == 1]
    assert revived[-1]["n_events"] == 1


def test_tws_eviction_processor_overrides_timer_hook():
    """Runs TODAY (no runtime needed): the eviction processor must actually
    override handleExpiredTimer — inheriting the base's empty-iterator
    default would make the timer test green-by-vacuity once HAS_TWS."""
    from data_engineering_nd_datalake_project_4_spark.streaming import stateful

    cls = stateful.IdleSessionEvictionProcessor
    assert "handleExpiredTimer" in cls.__dict__
    assert "handleInputRows" in cls.__dict__
    # and the wrapper arms ProcessingTime mode (timers need it)
    import inspect

    assert 'timeMode="ProcessingTime"' in inspect.getsource(
        stateful.idle_evicting_session_counts
    )
