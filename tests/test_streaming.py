"""Structured Streaming surface tests (SURVEY.md §2.2 J):
- Q31 batch-equivalence: the same tumbling-window transform over a file
  stream (availableNow) must equal the batch result.
- session windows over a stream.
- watermark late-data drop with a crafted two-file replay.
- stateful streaming dedup.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.catalog import load_table
from data_engineering_nd_datalake_project_4_spark.functions import DEC18_2, dec
from data_engineering_nd_datalake_project_4_spark.streaming import (
    read_file_stream,
    run_available_now,
    session_agg,
    stream_dedup,
    stream_static_join,
    stream_stream_interval_join,
    sliding_agg,
    tumbling_agg,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """events re-materialized as µs-timestamp parquet in a streaming source
    dir (the raw testdata file is ns, which the batch path converts; a
    stream source needs a consistent schema on disk)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(d)
    return d


def _tumble(df):
    agg = tumbling_agg(
        df,
        "ts",
        "1 day",
        ["event_type"],
        [F.count(F.lit(1)).alias("cnt"), F.sum(dec("value")).cast(DEC18_2).alias("sum_value")],
    )
    return agg.select(
        F.col("window.start").alias("window_start"), "event_type", "cnt", "sum_value"
    )


def test_q31_stream_batch_equivalence(spark, sf_dir, events_stream_dir):
    batch = _tumble(load_table(spark, sf_dir, "events"))
    schema = spark.read.parquet(events_stream_dir).schema
    stream = read_file_stream(spark, events_stream_dir, schema, "parquet")
    streamed = run_available_now(_tumble(stream), "q31_stream")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in streamed.collect()}
    assert b == s


def test_session_window_stream(spark, sf_dir, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = read_file_stream(spark, events_stream_dir, schema, "parquet")
    agg = session_agg(stream, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")])
    out = run_available_now(
        agg.select("user_id", F.col("session.start").alias("session_start"), "n"),
        "sessions_stream",
    )
    batch = session_agg(
        load_table(spark, sf_dir, "events"), "ts", "30 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("n")],
    ).select("user_id", F.col("session.start").alias("session_start"), "n")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in batch.collect()}


def test_watermark_drops_late_data(spark, tmp_path_factory):
    """Two micro-batches: batch 1 advances the watermark far past a late
    event delivered in batch 2 → append-mode output must NOT contain the
    late event's window."""
    src = str(tmp_path_factory.mktemp("late_src"))
    sink = str(tmp_path_factory.mktemp("late_sink"))
    chk = str(tmp_path_factory.mktemp("late_chk"))

    rows1 = [(1, "2024-01-01 00:05:00"), (2, "2024-01-10 00:00:00")]
    rows2 = [(3, "2024-01-01 00:10:00")]  # 9 days late vs max seen ts
    df1 = spark.createDataFrame(rows1, "id INT, ts STRING").select(
        "id", F.to_timestamp("ts").alias("ts")
    )
    df2 = spark.createDataFrame(rows2, "id INT, ts STRING").select(
        "id", F.to_timestamp("ts").alias("ts")
    )
    # exactly ONE file per batch: multiple part-files would become separate
    # micro-batches in nondeterministic order, and the Jan-10 file processing
    # first would (correctly) drop the Jan-1 event as late in run 1 already
    df1.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))

    schema = "id INT, ts TIMESTAMP"

    def run_once(qname):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .queryName(qname)
            .start()
        )
        q.awaitTermination()

    run_once("wm1")
    df2.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b2"))
    run_once("wm2")

    out = spark.read.parquet(sink)
    jan1 = out.filter(F.col("ws") == F.lit("2024-01-01").cast("timestamp")).collect()
    # the Jan-1 window closed when the watermark advanced to Jan-10 in run 1;
    # the late Jan-1 event from batch 2 must not reopen it
    assert len(jan1) == 1 and jan1[0]["n"] == 1, out.collect()


def test_stream_dedup_with_watermark(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("dedup_src"))
    rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:30"), (2, "2024-01-01 00:01:00")]
    spark.createDataFrame(rows, "id INT, ts STRING").select(
        "id", F.to_timestamp("ts").alias("ts")
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("id INT, ts TIMESTAMP").parquet(src)
    deduped = stream_dedup(stream, ["id"], "ts", "10 minutes")
    out = run_available_now(deduped.select("id"), "dedup_stream", output_mode="append")
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_foreach_batch_sink(spark, tmp_path_factory):
    """foreachBatch delivers each micro-batch exactly once with its id; the
    collected union equals the source."""
    from data_engineering_nd_datalake_project_4_spark.streaming import run_foreach_batch

    src = str(tmp_path_factory.mktemp("fb_src"))
    out = str(tmp_path_factory.mktemp("fb_out"))
    chk = str(tmp_path_factory.mktemp("fb_chk"))
    spark.createDataFrame([(1,), (2,)], "id INT").coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame([(3,)], "id INT").coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema("id INT").option("maxFilesPerTrigger", "1").parquet(src + "/*")
    )

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out)

    run_foreach_batch(stream, sink, chk)
    got = spark.read.parquet(out)
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3]
    assert got.select("batch_id").distinct().count() == 2


def test_stream_static_join(spark, sf_dir, events_stream_dir):
    """Stream enriched by a static dimension (the everyday pattern: fact
    stream ⋈ broadcast dim)."""
    schema = spark.read.parquet(events_stream_dir).schema
    stream = read_file_stream(spark, events_stream_dir, schema, "parquet")
    dim = spark.createDataFrame(
        [(i, f"user_{i}") for i in range(100)], "user_id LONG, user_name STRING"
    )
    joined = stream_static_join(stream, dim, "user_id").groupBy("user_name").count()
    out = run_available_now(joined, "ss_join")
    assert out.count() > 0
    batch = (
        load_table(spark, sf_dir, "events").join(dim, "user_id").groupBy("user_name").count()
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in batch.collect()}


def test_stream_stream_join_time_bounded(spark, tmp_path_factory):
    """Stream-stream inner join with watermarks + a time-range condition —
    the bounded-state two-stream correlation pattern (impressions ⋈ clicks
    within 10 minutes)."""
    imp_dir = str(tmp_path_factory.mktemp("impressions"))
    clk_dir = str(tmp_path_factory.mktemp("clicks"))
    imps = [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 01:00:00"), (3, "2024-01-01 02:00:00")]
    clks = [(1, "2024-01-01 00:05:00"),  # within 10 min -> joins
            (2, "2024-01-01 01:30:00")]  # 30 min late -> no join
    spark.createDataFrame(imps, "ad_id INT, ts STRING").select(
        "ad_id", F.to_timestamp("ts").alias("imp_ts")
    ).coalesce(1).write.parquet(imp_dir + "/b")
    spark.createDataFrame(clks, "ad_id INT, ts STRING").select(
        "ad_id", F.to_timestamp("ts").alias("clk_ts")
    ).coalesce(1).write.parquet(clk_dir + "/b")

    imp_s = spark.readStream.schema("ad_id INT, imp_ts TIMESTAMP").parquet(imp_dir + "/*")
    clk_s = spark.readStream.schema("ad_id INT, clk_ts TIMESTAMP").parquet(clk_dir + "/*")
    joined = stream_stream_interval_join(
        imp_s, clk_s, "ad_id", "imp_ts", "clk_ts",
        lower="0 seconds", upper="10 minutes", watermark="1 hour",
    ).select(imp_s["ad_id"].alias("ad_id"), "imp_ts", "clk_ts")
    out = run_available_now(joined, "ss2_join", output_mode="append")
    rows = out.collect()
    assert [r["ad_id"] for r in rows] == [1], rows


def test_stream_stream_join_matches_across_microbatches(spark, tmp_path_factory):
    """The property that makes a stream-stream join STATEFUL: the left row
    arrives in micro-batch 1, its match in micro-batch 2 — the join must
    still emit the pair from buffered state (a naive per-batch join would
    emit nothing). maxFilesPerTrigger=1 forces the two files into separate
    micro-batches."""
    imp_dir = str(tmp_path_factory.mktemp("imp_mb"))
    clk_dir = str(tmp_path_factory.mktemp("clk_mb"))
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "ad_id INT, ts STRING"
    ).select("ad_id", F.to_timestamp("ts").alias("imp_ts")).coalesce(1).write.parquet(
        imp_dir + "/b1"
    )
    # clicks: one early file so the source has data in batch 1, and the
    # matching click in a SECOND file (second micro-batch)
    spark.createDataFrame(
        [(99, "2024-01-01 00:00:30")], "ad_id INT, ts STRING"
    ).select("ad_id", F.to_timestamp("ts").alias("clk_ts")).coalesce(1).write.parquet(
        clk_dir + "/b1"
    )
    spark.createDataFrame(
        [(1, "2024-01-01 00:04:00")], "ad_id INT, ts STRING"
    ).select("ad_id", F.to_timestamp("ts").alias("clk_ts")).coalesce(1).write.parquet(
        clk_dir + "/b2"
    )
    imp_s = spark.readStream.schema("ad_id INT, imp_ts TIMESTAMP").parquet(imp_dir + "/*")
    clk_s = (
        spark.readStream.schema("ad_id INT, clk_ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(clk_dir + "/*")
    )
    joined = stream_stream_interval_join(
        imp_s, clk_s, "ad_id", "imp_ts", "clk_ts",
        lower="0 seconds", upper="10 minutes", watermark="1 hour",
    ).select(imp_s["ad_id"].alias("ad_id"), "imp_ts", "clk_ts")
    out = run_available_now(joined, "ss_mb_join", output_mode="append")
    rows = out.collect()
    assert [(r["ad_id"], str(r["clk_ts"])) for r in rows] == [
        (1, "2024-01-01 00:04:00")
    ], rows


def test_stream_stream_left_outer_null_completion(spark, tmp_path_factory):
    """LEFT OUTER stream-stream interval join: an unmatched left row is
    emitted with a NULL right side ONLY after the watermark passes the end
    of its join window (left_ts + upper) — never eagerly at the end of its
    own micro-batch (a match could still arrive). Two checkpointed
    availableNow phases prove both directions:

    - phase A: left imp@00:00 (never matched) + right clicks up to 02:00.
      The 02:00 event only RAISES the watermark after its batch; no later
      batch runs, so state is not yet evicted -> NO output rows.
    - phase B: late files on BOTH sides (the GLOBAL watermark is the MIN
      across watermarked inputs — a silent left source pins it at epoch
      forever, the first thing this test caught) raise the watermark past
      01:50, and the following batch evicts ad 1's state and emits exactly
      (1, imp_ts, NULL). Matched pairs for ad 2 flow normally.
    Finally the closed-window rows equal the batch left join's.
    """
    imp_dir = str(tmp_path_factory.mktemp("imp_lo"))
    clk_dir = str(tmp_path_factory.mktemp("clk_lo"))
    out_dir = str(tmp_path_factory.mktemp("out_lo")) + "/rows"
    ckpt = str(tmp_path_factory.mktemp("ckpt_lo"))

    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:01:00")],
        "ad_id INT, ts STRING",
    ).select("ad_id", F.to_timestamp("ts").alias("imp_ts")).coalesce(1).write.parquet(
        imp_dir + "/b1"
    )
    # b1: the match for ad 2; b2: a far-future click that advances the
    # watermark past ad 1's window end once ITS batch completes
    spark.createDataFrame(
        [(2, "2024-01-01 00:05:00")], "ad_id INT, ts STRING"
    ).select("ad_id", F.to_timestamp("ts").alias("clk_ts")).coalesce(1).write.parquet(
        clk_dir + "/b1"
    )
    spark.createDataFrame(
        [(98, "2024-01-01 02:00:00")], "ad_id INT, ts STRING"
    ).select("ad_id", F.to_timestamp("ts").alias("clk_ts")).coalesce(1).write.parquet(
        clk_dir + "/b2"
    )

    def _joined():
        imp_s = spark.readStream.schema("ad_id INT, imp_ts TIMESTAMP").parquet(
            imp_dir + "/*"
        )
        clk_s = (
            spark.readStream.schema("ad_id INT, clk_ts TIMESTAMP")
            .option("maxFilesPerTrigger", "1")
            .parquet(clk_dir + "/*")
        )
        return stream_stream_interval_join(
            imp_s, clk_s, "ad_id", "imp_ts", "clk_ts",
            lower="0 seconds", upper="10 minutes", watermark="10 minutes",
            how="left_outer",
        ).select(imp_s["ad_id"].alias("ad_id"), "imp_ts", "clk_ts")

    def _drain():
        q = (
            _joined().writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.catalog.refreshByPath(out_dir)
        try:
            return spark.read.parquet(out_dir).collect()
        except Exception:
            return []  # sink dir may hold no files yet (phase A)

    rows_a = _drain()
    # phase A: ad 2's match emits as soon as both sides are in state; ad 1
    # must NOT have null-completed yet (watermark raised by 02:00 click
    # only takes effect in a subsequent batch, which hasn't run)
    assert [(r["ad_id"], r["clk_ts"] is None) for r in rows_a] == [(2, False)], rows_a

    # late data on BOTH sides: the join's watermark is min(left, right), so
    # the left source must advance too (ad 99's own window stays open past
    # the end of the test — it must NOT null-complete)
    spark.createDataFrame(
        [(99, "2024-01-01 03:00:00")], "ad_id INT, ts STRING"
    ).select("ad_id", F.to_timestamp("ts").alias("imp_ts")).coalesce(1).write.parquet(
        imp_dir + "/b2"
    )
    # two right files -> two more micro-batches: the first runs BEFORE the
    # raised watermark applies (watermark advances take effect in the NEXT
    # batch), the second runs under wm=02:50 and flushes the eviction
    spark.createDataFrame(
        [(97, "2024-01-01 03:00:00")], "ad_id INT, ts STRING"
    ).select("ad_id", F.to_timestamp("ts").alias("clk_ts")).coalesce(1).write.parquet(
        clk_dir + "/b3"
    )
    spark.createDataFrame(
        [(96, "2024-01-01 03:01:00")], "ad_id INT, ts STRING"
    ).select("ad_id", F.to_timestamp("ts").alias("clk_ts")).coalesce(1).write.parquet(
        clk_dir + "/b4"
    )
    spark.catalog.refreshByPath(clk_dir)
    spark.catalog.refreshByPath(imp_dir)
    rows_b = _drain()
    got = {(r["ad_id"], str(r["clk_ts"])) for r in rows_b}
    assert got == {
        (2, "2024-01-01 00:05:00"),  # matched pair (phase A)
        (1, "None"),  # null-completed ONLY after watermark passed 00:10
    }, rows_b

    # batch equivalence on closed windows: same inputs, same call, batch
    # plans. Ad 99's join window ([03:00, 03:10]) never closed before the
    # final stream watermark, so the stream rightly hasn't emitted it yet;
    # the batch plan (which sees the complete input) does — compare on the
    # windows the stream has decided.
    imp_b = spark.read.parquet(imp_dir + "/*")
    clk_b = spark.read.parquet(clk_dir + "/*")
    batch = stream_stream_interval_join(
        imp_b, clk_b, "ad_id", "imp_ts", "clk_ts",
        lower="0 seconds", upper="10 minutes", watermark="10 minutes",
        how="left_outer",
    ).select(imp_b["ad_id"].alias("ad_id"), "imp_ts", "clk_ts")
    closed = batch.filter(F.col("imp_ts") < F.lit("2024-01-01 02:40:00").cast("timestamp"))
    assert got == {(r["ad_id"], str(r["clk_ts"])) for r in closed.collect()}


def _slide(df):
    agg = sliding_agg(
        df,
        "ts",
        "2 days",
        "1 day",
        [],
        [F.count(F.lit(1)).alias("cnt"), F.sum(dec("value")).cast(DEC18_2).alias("sum_value")],
    )
    return agg.select(F.col("window.start").alias("window_start"), "cnt", "sum_value")


def test_q90_sliding_stream_batch_equivalence(spark, sf_dir, events_stream_dir):
    """The q90 sliding-window plan produces identical windows on the batch
    path and as a Structured Streaming availableNow run."""
    batch = _slide(load_table(spark, sf_dir, "events"))
    schema = spark.read.parquet(events_stream_dir).schema
    stream = read_file_stream(spark, events_stream_dir, schema, "parquet")
    streamed = run_available_now(_slide(stream), "q90_stream")
    assert {tuple(r) for r in batch.collect()} == {tuple(r) for r in streamed.collect()}


def test_checkpoint_recovery_exactly_once(spark, tmp_path_factory):
    """Kill/restart durability: a foreachBatch query restarted over the SAME
    checkpoint dir must resume batch ids where it stopped and deliver every
    input file exactly once — the checkpoint (offset log + commit log) is
    the exactly-once contract a production restart relies on."""
    base = tmp_path_factory.mktemp("ckpt_recovery")
    src, ckpt = str(base / "src"), str(base / "ckpt")
    os.makedirs(src)

    def write_file(tag, vals):
        spark.createDataFrame([(tag, v) for v in vals], "tag string, v int").coalesce(
            1
        ).write.mode("append").parquet(src)

    write_file("a", [1, 2])
    write_file("b", [3, 4])

    seen: list[tuple[int, list[tuple[str, int]]]] = []

    def sink(batch_df, batch_id):
        seen.append((batch_id, [(r["tag"], r["v"]) for r in batch_df.collect()]))

    schema = "tag string, v int"
    from data_engineering_nd_datalake_project_4_spark.streaming import run_foreach_batch

    # run 1: drain both files (1 file per micro-batch), then the query stops
    # (availableNow) — simulating a shutdown after commit
    s1 = read_file_stream(spark, src, schema, "parquet", max_files_per_trigger=1)
    run_foreach_batch(s1, sink, ckpt, query_name="ckpt_run1")
    run1_ids = [bid for bid, _ in seen]
    run1_rows = sorted(r for _, rows in seen for r in rows)
    assert run1_rows == [("a", 1), ("a", 2), ("b", 3), ("b", 4)]
    assert run1_ids == sorted(run1_ids)

    # new data lands while the query is down
    write_file("c", [5])
    write_file("d", [6])

    # run 2: SAME checkpoint — must process ONLY the new files, with batch
    # ids strictly continuing after run 1's last committed id
    s2 = read_file_stream(spark, src, schema, "parquet", max_files_per_trigger=1)
    run_foreach_batch(s2, sink, ckpt, query_name="ckpt_run2")
    run2 = seen[len(run1_ids):]
    run2_rows = sorted(r for _, rows in run2 for r in rows)
    assert run2_rows == [("c", 5), ("d", 6)], f"run2 reprocessed old data: {run2}"
    assert all(bid > max(run1_ids) for bid, _ in run2), (run1_ids, run2)

    # whole history: every row delivered exactly once across the restart
    all_rows = sorted(r for _, rows in seen for r in rows)
    assert all_rows == [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 5), ("d", 6)]


def test_session_spans_microbatch_boundary_with_watermark(spark, tmp_path_factory):
    """A session whose events arrive in DIFFERENT micro-batches (and across
    an availableNow restart) must merge into ONE session row once the
    watermark evicts it — the stateful session store has to carry the open
    session across the batch boundary, not emit two fragments. The emitted
    row must equal the batch session_agg over the full input."""
    base = tmp_path_factory.mktemp("session_boundary")
    src, sink, chk = str(base / "src"), str(base / "sink"), str(base / "chk")
    os.makedirs(src)
    schema = "user_id INT, ts TIMESTAMP"

    def write_file(name, rows):
        spark.createDataFrame(rows, "user_id INT, ts STRING").select(
            "user_id", F.to_timestamp("ts").alias("ts")
        ).coalesce(1).write.parquet(os.path.join(src, name))

    def run_once(qname):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        agg = session_agg(
            stream, "ts", "30 minutes", ["user_id"],
            [F.count(F.lit(1)).alias("n")], watermark="1 hour",
        ).select(
            "user_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n",
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .queryName(qname)
            .start()
        )
        q.awaitTermination()

    # batch 1: the session opens (no output yet — watermark at epoch)
    write_file("b1", [(1, "2024-01-01 00:00:00")])
    run_once("sess_b1")
    # batch 2: the SAME session continues (10 min < 30 min gap) and a
    # far-future event pushes the watermark past the session's end
    write_file("b2", [(1, "2024-01-01 00:10:00"), (99, "2024-01-05 00:00:00")])
    run_once("sess_b2")
    # batch 3: one more watermark advance so any finalize-on-next-batch
    # emission semantics have a batch to emit in
    write_file("b3", [(99, "2024-02-01 00:00:00")])
    run_once("sess_b3")

    rows = [
        r.asDict()
        for r in spark.read.parquet(sink).filter(F.col("user_id") == 1).collect()
    ]
    # exactly ONE merged session — a [00:00] fragment and a [00:10] fragment
    # would mean the boundary (or the restart) split the state
    assert len(rows) == 1, rows
    got = rows[0]
    expected = (
        session_agg(
            spark.createDataFrame(
                [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00")],
                "user_id INT, ts STRING",
            ).select("user_id", F.to_timestamp("ts").alias("ts")),
            "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n")],
        )
        .select(
            "user_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n",
        )
        .collect()[0]
        .asDict()
    )
    assert got == expected, (got, expected)
    assert got["n"] == 2
