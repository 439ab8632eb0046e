"""Structured Streaming surface (SURVEY.md §2.2 J).

Batch/stream parity by construction: the windowing transformations are
plain DataFrame functions applied to either a batch read or a
``readStream`` — the same logical plan, so Q31's batch-equivalence check
is an identity property, not luck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def read_rate_stream(
    spark: SparkSession,
    rows_per_second: int = 10,
    num_partitions: int | None = None,
    micro_batch: bool = False,
    rows_per_batch: int | None = None,
) -> DataFrame:
    """Built-in rate source (SURVEY §2.2 J "file/rate source"): synthetic
    ``(timestamp, value)`` rows for load tests and pipeline smoke runs.

    ``micro_batch=True`` selects the ``rate-micro-batch`` provider, which
    emits exactly ``rows_per_batch`` rows per trigger — deterministic row
    counts (the plain ``rate`` provider is wall-clock-driven), which is what
    tests and reproducible load generators want.
    """
    if micro_batch:
        reader = spark.readStream.format("rate-micro-batch").option(
            "rowsPerBatch", str(rows_per_batch or rows_per_second)
        )
    else:
        reader = spark.readStream.format("rate").option(
            "rowsPerSecond", str(rows_per_second)
        )
    if num_partitions:
        reader = reader.option("numPartitions", str(num_partitions))
    return reader.load()


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregate; works identically on batch and stream
    inputs. ``watermark`` (streams only) bounds state and drops late data.
    A tumbling window is the slide == duration case of :func:`sliding_agg`."""
    return sliding_agg(df, ts_col, duration, duration, keys, aggs, watermark)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window aggregate (each event lands in duration/slide
    windows); identical plan on batch and stream inputs (q90)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration, slide).alias("window"), *keys).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
    watermark: str | None = None,
) -> DataFrame:
    """Session-window aggregate (gap-based). Session = [first event, last
    event + gap); an event exactly ``gap`` after the previous starts a NEW
    session (half-open interval semantics)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.session_window(ts_col, gap).alias("session"), *keys).agg(*aggs)


def run_available_now(
    stream_df: DataFrame, query_name: str = "snapshot", output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with trigger=availableNow into an
    in-memory sink, block until drained, and return the materialized result
    as a batch DataFrame (used by the Q31 batch-equivalence test).
    ``output_mode='append'`` for non-aggregating streams (dedup, maps)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def run_foreach_batch(
    stream_df: DataFrame,
    batch_fn,
    checkpoint: str,
    query_name: str = "foreach_batch",
):
    """Run a stream through ``foreachBatch`` with trigger=availableNow and
    block until drained. ``batch_fn(batch_df, batch_id)`` gets each
    micro-batch as a BATCH DataFrame — the escape hatch for sinks without
    native streaming support (JDBC, multi-table fan-out, merge/upsert) and
    for exactly-once-per-batch side effects keyed on ``batch_id``."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()


def stream_dedup(
    df: DataFrame, keys: list[str], ts_col: str | None = None, watermark: str | None = None
) -> DataFrame:
    """Stateful streaming dedup. With a watermark, state is bounded
    (``dropDuplicatesWithinWatermark``); without, state grows forever —
    batch callers just get dropDuplicates."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    if watermark and ts_col:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def stream_static_join(
    stream_df: DataFrame,
    static_df: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
    broadcast_static: bool = True,
) -> DataFrame:
    """Enrich a stream against a static dimension (the reference joins log
    events to song/artist dims, /root/reference/etl.py:150-162 — here as a
    continuous stream). Stateless: the static side is re-planned per
    micro-batch, so a broadcast keeps every micro-batch shuffle-free —
    the default for dimension tables; disable for a static side too big
    to broadcast (falls back to a per-batch shuffle join)."""
    s = F.broadcast(static_df) if broadcast_static else static_df
    return stream_df.join(s, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str | None = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time interval condition: match
    left/right rows sharing ``key`` where ``right_ts`` lies in
    ``[left_ts - lower, left_ts + upper]`` (attribution joins: a purchase
    within N minutes of a view, a response within N of a request).

    BOTH sides carry a watermark and the join condition bounds event time
    in BOTH directions — together they let Spark evict buffered state
    once the watermark passes ``upper``; an unbounded condition would
    buffer each side forever (OOM at scale, and Spark refuses outer
    variants without it). State size ≈ rate × (watermark + upper), not
    corpus size. Rows later than the watermark drop from state and stop
    matching — the documented late-data semantics, same as the windowed
    aggregates'.

    Column naming: both inputs keep their own columns; alias the ts/key
    columns distinctly before calling if they collide (the self-join
    shared-attribute trap, CLAUDE.md).

    ``how``: ``"inner"`` (default), ``"left_outer"``, ``"right_outer"``
    or ``"full_outer"``. Outer semantics are WATERMARK-DRIVEN: an
    unmatched left row is NOT emitted the moment its micro-batch ends —
    Spark cannot know a match won't still arrive — but only once the
    watermark passes the end of that row's join window
    (``left_ts + upper``) and its buffered state is evicted; the
    NULL-completed row comes out in a LATER micro-batch (see
    test_stream_stream_left_outer_null_completion). This is why Spark
    refuses outer variants without both watermarks and two-sided time
    bounds: null-completion would otherwise never be decidable.
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(
            f"how must be inner/left_outer/right_outer/full_outer, got {how!r}"
        )
    # watermark=None means the caller already applied one (Spark refuses a
    # second withWatermark on the same stream: "Redefining watermark")
    lw = left.withWatermark(left_ts, watermark) if (watermark and left.isStreaming) else left
    rw = right.withWatermark(right_ts, watermark) if (watermark and right.isStreaming) else right
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lower}"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


def latest_snapshot_version(snapshot_root: str, before: int | None = None) -> int | None:
    """Highest COMMITTED snapshot version under ``snapshot_root`` (dirs
    named ``v<number>`` containing Spark's ``_SUCCESS`` commit marker),
    optionally restricted to versions < ``before``. None if no committed
    snapshot exists."""
    import os

    best = None
    if not os.path.isdir(snapshot_root):
        return None
    for name in os.listdir(snapshot_root):
        if not name.startswith("v"):
            continue
        try:
            ver = int(name[1:])
        except ValueError:
            continue
        if before is not None and ver >= before:
            continue
        if os.path.exists(os.path.join(snapshot_root, name, "_SUCCESS")):
            best = ver if best is None else max(best, ver)
    return best


def run_cdc_upsert_stream(
    stream_changes: DataFrame,
    snapshot_root: str,
    key: str,
    seq_cols,
    checkpoint: str,
    op_col: str = "op",
    initial: DataFrame | None = None,
    query_name: str = "cdc_upsert",
) -> None:
    """Streaming CDC materialization: consume a change feed (Debezium/DMS
    shape — ``key``, ``op_col`` I/U/D, ``seq_cols`` ordering, payload
    columns) and maintain a queryable snapshot table on disk, one
    versioned parquet directory per micro-batch.

    Each micro-batch: read the latest COMMITTED snapshot version BELOW the
    current batch id, :func:`operators.incremental.apply_changelog` the
    batch onto it, write ``v<batch_id>``. Crash-safety without a
    transaction log: versions are keyed by ``batch_id`` (a replayed batch
    OVERWRITES its own version — idempotent), a half-written version has
    no ``_SUCCESS`` marker and is never read, and reading "latest below
    my batch id" means a replay never consumes its own failed output
    (which would double-apply the changes). This is the public-Spark
    equivalent of a Delta/Hudi streaming MERGE; real object stores want a
    conditional-put pointer instead of directory listing — noted, not
    needed for file:// semantics.

    Scale: batch cost = one changelog compaction + one full-outer join vs
    the snapshot (see apply_changelog); old versions are retention
    garbage for an external vacuum. Bootstrap: pass ``initial``; it is
    written once as version ``-1`` (``v-1``), which sorts below every
    batch id.
    """
    if initial is not None and latest_snapshot_version(snapshot_root) is None:
        initial.write.mode("overwrite").parquet(f"{snapshot_root}/v-1")

    from data_engineering_nd_datalake_project_4_spark.operators.incremental import apply_changelog

    def batch_fn(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base_ver = latest_snapshot_version(snapshot_root, before=int(batch_id))
        if base_ver is None:
            snap = None
        else:
            snap = spark.read.parquet(f"{snapshot_root}/v{base_ver}")
        if snap is None:
            # cold start with no initial snapshot: apply against an empty
            # frame shaped like the payload (every change becomes an upsert)
            payload = [c for c in batch_df.columns if c != op_col and c not in seq_cols]
            snap = spark.createDataFrame([], batch_df.select(*payload).schema)
        out = apply_changelog(snap, batch_df, key, list(seq_cols), op_col)
        out.write.mode("overwrite").parquet(f"{snapshot_root}/v{int(batch_id)}")

    run_foreach_batch(stream_changes, batch_fn, checkpoint, query_name)


def run_sketch_state_stream(
    stream_df: DataFrame,
    snapshot_root: str,
    col: str,
    checkpoint: str,
    p: int = 12,
    group_cols=(),
    query_name: str = "hll_state",
) -> None:
    """Streaming distinct-count state maintenance — the streaming face of
    the q168 sketch-state rollup: each micro-batch builds
    ``hll_registers`` over its own rows and MAX-merges them into a
    versioned on-disk register table (the :func:`run_cdc_upsert_stream`
    crash-safety scheme: versions keyed by ``batch_id``, a half-written
    version has no ``_SUCCESS`` and is never read, and reading "latest
    COMMITTED version below my batch id" means a replay never consumes
    its own failed output).

    Register MAX-merge is idempotent AND commutative, which buys a
    STRONGER guarantee than the CDC sink needs sequence columns for: a
    replayed or duplicated batch merges to the identical state
    (``max(a, a) = a``), so at-least-once delivery converges to the exact
    union registers — no dedup, no ordering requirements. Any committed
    version answers distinct-count questions via
    ``sketches.hll_estimate`` (and the estimate equals a from-scratch
    batch build over everything consumed so far, by the merge theorem).

    Scale shape: per batch the state moved is the batch's own registers
    plus the latest snapshot — each bounded by ≤ 2^p rows PER GROUP —
    never raw history; the snapshot is the entire state whatever the
    stream's lifetime. Old versions are retention garbage for an
    external vacuum, exactly like the CDC sink's.
    """
    from data_engineering_nd_datalake_project_4_spark.operators.sketches import hll_merge, hll_registers

    gcols = list(group_cols)

    def batch_fn(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        regs = hll_registers(batch_df, col, p=p, group_cols=gcols)
        base_ver = latest_snapshot_version(snapshot_root, before=int(batch_id))
        if base_ver is not None:
            regs = spark.read.parquet(f"{snapshot_root}/v{base_ver}").unionByName(regs)
        hll_merge(regs, group_cols=gcols).write.mode("overwrite").parquet(
            f"{snapshot_root}/v{int(batch_id)}"
        )

    run_foreach_batch(stream_df, batch_fn, checkpoint, query_name)


def run_cms_state_stream(
    stream_df: DataFrame,
    snapshot_root: str,
    col: str,
    checkpoint: str,
    width: int = 2048,
    depth: int = 5,
    hash_fn: str = "xxhash64",
    group_cols=(),
    query_name: str = "cms_state",
) -> None:
    """Streaming FREQUENCY state maintenance — the CMS face of
    :func:`run_sketch_state_stream`: each micro-batch builds a Count-Min
    sketch over its own rows and cell-SUM-merges it into a versioned
    on-disk cell table.

    Unlike HLL register MAX, cell SUM is NOT idempotent — blindly
    re-adding a replayed batch double-counts. The versioned-snapshot
    scheme (shared with :func:`run_cdc_upsert_stream`) is what makes
    at-least-once delivery safe anyway: versions are keyed by
    ``batch_id``, so a replayed batch recomputes FROM the latest
    committed version BELOW its own id (never from its own failed or
    duplicated output) and OVERWRITES ``v<batch_id>`` — the merge applies
    exactly once per batch id no matter how many times the batch fires.
    A half-written version has no ``_SUCCESS`` marker and is never read.

    Any committed version answers frequency questions via
    :func:`operators.sketches.cms_estimate` / ``heavy_hitters_from_cms``
    and merges across state tables with ``merge_cms`` — and because cell
    addition is exact, the streamed state is BIT-IDENTICAL to a
    from-scratch ``build_cms`` over everything consumed (property-tested),
    not just estimate-equivalent.

    Scale shape: per batch the state moved is the batch's own cells plus
    the snapshot — each bounded by depth·width rows PER GROUP — never raw
    history. Old versions are retention garbage for an external vacuum.
    """
    from data_engineering_nd_datalake_project_4_spark.operators.sketches import build_cms, merge_cms

    gcols = list(group_cols)

    def batch_fn(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cells = build_cms(
            batch_df, col, width=width, depth=depth, hash_fn=hash_fn, group_cols=gcols
        )
        base_ver = latest_snapshot_version(snapshot_root, before=int(batch_id))
        if base_ver is not None:
            cells = spark.read.parquet(f"{snapshot_root}/v{base_ver}").unionByName(cells)
        merge_cms(cells, group_cols=gcols).write.mode("overwrite").parquet(
            f"{snapshot_root}/v{int(batch_id)}"
        )

    run_foreach_batch(stream_df, batch_fn, checkpoint, query_name)


def run_topk_candidate_stream(
    stream_df: DataFrame,
    snapshot_root: str,
    col: str,
    checkpoint: str,
    pool: int = 64,
    query_name: str = "topk_candidates",
) -> None:
    """Streaming candidate-vocabulary maintenance — the missing half of
    the all-from-state heavy-hitter story: :func:`run_cms_state_stream`
    keeps per-group frequency CELLS, but probing them needs a candidate
    item set, which batch mode derives from a global count
    (``grouped_heavy_hitters``). This sink maintains that head
    vocabulary from the stream itself: each micro-batch's per-item
    counts are SUM-merged with the prior state and the top-``pool``
    rows (count desc, item asc — total order) are kept, under the same
    batch-id-versioned snapshot scheme (replay recomputes from the
    state below its id and overwrites — exactly once per batch id).

    Approximation contract (the lossy-counting / SpaceSaving shape,
    Metwally et al. 2005): state is ≤ ``pool`` rows forever. An item
    that stays in the pool across merges carries its EXACT total; an
    item evicted and later re-entered loses the counts from its absent
    epochs — so ``cnt`` is a LOWER bound (one-sided, like CMS's upper
    bound from the other side), and a persistent head item is retained
    as long as fewer than ``pool`` items out-count it. Size ``pool``
    well above the k you query (the same guidance as
    ``grouped_heavy_hitters``'s candidate_pool). For exact counts,
    probe the items against the CMS state — the intended pairing:
    candidates from THIS sink, estimates from the cell state, zero
    raw-data rescans (see ``heavy_hitters_from_cms``).

    QUANTIFIED error bound (the lossy-counting ε·N shape, Manku &
    Motwani 2002): define per truncation j the eviction threshold
    ``θ_j`` = the pool-th largest merged count if the merge overflowed
    the pool, else 0 (observable as ``min(cnt)`` of snapshot ``v_j``
    when it holds exactly ``pool`` rows). Every count an item loses, it
    loses at an eviction, and an evicted item's accumulated-since-last-
    eviction count is ≤ θ_j (it ranked below every kept row under the
    (cnt desc, item asc) total order) — so for EVERY item x, over B
    processed batches with stream mass N:

        true(x) − cnt(x)  ≤  Σ_{j∈evictions(x)} θ_j  ≤  Σ_j θ_j
                          ≤  B·N/pool        (θ_j ≤ M_j/pool ≤ N/pool,
                                              since ≥ pool items tie or
                                              out-count an evicted one)

    i.e. the lossy-counting bound with ε = B/pool — items absent from
    the state implicitly carry cnt 0 and satisfy the same bound. The
    Σθ_j certificate is computable from the committed snapshots alone;
    tests/test_cms_stream.py::test_candidate_stream_lossy_counting_bound
    measures the worst-case undercount against exact counts across 24
    churning micro-batches and asserts both inequalities.

    Scale shape: per batch the state moved is the batch's own item
    counts (one map-side-combining groupBy) plus ≤ pool state rows;
    NULL items are dropped (the build_cms NULL contract).
    """
    def batch_fn(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts = (
            batch_df.filter(F.col(col).isNotNull())
            .groupBy(F.col(col).alias("item"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        base_ver = latest_snapshot_version(snapshot_root, before=int(batch_id))
        if base_ver is not None:
            counts = spark.read.parquet(f"{snapshot_root}/v{base_ver}").unionByName(counts)
        merged = (
            counts.groupBy("item")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("item"))
            .limit(pool)
        )
        merged.write.mode("overwrite").parquet(f"{snapshot_root}/v{int(batch_id)}")

    run_foreach_batch(stream_df, batch_fn, checkpoint, query_name)


def run_incremental_lsh_dedup_stream(
    stream_docs: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    decisions_root: str,
    checkpoint: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    num_buckets: int = 64,
    query_name: str = "incremental_lsh_dedup",
    compact_every: int | None = None,
) -> None:
    """Continuous-ingest NEAR-dup dedup: q169's incremental MinHash-LSH
    operator as a Structured Streaming sink — "dedupe the crawl feed
    against the historical corpus as it arrives". Each micro-batch runs
    :func:`..operators.incremental.incremental_lsh_dedup` in VERSIONED
    mode (``src_batch = batch_id``) against the shared band store
    (bootstrap it with ``build_band_store``; batch and streaming appends
    coexist — unstamped rows are always visible) and writes the batch's
    SURVIVORS to ``decisions_root/v<batch_id>`` (overwrite).

    Exactly-once decisions on an at-least-once feed, without versioned
    store copies: the store append is stamped with the batch id and the
    probe sees only strictly-earlier stamps, so a replayed micro-batch
    ignores its own earlier append and reproduces the identical survivor
    set, overwriting ``v<batch_id>`` with the same rows (the CDC/HLL
    sinks' "read state below my id" rule, implemented as a stamp filter
    on ONE append-only store instead of per-batch snapshots — the store
    gains only duplicate stamped rows on replay, which are decision-
    neutral). Crash between append and decisions-write = the replay
    re-appends duplicates and completes the write: same rows.

    Scale shape per batch: identical to the batch operator (24-byte band
    rows, bucket-pruned store scan, batch-sized checkpoints); decisions
    are batch-sized. Store maintenance: ``compact_band_store`` (since r13
    the compaction ALWAYS carries ``src_batch`` through — the old
    ``versioned=False`` default silently erased stamps; ADVICE r12).
    Crash between the store append and the decisions write is healed by
    the replay (test_lsh_stream_crash_between_store_append_and_decisions_
    write pins it); sustained replay grows the store by one duplicate
    stamped row per surviving (band, bucket) per extra delivery —
    ``compact_band_store(..., dedup_exact=True)`` reclaims them
    (decision-identical: exact-duplicate rows are probe-invisible).

    ``compact_every=N`` runs that reclaim IN-STREAM after every Nth
    batch's decisions commit (batch_id % N == N-1). Safe by
    construction: foreachBatch serializes micro-batches, so the
    single-writer assumption holds — the compaction never races an
    append. A crash mid-swap leaves the ``__old`` aside and the next
    batch's store read refuses loudly with the one-rename recovery
    (the pinned ``_read_store_cold_start`` contract); a replayed batch
    harmlessly re-compacts. Decisions are identical with or without
    (compaction is decision-neutral — tested).
    """
    from data_engineering_nd_datalake_project_4_spark.operators import incremental

    def batch_fn(batch_df, batch_id: int) -> None:
        out = incremental.incremental_lsh_dedup(
            batch_df.sparkSession, batch_df, text_col, id_col, store_path,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            hash_fn=hash_fn, num_buckets=num_buckets,
            src_batch=int(batch_id),
        )
        out.write.mode("overwrite").parquet(f"{decisions_root}/v{int(batch_id)}")
        if compact_every and int(batch_id) % compact_every == compact_every - 1:
            incremental.compact_band_store(
                batch_df.sparkSession, store_path, dedup_exact=True
            )

    run_foreach_batch(stream_docs, batch_fn, checkpoint, query_name)


def run_incremental_exact_dedup_stream(
    stream_docs: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    decisions_root: str,
    checkpoint: str,
    mode: str = "exact",
    num_buckets: int = 64,
    query_name: str = "incremental_exact_dedup",
    compact_every: int | None = None,
) -> None:
    """The EXACT-fingerprint member of the continuous-ingest dedup trio
    (exact here / MinHash-LSH :func:`run_incremental_lsh_dedup_stream` /
    sign-LSH :func:`run_incremental_semantic_dedup_stream`): each
    micro-batch runs :func:`..operators.incremental.incremental_dedup`
    in VERSIONED mode (``src_batch = batch_id``) against the shared
    fingerprint store (bootstrap with ``build_fingerprint_store``;
    batch-mode unstamped appends coexist — NULL stamps are always
    visible) and writes the batch's SURVIVORS to
    ``decisions_root/v<batch_id>`` (overwrite).

    Same exactly-once contract as the LSH wrapper: the stamped append +
    strictly-earlier-stamp probe make a replayed micro-batch reproduce
    the identical survivor set and overwrite ``v<batch_id>`` with the
    same rows; a crash between the store append and the decisions write
    is healed by the replay. Store maintenance:
    ``compact_fingerprint_store`` (stamps always carried;
    ``dedup_exact=True`` reclaims replay-duplicate rows);
    ``compact_every=N`` runs it in-stream after every Nth batch (see
    :func:`run_incremental_lsh_dedup_stream` for the safety argument)."""
    from data_engineering_nd_datalake_project_4_spark.operators import incremental

    def batch_fn(batch_df, batch_id: int) -> None:
        out = incremental.incremental_dedup(
            batch_df.sparkSession, batch_df, text_col, id_col, store_path,
            mode=mode, num_buckets=num_buckets, src_batch=int(batch_id),
        )
        out.write.mode("overwrite").parquet(f"{decisions_root}/v{int(batch_id)}")
        if compact_every and int(batch_id) % compact_every == compact_every - 1:
            incremental.compact_fingerprint_store(
                batch_df.sparkSession, store_path, dedup_exact=True
            )

    run_foreach_batch(stream_docs, batch_fn, checkpoint, query_name)


def run_incremental_semantic_dedup_stream(
    stream_vecs: DataFrame,
    id_col: str,
    vec_col: str,
    store_path: str,
    decisions_root: str,
    checkpoint: str,
    bands: int = 4,
    band_bits: int = 6,
    num_buckets: int = 16,
    query_name: str = "incremental_semantic_dedup",
    compact_every: int | None = None,
) -> None:
    """The sign-LSH twin of :func:`run_incremental_lsh_dedup_stream` for
    embedding feeds (q170's operator, versioned mode): per micro-batch,
    every row lands in ``decisions_root/v<batch_id>`` with its
    ``sem_removed`` flag (degenerate vectors pass through flagged False,
    the q170 contract). Same stamp-filter exactly-once contract, same
    store coexistence with batch-mode appends and
    ``build_sign_band_store`` bootstraps; same ``compact_every``
    in-stream reclaim (the sign store shares the band-store layout)."""
    from data_engineering_nd_datalake_project_4_spark.operators import incremental

    def batch_fn(batch_df, batch_id: int) -> None:
        out = incremental.incremental_semantic_dedup(
            batch_df.sparkSession, batch_df, id_col, vec_col, store_path,
            bands=bands, band_bits=band_bits, num_buckets=num_buckets,
            src_batch=int(batch_id),
        )
        out.write.mode("overwrite").parquet(f"{decisions_root}/v{int(batch_id)}")
        if compact_every and int(batch_id) % compact_every == compact_every - 1:
            incremental.compact_band_store(
                batch_df.sparkSession, store_path, dedup_exact=True
            )

    run_foreach_batch(stream_vecs, batch_fn, checkpoint, query_name)
