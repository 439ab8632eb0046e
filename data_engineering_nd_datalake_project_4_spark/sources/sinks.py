"""Sinks (SURVEY.md §2.2 A; reference R05-R07).

Partitioned snappy parquet, written natively — including to s3a:// — never
via an ``aws s3 cp`` subprocess side-channel (reference anti-pattern,
/root/reference/etl.py:239-251).

Scale notes: dynamic partition overwrite only rewrites touched partitions;
``max_records_per_file`` bounds file sizes so a skewed partition key cannot
produce multi-GB files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
    max_records_per_file: int | None = None,
    dynamic_partition_overwrite: bool = False,
    cluster_by_partitions: bool = True,
) -> None:
    """``cluster_by_partitions`` repartitions on the partition columns before
    a partitioned write so each output directory is produced by ONE task —
    without it every task touches every directory it holds rows for, and a
    high-cardinality partition key (e.g. the reference's ``artist_id``
    layout, etl.py:107) explodes into tasks×dirs tiny files. Costs one
    shuffle; at scale that shuffle is far cheaper than the small-file storm.
    """
    if partition_by and cluster_by_partitions:
        df = df.repartition(*partition_by)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if dynamic_partition_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed identically on their join key join WITHOUT a
    shuffle (both sides already hash-partitioned on disk) — at 100 TB this
    turns the recurring fact⋈fact join from the dominant cost into a local
    merge. Requires the session catalog (saveAsTable), not a bare path.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def upsert_partitioned(
    spark,
    updates: DataFrame,
    path: str,
    keys: Sequence[str],
    order_col: str,
    partition_by: Sequence[str],
    max_touched_partitions: int = 1000,
) -> None:
    """Upsert (merge) into a partitioned parquet table without a table
    format: union the existing rows of the TOUCHED partitions with the
    updates, keep the highest-``order_col`` row per key, and dynamically
    overwrite only those partitions.

    Scale shape: the touched-partition filter prunes the read to the
    partitions present in ``updates`` (partition pruning, not a full-table
    scan); the merge itself is one window shuffle on ``keys``. A real table
    format (Delta/Iceberg) adds ACID + concurrent writers; the data motion
    is the same.

    Assumes partition-stable keys: an update that moves a key to a new
    partition value leaves the stale row in its old (untouched) partition —
    the same contract as Hive-style INSERT OVERWRITE upserts.

    The touched-partition list is collected to the driver ONLY while it has
    at most ``max_touched_partitions`` entries (static pruning literals —
    planner-time directory skip, zero runtime cost). Past the cap the list
    is never materialized: the existing table is LEFT SEMI joined to the
    distinct partition tuples of ``updates``, and dynamic partition pruning
    does the directory skip at runtime — bounded driver memory at any
    partition cardinality.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyspark.errors import AnalysisException

    prev_overwrite_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    # the updates plan drives THREE consumers (touched-partition collect,
    # the merge union, and — past the cap — the semi-join build side):
    # persist so an expensive/nondeterministic upstream runs once and the
    # partition list cannot disagree with the rows actually merged
    updates = updates.persist()
    try:
        # limit(cap+1): detect overflow without an unbounded collect
        touched = [
            tuple(r)
            for r in updates.select(*partition_by)
            .distinct()
            .limit(max_touched_partitions + 1)
            .collect()
        ]
        try:
            existing = spark.read.parquet(path)
        except AnalysisException as e:
            # ONLY a missing table means first write — a schema-drift or
            # column error below must propagate, or the dynamic overwrite
            # would silently replace touched partitions with updates-only
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            existing = None
        if existing is not None:
            if len(touched) <= max_touched_partitions:
                pred = F.lit(False)
                for combo in touched:
                    clause = F.lit(True)
                    for col, val in zip(partition_by, combo):
                        # eqNullSafe: a NULL partition value must still
                        # match its existing partition or its rows are
                        # dropped by the merge yet overwritten on disk
                        clause = clause & F.col(col).eqNullSafe(F.lit(val))
                    pred = pred | clause
                existing = existing.filter(pred)
            else:
                upd_parts = updates.select(*partition_by).distinct()
                cond = F.lit(True)
                for col in partition_by:
                    cond = cond & existing[col].eqNullSafe(upd_parts[col])
                existing = existing.join(upd_parts, cond, "left_semi")
            existing = existing.select(*updates.columns)
            merged = existing.unionByName(updates)
        else:  # first write: nothing to merge
            merged = updates
        w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            latest.repartition(*partition_by).write.mode("overwrite").partitionBy(
                *partition_by
            ).parquet(path)
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_overwrite_mode
            )
    finally:
        updates.unpersist()


def compact_parquet_dir(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compact a small-file parquet directory in place: read, coalesce to
    ~target-sized files, swap in via rename. Returns the new file count.
    The antidote to streaming sinks and over-parallel writes accumulating
    thousands of KB-sized files (each file costs a task + footer fetch on
    every downstream scan).

    Filesystem ops go through the Hadoop FileSystem API, so the same code
    works on ``file://``, ``hdfs://`` and ``s3a://`` paths (sizing via
    ``getContentSummary``, swap via ``rename``). The swap order is
    old→aside, new→live, delete-aside: a crash can leave the table under
    the ``__old`` name (recoverable by a rename), never half-deleted. On
    a rename-less object store the two renames are copies, not atomic —
    a table format (Delta/Iceberg) is the real answer there; the data
    motion is identical.
    """
    import math

    df = spark.read.parquet(path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/"))
    fs = jpath.getFileSystem(hconf)
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    _swap_compacted(
        spark,
        path,
        lambda tmp: df.coalesce(n_files).write.mode("overwrite").parquet(tmp),
    )
    return n_files


def _swap_compacted(spark, path: str, write_tmp) -> None:
    """The compact-in-place swap shared by :func:`compact_parquet_dir` and
    :func:`compact_partitioned_parquet_dir`: ``write_tmp(tmp_path)`` writes
    the compacted copy (while the live path is still readable), then the
    swap goes old→aside, new→live, delete-aside.

    Crash contract, per window (pinned by
    ``tests/test_incremental_lsh.py::test_compact_band_store_crash_windows``):

    1. die during/after ``write_tmp`` → live store untouched; the orphaned
       ``__compacting`` is overwritten by the next compaction.
    2. die between the renames → the ONLY window where the live path is
       missing; the full store sits intact under ``__old`` — recoverable
       by exactly one rename (+ ``refreshByPath`` in a live session). A
       concurrent reader in this window fails LOUDLY (path not found),
       never reads a half-state.
    3. die before the aside delete → live is already the compacted copy
       (written in full before any rename); the stale ``__old`` is cleared
       by the next compaction.

    Never half-deleted, and replay decisions are identical in every
    readable state. Single-WRITER assumption: don't append a batch while
    a swap runs (same assumption the appends already make). Finishes with
    ``refreshByPath``: the session FileStatusCache pins file listings
    (round-5 rule), so without the refresh this same session would keep
    reading the pre-compaction file set it already listed."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/"))
    fs = jpath.getFileSystem(hconf)
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compacting")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
    write_tmp(tmp.toString())
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(jpath, old):
        raise IOError(f"compact: could not move {path} aside")
    if not fs.rename(tmp, jpath):
        # put the original back before failing — never leave the live
        # path missing
        fs.rename(old, jpath)
        raise IOError(f"compact: could not swap in compacted {path}")
    fs.delete(old, True)
    spark.catalog.refreshByPath(path)


def compact_partitioned_parquet_dir(
    spark,
    path: str,
    partition_by: str,
    schema: str | None = None,
    transform=None,
) -> int:
    """Compact a PARTITIONED parquet directory in place, PRESERVING the
    ``partitionBy`` layout — the variant append-heavy stores need
    (:mod:`..operators.incremental`'s band/fingerprint stores): months of
    batch appends leave thousands of KB-sized files per partition
    directory, and :func:`compact_parquet_dir` would flatten the partition
    column into data files, silently demoting every later
    partition-pruned probe to a full-store row filter.

    One ``repartition(partition_by)`` pass: each partition value hashes to
    exactly one task, so each partition directory comes back as ~one file.
    ``schema`` (a DDL string INCLUDING the partition column) makes an
    EMPTY store — a valid directory with zero data files (round-7 rule) —
    compact to itself instead of failing schema inference.

    ``transform`` (optional ``df -> df``) is applied to the full store
    frame before the rewrite — the hook row-level maintenance rides on
    (e.g. :func:`..operators.incremental.compact_band_store`'s
    ``dedup_exact`` reclaim of at-least-once replay duplicates). The
    DEFAULT (None) preserves the row multiset exactly.

    Returns the post-compaction data-file count."""
    reader = spark.read.schema(schema) if schema else spark.read
    df = reader.parquet(path)
    if transform is not None:
        df = transform(df)
    _swap_compacted(
        spark,
        path,
        lambda tmp: (
            df.repartition(partition_by)
            .write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(tmp)
        ),
    )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/"))
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            n += 1
    return n


def write_orc(df: DataFrame, path: str, partition_by: Sequence[str] | None = None) -> None:
    """ORC sink, overwrite + snappy — mirror of :func:`write_parquet` for
    ORC-standardized lakes."""
    w = df.write.mode("overwrite").option("compression", "snappy")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    """CSV sink (overwrite, headered) — the interchange/export path; flat
    schemas only, callers serialize arrays/maps first."""
    df.write.mode("overwrite").option("header", str(header).lower()).option(
        "sep", sep
    ).csv(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str | None = "gzip",
) -> None:
    """JSON-Lines sink — the training-data interchange format (one JSON
    object per line; nested arrays/structs serialize natively, unlike CSV).
    Spark's json writer IS line-delimited; ``max_records_per_file`` bounds
    shard sizes for data-loader consumption, ``partition_by`` gives
    source/language-split exports, gzip keeps text shards ~5x smaller
    (gzip splits per FILE, not within — bound shard size accordingly)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    seed: int = 42,
    epoch: int = 0,
    n_shards: int = 8,
) -> DataFrame:
    """Materialize one training epoch on disk: deterministic shuffle
    (``packing.epoch_shuffle``), then EXACTLY ONE parquet file per shard
    with rows in shuffled ``pos`` order — the layout a data-loader fleet
    consumes (worker k streams shard k sequentially; no shared scan, no
    runtime shuffling). Returns the per-shard manifest DataFrame
    ``(shard_id, n_docs[, n_tokens, content_xor])`` computed from the
    FILES JUST WRITTEN (read-back, not the plan), so the manifest attests
    what actually landed; it is written alongside the data under
    ``<path>/_manifest`` (underscore-prefixed → invisible to parquet
    readers of ``path``).

    Scale shape: one shuffle (repartition on shard_id, ~n_shards tasks,
    each sorting corpus/n_shards rows); the per-shard file is written by
    exactly one task because every shard's rows hash to one partition.
    Determinism: same (seed, epoch) → byte-identical shard order on any
    cluster size, and shard manifests XOR-merge to the corpus manifest
    (``text.corpus_manifest`` property). Re-writing the same path with a
    new epoch refreshes the session file-status cache — without that, a
    reader session pins the OLD file listing (CLAUDE.md round-5 trap).
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards ({n_shards}) must be positive")
    from data_engineering_nd_datalake_project_4_spark.operators.packing import epoch_shuffle
    from data_engineering_nd_datalake_project_4_spark.operators.text import corpus_manifest

    shuffled = epoch_shuffle(df, id_col, seed, epoch, n_shards)
    (
        shuffled.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    spark = df.sparkSession
    spark.catalog.refreshByPath(path)
    written = spark.read.parquet(path)
    if text_col is not None:
        manifest = corpus_manifest(written, text_col, id_col, by="shard_id")
    else:
        manifest = written.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n_docs"))
    manifest = manifest.orderBy("shard_id")
    manifest.coalesce(1).write.mode("overwrite").json(f"{path}/_manifest")
    return manifest
