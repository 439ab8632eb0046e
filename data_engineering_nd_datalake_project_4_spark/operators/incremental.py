"""Incremental deduplication against a persisted fingerprint store.

The reference's only "incremental" idiom is overwrite-everything
(/root/reference/etl.py:225-237: each run rewrites the full output table).
At 100 TB that is the one thing you cannot do: deduping a NEW batch of
documents must not rescan — let alone rewrite — the existing corpus. This
module persists only the corpus *fingerprints* (8-byte ``xxhash64``
content hashes, ~16 bytes/doc on disk), hash-partitioned so each new batch
reads just the store partitions its own fingerprints could live in.

Data motion per batch at any corpus scale:
- the batch shuffles once on its 8-byte fingerprint (in-batch first-wins);
- the store scan is pruned to the batch's touched ``fp_bucket`` partitions
  (static IN-literal pruning — the bucket list is at most ``num_buckets``
  driver-side integers, never data);
- the anti-join shuffles 8-byte keys only — document text never moves;
- the store append writes only the survivors' fingerprints, into the same
  bucket layout, so the NEXT batch prunes just as well. Periodic
  :func:`compact_fingerprint_store` / :func:`compact_band_store`
  (partition-layout-preserving, replay-safe) keep file counts bounded.

Fingerprint modes:
- ``exact``: ``xxhash64(text)`` — byte-identical duplicates.
- ``canonical``: ``xxhash64(canonical_text_key(text))`` — token-set
  duplicates (permutations/repetitions collide), same store machinery.

Equality of hashes stands in for equality of texts: a false-duplicate
requires a 64-bit collision (~n²/2⁶⁵ for n docs); the q130 oracle joins on
the raw text and the driver gate would surface any collision as a mismatch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators.dedup import canonical_text_key, latest_per_key

#: store schema: fp (long), first_id (long), fp_bucket (int, partition col)
_STORE_COLS = ("fp", "first_id", "fp_bucket")


def _fingerprint(text_col: str, mode: str) -> Column:
    # NULL text: xxhash64 of a NULL arg returns the seed hash (constant),
    # so all NULL-text docs form ONE duplicate class — "no content" dedups
    # against "no content". Oracles must compare null-safely
    # (IS NOT DISTINCT FROM) to reproduce this (nulls soak, q130).
    if mode == "exact":
        return F.xxhash64(F.col(text_col))
    if mode == "canonical":
        return F.xxhash64(canonical_text_key(text_col))
    raise ValueError(f"unknown fingerprint mode: {mode!r}")


def _read_store_cold_start(spark: SparkSession, store_path: str, schema: str):
    """Read a persisted dedup-state store with the declared ``schema``;
    a MISSING store returns None ("first batch", the cold-start
    contract). Two hard lines inside that leniency:

    - any AnalysisException other than path-not-found propagates (a
      corrupt footer / permission error must never read as "no state",
      or every batch doc silently passes dedup);
    - a missing live path WITH a ``__old`` aside present is a compaction
      swap that crashed between its renames (``_swap_compacted`` window
      2) — treating it as a cold start would silently rebuild dedup
      state from scratch and pass every duplicate. Refuse loudly with
      the one-rename recovery step. Pinned by
      tests/test_incremental_lsh.py::test_compact_band_store_crash_windows.
    """
    try:
        return spark.read.schema(schema).parquet(store_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        jvm = spark._jvm
        old = jvm.org.apache.hadoop.fs.Path(store_path.rstrip("/") + "__old")
        fs = old.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(old):
            raise IOError(
                f"store missing at {store_path} but {store_path}__old exists: "
                "a compaction swap crashed between its renames (or is in "
                "flight). Recover by renaming the __old aside back to the "
                "live path; refusing to treat an interrupted swap as a "
                "cold start."
            ) from e
        return None


def _bucket(fp: Column, num_buckets: int) -> Column:
    # pmod keeps negative xxhash64 values in [0, num_buckets)
    return F.pmod(fp, F.lit(num_buckets)).cast("int")


def fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    mode: str = "exact",
    num_buckets: int = 64,
) -> DataFrame:
    """One ``(fp, first_id, fp_bucket)`` row per distinct fingerprint —
    ``first_id`` is the minimum ``id_col`` carrying it. Single groupBy
    shuffle on the 8-byte hash (partial+final HashAggregate)."""
    fp = _fingerprint(text_col, mode)
    return (
        df.select(fp.alias("fp"), F.col(id_col).alias("__id"))
        .groupBy("fp")
        .agg(F.min("__id").alias("first_id"))
        .withColumn("fp_bucket", _bucket(F.col("fp"), num_buckets))
    )


def build_fingerprint_store(
    df: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    mode: str = "exact",
    num_buckets: int = 64,
) -> None:
    """Materialize the corpus fingerprint store, hash-partitioned by
    ``fp_bucket``. One-time full scan of the corpus; every later batch
    touches only its own buckets."""
    (
        fingerprints(df, text_col, id_col, mode, num_buckets)
        .repartition("fp_bucket")
        .write.mode("overwrite")
        .partitionBy("fp_bucket")
        .parquet(store_path)
    )


def incremental_dedup(
    spark: SparkSession,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    mode: str = "exact",
    num_buckets: int = 64,
    update_store: bool = False,
    src_batch: int | None = None,
) -> DataFrame:
    """Rows of ``batch`` that are new to the corpus: not fingerprinted in
    the store, and the first (minimum-``id_col``) occurrence within the
    batch itself.

    With ``update_store=True`` the survivors' fingerprints are appended to
    the store first (same bucket layout), making the operation idempotent:
    replaying the identical batch then yields zero survivors.

    ``src_batch`` (VERSIONED mode — the exactly-once-decisions contract,
    identical to :func:`incremental_lsh_dedup`'s): pass a MONOTONE batch
    id and the operator becomes REPLAY-STABLE — the survivor append is
    stamped with the id and the probe sees only bootstrap rows (NULL
    stamp: ``build_fingerprint_store`` / unversioned appends) or
    STRICTLY-earlier stamps, so re-running the same batch with the same
    id returns the IDENTICAL survivor set instead of zero survivors.
    Implies ``update_store``; parquet schema evolution merges stamped
    and legacy layouts in one store, and
    :func:`compact_fingerprint_store` always carries the stamp through.

    Multi-consumer consistency (BOTH paths): the batch plan feeds several
    consumers — the touched-bucket collect, the survivor anti-join the
    caller later actions, and (update_store=True) the store append. A
    nondeterministic or sampled upstream must not evaluate once per
    consumer, or fingerprints could land in buckets that were pruned from
    the store scan (silently letting duplicates pass), or the store could
    permanently record fingerprints disagreeing with the survivors
    returned. So the keyed batch is ``localCheckpoint(eager=True)``-frozen
    ONCE up front — every consumer, including the caller's consumption
    after this function returns, reads the same materialized rows (a
    ``persist()`` released in ``finally`` could not cover that last
    consumer). With update_store=True the survivor set is additionally
    checkpointed so the append and the caller share one evaluation of the
    anti-join. Both checkpoints hold only *batch*-sized rows (never
    corpus-sized); on a real cluster with executor loss in scope, swap
    for a reliable ``checkpoint()`` dir.
    """
    update_store = update_store or src_batch is not None
    fp = _fingerprint(text_col, mode)
    keyed = batch.withColumn("__fp", fp).localCheckpoint(eager=True)
    # first-wins within the batch: one window shuffle on the 8-byte hash
    firsts = latest_per_key(keyed, ["__fp"], [F.col(id_col)])

    # prune the store scan to the buckets this batch can touch: at most
    # num_buckets driver-side ints → static partition pruning literals
    touched = [
        r[0]
        for r in keyed.select(_bucket(F.col("__fp"), num_buckets).alias("b"))
        .distinct()
        .collect()
    ]
    # explicit schema (the probe needs only fp + the partition column):
    # a store built from an EMPTY corpus is a valid directory with zero
    # data files (partitionBy writes no part files for no rows), where
    # schema inference would fail UNABLE_TO_INFER_SCHEMA — with the
    # declared schema it reads as the correct empty frame (empty soak).
    # fp is always xxhash64 -> LONG; fp_bucket is _bucket -> INT.
    # Missing store = first batch; mid-swap / corrupt stores fail loudly
    # (_read_store_cold_start).
    probe_schema = "fp LONG" + (
        ", src_batch LONG" if src_batch is not None else ""
    ) + ", fp_bucket INT"
    store = _read_store_cold_start(spark, store_path, probe_schema)
    if store is not None and src_batch is not None:
        # versioned visibility: bootstrap rows (NULL stamp) + strictly
        # earlier batches; a replay's own earlier append is invisible
        store = store.filter(
            F.col("src_batch").isNull() | (F.col("src_batch") < F.lit(int(src_batch)))
        )
    if store is not None:
        seen = store.filter(F.col("fp_bucket").isin(touched)).select("fp")
        survivors = firsts.join(
            seen, firsts["__fp"] == seen["fp"], "left_anti"
        )
    else:  # no store yet: everything survives in-batch dedup
        survivors = firsts

    if update_store:
        # freeze the survivor set once; append and caller share it
        survivors = survivors.localCheckpoint(eager=True)
        cols = [
            F.col("__fp").alias("fp"),
            F.col(id_col).cast("long").alias("first_id"),
        ]
        if src_batch is not None:
            # replay re-appends identical stamped rows — invisible to the
            # replaying batch itself, decision-neutral for later ones
            cols.append(F.lit(int(src_batch)).cast("long").alias("src_batch"))
        cols.append(_bucket(F.col("__fp"), num_buckets).alias("fp_bucket"))
        (
            survivors.select(*cols)
            .repartition("fp_bucket")
            .write.mode("append")
            .partitionBy("fp_bucket")
            .parquet(store_path)
        )
    return survivors.drop("__fp")


#: band store schema: one row per distinct (band, bucket) in the corpus;
#: bkt_part is the partition column (pmod of the 8-byte bucket hash)
_BAND_STORE_SCHEMA = "band INT, bucket LONG, first_id LONG"


def _band_part(bucket: Column, num_buckets: int) -> Column:
    # pmod keeps negative xxhash64 bucket values in [0, num_buckets)
    return F.pmod(bucket, F.lit(num_buckets)).cast("int")


def band_store_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    num_buckets: int = 64,
) -> DataFrame:
    """One ``(band, bucket, first_id, bkt_part)`` row per distinct MinHash
    band bucket occupied by the corpus — ``first_id`` is the minimum
    ``id_col`` that claimed it. NULL-text rows contribute nothing (no
    signature — see :func:`incremental_lsh_dedup` for the contract).
    Single groupBy shuffle on (int, 8-byte hash) keys; text never moves."""
    from data_engineering_nd_datalake_project_4_spark.operators.dedup import minhash_band_rows

    banded = minhash_band_rows(
        df.filter(F.col(text_col).isNotNull()),
        text_col, id_col, num_hashes, bands, shingle_n, hash_fn,
    )
    return (
        banded.groupBy("__band", "__bucket")
        .agg(F.min("__id").alias("first_id"))
        .select(
            F.col("__band").cast("int").alias("band"),
            F.col("__bucket").cast("long").alias("bucket"),
            F.col("first_id").cast("long").alias("first_id"),
            _band_part(F.col("__bucket"), num_buckets).alias("bkt_part"),
        )
    )


def build_band_store(
    df: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    num_buckets: int = 64,
) -> None:
    """Materialize the corpus MinHash band-bucket store, hash-partitioned
    by ``bkt_part``. One-time full scan of the corpus; every later batch
    reads only the store partitions its own band buckets could live in —
    the near-dup twin of :func:`build_fingerprint_store`. On disk the
    store is ~bands·20 bytes per distinct corpus document signature, never
    the corpus itself."""
    (
        band_store_rows(
            df, text_col, id_col, num_hashes, bands, shingle_n, hash_fn, num_buckets
        )
        .repartition("bkt_part")
        .write.mode("overwrite")
        .partitionBy("bkt_part")
        .parquet(store_path)
    )


def incremental_lsh_dedup(
    spark: SparkSession,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    num_buckets: int = 64,
    update_store: bool = False,
    src_batch: int | None = None,
) -> DataFrame:
    """NEAR-duplicate incremental dedup: rows of ``batch`` that are not
    LSH-near-duplicates of the persisted corpus, nor of a lower-``id_col``
    document within the batch itself. The MinHash+LSH twin of
    :func:`incremental_dedup` — "dedupe today's crawl against the 100 TB
    historical corpus" without rescanning (or even storing) corpus text:
    only band-bucket hashes persist (~bands·20 B/doc).

    Drop rule (pairwise-greedy, deliberately non-iterative so the full
    operator is exactly expressible in ANSI SQL — the q169 oracle):
    a batch document is dropped iff ANY of its ``bands`` band buckets
    (a) exists in the corpus store, or (b) contains a smaller-id batch
    document. Every survivor is therefore the minimum id in all of its
    buckets; two survivors never share a bucket. This is the pairwise
    variant of :func:`..dedup.lsh_near_dedup`'s connected-components
    keep-min (q152): a chain a<b<c with buckets {a,b} and {b,c} keeps
    {a} under CC but {a, c} here — c has no DIRECT candidate with a
    smaller id. Within one batch that difference is the standard
    greedy-vs-transitive dedup policy choice; across batches CC would
    require corpus-wide component state, which is exactly what an
    incremental operator must not maintain.

    NULL-text rows PASS THROUGH (no signature, nothing recorded): with
    ``hash_fn="portable"`` NULL hashes to NULL, and under xxhash64 a
    NULL→seed class would near-dup "no content" against every other NULL
    doc, which is not near-duplication — route NULL/empty docs to
    :func:`incremental_dedup` (exact mode) instead. Consequence: replay
    idempotence (re-running the identical batch with ``update_store=True``
    yields zero survivors) holds for the non-NULL-text rows only.

    Each surviving document is emitted ONCE even when the feed delivered
    duplicate copies of the row (at-least-once delivery — the duprows
    soak): exact copies share an id and collapse to one row.

    ``src_batch`` (versioned mode): pass a MONOTONE batch id and the
    operator becomes REPLAY-STABLE — the store append is stamped with the
    id and the probe sees only strictly-earlier stamps (bootstrap rows
    always), so re-running the same batch with the same id returns the
    IDENTICAL survivor set instead of zero survivors. This is the
    exactly-once-decisions contract the streaming wrapper
    (:func:`..streaming.run_incremental_lsh_dedup_stream`) builds on;
    implies ``update_store``.

    Data motion per batch at any corpus scale: the batch maps to
    ~24-byte ``(id, band, bucket)`` rows (text stays in the projection);
    the store scan is pruned to the batch's touched ``bkt_part``
    partitions (at most ``num_buckets`` driver-side ints); every shuffle
    carries hash/id keys; the final anti-join on ``id_col`` is the one
    move that carries batch payload columns — batch-sized, and column
    pruning keeps ``text_col`` out of it whenever the caller's projection
    drops it (the q169 shape).

    Multi-consumer consistency (the :func:`incremental_dedup` rule): the
    batch is frozen once up front, the band rows once after the map, and
    the dropped-id set once before the store append, so the touched-bucket
    collect, the survivor set the caller actions, and the store append all
    read the same materialized rows. All three checkpoints hold
    batch-sized (never corpus-sized) rows. Single-writer store assumption,
    as for the fingerprint store.
    """
    from data_engineering_nd_datalake_project_4_spark.operators.dedup import minhash_band_rows

    keyed = batch.localCheckpoint(eager=True)
    banded = minhash_band_rows(
        keyed.filter(F.col(text_col).isNotNull()),
        text_col, id_col, num_hashes, bands, shingle_n, hash_fn,
    ).localCheckpoint(eager=True)
    # src_batch (versioned mode) implies a store append: the stamp IS the
    # replay-safety mechanism — see _banded_store_dropped
    dropped = _banded_store_dropped(
        spark, banded, store_path, num_buckets,
        update_store or src_batch is not None, src_batch,
    )
    survivors = keyed.join(
        dropped, keyed[id_col] == dropped["__id"], "left_anti"
    )
    # one output row per surviving id (exact feed copies collapse; ties
    # are identical rows, so the row_number pick is deterministic content)
    return latest_per_key(survivors, [id_col], [F.col(id_col)])


def _banded_store_dropped(
    spark: SparkSession,
    banded: DataFrame,
    store_path: str,
    num_buckets: int,
    update_store: bool,
    src_batch: int | None = None,
) -> DataFrame:
    """The shared banded-store decision core behind
    :func:`incremental_lsh_dedup` (MinHash bands over text) and
    :func:`incremental_semantic_dedup` (sign-LSH bands over vectors):
    given eagerly-checkpointed ``(__id, __band, __bucket)`` fan-out rows
    for the batch, return the CHECKPOINTED distinct set of dropped ids
    under the pairwise-greedy rule — any band bucket present in the
    store, or holding a smaller batch id. With ``update_store`` the
    survivors' buckets are appended first (same layout), so the append
    and the caller's consumption share one evaluation of the decision.

    ``src_batch`` (VERSIONED mode — the exactly-once-decisions contract
    for at-least-once feeds, used by the streaming wrappers): the store
    read sees only rows whose ``src_batch`` stamp is NULL (bootstrap
    rows written by build_*_store / unversioned batch appends — always
    visible) or STRICTLY BELOW this batch id, and the survivor append is
    stamped with this id. A replayed batch therefore ignores its own
    earlier append and reproduces IDENTICAL decisions — versioned
    replays return the same survivors, where unversioned replay returns
    zero new survivors (each doc hits its own stored bands). Requires
    monotone batch ids (Structured Streaming's foreachBatch guarantee;
    for scheduled jobs, any monotone run counter). Parquet schema
    evolution makes the two layouts one store: files written without the
    column read as NULL under the declared versioned schema."""
    # prune the store scan to the partitions this batch can touch
    touched = [
        r[0]
        for r in banded.select(_band_part(F.col("__bucket"), num_buckets).alias("b"))
        .distinct()
        .collect()
    ]
    # declared schema: a store built from an empty corpus is a valid
    # directory with zero data files (empty soak — round-7 rule). Missing
    # store = first batch; mid-swap / corrupt stores fail loudly
    # (_read_store_cold_start).
    schema = _BAND_STORE_SCHEMA + (
        ", src_batch LONG" if src_batch is not None else ""
    ) + ", bkt_part INT"
    store = _read_store_cold_start(spark, store_path, schema)
    if store is not None and src_batch is not None:
        # versioned visibility: bootstrap rows (NULL stamp) + strictly
        # earlier batches; a replay's own earlier append is invisible
        store = store.filter(
            F.col("src_batch").isNull() | (F.col("src_batch") < F.lit(int(src_batch)))
        )

    from pyspark.sql import Window

    w = Window.partitionBy("__band", "__bucket")
    killed_in_batch = (
        banded.withColumn("__min", F.min("__id").over(w))
        .filter(F.col("__min") < F.col("__id"))
        .select("__id")
    )
    if store is not None:
        seen = store.filter(F.col("bkt_part").isin(touched)).select("band", "bucket")
        hit_store = (
            banded.join(
                seen,
                (banded["__band"] == seen["band"])
                & (banded["__bucket"] == seen["bucket"]),
                "left_semi",
            ).select("__id")
        )
        dropped = killed_in_batch.union(hit_store)
    else:
        dropped = killed_in_batch
    dropped = dropped.distinct().localCheckpoint(eager=True)

    if update_store:
        surv_banded = banded.join(
            dropped, banded["__id"] == dropped["__id"], "left_anti"
        )
        cols = [
            F.col("__band").cast("int").alias("band"),
            F.col("__bucket").cast("long").alias("bucket"),
            F.col("first_id").cast("long").alias("first_id"),
        ]
        if src_batch is not None:
            # replay re-appends the same stamped rows — duplicates with
            # an identical stamp, invisible to the replaying batch itself
            # and decision-neutral for later ones (existence + min id)
            cols.append(F.lit(int(src_batch)).cast("long").alias("src_batch"))
        (
            surv_banded.groupBy("__band", "__bucket")
            .agg(F.min("__id").alias("first_id"))
            .select(*cols, _band_part(F.col("__bucket"), num_buckets).alias("bkt_part"))
            .repartition("bkt_part")
            .write.mode("append")
            .partitionBy("bkt_part")
            .parquet(store_path)
        )
    return dropped


def _sign_band_rows(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bands: int,
    band_bits: int,
) -> DataFrame:
    """Sign-LSH fan-out in the core's ``(__id, __band, __bucket)`` shape.

    Degenerate vectors get NO signature (pass-through, the q169 NULL-text
    rule): NULL vectors, EMPTY vectors (``sequence(1, 0)`` is the
    documented DESCENDING trap — the fold would otherwise yield a NULL
    proj and the all-zero signature), and vectors containing NULL
    elements (the fold NULL-propagates to all-zero where the oracle's
    ``unnest``+SUM would skip NULLs into partial sums). The q170 oracle
    excludes the NULL-element class from banding with the same
    ``list_filter`` predicate, so both engines keep all three classes.
    Zero-NORM (non-empty, all-zero) vectors still band: every plane
    projects to exactly 0 in both engines, so they dedup as a class.
    """
    from data_engineering_nd_datalake_project_4_spark.functions import valid_vector
    from data_engineering_nd_datalake_project_4_spark.operators.similarity import banded_sign_lsh_keys

    clean = df.filter(valid_vector(F.col(vec_col)))
    return banded_sign_lsh_keys(clean, id_col, vec_col, bands, band_bits).select(
        F.col(id_col).alias("__id"),
        F.col("band").alias("__band"),
        F.col("band_key").cast("long").alias("__bucket"),
    )


def build_sign_band_store(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    store_path: str,
    bands: int = 4,
    band_bits: int = 6,
    num_buckets: int = 16,
) -> None:
    """Materialize the corpus sign-LSH band-key store (the embedding twin
    of :func:`build_band_store`): one ``(band, bucket, first_id)`` row per
    distinct corpus (band, key), hash-partitioned by ``bkt_part``. On disk
    ~bands·20 B per distinct vector signature — the corpus VECTORS never
    persist and are never rescanned."""
    (
        _sign_band_rows(df, id_col, vec_col, bands, band_bits)
        .groupBy("__band", "__bucket")
        .agg(F.min("__id").alias("first_id"))
        .select(
            F.col("__band").cast("int").alias("band"),
            F.col("__bucket").cast("long").alias("bucket"),
            F.col("first_id").cast("long").alias("first_id"),
            _band_part(F.col("__bucket"), num_buckets).alias("bkt_part"),
        )
        .repartition("bkt_part")
        .write.mode("overwrite")
        .partitionBy("bkt_part")
        .parquet(store_path)
    )


def compact_band_store(
    spark: SparkSession,
    store_path: str,
    versioned: bool | None = None,
    dedup_exact: bool = False,
) -> int:
    """Compact an append-only band-bucket store in place (shared by the
    lexical MinHash store of :func:`incremental_lsh_dedup` and the
    sign-LSH store of :func:`incremental_semantic_dedup`): every
    ``update_store=True`` batch appends ~one file per ``bkt_part``
    partition, so months of daily batches leave thousands of KB-sized
    files whose per-file task + footer fetch eventually dominates the
    probe scan. One partition-preserving rewrite
    (:func:`..sources.sinks.compact_partitioned_parquet_dir`) restores
    ~one file per partition while keeping directory-level pruning intact.

    Pure layout change: the row multiset is untouched, so batch decisions
    — and replay idempotence — are identical before and after
    (``tests/test_incremental_lsh.py`` proves it). Same single-writer
    assumption as the appends themselves: don't compact concurrently with
    a batch. Returns the post-compaction data-file count.

    ``src_batch`` is ALWAYS carried through the rewrite (ADVICE r12):
    the old ``versioned=True`` opt-in meant compacting a stamped store
    with the default flag silently erased every stamp — every row became
    bootstrap-visible and the streaming wrappers' replay-stability
    contract broke with no error. Now files without the column read it
    as NULL and the rewrite writes the NULL column back, which is
    decision-neutral for unversioned probes (their declared read schema
    omits the column, so parquet prunes it) AND for a later versioned
    probe (explicit NULL == absent == bootstrap-visible). ``versioned``
    is retained for source compatibility and ignored.

    ``dedup_exact`` additionally collapses EXACT duplicate rows during
    the rewrite — the row-level reclaim for sustained at-least-once
    replay (VERDICT r12 task 4): every replayed delivery of a batch
    re-appends its surviving ``(band, bucket, first_id, src_batch)``
    rows VERBATIM (same stamp → identical rows), so k extra deliveries
    grow the store by k× the batch's surviving band rows. Identical
    rows are probe-invisible (existence + min-id semantics, and the
    stamp filter treats equal stamps equally), so ``distinct()`` is
    decision-identical — replay stability and later batches' decisions
    are untouched (tests prove it). Distinct rows from DIFFERENT
    batches/stamps are never collapsed. Default off: the plain
    compaction stays a pure layout change."""
    del versioned  # deprecated no-op — stamps are always preserved
    from data_engineering_nd_datalake_project_4_spark.sources.sinks import compact_partitioned_parquet_dir

    schema = _BAND_STORE_SCHEMA + ", src_batch LONG, bkt_part INT"
    return compact_partitioned_parquet_dir(
        spark, store_path, "bkt_part", schema=schema,
        transform=(lambda df: df.distinct()) if dedup_exact else None,
    )


def compact_fingerprint_store(
    spark: SparkSession,
    store_path: str,
    dedup_exact: bool = False,
) -> int:
    """:func:`compact_band_store` for the exact/canonical fingerprint
    store of :func:`incremental_dedup` (``fp_bucket`` layout). Same
    contracts: ``src_batch`` stamps (versioned mode) are ALWAYS carried
    through (unstamped files read the column as NULL — decision-neutral
    both ways), and ``dedup_exact`` reclaims the identical rows that
    at-least-once replays of a versioned batch re-append."""
    from data_engineering_nd_datalake_project_4_spark.sources.sinks import compact_partitioned_parquet_dir

    return compact_partitioned_parquet_dir(
        spark, store_path, "fp_bucket",
        schema="fp LONG, first_id LONG, src_batch LONG, fp_bucket INT",
        transform=(lambda df: df.distinct()) if dedup_exact else None,
    )


def incremental_semantic_dedup(
    spark: SparkSession,
    batch: DataFrame,
    id_col: str,
    vec_col: str,
    store_path: str,
    bands: int = 4,
    band_bits: int = 6,
    num_buckets: int = 16,
    update_store: bool = False,
    src_batch: int | None = None,
) -> DataFrame:
    """Incremental SEMANTIC dedup: batch vectors dropped when any of their
    sign-LSH band keys (a) exists in the persisted corpus store or (b) is
    held by a smaller-id batch vector — completing the incremental family
    (exact q130, lexical MinHash q169, semantic q170) with the same
    pairwise-greedy, exactly-SQL-expressible rule and the same
    checkpoint/pruning/append machinery (:func:`_banded_store_dropped`).

    SIGNATURE-level semantics, stated honestly: batch-mode
    :func:`..similarity.semantic_dedup` (q142) rescores candidates with
    true cosine before removing; an incremental operator cannot — the
    store holds ~bands·20 B/vec of band keys, never vectors, so there is
    nothing to rescore against without rescanning the corpus. A band-key
    hit IS the drop decision (SemDeDup-style banding as the decision
    rule, size band_bits ~ log2(N) via :func:`..similarity.
    sized_band_bits` to hold the false-collision rate flat). Routes
    needing exact-threshold semantics keep the batch operator.

    Degenerate geometry contract (the advembed soak classes): an all-zero
    vector projects to 0 on every plane (sign bit 0 everywhere), so all
    zero-norm vectors share one signature and dedup as a class — unlike
    q142, where NULL cosine never removes. NULL vectors, EMPTY vectors
    and vectors containing NULL elements all pass through (no signature,
    not recorded — see :func:`_sign_band_rows`), as q169's NULL text.

    Output: one row per distinct batch id, the batch's columns plus
    ``sem_removed`` (true = near-dup of corpus or of a smaller batch id).
    Exact feed copies collapse to one row (duprows contract)."""
    keyed = batch.localCheckpoint(eager=True)
    banded = _sign_band_rows(
        keyed, id_col, vec_col, bands, band_bits
    ).localCheckpoint(eager=True)
    # src_batch: versioned/replay-stable mode, identical contract to
    # incremental_lsh_dedup's (monotone ids, implies update_store)
    dropped = _banded_store_dropped(
        spark, banded, store_path, num_buckets,
        update_store or src_batch is not None, src_batch,
    )
    annotated = keyed.join(
        dropped, keyed[id_col] == dropped["__id"], "left"
    ).select(*keyed.columns, F.col("__id").isNotNull().alias("sem_removed"))
    return latest_per_key(annotated, [id_col], [F.col(id_col)])


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-versioning diff: classify every document across two corpus
    snapshots as ``added`` (id only in new), ``removed`` (id only in old),
    ``changed`` (id in both, content differs) or ``unchanged``. The audit
    record behind "what moved between corpus v1 and v2" — pairs with
    ``text.corpus_manifest`` (the manifest says THAT something changed;
    the diff says WHAT).

    Returns ``(id_col, status)`` — one row per id in either snapshot.

    Scale shape: each side reduces to (id, xxhash64(id, text)) 16-byte
    rows before the single full-outer shuffle join — corpus text never
    moves. Content comparison is null-safe: a NULL text on both sides is
    'unchanged' (xxhash64(NULL)=seed on both — the nulls-soak trap works
    FOR us here), NULL vs non-NULL is 'changed'.
    """
    o = old.select(
        F.col(id_col), F.xxhash64(F.col(id_col), F.col(text_col)).alias("__oh")
    )
    n = new.select(
        F.col(id_col), F.xxhash64(F.col(id_col), F.col(text_col)).alias("__nh")
    )
    return (
        o.join(n, id_col, "full_outer")
        .select(
            F.col(id_col),
            F.when(F.col("__oh").isNull(), F.lit("added"))
            .when(F.col("__nh").isNull(), F.lit("removed"))
            .when(F.col("__oh") == F.col("__nh"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )


def compact_changelog(
    changes: DataFrame,
    key: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Collapse a CDC changelog to its net effect: one row per key — the
    change with the highest ``seq_cols`` value (lexicographic). This is the
    standard log-compaction step Delta/Hudi/Kafka-compacted-topics apply
    before merging a change feed into a snapshot.

    Physical: ONE ``max_by(struct(payload), struct(seq))`` hash aggregate —
    partial map-side combine reduces each partition to its per-key winner
    before the shuffle, so shuffle volume is ~|distinct keys|, not
    |changelog|. (A row_number window would shuffle the full changelog.)

    ``seq_cols`` must totally order each key's changes (add a unique
    tie-break column — the reference's `latest_per_key` lesson,
    /root/reference/etl.py:142-146); equal-seq winners are otherwise
    nondeterministic. NULL seq values sort first in Spark's struct
    comparison (asc NULLS FIRST) — give real changes non-NULL seqs.
    """
    payload = [c for c in changes.columns if c != key]
    return changes.groupBy(key).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in seq_cols]),
        ).alias("__last")
    ).select(key, *[F.col(f"__last.{c}").alias(c) for c in payload if c not in seq_cols])


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    seq_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change feed (insert / update / delete rows) to a base
    snapshot and return the new snapshot — the batch half of a Delta/Hudi
    `MERGE`-from-changelog, composed from public DataFrame ops.

    ``changes`` carries ``key``, ``op_col`` (``'I'`` insert, ``'U'``
    update, ``'D'`` delete — I and U are both upserts here, the usual
    changelog-relaxation), ``seq_cols`` (change ordering within a key,
    must be total — see :func:`compact_changelog`) and payload columns
    named like snapshot columns. Payload columns REPLACE the snapshot
    value on upsert; snapshot columns with no payload twin are kept on
    update and NULL on fresh insert. Net-``D`` keys are dropped (a delete
    of an absent key is a no-op). Unknown op codes fail the job loudly
    (``assert_true``) rather than silently keeping or dropping rows.

    Scale shape: changelog compaction is one partial-aggregating shuffle
    on ~|distinct keys| (see :func:`compact_changelog`); the apply is one
    full-outer hash join snapshot-vs-compacted on the key. Snapshot rows
    never move twice and nothing collects. With the snapshot bucketed on
    the key (``sinks.write_bucketed_table``) its shuffle disappears.
    """
    last = compact_changelog(changes, key, seq_cols, op_col)
    payload = [c for c in last.columns if c not in (key, op_col)]
    src = last.select(
        F.col(key).alias("__chg_key"),
        F.col(op_col).alias("__chg_op"),
        *[F.col(c).alias(f"__chg_{c}") for c in payload],
    )
    j = snapshot.join(src, F.col(key) == F.col("__chg_key"), "full_outer")
    op = F.col("__chg_op")
    has_chg_row = F.col("__chg_key").isNotNull()
    # op is legitimately NULL only on unmatched SNAPSHOT rows (no change row).
    # A change row with NULL op must trip assert_true loudly — `op.isNull() |`
    # would admit it, and the three-valued delete filter below would then
    # silently DROP its key (~NULL -> NULL -> filtered).
    known = ~has_chg_row | op.isin("I", "U", "D")
    # concat NULL-propagates: coalesce op or a NULL-op failure reports "null"
    guard = F.assert_true(
        known,
        F.concat(
            F.lit("apply_changelog: unknown op "), F.coalesce(op, F.lit("<NULL>"))
        ),
    )
    has_chg = F.col("__chg_key").isNotNull()
    src_only = F.col(key).isNull() & has_chg
    upsert = has_chg & op.isin("I", "U")
    out = []
    for c in snapshot.columns:
        if c == key:
            col = F.coalesce(F.col(key), F.col("__chg_key"))
        elif c in payload:
            col = F.when(upsert, F.col(f"__chg_{c}")).otherwise(F.col(c))
        else:
            # no payload twin: kept on update, NULL on fresh insert
            col = F.when(src_only, F.lit(None)).otherwise(F.col(c))
        out.append(col.alias(c))
    # assert_true is NULL when it passes; filtering on its coalesced TRUE
    # keeps the guard alive in the plan without dropping rows
    # coalesce: NULL op must not three-valued-NULL the predicate (the row
    # survives here so the assert_true guard gets to see it and fail)
    return j.filter(~(has_chg & F.coalesce(op == "D", F.lit(False)))).filter(
        F.coalesce(guard.cast("boolean"), F.lit(True))
    ).select(*out)
