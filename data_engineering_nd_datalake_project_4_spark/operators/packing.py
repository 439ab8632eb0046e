"""Sequence packing: assemble documents into fixed-token-budget training
sequences — the step between a curated corpus and a training shard. The
reference has no analogue (its pipeline stops at analytical tables); this
is part of the LLM-training-data surface SURVEY.md §2 extends.

Packing is inherently sequential WITHIN a pack, so the scale design makes
the sequential unit the SHARD, not the corpus: documents are spread over
``n_shards`` deterministic shards (training shards are independent by
construction — they are consumed by different data-loader workers), and
all packing state lives within one shard. One exchange on the shard key,
then either a per-shard window cumsum (pure Catalyst) or a per-shard
Arrow-batched pass (exact capacity) — no global sequential bottleneck, and
1000 shards at 100 TB parallelize exactly like 8 shards at test scale.

Two packers, one trade each way:

- :func:`pack_greedy_contiguous` — pure Catalyst (window cumsum). A doc
  that straddles a ``target_tokens`` boundary belongs to the pack it
  STARTS in, so packs can overflow by up to one doc — the standard
  "document packing, split on read" layout. Exactly SQL-expressible
  (oracle-checkable).
- :func:`pack_first_fit` — exact capacity: a doc that would overflow the
  open pack closes it and opens the next, so no pack ever exceeds
  ``target_tokens`` unless a single doc alone does. The open-pack state is
  a prefix-dependent recursion no window frame expresses, so it runs as a
  per-shard ``applyInPandas`` (one Arrow batch per shard, sequential only
  within the shard) — property-tested rather than oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators.text import token_count


def _sharded_counts(
    df: DataFrame, text_col: str, id_col: str, n_shards: int
) -> DataFrame:
    """(id, n_tok, shard_id): narrow projection — the shuffle that follows
    moves three numeric columns, never the document text."""
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tok"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard_id"),
    )


def pack_greedy_contiguous(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_tokens: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Greedy contiguous packing: within each shard (docs in ``id_col``
    order) a doc joins the pack its cumulative-token START position falls
    in. Returns ``(id, shard_id, pack_id, n_tok, start_tok)``.

    One shuffle (shard key), one window pass. Deterministic: the shard
    function is ``id % n_shards`` so an oracle can replicate it; a
    production corpus with arbitrary ids would use ``pmod(xxhash64(id))``
    — same plan shape.
    """
    if target_tokens <= 0:
        raise ValueError(f"target_tokens must be positive, got {target_tokens}")
    # ROWS frame pinned: Spark's default frame for an ordered window is
    # RANGE, which sums ALL order-key peers at once — under duplicate ids
    # (at-least-once feeds, the duprows soak) each copy must occupy its
    # OWN token span, which is ROWS semantics (and what the oracle pins)
    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    start = (cum - F.col("n_tok")).alias("start_tok")
    return _sharded_counts(df, text_col, id_col, n_shards).select(
        F.col(id_col),
        "shard_id",
        F.floor((cum - F.col("n_tok")) / target_tokens).cast("int").alias("pack_id"),
        "n_tok",
        start,
    )


def token_budget_subsample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget_tokens: int,
    order_by,
    by: str | None = None,
) -> DataFrame:
    """Select documents under a total token budget, best-first — the data
    mixing step: sample N tokens out of an M-token corpus in a declared
    quality order (e.g. sample 1T tokens of a 10T crawl for one training
    run).

    ``order_by`` is the list of ordering columns (must totally order rows,
    e.g. ``[F.desc("quality"), F.asc(id)]``). With ``by``, the budget is
    split across strata proportionally to their token mass —
    ``floor(budget · (massₛ/mass))`` computed share-first in double (one
    correctly-rounded division, one multiply: deterministic cross-engine,
    and no BIGINT wrap even at 1T-token budgets × 1T-token strata) — and
    the prefix-cumsum window is PER STRATUM — the
    scale path: the one shuffle is on the stratum key and no partition
    sees more than one stratum's rows. Without ``by`` the cumsum is a
    single global window — fine for driver-side corpora, serialized at
    scale; pass ``by`` (source, language, shard) on anything big.

    Returns the selected rows: ``(id_col, [by,] n_tok, cum_tok)``.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    keys = [by] if by else []
    # keep every original column: order_by may reference any of them
    t = df.withColumn("n_tok", token_count(text_col))
    if by:
        strata = t.groupBy(by).agg(F.sum("n_tok").alias("__s"))
        total = t.agg(F.sum("n_tok").alias("__g"))
        # share-first double math: __s/__g is one correctly-rounded double
        # division, × budget one multiply — deterministic cross-engine AND
        # overflow-free at the advertised scale (budget·mass as BIGINT
        # would wrap at 1T-token budgets × 1T-token strata)
        budgets = strata.crossJoin(F.broadcast(total)).select(
            by,
            F.floor(
                F.lit(float(budget_tokens))
                * (F.col("__s").cast("double") / F.col("__g"))
            ).cast("long").alias("__budget"),
        )
        # ROWS frame pinned (same reasoning as pack_greedy_contiguous):
        # under duplicate rows the budget must admit copies one at a time,
        # not all order-key peers at once (RANGE, the Spark default)
        w = (
            Window.partitionBy(by)
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        keyed = t.join(F.broadcast(budgets), by)
    else:
        w = (
            Window.partitionBy()
            .orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        keyed = t.withColumn("__budget", F.lit(int(budget_tokens)))
    out = keyed.withColumn("cum_tok", F.sum("n_tok").over(w)).filter(
        F.col("cum_tok") <= F.col("__budget")
    )
    return out.select(F.col(id_col), *keys, "n_tok", "cum_tok")


#: modulus/multipliers for the portable epoch-shuffle hash. 2^31 keeps
#: every intermediate product below 2^63: Spark longs would silently wrap
#: past that, while DuckDB BIGINT multiplication ERRORS — staying under the
#: bound is what makes the key bit-identical (and oracle-checkable) on both
#: engines. MUL1 is Knuth's golden-ratio multiplicative constant, MUL2 is
#: xxHash PRIME32_2 — two multiply-mod rounds disperse sequential ids well
#: enough for data ordering (this is a reproducible pseudo-shuffle, not
#: cryptography; swap xxhash64 in via shuffle key_col for adversarial
#: settings and lose only the cross-engine oracle).
SHUFFLE_MOD = 2_147_483_648
_SHUFFLE_MUL1 = 2_654_435_761
_SHUFFLE_MUL2 = 2_246_822_519


def epoch_shuffle_key(id_col, seed: int, epoch: int = 0):
    """Deterministic per-(seed, epoch) pseudo-random key for a document id:
    ``((id + salt)·MUL1 mod 2³¹)·MUL2 + salt mod 2³¹``. Pure Catalyst
    arithmetic, reproducible across engines, sessions and cluster sizes —
    the property a training run needs from its data order. Ids ≥ 2³¹ fold
    by pmod first (key ties are broken by id downstream)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    salt = (seed * 1_000_003 + epoch * 7_368_787) % SHUFFLE_MOD
    a = F.pmod(F.pmod(c, F.lit(SHUFFLE_MOD)) + F.lit(salt), F.lit(SHUFFLE_MOD))
    k1 = F.pmod(a * F.lit(_SHUFFLE_MUL1), F.lit(SHUFFLE_MOD))
    return F.pmod(k1 * F.lit(_SHUFFLE_MUL2) + F.lit(salt), F.lit(SHUFFLE_MOD))


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int,
    epoch: int = 0,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic corpus shuffle for one training epoch: every row gets
    ``(shuffle_key, shard_id, pos)`` where ``pos`` is its 1-based position
    within its shard's shuffled order. The standard step between token-
    budget mixing (q137) and sequence packing (q135): each epoch re-orders
    the corpus by re-seeding, each data-loader worker reads one shard in
    ``pos`` order.

    Scale shape: the key is map-side arithmetic; position is a per-SHARD
    window (``row_number`` over ``shuffle_key``), so the one shuffle
    partitions by ``shard_id`` and no task sorts more than corpus/n_shards
    rows — a GLOBAL shuffled position would serialize the corpus through
    one window partition. Ties on the folded key are broken by id: the
    order is total and replay-identical.
    """
    key = epoch_shuffle_key(id_col, seed, epoch)
    w = Window.partitionBy("shard_id").orderBy("shuffle_key", id_col)
    return (
        df.withColumn("shuffle_key", key)
        .withColumn("shard_id", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w))
    )


def epoch_sample(
    df: DataFrame,
    id_col: str,
    seed: int,
    epoch: int = 0,
    fraction: float = 0.5,
) -> DataFrame:
    """Per-epoch without-replacement subsample: keep rows whose epoch
    shuffle key falls below ``fraction`` of the key space. Within an epoch
    each doc appears at most once (threshold selection, no replacement);
    across epochs the subsets decorrelate because the salt re-seeds the
    key. Deterministic — re-running an epoch yields byte-identical data —
    and map-side only (a filter; no shuffle, no sample() RNG state).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * SHUFFLE_MOD)
    return df.filter(epoch_shuffle_key(id_col, seed, epoch) < F.lit(threshold))


def pack_first_fit(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_tokens: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Exact-capacity packing: docs close the open pack rather than
    straddle it. Per-shard sequential state via ``applyInPandas`` (Arrow
    batch per shard; the narrow (id, n_tok) projection is what shuffles).
    Returns ``(id, shard_id, pack_id, n_tok)``.
    """
    if target_tokens <= 0:
        raise ValueError(f"target_tokens must be positive, got {target_tokens}")
    counts = _sharded_counts(df, text_col, id_col, n_shards)
    id_name = id_col  # plain string: the closure must not capture DataFrames

    def pack(pdf):
        pdf = pdf.sort_values(id_name).reset_index(drop=True)
        pack_ids, pid, filled = [], 0, 0
        for n in pdf["n_tok"]:
            if filled > 0 and filled + n > target_tokens:
                pid += 1
                filled = 0
            pack_ids.append(pid)
            filled += n
        pdf["pack_id"] = pack_ids
        return pdf

    out_schema = f"{id_name} long, n_tok int, shard_id int, pack_id int"
    return (
        counts.groupBy("shard_id")
        .applyInPandas(pack, out_schema)
        .select(id_name, "shard_id", "pack_id", "n_tok")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    fractions: tuple[float, float, float] = (0.8, 0.1, 0.1),
    seed: int = 0,
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment: the portable
    :func:`epoch_shuffle_key` is threshold-partitioned into three key
    ranges, so every row gets exactly one ``split`` label ('train' /
    'val' / 'test'), the assignment is reproducible across engines,
    sessions and cluster sizes (no RNG state, no ``randomSplit``
    partition-dependence), and re-running on a grown corpus keeps every
    previously-assigned row in its split (hash-stable — the property a
    training pipeline needs so val examples never leak into train after
    an append).

    Map-side only: one arithmetic key + two comparisons per row; no
    shuffle, no sample(). Thresholds are integers in the 2³¹ key space —
    exactly replicable in the DuckDB oracle (q157). ``fractions`` must
    sum to 1 (±1e-9); expected split sizes are fraction-proportional with
    the usual hash-binomial variance.
    """
    f_train, f_val, f_test = fractions
    if abs(f_train + f_val + f_test - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    if min(fractions) < 0:
        raise ValueError(f"fractions must be non-negative, got {fractions}")
    t1 = int(f_train * SHUFFLE_MOD)
    t2 = int((f_train + f_val) * SHUFFLE_MOD)
    key = epoch_shuffle_key(id_col, seed)
    return df.withColumn(
        "split",
        F.when(key < F.lit(t1), F.lit("train"))
        .when(key < F.lit(t2), F.lit("val"))
        .otherwise(F.lit("test")),
    )
