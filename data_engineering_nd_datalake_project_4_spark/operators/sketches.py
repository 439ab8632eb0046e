"""Mergeable sketch operators: Count-Min frequency estimation.

Completes the engine's sketch family (HLL distinct counts via
``approx_count_distinct`` — q45; rank/percentile sketch via
``approx_percentile`` — q60) with a frequency sketch. The point of a CMS
at 100 TB: the sketch table is a FIXED ``depth × width`` grid of counters
(kilobytes) built in one scan with map-side partial aggregation; point
queries after that are O(depth) lookups against the tiny table — no
second scan of the data, and sketches from separate partitions/days merge
by cell-wise addition.

Pure Catalyst: the d hash rows come from ``xxhash64(col, seed_i)`` (the
extra literal argument reseeds the hash), bucketing via ``pmod``. No UDF,
no driver-side state.

The reference has no sketches (it has no aggregates beyond MAX —
/root/reference/etl.py:143); this is a north-star extension.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.functions import portable_hash60


def _cms_bucket(value: Column, row: Column, width: int, hash_fn: str) -> Column:
    """Seeded bucket hash for one CMS row. ``xxhash64`` seeds via the
    extra argument; ``portable`` (functions.portable_hash60 — exactly
    computable in DuckDB) seeds by appending chr(0) + row index to the
    value string: ``v || chr(0) || row``, the same construction the
    oracle writes."""
    if hash_fn == "portable":
        seeded = F.concat(value.cast("string"), F.lit("\x00"), row.cast("string"))
        return F.pmod(portable_hash60(seeded), F.lit(width))
    if hash_fn != "xxhash64":
        raise ValueError(f"hash_fn must be 'xxhash64' or 'portable', got {hash_fn!r}")
    return F.pmod(F.xxhash64(value, row), F.lit(width))


def build_cms(
    df: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One-scan Count-Min sketch: DataFrame[row, bucket, cnt] with
    ``depth`` hash rows of ``width`` buckets. Error: overestimate only,
    ≤ e/width · N with probability 1 - e^-depth. ``hash_fn='portable'``
    makes the whole sketch (and every estimate from it) bit-identical in
    a DuckDB oracle at ~2-3× hashing cost — default stays xxhash64."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    return (
        df.select(F.col(col).alias("__v"))
        .select("__v", rows)
        .select(
            "row",
            _cms_bucket(F.col("__v"), F.col("row"), width, hash_fn).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, depth): cell-wise
    addition — the property that makes CMS distributable (per-partition /
    per-day sketches combine without touching row data)."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 2048,
    depth: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Estimated frequency for each distinct value in ``items[col]``:
    min over the depth hash rows of the matching bucket counters. The
    sketch side is broadcast (it is depth × width rows at most).
    ``hash_fn`` must match the sketch's build."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    probes = (
        items.select(F.col(col).alias("item"))
        .distinct()
        .select("item", rows)
        .select(
            "item",
            "row",
            _cms_bucket(F.col("item"), F.col("row"), width, hash_fn).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy("item")
        .agg(F.min("cnt").alias("est"))
    )


# ---------------------------------------------------------------------------
# Explicit HyperLogLog on the portable hash (oracle-checkable distinct count)
# ---------------------------------------------------------------------------

def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias-correction constant for m >= 128."""
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame, col: str, p: int = 12, group_cols: Sequence[str] = ()
) -> DataFrame:
    """HyperLogLog registers as a DataFrame[bucket, reg] — the classic
    algorithm implemented as ONE partial-aggregating groupBy over the
    portable 60-bit hash, so (unlike ``approx_count_distinct`` /
    ``hll_sketch_agg``, whose register layout is engine-internal) the
    sketch is exactly computable by a DuckDB oracle:

    - bucket = low ``p`` hash bits; w = the remaining ``60 - p`` bits;
    - rho(w) = trailing-zero count of w + 1, computed EXACTLY in integer
      arithmetic as ``bit_count((w & -w) - 1) + 1`` (w = 0 → 60 - p + 1)
      — no float log2, whose rounding at exact powers of two differs
      between libm implementations;
    - reg = MAX(rho) per bucket. Empty buckets are NOT materialized —
      estimators recover them as ``m - count(buckets)``.

    The register table is ≤ 2^p rows of two ints: mergeable across
    shards/days by MAX, broadcastable, and the only state at 100 TB.
    NULLs are excluded (COUNT DISTINCT semantics).

    ``group_cols`` builds one independent sketch per group (≤ 2^p rows
    EACH) in the same single pass — the "distinct per tag/day/shard"
    shape without per-group scans."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    maxrho = 60 - p + 1
    h = portable_hash60(F.col(col).cast("string"))
    w = F.shiftright(h, p)
    lsb = w.bitwiseAND(-w)
    rho = F.when(w == 0, F.lit(maxrho)).otherwise(F.bit_count(lsb - 1) + 1)
    gcols = list(group_cols)
    return (
        df.filter(F.col(col).isNotNull())
        .select(*gcols, F.pmod(h, F.lit(m)).alias("bucket"), rho.alias("rho"))
        .groupBy(*gcols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(
    registers: DataFrame, p: int = 12, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Distinct-count estimate from :func:`hll_registers` output — one
    row, ``est`` (double, rounded to 3).

    Determinism across engines: the indicator sum Z = Σ 2^-reg is scaled
    by 2^(60-p+1) so every term is an INTEGER (exact, order-independent —
    a float Σ2^-reg loses associativity once exponents spread past the
    53-bit significand) and only the final alpha·m²/Z division happens in
    doubles (single correctly-rounded op). The small-range branch uses
    linear counting m·ln(m/V) — ln is the one transcendental: 1-ulp
    libm divergence can flip a ROUND(·,3) boundary with probability
    ~measure-zero per CLAUDE.md's accepted class."""
    m = 1 << p
    scale = 60 - p + 1
    # exact integer indicator: empty buckets (m - n) contribute 2^scale
    num = float(_hll_alpha(m) * m * m * (1 << scale))
    gcols = list(group_cols)
    agg = registers.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.lit(scale) - F.col("reg")).cast("int")
            )
        ).alias("__z"),
    )
    v = F.lit(m) - F.col("__n")
    z = F.coalesce(F.col("__z"), F.lit(0)) + v * F.lit(1 << scale).cast("long")
    raw = F.lit(num) / z.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    ).otherwise(raw)
    return agg.select(*gcols, F.round(est, 3).alias("est"))
