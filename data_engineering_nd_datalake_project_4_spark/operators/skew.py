"""Skew mitigation (SURVEY.md §2.2 design rule; BASELINE.json 100-TB goal).

AQE's skew-join splitting handles moderate skew automatically (on by
default in session.py). These operators are for the pathological cases AQE
can't fix — a single join key holding a double-digit percentage of the
fact table:

- :func:`salted_join`: split each hot key into ``n_salts`` sub-keys by
  salting the big side with a deterministic hash and replicating the small
  side once per salt. The shuffle then spreads each hot key over
  ``n_salts`` reducers. Cost: small side × n_salts.
- :func:`skewed_keys`: find the keys worth salting (frequency above a
  threshold) so the replication cost is paid only for the hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skewed_keys(df: DataFrame, key: str, min_share: float = 0.01) -> DataFrame:
    """Keys holding at least ``min_share`` of the rows — candidates for
    salting. ONE pass over the input: the total comes from summing the
    (key-cardinality-sized) aggregated counts with an unpartitioned window,
    not from a second full-table ``count()``."""
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return (
        counts.withColumn("__total", total)
        .filter(F.col("n") >= F.col("__total") * min_share)
        .select(key, "n")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_source: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is heavily skewed.

    The big side gets ``salt = pmod(xxhash64(salt_source), n_salts)``
    (``salt_source`` defaults to the whole row's columns — deterministic,
    no rand() so retries/speculative tasks agree); the small side is
    replicated once per salt via an explode. The join key becomes
    ``(key, salt)`` → each hot key spreads over ``n_salts`` partitions.

    Equivalent to the unsalted join for inner/left joins keyed on ``key``.
    """
    if salt_source is None:
        salt_source = F.xxhash64(*[F.col(c) for c in big.columns])
    b = big.withColumn("__salt", F.pmod(salt_source, F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
