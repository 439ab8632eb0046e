"""Skew mitigation (SURVEY.md §2.2 design rule; BASELINE.json 100-TB goal).

AQE's skew-join splitting handles moderate skew automatically (on by
default in session.py). These operators are for the pathological cases AQE
can't fix — a single join key holding a double-digit percentage of the
fact table:

- :func:`salted_join`: split each hot key into ``n_salts`` sub-keys by
  salting the big side and replicating the small side once per salt. The
  shuffle then spreads each hot key over ``n_salts`` reducers. Cost: small
  side × n_salts.
- :func:`skewed_keys`: find the keys worth salting (frequency above a
  threshold) so the replication cost is paid only for the hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skewed_keys(df: DataFrame, key: str, min_share: float = 0.01) -> DataFrame:
    """Keys holding at least ``min_share`` of the rows — candidates for
    salting. ONE pass over the input: the total comes from a scalar
    aggregate of the (key-cardinality-sized) counts, broadcast back with a
    1-row cross join — NOT an unpartitioned window, which would shuffle
    every distinct key's count row to a single reducer (a single-task
    bottleneck at hundreds of millions of distinct keys), and not a second
    full-table ``count()``."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
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

    The big side gets a per-row salt; the small side is replicated once
    per salt via an explode. The join key becomes ``(key, salt)`` → each
    hot key spreads over ``n_salts`` partitions.

    The default salt is ``pmod(monotonically_increasing_id(), n_salts)``:
    genuinely per-ROW, so a hot key made of exact-duplicate rows (the
    post-explode fact-table case) still spreads — a content hash would
    give every duplicate the same salt and leave the straggler in place.
    The salt VALUE never affects the result (the small side carries every
    salt, so any row matches under any salt); determinism of the output is
    unaffected by the nondeterministic id. Pass ``salt_source`` to use a
    content-derived salt instead (e.g. when speculative-task stability of
    the intermediate salt column itself matters).

    ONLY inner/left_semi/left joins are equivalent to the unsalted join:
    any join that null-extends or keeps unmatched SMALL-side rows
    (right/full/left_anti from the small side's view) would emit each
    unmatched small row once per salt. Those are rejected loudly.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): only {sorted(allowed)} are "
            "equivalent to the unsalted join — right/full joins would "
            "duplicate every unmatched small-side row n_salts times"
        )
    if salt_source is None:
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
