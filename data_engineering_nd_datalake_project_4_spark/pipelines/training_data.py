"""Training-data curation pipeline: the LLM-pipeline operators composed
into the standard corpus-prep flow —

    score (lang-ID, quality, token counts)
      → quality filter
      → exact dedup (64-bit content hash)
      → canonical near-dedup (keep lowest doc_id per token-set group)
      → per-language corpus stats

Everything is one declarative DataFrame chain: Catalyst fuses the scoring
projections, the two dedups are one window each over an 8-byte hash key
(document text never becomes a shuffle key), and the stats are a
partial+final aggregate. At 100 TB the near-dedup stage would be preceded
by MinHash/LSH candidate pruning (operators.dedup) — the exact canonical
pass here doubles as its verifier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators.dedup import canonical_text_key
from data_engineering_nd_datalake_project_4_spark.operators.text import (
    lang_id,
    quality_score,
    token_count,
)


def score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach lang_pred, quality, n_tokens (pure scalar projections)."""
    return df.withColumns(
        {
            "lang_pred": lang_id(text_col),
            "quality": quality_score(text_col),
            "n_tokens": token_count(text_col),
        }
    )


def keep_first_per_key(df: DataFrame, key: Column, id_col: str) -> Column | DataFrame:
    """Keep the lowest-id row per key — the curation-standard deterministic
    survivor rule. One window over the (hashed) key."""
    w = Window.partitionBy(key).orderBy(F.asc(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
) -> DataFrame:
    """Full curation flow → the surviving, scored documents."""
    scored = score(df, text_col)
    filtered = scored.filter(F.col("quality") >= min_quality)
    exact = keep_first_per_key(filtered, F.xxhash64(F.col(text_col)), id_col)
    near = keep_first_per_key(exact, F.xxhash64(canonical_text_key(text_col)), id_col)
    return near


def corpus_stats(survivors: DataFrame, group_col: str = "lang") -> DataFrame:
    # avg = exact dec4-sum / count: ROUND(AVG, 3) of 4-decimal quality scores
    # sits on x.xxx5 half-boundaries where Spark and DuckDB rounding disagree
    from data_engineering_nd_datalake_project_4_spark.functions import dec4

    return (
        survivors.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum(dec4("quality")).cast("double") / F.count(F.lit(1))).alias(
                "avg_quality"
            ),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy(group_col)
    )
