"""Graph analytics over DataFrame edge lists.

Complements :func:`dedup.connected_components` (the dedup-cluster step)
with PageRank — the published corpus-curation use is host/domain ranking
over the web link graph (Common Crawl publishes exactly this as its
host-level ranking; quality filters consume it as a feature).

Design: iterative mass-passing with a DRIVER loop over iterations (never
over rows) — each round is one edges⨝ranks join + one groupBy sum, the
same building blocks as label propagation. ``localCheckpoint`` truncates
lineage per round. The determinism trick that makes a floating-point
fixpoint oracle-checkable: every per-edge contribution is quantized to
DECIMAL(28,18) BEFORE the per-node SUM, so the sum is exact and
order-independent; the remaining per-row ops (rank/degree division,
damping multiply-add) are single IEEE operations on identical inputs —
bit-identical cross-engine, no transcendentals anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list (duplicate edges are collapsed —
    multiplicity does not add mass). Returns ``(node, rank)``.

    Per iteration: r'(v) = (1-d)/N + d · Σ_{u→v} quant(r(u)/outdeg(u)).
    Dangling mass (nodes without out-edges) is dropped, not redistributed
    — the simple variant; ranks then sum to < 1, which ranking consumers
    don't care about. N counts distinct nodes on either edge end.

    Scale shape: ``iters`` rounds of (edges ⨝ ranks on src: one shuffle
    keyed by the 8-byte node id) + (partial-aggregating sum keyed by dst).
    outdeg is computed once. Driver state is the two scalars (N-derived
    teleport terms), never row data.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        # empty edge list: return an empty (node, rank) frame instead of
        # letting the teleport term raise an opaque ZeroDivisionError
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    teleport = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).cast("decimal(28,18)").alias("__c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(F.col("__s").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
