"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the oracle-checked baseline (SURVEY.md Q30).
The scale paths are:

- :func:`ivf_topk` — IVF-style coarse quantization: assign every vector to
  its nearest of K centroids (one broadcast join), then search only the
  ``nprobe`` closest centroids' buckets. Turns O(N·Q) into O(N·Q·nprobe/K)
  with a shuffle keyed by bucket id.
- :func:`random_projection_buckets` — sign-LSH bucketing for near-dup style
  lookups.

All pure Catalyst expressions (zip_with/aggregate) — vectorized JVM-side,
no Python on the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.functions import (
    as_double_array,
    cosine_similarity,
    dot_product,
    l2_norm,
)


def _unit(vec: Column) -> Column:
    """Unit-normalize an array<float|double> column in one pass; cosine of
    unit vectors is a plain dot product."""
    vd = as_double_array(vec)
    n = l2_norm(vd)
    return F.transform(vd, lambda x: x / n)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast the (small) query set against the full vector
    table — a BroadcastNestedLoopJoin-free equi-less join expressed as a
    crossJoin of the broadcast side; ranking is a window partitioned by
    query id. The big side streams through codegen once; no O(N²) shuffle.

    Output: ``query_id, neighbor_id, sim`` (double, unrounded).
    """
    # Pre-normalize each side ONCE (O(N) + O(Q) array passes) so the O(N·Q)
    # pairwise kernel is a single dot product instead of dot + two norms.
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _unit(F.col(vec_col)).alias("__qv"),
        )
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), _unit(F.col(vec_col)).alias("__vv")
    )
    scored = (
        v.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot_product(F.col("__qv"), F.col("__vv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def assign_ivf_buckets(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine). One broadcast
    join + window; adds a ``bucket`` column."""
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id).alias("__cid"), F.col(centroid_vec).alias("__cv")
        )
    )
    scored = vectors.crossJoin(c).withColumn(
        "__csim", cosine_similarity(F.col(vec_col), F.col("__cv"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__csim"), F.asc("__cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*vectors.columns, F.col("__cid").alias("bucket"))
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Approximate top-k: only vectors in the query's ``nprobe`` nearest
    centroid buckets are scored. Recall < 1.0 by construction; recall vs
    :func:`brute_force_topk` is property-tested, not oracle-hashed."""
    cid = centroids.columns[0]
    cvec = centroids.columns[1]
    bucketed = assign_ivf_buckets(vectors, centroids, id_col, vec_col, cid, cvec)

    c = F.broadcast(
        centroids.select(F.col(cid).alias("__cid"), F.col(cvec).alias("__cv"))
    )
    qscored = queries.crossJoin(c).withColumn(
        "__csim", cosine_similarity(F.col(vec_col), F.col("__cv"))
    )
    wq = Window.partitionBy(id_col).orderBy(F.desc("__csim"), F.asc("__cid"))
    probes = (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.col("__cid").alias("bucket"),
        )
    )
    cand = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__vv"), "bucket"
    )
    scored = (
        F.broadcast(probes)
        .join(cand, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", cosine_similarity(F.col("__qv"), F.col("__vv")).alias("sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def random_projection_buckets(
    vectors: DataFrame,
    vec_col: str = "embedding",
    n_bits: int = 8,
) -> DataFrame:
    """Sign-LSH bucket id (0..2^n_bits-1) from deterministic pseudo-random
    hyperplanes: plane j weight for dim i = sin((i+1)·(j+1)) — deterministic
    across engines and runs, no stored model. Adds ``rp_bucket``."""
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def plane_bit(j: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vd,
                F.transform(F.sequence(F.lit(1), F.size(vd)), lambda i: F.sin(i.cast("double") * (j + 1))),
                lambda x, wgt: x * wgt,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj > 0, F.lit(2 ** j)).otherwise(F.lit(0))

    bucket = F.lit(0)
    for j in range(n_bits):
        bucket = bucket + plane_bit(j)
    return vectors.withColumn("rp_bucket", bucket.cast("int"))
