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

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.functions import (
    as_double_array,
    cosine_similarity,
    dot_product,
    l2_norm,
    valid_vector,
)


def _unit(vec: Column) -> Column:
    """Unit-normalize an array<float|double> column in one pass; cosine of
    unit vectors is a plain dot product. A zero-norm vector normalizes to
    all-NULL elements (``try_divide``, not an ANSI DIVIDE_BY_ZERO crash),
    so every sim against it is NULL — dropping out of thresholds and
    ranks exactly like the oracle's NULL-on-zero-divisor division."""
    vd = as_double_array(vec)
    n = l2_norm(vd)
    return F.transform(vd, lambda x: F.try_divide(x, n))


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

    Degenerate vectors (NULL / empty / NULL-element — ``valid_vector``)
    are excluded from both sides: no cross-engine cosine exists for them
    (advembed soak), so they are neither queries nor neighbors. Pairs of
    UNEQUAL dimension are non-candidates (the raggeddim soak — a
    mid-corpus embedding-model switch leaves mixed-dim tables; cosine
    across models is undefined, Spark's zip_with would pad to a NULL sim
    while DuckDB's list functions ERROR): each query ranks only
    neighbors of its own dimension.
    """
    from data_engineering_nd_datalake_project_4_spark.operators import ensure_map_parallelism

    vectors = vectors.filter(valid_vector(F.col(vec_col)))
    queries = queries.filter(valid_vector(F.col(vec_col)))
    # the O(N·Q) scoring kernel must not run on one unsplittable partition
    vectors = ensure_map_parallelism(vectors)
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
        # same-dimension pairs only (raggeddim contract)
        .filter(F.size("__vv") == F.size("__qv"))
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


#: Hard cap on plan-folded centroid literals (doubles) for the map-side
#: nearest-centroid expressions. Past it, fall back to the broadcast-join
#: + window path — the pq_adc lesson: a plan that grows with the model
#: needs an explicit budget, not hope.
_MAX_CENTROID_PLAN_DOUBLES = 1 << 16


def _collect_centroid_model(
    centroids: DataFrame, centroid_id: str, centroid_vec: str
) -> list[tuple]:
    """``[(cid, [float, ...]), ...]`` ordered by cid — bounded driver-side
    model state (k·dim floats), the same contract as kmeans centroids and
    PQ codebooks."""
    rows = centroids.select(centroid_id, centroid_vec).collect()
    out = [(r[0], [float(x) for x in (r[1] or [])]) for r in rows]
    out.sort(key=lambda t: (t[0] is None, t[0]))
    return out


def _nearest_centroid_keys(vec: Column, cents: list[tuple]) -> Column:
    """``array<struct<k,c>>`` with ``k = -cosine(vec, centroid)`` (NULL →
    +inf): ascending struct order is exactly ``cosine DESC NULLS LAST,
    cid ASC`` — the order the shuffled fallback's window uses, so both
    paths pick identical buckets (ties and zero-norm vectors included)."""
    return F.array(
        *[
            F.struct(
                F.coalesce(
                    -cosine_similarity(vec, F.array(*[F.lit(x) for x in cv])),
                    F.lit(float("inf")),
                ).alias("k"),
                F.lit(cid).alias("c"),
            )
            for cid, cv in cents
        ]
    )


def _centroid_plan_fits(cents: list[tuple]) -> bool:
    return (
        not cents
        or len(cents) * max(len(cv) for _, cv in cents) <= _MAX_CENTROID_PLAN_DOUBLES
    )


def assign_ivf_buckets(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, ties to the
    lowest centroid id); adds a ``bucket`` column.

    MAP-SIDE: the centroid model folds into the plan as literals and every
    row evaluates one argmin expression — ZERO shuffles, like
    :func:`pq_encode` / :func:`ivfpq_encode`. The previous shape
    (broadcast crossJoin + row_number window) pushed |V|·C vector-carrying
    rows through a ``hashpartitioning(id)`` exchange — C× the corpus over
    the wire, exactly what the repo-wide wide-shuffle audit
    (``plans.wide_shuffle_sites``) exists to catch. Models past the
    literal budget fall back to that path (``_assign_ivf_buckets_shuffled``).

    Degenerate vectors (``valid_vector``) get NO bucket (row dropped):
    there is no distance to be nearest by, and the map-side argmin would
    otherwise tie-break them all into centroid 0 while the SQL twin's
    NULL-ordering does the same only by accident of NULLS placement.
    Vectors whose dimension differs from the model's (the raggeddim
    contract) are unassignable for the same reason.
    """
    vectors = vectors.filter(valid_vector(F.col(vec_col)))
    cents = _collect_centroid_model(centroids, centroid_id, centroid_vec)
    if cents:
        vectors = vectors.filter(F.size(F.col(vec_col)) == len(cents[0][1]))
    if not _centroid_plan_fits(cents):
        return _assign_ivf_buckets_shuffled(
            vectors, centroids, id_col, vec_col, centroid_id, centroid_vec
        )
    if not cents:
        # empty model (trained on zero rows): no assignments, but the
        # output schema must still carry a typed bucket column (empty soak)
        return vectors.limit(0).withColumn(
            "bucket", F.lit(None).cast(centroids.schema[centroid_id].dataType)
        )
    from data_engineering_nd_datalake_project_4_spark.operators import ensure_map_parallelism

    vectors = ensure_map_parallelism(vectors)
    keys = _nearest_centroid_keys(F.col(vec_col), cents)
    # r14: coalesce makes `bucket` NON-NULLABLE (array_min's static
    # nullability is true even over this never-empty literal array), so a
    # downstream equi-join cannot infer isnotnull(bucket) and push the
    # whole argmin into the scan filter as a second evaluation (q42's
    # before-plan carried a 38 kB filter with 30 re-run aggregates). The
    # fallback value is the first centroid id — type-correct for any id
    # type — and unreachable: every struct key is coalesced to +inf, never
    # NULL, so the min of a non-empty array is always found.
    return vectors.withColumn(
        "bucket", F.coalesce(F.array_min(keys)["c"], F.lit(cents[0][0]))
    )


def _assign_ivf_buckets_shuffled(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_id: str,
    centroid_vec: str,
) -> DataFrame:
    """Broadcast-crossJoin + window fallback for models too large to fold
    into the plan. Shuffles |V|·C vector-carrying rows — only acceptable
    because a model this size (> 2^16 plan doubles) should be using
    :func:`ivfpq_adc_topk` (LUTs ride as data rows) instead."""
    from data_engineering_nd_datalake_project_4_spark.operators import ensure_map_parallelism

    vectors = ensure_map_parallelism(vectors)
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
    :func:`brute_force_topk` is property-tested, not oracle-hashed.

    Probe selection is the same map-side literal argmin as
    :func:`assign_ivf_buckets` (sort the per-centroid key array, slice
    ``nprobe`` — clamped to the trained cell count like FAISS): neither
    the corpus nor the query vectors ride a keyed shuffle anywhere in
    this plan; the only exchange is the bucket-key candidate join.

    REPLAY SEMANTICS: every step is a per-ROW map/join — exact duplicate
    feed rows (at-least-once delivery) each probe and each candidate
    independently, so duplicated ids surface as duplicated result rows.
    Dedup the feed first (``dedup.exact_dedup``) when ids may repeat;
    the q42 oracle replicates the per-row contract via the
    compute-per-distinct-then-join-back pattern (duprows soak).

    Degenerate query vectors (``valid_vector``) probe nothing; degenerate
    corpus vectors are unbucketed by :func:`assign_ivf_buckets` — both
    classes simply don't appear in the result. Off-model-dimension
    vectors (raggeddim) are degenerate on both sides too."""
    queries = queries.filter(valid_vector(F.col(vec_col)))
    cid = centroids.columns[0]
    cvec = centroids.columns[1]
    cents = _collect_centroid_model(centroids, cid, cvec)
    if not cents:
        # empty model: typed empty result (empty soak)
        from pyspark.sql.types import DoubleType, StructField, StructType

        schema = StructType(
            [
                StructField("query_id", queries.schema[id_col].dataType),
                StructField("neighbor_id", vectors.schema[id_col].dataType),
                StructField("sim", DoubleType()),
            ]
        )
        return vectors.sparkSession.createDataFrame([], schema)
    queries = queries.filter(F.size(F.col(vec_col)) == len(cents[0][1]))
    bucketed = assign_ivf_buckets(vectors, centroids, id_col, vec_col, cid, cvec)

    if _centroid_plan_fits(cents):
        keys = _nearest_centroid_keys(F.col(vec_col), cents)
        probe_buckets = F.transform(
            F.slice(F.array_sort(keys), 1, min(nprobe, len(cents))),
            lambda s: s["c"],
        )
        # explode_outer: a plain explode makes InferFiltersFromGenerate add
        # `size(probe_buckets) > 0 AND isnotnull(probe_buckets)` — the full
        # k-centroid argmin re-evaluated per query row in a filter that is
        # always true (the slice of a literal-length sorted array is never
        # empty). The outer variant gets no inferred filter; its one extra
        # NULL row per empty array cannot occur here, and the cheap
        # isNotNull on the GENERATED column (not pushable below the
        # Generate) keeps the schema contract identical.
        probes = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.explode_outer(probe_buckets).alias("bucket"),
        ).filter(F.col("bucket").isNotNull())
    else:
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
    across engines and runs, no stored model. Adds ``rp_bucket``.
    Degenerate vectors (``valid_vector``) have no projections and no
    bucket — the row is dropped, matching the oracle's unnest."""
    vectors = vectors.filter(valid_vector(F.col(vec_col)))
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


def blocked_all_pairs_cosine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    block_size: int = 256,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via blocked matrix multiplication.

    The scale path for exact near-duplicate detection: vectors are split
    into ordered blocks of ``block_size``; every block pair (bi ≤ bj) is
    routed to one task via cogroup, where the full sim matrix of the two
    blocks is one vectorized numpy matmul. Compared to the per-pair
    Catalyst kernel (zip_with+aggregate per row pair) this trades a
    ~B-fold row replication for dense BLAS work — O(n²·d) flops either
    way, but at matmul speed and with threshold filtering applied before
    anything leaves the task.

    Output: ``id_a, id_b, cosine`` with ``id_a < id_b`` — identical row set
    to :func:`data_engineering_nd_datalake_project_4_spark.operators.dedup.embedding_near_dup_pairs`.

    Degenerate vectors (``valid_vector``) are excluded up front: a ragged
    batch would crash ``np.stack``, and no cross-engine cosine exists for
    them anyway (advembed soak). Mixed DIMENSIONS (raggeddim soak — the
    mid-corpus model-switch drift) are handled by adding the dimension
    to the cogroup key: only same-dim block pairs ever meet a kernel, so
    every ``np.stack`` is rectangular and cross-dim pairs — whose cosine
    is undefined — are structurally non-candidates.
    """
    import pandas as pd

    df = df.filter(valid_vector(F.col(vec_col)))

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def side(prefix: str) -> DataFrame:
        # each side re-selects from df with side-specific names: a
        # self-cogroup whose children share attribute ids relies on the
        # analyzer's dedup rewrite, which intermittently delivered one side's
        # batches with rows but no data columns — distinct names sidestep it
        return df.select(
            F.col(id_col).alias(f"{prefix}id"),
            F.col(vec_col).alias(f"{prefix}v"),
            F.floor(F.col(id_col) / block_size).cast("long").alias(f"{prefix}blk"),
            F.size(F.col(vec_col)).cast("long").alias(f"{prefix}dim"),
        )

    # plan parameter (a single scalar), not data on the driver
    n_blocks = side("__l_").agg(F.max("__l_blk")).first()[0]
    if n_blocks is None:
        return df.sparkSession.createDataFrame([], out_schema)

    left = side("__l_").select(
        "__l_id",
        "__l_v",
        F.col("__l_dim").alias("__dim"),
        F.col("__l_blk").alias("__bi"),
        F.explode(F.sequence(F.col("__l_blk"), F.lit(int(n_blocks)))).alias("__bj"),
    )
    right = side("__r_").select(
        "__r_id",
        "__r_v",
        F.col("__r_dim").alias("__dim"),
        F.explode(F.sequence(F.lit(0), F.col("__r_blk"))).alias("__bi"),
        F.col("__r_blk").alias("__bj"),
    )

    def sim_block(key, l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(l) == 0 or len(r) == 0 or "__l_v" not in l.columns or "__r_v" not in r.columns:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        a = np.stack(l["__l_v"].to_numpy()).astype("float64")
        b = np.stack(r["__r_v"].to_numpy()).astype("float64")
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        sims = a @ b.T
        ia = l["__l_id"].to_numpy()[:, None]
        ib = r["__r_id"].to_numpy()[None, :]
        mask = (sims >= threshold) & (ia < ib)
        rows, cols = np.nonzero(mask)
        return pd.DataFrame(
            {
                "id_a": l["__l_id"].to_numpy()[rows],
                "id_b": r["__r_id"].to_numpy()[cols],
                "cosine": sims[rows, cols],
            }
        )

    return (
        left.groupBy("__bi", "__bj", "__dim")
        .cogroup(right.groupBy("__bi", "__bj", "__dim"))
        .applyInPandas(sim_block, out_schema)
    )


def sized_gemm_block(n_vectors: int, min_blocks: int = 12, floor: int = 256, cap: int = 2048) -> int:
    """Block-size sizing discipline for :func:`blocked_all_pairs_cosine`
    (the GEMM twin of :func:`sized_band_bits`): the exchange moves each
    vector once per partner block — total ``N²·rowbytes / (2B)`` — so
    shuffle volume is DECREASING in the block size, while per-kernel
    memory is ``8·B²`` bytes of float64 sim matrix (32 MB at the 2048
    cap) plus two ``B×d`` blocks, and task parallelism needs at least
    ``min_blocks`` blocks. Returns the largest power of two satisfying
    all three: ``min(cap, max(floor, 2^floor(log2(N/min_blocks))))``.

    At a fixed B the block-pair count grows as ``(N/B)²`` — the lane's
    block-pair growth law (``tools/bench_scale.py --gemm``). Sizing B up
    with N divides the constant but CANNOT change the law: all-pairs
    cosine is O(N²·d) by specification. At corpus scale the exact
    operator is for bounded subsets and in-bucket rescoring; corpus-wide
    near-dup routes to :func:`semantic_dedup` + :func:`sized_band_bits`.
    """
    import math

    if n_vectors <= min_blocks:
        return floor
    b = 2 ** int(math.floor(math.log2(max(n_vectors / min_blocks, 1.0))))
    return max(floor, min(cap, b))


def _sq_dist_to_literal(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance from an array<double> column to a constant
    centroid, as a pure Catalyst expression (zip_with + aggregate)."""
    clit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, clit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 5,
    cache: bool = True,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means over an ``array<float>`` column; returns
    ``(assignments DataFrame[id, cluster], final centroids)``.

    Deterministic init: centroids = the vectors of the ``k`` smallest ids.
    Per iteration the only data-path shuffle is the centroid recompute
    (posexplode -> partial+final avg per (cluster, dim)); the assignment
    step is map-side only — the k centroids are folded into the plan as
    literal arrays, so each row evaluates k codegen'd squared-distance
    expressions and picks argmin (first-match tie-break = lowest cluster,
    matching numpy argmin). The driver holds just the k*d model state per
    round (512 doubles here), never row data — at 100 TB the per-iteration
    cost is one scan + one k*dim-sized shuffle.

    The reference has no clustering; this is a north-star extension
    (BASELINE.json training-data ops). Non-SQL-expressible (iterative) —
    property-tested against a numpy replication instead of the DuckDB
    oracle.

    ``cache=True`` localCheckpoints the (id, double-vector) training
    frame ONCE so the ``iters`` assignment/recompute passes read a
    materialized copy instead of re-running the scan + projection
    lineage per iteration — the standard iterative-training discipline
    (Spark MLlib caches its training set the same way). Train on a
    sample when the corpus itself is the input; pass ``cache=False``
    when the caller already materialized the frame (e.g. pq_train's
    shared base).

    Degenerate vectors (``valid_vector``) are excluded from training AND
    assignment: a NULL-element vector would poison centroid means (and
    the init collect), an empty one has no distance to any centroid.
    The model DIMENSION is fixed by the lowest-id valid vector
    (deterministic under any partitioning); off-dimension vectors are
    degenerate too — a mixed-dim table (raggeddim soak: mid-corpus
    model switch) trains and assigns on the reference-dim rows only,
    the FAISS d-mismatch contract.
    """
    rows = df.filter(valid_vector(F.col(vec_col))).select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v")
    )
    first = rows.orderBy("id").limit(1).collect()
    if first:
        dim = len(first[0]["v"])
        rows = rows.filter(F.size("v") == dim)
    if cache and iters > 1:
        rows = rows.localCheckpoint(eager=False)
    init = rows.orderBy("id").limit(k).collect()
    centroids = [list(r["v"]) for r in init]
    if not centroids:
        # empty training input (a cold-start feed, an empty partition):
        # no model to fit — empty assignments with the contract schema,
        # empty centroid list. Found by the `empty` soak variant (the
        # k=0 literal array otherwise fails analysis as NULL-typed).
        return rows.select("id", F.lit(0).cast("int").alias("cluster")), []

    assignments = None
    for _ in range(iters):
        dists = F.array(*[_sq_dist_to_literal(F.col("v"), c) for c in centroids])
        assigned = (
            rows.withColumn("dists", dists)
            .withColumn(
                "cluster",
                (F.array_position(F.col("dists"), F.array_min("dists")) - 1).cast(
                    "int"
                ),
            )
            .drop("dists")
        )
        dim_means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
        )
        new_rows = (
            dim_means.groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("centroid")
            )
            .collect()
        )
        new_centroids = list(centroids)  # empty clusters keep their centroid
        for r in new_rows:
            new_centroids[r["cluster"]] = list(r["centroid"])
        centroids = new_centroids
        assignments = assigned.select("id", "cluster")

    return assignments, centroids


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    out_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric int8 quantization of an ``array<float>`` column: per-vector
    scale = max(|x|)/127, codes = round(x/scale) in [-127, 127] stored as
    ``array<tinyint>`` (1 byte/dim at rest vs 4 — the 100 TB storage path
    for embedding tables; cosine on dequantized vectors stays within ~1e-3
    of exact for typical distributions). Zero vectors get scale 0 and
    all-zero codes. Pure Catalyst (transform/aggregate), no UDF."""
    v = as_double_array(F.col(vec_col))
    amax = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    scale = (amax / F.lit(127.0)).alias(scale_col)
    codes = F.when(amax == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(v, lambda x: F.round(x / (amax / F.lit(127.0))).cast("tinyint"))
    )
    return df.withColumn(scale_col, scale).withColumn(out_col, codes)


def dequantize(qvec: Column, qscale: Column) -> Column:
    """Reconstruct an approximate double vector from int8 codes + scale."""
    return F.transform(qvec, lambda c: c.cast("double") * qscale)


def sized_band_bits(
    n_vectors: int, target_bucket_rows: int = 256, floor: int = 6
) -> int:
    """The LSH banding SIZING DISCIPLINE as a function: band_bits =
    max(floor, ceil(log2(n / target_bucket_rows))) keeps expected bucket
    occupancy — and therefore candidate-pair volume per vector — flat as
    the corpus grows (pairs per band ~ n²/2^band_bits; holding n/2^bits
    constant makes that ~n·target/2, linear).

    This is not a tuning nicety but the difference between linear and
    quadratic: the round-10 second-decade lane ran :func:`semantic_dedup`
    at a FIXED band_bits=6 from 20k to 200k vectors and the candidate set
    grew ~100× (≈1.25G pairs whose two vector-attaching rescore joins
    spilled past the machine's disk — the run died on SPILL_OUT_OF_MEMORY
    before producing a number). Fixed-key-space LSH saturates; real
    deployments (and the lane, via this helper) grow the key space
    ~log2(N). Recall at cosine c moves with bits as
    1-(1-p^bits)^bands, p = 1-acos(c)/pi — tighten ``bands`` upward when
    raising bits if per-pair recall must hold.

    n <= target (or n = 0) returns ``floor`` — small corpora keep the
    calibrated test-scale banding.
    """
    if n_vectors <= target_bucket_rows:
        return floor
    return max(floor, math.ceil(math.log2(n_vectors / target_bucket_rows)))


def banded_sign_lsh_keys(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 4,
    band_bits: int = 4,
    keep_vec: bool = False,
) -> DataFrame:
    """Banded sign-LSH: ``bands`` independent ``band_bits``-bit signatures
    per vector from the same deterministic sin() hyperplane family as
    :func:`random_projection_buckets` (plane j uses weight sin((i+1)·j),
    planes numbered 1..bands*band_bits across the bands).

    Where a single 2^n_bits bucketing ANDs all the bits (recall falls
    exponentially in n_bits), banding ORs ``bands`` chances of a
    ``band_bits``-bit match — the MinHash-banding construction applied to
    the angular metric. Returns one row per (vector, band):
    ``(id_col, band, band_key)`` — 16 bytes of shuffle payload per row,
    never the vector itself.

    Sizing at scale: expected bucket size is N / 2^band_bits per band, so
    band_bits should grow ~log2(N) to hold candidate volume flat;
    recall at cosine c is 1-(1-p^band_bits)^bands with p = 1-acos(c)/pi.

    Kernel note (measured, sf0.1): the dynamic zip_with/aggregate HOF fold
    is the FASTEST correct form once the scan is spread — 0.24s warm for
    2000x64x24 planes. Driver-literal weight arrays are no faster, and
    unrolling to element_at chains is 15x SLOWER (the giant expression
    falls out of JIT-able codegen). Keep the HOF fold; it also keeps the
    strict left-to-right float order the oracle depends on.
    """
    if bands <= 0 or band_bits <= 0:
        raise ValueError(f"bands ({bands}) and band_bits ({band_bits}) must be positive")
    from data_engineering_nd_datalake_project_4_spark.operators import ensure_map_parallelism

    # degenerate vectors (valid_vector) get NO band keys: an empty array's
    # sequence(1, 0) is DESCENDING (the documented trap) and a NULL element
    # NULL-propagates the fold — neither has a cross-engine signature, so
    # the row simply emits no (band, key) pairs (semantic_dedup then keeps
    # it; the q170 store never records it)
    vectors = vectors.filter(valid_vector(F.col(vec_col)))
    # bands*band_bits interpreted higher-order aggregates per row (HOFs run
    # outside codegen) over a possibly single-row-group scan: spread first
    vectors = ensure_map_parallelism(vectors)
    # stage the double vector once; referenced by every plane projection
    # (non-cheap multi-ref, so CollapseProject leaves the staging in place)
    staged = vectors.select(F.col(id_col), as_double_array(F.col(vec_col)).alias("__vd"))
    vd = F.col("__vd")

    def plane_proj(j: int) -> Column:  # j is 1-based plane number
        return F.aggregate(
            F.zip_with(
                vd,
                F.transform(
                    F.sequence(F.lit(1), F.size(vd)),
                    lambda i: F.sin(i.cast("double") * j),
                ),
                lambda x, wgt: x * wgt,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    band_structs = []
    for b in range(bands):
        key = F.lit(0)
        for t in range(band_bits):
            j = b * band_bits + t + 1
            key = key + F.when(plane_proj(j) > 0, F.lit(2 ** t)).otherwise(F.lit(0))
        band_structs.append(F.struct(F.lit(b).alias("band"), key.cast("int").alias("band_key")))
    # keep_vec (r13): let the staged double vector RIDE the band explode as
    # ``__vd`` — the bucket-rescore consumer needs (band, key, id, vector)
    # rows, and re-attaching the vector by an id equi-join costs a whole
    # extra corpus shuffle at scale (broadcast only at test SF); the band
    # exchange carrying vectors bands× is the operator's documented,
    # audit-whitelisted data motion either way.
    extra = [F.col("__vd")] if keep_vec else []
    return staged.select(
        F.col(id_col),
        F.explode(F.array(*band_structs)).alias("__bk"),
        *extra,
    ).select(
        id_col,
        F.col("__bk.band").alias("band"),
        F.col("__bk.band_key").alias("band_key"),
        *extra,
    )


def _bucket_removal_udf(id_col: str, threshold: float):
    """Per-bucket removal scan for :func:`semantic_dedup`'s bucket
    rescore: inside one (band, band_key) group, find every id that has a
    SMALLER-id partner with cosine >= threshold.

    BIT-EXACT twin of the pair-mode Catalyst arithmetic: the JVM path is
    ``try_divide(dot(a,b), norm(a)*norm(b)) >= t`` with left-to-right
    fold order. Here the dot is accumulated ONE DIMENSION AT A TIME
    across the whole pair block (``acc += Vi[:,d] * Vj[:,d]``) — each
    pair's scalar sequence is the identical chain of IEEE mul/adds, and
    the norm/divide/compare are single IEEE ops — so every threshold
    comparison lands on the same side in both modes (the equality test
    and q142's unchanged DuckDB oracle pin this). NaNs (NULL vector
    elements) and zero denominators (zero-norm vectors) compare False =
    never removed, matching try_divide's NULL.

    Pair blocks are row/column-chunked (2048²) so a pathological bucket
    cannot allocate an unbounded matrix.
    """
    import numpy as np
    import pandas as pd

    def scan(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf[pdf["__vd"].notna()]
        if len(pdf) < 2:
            return pd.DataFrame({id_col: pdf[id_col][:0]})
        # mixed DIMENSIONS inside one bucket (raggeddim: LSH signatures
        # from different model dims can collide): scan each dim class
        # separately — cross-dim cosine is undefined and never removes,
        # exactly the pair-mode twin's behavior (zip_with pads the
        # shorter vector with NULLs → NULL sim → threshold False), and
        # per-class matrices keep np.array rectangular.
        lens = pdf["__vd"].map(len)
        if lens.nunique() > 1:
            parts = [scan(pdf[lens == d]) for d in sorted(lens.unique())]
            return pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy()
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__vd"]])
        n, dim = V.shape
        nrm = np.zeros(n)
        for d in range(dim):  # left-to-right, matching l2_norm's fold
            nrm += V[:, d] * V[:, d]
        nrm = np.sqrt(nrm)
        removed = np.zeros(n, dtype=bool)
        B = 2048
        for lo_j in range(0, n, B):
            hi_j = min(lo_j + B, n)
            for lo_i in range(0, hi_j, B):
                hi_i = min(lo_i + B, hi_j)
                acc = np.zeros((hi_i - lo_i, hi_j - lo_j))
                for d in range(dim):  # left-to-right, matching dot_product
                    acc += np.multiply.outer(V[lo_i:hi_i, d], V[lo_j:hi_j, d])
                denom = np.multiply.outer(nrm[lo_i:hi_i], nrm[lo_j:hi_j])
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(denom == 0.0, np.nan, acc / denom)
                # strict id order (not position): duplicate-id copies
                # (at-least-once feeds) must never remove each other
                qual = (cos >= threshold) & np.less.outer(
                    ids[lo_i:hi_i], ids[lo_j:hi_j]
                )
                removed[lo_j:hi_j] |= qual.any(axis=0)
        return pd.DataFrame({id_col: pdf[id_col].iloc[removed]})

    return scan


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    bands: int = 4,
    band_bits: int = 4,
    blocking: str = "lsh",
    clusters: int = 8,
    kmeans_iters: int = 3,
    rescore: str = "bucket",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): a vector
    is REMOVED when some candidate with a SMALLER id has cosine similarity
    ≥ ``threshold`` — keep-earliest, so the kept set is deterministic and
    order-free.

    ``blocking`` picks the candidate generator; the rescore/threshold/
    keep-earliest semantics are identical either way:

    - ``"lsh"`` (default): :func:`banded_sign_lsh_keys` — pairs sharing
      any band key. Deterministic and oracle-checkable (q142); pairs the
      banding misses are the documented approximation, tunable via
      bands/band_bits.
    - ``"kmeans"``: the published SemDeDup shape — vectors block by
      their k-means cluster (``clusters``/``kmeans_iters``;
      :func:`kmeans`'s assignment step folds the centroids into the plan
      as literals, so assignment is MAP-SIDE — the broadcast-centroid
      pattern) and only same-cluster pairs rescore. Right for trained
      embeddings where clusters capture semantics; iterative → not
      oracle-expressible (property-tested equality vs the exact variant
      on planted duplicates instead).

    Use :func:`blocked_all_pairs_cosine` for the exact variant at oracle
    scale.

    ``rescore`` picks the physical verification strategy — SAME removal
    set either way (bit-identical threshold comparisons; see
    :func:`_bucket_removal_udf` and the equality test):

    - ``"bucket"`` (default since round 10): vectors ride the blocking
      exchange ONCE PER BAND/cluster (a bands-bounded, fan-out-free
      replication) and each bucket's pairs are scanned by an
      Arrow-batched numpy kernel that replicates the Catalyst fold order
      exactly. Candidate PAIRS never carry vectors. Found necessary by
      the second-decade lane: at sf10 (200k vectors, ~86M candidate
      pairs) the pair-mode rescore joins pushed ~45 GB of vector-carrying
      pair rows through the shuffle and fell off the memory cliff —
      219 s (after spilling past the disk entirely at fixed banding);
      bucket mode moves ~0.4 GB and runs the same step in seconds.
      A pair appearing in several bands rescored once per band — harmless
      (removal is an EXISTS; results distinct'd).
    - ``"pair"``: the round-9 shape — distinct the (ida, idb) pair set,
      then re-join each side's vector by id. Fine while the pair set is
      small enough that pairs×dim fits comfortably in executor memory;
      kept as the cross-check twin and for oracle-shaped debugging.

    Returns the input plus a ``sem_removed`` boolean — every row is
    accounted for (quarantine-style observability, q140 pattern).

    Scale shape (bucket mode): the blocking exchange carries
    (id, band, key, vector) rows — bands× the corpus, the operator's
    whole data motion (whitelisted in the wide-payload audit with the
    q41/q57 bounded-replication reasoning); zero-norm vectors get NULL
    cosine (try_divide) and are never removed, matching DuckDB. Real
    deployments run threshold 0.9+ on trained embeddings; the default is
    calibrated to this repo's synthetic near-uniform vectors. Size
    ``band_bits`` with :func:`sized_band_bits` — candidate volume is
    quadratic in bucket occupancy, and a FIXED key space saturates as
    the corpus grows (the round-10 second-decade lesson).
    """
    if blocking not in ("lsh", "kmeans"):
        raise ValueError(f"blocking must be 'lsh' or 'kmeans', got {blocking!r}")
    if rescore not in ("bucket", "pair"):
        raise ValueError(f"rescore must be 'bucket' or 'pair', got {rescore!r}")

    if rescore == "bucket":
        from pyspark.sql.types import StructField, StructType

        if blocking == "lsh":
            # r13: the vector rides the band explode (keep_vec) instead of
            # re-attaching by an id equi-join — the join broadcast only at
            # test SF; at scale it was a second corpus shuffle (by id) on
            # top of the whitelisted band-group one.
            kv = banded_sign_lsh_keys(
                vectors, id_col, vec_col, bands, band_bits, keep_vec=True
            )
            group_cols = ["band", "band_key"]
        else:
            # only the kmeans branch needs the id->vector re-attach; in the
            # lsh branch the vector rides the band explode (keep_vec) and a
            # top-level vproj would be dead code (ADVICE r13)
            vproj = vectors.select(
                F.col(id_col), as_double_array(F.col(vec_col)).alias("__vd")
            )
            assignments, _ = kmeans(
                vectors, id_col, vec_col, k=clusters, iters=kmeans_iters
            )
            kv = assignments.withColumnRenamed("id", id_col).join(vproj, id_col)
            group_cols = ["cluster"]
        out_schema = StructType([StructField(id_col, vectors.schema[id_col].dataType)])
        removed = (
            kv.groupBy(*group_cols)
            .applyInPandas(
                _bucket_removal_udf(id_col, threshold), schema=out_schema
            )
            .distinct()
        )
        marker = removed.withColumn("__rm", F.lit(True))
        return (
            vectors.join(marker, id_col, "left")
            .withColumn("sem_removed", F.coalesce(F.col("__rm"), F.lit(False)))
            .drop("__rm")
        )

    if blocking == "lsh":
        # the key frame is consumed by BOTH self-join sides: materialize it
        # once (localCheckpoint, the q136 shared-subtree pattern) so the
        # bands×band_bits sin-weighted plane folds — the heaviest map
        # compute in this operator — run one time, not per branch. The
        # checkpoint holds (id, band, band_key) 16-byte rows only.
        keys = banded_sign_lsh_keys(
            vectors, id_col, vec_col, bands, band_bits
        ).localCheckpoint(eager=False)
        a = keys.select(F.col(id_col).alias("__ida"), "band", "band_key")
        b = keys.select(F.col(id_col).alias("__idb"), "band", "band_key")
        cand = (
            a.join(b, ["band", "band_key"])
            .filter(F.col("__ida") < F.col("__idb"))
            .select("__ida", "__idb")
            .distinct()
        )
    else:
        assignments, _ = kmeans(vectors, id_col, vec_col, k=clusters, iters=kmeans_iters)
        a = assignments.select(F.col("id").alias("__ida"), "cluster")
        b = assignments.select(F.col("id").alias("__idb"), "cluster")
        # one cluster per id -> pair set is already distinct
        cand = (
            a.join(b, "cluster")
            .filter(F.col("__ida") < F.col("__idb"))
            .select("__ida", "__idb")
        )
    # Precompute each vector's L2 norm ONCE (per vector, not per pair):
    # the rescore then costs one interpreted HOF aggregate per pair (the
    # dot) instead of three. try_divide(dot, na*nb) is the exact same
    # arithmetic cosine_similarity performs per pair — same values, same
    # fold order, so the threshold comparison is bit-identical.
    # NOTE: the rescore sides deliberately re-derive from the parquet scan
    # (NOT a shared localCheckpoint): checkpointing would erase the scan
    # statistics Catalyst uses to broadcast these |V|-bounded joins, and
    # an RDD-scan join side defaults to "huge" — turning the rescores into
    # vector-carrying shuffles (the exact shape plans.wide_shuffle_sites
    # forbids). Re-reading the column-pruned (id, vector) projection twice
    # costs two O(|V|·dim) map passes; each side computes its own norm.
    va = vectors.select(
        F.col(id_col).alias("__ida"),
        as_double_array(F.col(vec_col)).alias("__va"),
    ).withColumn("__na", l2_norm(F.col("__va")))
    vb = vectors.select(
        F.col(id_col).alias("__idb"),
        as_double_array(F.col(vec_col)).alias("__vb"),
    ).withColumn("__nb", l2_norm(F.col("__vb")))
    removed = (
        cand.join(va, "__ida")
        .join(vb, "__idb")
        .filter(
            F.try_divide(
                dot_product(F.col("__va"), F.col("__vb")),
                F.col("__na") * F.col("__nb"),
            )
            >= threshold
        )
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    marker = removed.withColumn("__rm", F.lit(True))
    return (
        vectors.join(marker, id_col, "left")
        .withColumn("sem_removed", F.coalesce(F.col("__rm"), F.lit(False)))
        .drop("__rm")
    )


def _pq_subspace(v: Column, s: int, sub_dim: int) -> Column:
    return F.slice(v, s * sub_dim + 1, sub_dim)


def _collect_train_sample(df: DataFrame, id_col: str, vec_col: str, n: int):
    """The ``n`` lowest-id REFERENCE-DIM vectors as a float64 matrix (None
    if empty). One limit(1) job resolves the model dimension (the
    lowest-id valid vector — the kmeans rule), then the dim filter is
    applied BEFORE the orderBy/limit so a raggeddim-heavy low-id prefix
    back-fills with later same-dim rows instead of silently shrinking the
    bounded sample below the requested ``n`` (ADVICE r11: the PQ/IVFPQ
    and kmeans training paths now implement the same dim contract the
    same way). Each pass is a TakeOrderedAndProject — a per-partition
    top-k heap, deterministic under any partitioning."""
    import numpy as np

    rows = df.filter(valid_vector(F.col(vec_col))).select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v")
    )
    first = rows.orderBy("id").limit(1).collect()
    if not first:
        return None
    dim = len(first[0]["v"])
    sample = rows.filter(F.size("v") == dim).orderBy("id").limit(n).collect()
    return np.array([r["v"] for r in sample], dtype=np.float64)


def _assign_numpy(X, C, block: int = 4096):
    """Argmin-squared-L2 cluster per row, row-blocked to bound the n·k·dim
    distance tensor; ties break to the lowest index (numpy argmin), the
    same rule as :func:`kmeans` / :func:`pq_encode`."""
    import numpy as np

    a = np.zeros(len(X), dtype=np.int64)
    for lo in range(0, len(X), block):
        blk = X[lo : lo + block]
        d2 = ((blk[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a[lo : lo + block] = d2.argmin(axis=1)
    return a


def _lloyd_numpy(X, k: int, iters: int) -> list[list[float]]:
    """Driver-side Lloyd's on a bounded training sample: init = the first
    k rows (the k smallest ids — the sample is id-ordered), empty clusters
    keep their previous centroid. Same algorithm as the distributed
    :func:`kmeans`; only the mean's float association order differs."""
    C = X[: min(k, len(X))].copy()
    for _ in range(iters):
        a = _assign_numpy(X, C)
        for c in range(len(C)):
            mask = a == c
            if mask.any():
                C[c] = X[mask].mean(axis=0)
    return [[float(x) for x in row] for row in C]


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    iters: int = 5,
    max_train_rows: int | None = None,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split each
    vector into ``m`` contiguous subspaces and run :func:`kmeans`
    independently in each. Returns ``codebooks[s] = k`` centroids of
    ``dim/m`` floats — the ANN compression path: ``m`` bytes/vector (for
    k<=256) instead of ``4*dim``, a 32x storage cut at dim=64/m=8.

    Model state is m*k*(dim/m) = k*dim driver-side floats (same footprint
    as one k-means model). dim must divide evenly by ``m``.

    TRAINING IS A BOUNDED-SAMPLE DRIVER-SIDE STAGE (the FAISS-canonical
    shape: faiss trains quantizers on ~max_points_per_centroid·k sampled
    vectors, never the corpus): the ``max_train_rows`` lowest-id vectors
    are collected once (one TakeOrderedAndProject job — a scalable top-k
    heap, deterministic across runs/partitionings) and all m subspace
    Lloyd's runs happen in numpy on that sample. At 100 TB this is the
    honest design — iterative full-corpus training jobs would re-scan the
    dataset iters·m times for a model whose quality saturates at a few
    thousand samples per centroid; ENCODE and SEARCH stay fully
    distributed (map-side literal argmin / LUT folds). Same deterministic
    init (k smallest ids) and first-match argmin tie-break as
    :func:`kmeans`; only the mean's float association order differs
    (identical contract to the distributed partial+final avg — the PQ
    gates are recall/exactness properties, not centroid bits).
    """
    X = _collect_train_sample(df, id_col, vec_col, max_train_rows or 256 * k)
    if X is None:
        return []  # empty training input: no codebooks (empty soak)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m
    return [
        _lloyd_numpy(X[:, s * sub : (s + 1) * sub], k, iters) for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
    pre_validated: bool = False,
) -> DataFrame:
    """Encode vectors against trained codebooks: per subspace the argmin
    squared-distance centroid index, as ``array<int>`` of length m.

    Entirely map-side: the m*k centroids fold into the plan as literal
    arrays, each row evaluates m*k codegen'd squared distances — no
    shuffle, no UDF, no model broadcast round-trip. Ties break to the
    lowest index (array_position finds the first match), matching
    :func:`kmeans` assignment.

    Degenerate vectors (``valid_vector``) and vectors whose dimension
    differs from the model's (m·sub — the raggeddim contract, FAISS
    d-mismatch) are uncodable — the row is dropped, like
    :func:`assign_ivf_buckets`.
    """
    if not codebooks:
        # empty model (trained on zero vectors): typed empty-code column so
        # downstream schemas hold. The pass-through keeps ALL input rows —
        # the codability filters below are a property of a trained model
        # (an empty model has no dimension to be uncodable against), so
        # they must not run in this branch (ADVICE r11: filtering first
        # silently dropped rows from a non-empty df under an empty model).
        return df.withColumn(out_col, F.expr("CAST(array() AS ARRAY<INT>)"))
    m, sub = len(codebooks), len(codebooks[0][0])
    if not pre_validated:
        df = df.filter(valid_vector(F.col(vec_col)))
        df = df.filter(F.size(F.col(vec_col)) == m * sub)
    # ``pre_validated=True`` (r14): the caller PROVES the vector column is
    # already valid and of dimension m·sub (ivfpq_encode's residual: a
    # zip_with of two same-length non-null arrays derived from a vector
    # that passed the same checks). The redundant re-filter was not just
    # wasted work — predicate pushdown substituted the whole residual
    # expression below the staging projections, and codegen's
    # subexpression elimination evaluates those filter subtrees EAGERLY
    # (before the short-circuit AND), so they also ran on rows the dim
    # filter was about to drop.
    # r14 (guide §1.2): STAGE the per-subspace distance arrays as
    # materialized columns. The old shape passed the `dists` python
    # variable to BOTH array_position and array_min, so the whole m·k
    # distance computation was inlined TWICE per row (the CLAUDE.md
    # CollapseProject trap — kmeans already staged its dists; this site
    # didn't). Staging halves the encode kernel (q151/q153 plans: 64
    # zip_with → 32). The double-cast vector is staged once for the same
    # reason (it fed every subspace's dists inline).
    v = as_double_array(F.col(vec_col))
    staged = df.withColumn("__pqv", v)
    for s in range(m):
        staged = staged.withColumn(
            f"__pqd{s}",
            F.array(
                *[
                    _sq_dist_to_literal(_pq_subspace(F.col("__pqv"), s, sub), c)
                    for c in codebooks[s]
                ]
            ),
        )
    codes = [
        (
            F.array_position(F.col(f"__pqd{s}"), F.array_min(f"__pqd{s}")) - 1
        ).cast("int")
        for s in range(m)
    ]
    return staged.withColumn(out_col, F.array(*codes)).drop(
        "__pqv", *[f"__pqd{s}" for s in range(m)]
    )


#: Hard cap on plan-folded ADC lookup-table literals (doubles). 2^20
#: doubles ~ 8 MB of literal expressions — past this, Catalyst analysis +
#: codegen time and driver plan memory dominate (the q151/q153 family's
#: one non-data scale axis). ivfpq_adc_topk is exempt: its LUTs are rows.
_MAX_LUT_PLAN_DOUBLES = 1 << 20


def pq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    k: int = 5,
    max_queries: int = 1024,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: approximate squared
    L2 from each query to each database vector as the sum of m lookup-table
    entries ``LUT[s][code[s]]``, where ``LUT[s][c] = ||q_s - codebook[s][c]||²``
    is precomputed per query (the PQ paper's ADC estimator — queries stay
    exact, database vectors are quantized).

    Scale shape: the LUTs are m*k doubles per query, folded into the plan
    as ONE literal array of (query_id, luts) structs exploded against each
    code row — a single scan of the codes table fans out map-side to all
    Q queries (no per-query re-scan, no join); the query set is the small,
    driver-known probe side — same contract as :func:`brute_force_topk`'s
    broadcast, enforced by ``max_queries``. The scan reads ONLY the m-byte
    code column — the O(N·Q) kernel is m array lookups + adds per pair
    instead of dim multiplies, and the full-precision vector column never
    loads. Ranking is the same per-query top-k window.

    PLAN-SIZE BOUND: the folded literal is Q·m·ncodes doubles — the PLAN
    grows with the model, not just the data. At the defaults (m=4,
    ncodes=16) 1024 queries fold 64K doubles (fine); at a FAISS-typical
    m=16/ncodes=256 each query folds 4096 doubles and the expression tree
    blows up (Catalyst analysis/codegen time, driver plan memory) long
    before any executor is busy. Guarded at ``_MAX_LUT_PLAN_DOUBLES``
    (2²⁰ ≈ 8 MB of literals): beyond it, chunk the probe set — or use
    :func:`ivfpq_adc_topk`, which ships its LUTs as a broadcast DATA
    frame (rows, not plan literals) and has no such bound.

    Output: ``query_id, neighbor_id, adc_dist`` (ascending = nearer).
    """
    from data_engineering_nd_datalake_project_4_spark.operators import ensure_map_parallelism

    if not codebooks:
        return _empty_adc_frame(codes_df, queries, id_col, query_id_col)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    # degenerate / off-model-dim query vectors have no LUT
    # (valid_vector + raggeddim contracts)
    qrows = queries.filter(
        valid_vector(F.col(query_vec_col))
        & (F.size(F.col(query_vec_col)) == m * sub)
    ).select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(F.col(query_vec_col)).alias("v"),
    ).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"{len(qrows)} queries > max_queries={max_queries}: ADC folds one "
            "m*k LUT per query into the plan — chunk the probe set"
        )
    ncodes = len(codebooks[0])
    lut_doubles = len(qrows) * m * ncodes
    if lut_doubles > _MAX_LUT_PLAN_DOUBLES:
        raise ValueError(
            f"ADC LUT literals would fold {lut_doubles} doubles "
            f"({len(qrows)} queries x m={m} x ncodes={ncodes}) into the plan "
            f"(> {_MAX_LUT_PLAN_DOUBLES}): the expression tree, not the data, "
            "becomes the bottleneck — chunk the probe set, or use "
            "ivfpq_adc_topk (LUTs ride as broadcast data rows, not literals)"
        )
    if not qrows:
        return _empty_adc_frame(codes_df, queries, id_col, query_id_col)
    qlits = []
    for r in qrows:
        luts = []
        for s in range(m):
            qs = r["v"][s * sub : (s + 1) * sub]
            luts.append(
                F.array(
                    *[
                        F.lit(sum((a - b) * (a - b) for a, b in zip(qs, c)))
                        for c in codebooks[s]
                    ]
                )
            )
        qlits.append(
            F.struct(F.lit(r["query_id"]).alias("query_id"), F.array(*luts).alias("luts"))
        )
    codes_df = ensure_map_parallelism(codes_df)
    fanned = codes_df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(codes_col).alias("__codes"),
        F.explode(F.array(*qlits)).alias("__q"),
    )
    dist = sum(
        (
            F.element_at(
                F.element_at("__q.luts", s + 1),
                F.element_at(F.col("__codes"), s + 1) + 1,
            )
            for s in range(m)
        ),
        start=F.lit(0.0),
    )
    scored = fanned.select(
        F.col("__q.query_id").alias("query_id"),
        "neighbor_id",
        dist.alias("adc_dist"),
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _empty_adc_frame(codes_df: DataFrame, queries: DataFrame, id_col: str, query_id_col: str) -> DataFrame:
    """Typed empty (query_id, neighbor_id, adc_dist) result — the ADC
    answer when the model or the probe set is empty (empty soak: a
    cold-start corpus has neither codebooks nor queries to fold)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [
            StructField("query_id", queries.schema[query_id_col].dataType),
            StructField("neighbor_id", codes_df.schema[id_col].dataType),
            StructField("adc_dist", DoubleType()),
        ]
    )
    return codes_df.sparkSession.createDataFrame([], schema)


def ivfpq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    m: int = 4,
    k: int = 16,
    iters: int = 5,
    max_train_rows: int | None = None,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train the FAISS-canonical IVFADC index (Jégou et al. 2011 §V):
    ``nlist`` coarse k-means centroids, then PQ codebooks over the
    RESIDUALS ``v - coarse[cell(v)]`` — residual energy is much lower than
    vector energy, so the same code budget quantizes finer than flat PQ.

    Returns ``(coarse_centroids, residual_codebooks)``. Model state is
    nlist*dim + k*dim driver-side floats. Training is the same
    bounded-sample driver-side stage as :func:`pq_train` (FAISS-canonical
    — one sample collect, then coarse Lloyd's + residual projection +
    per-subspace Lloyd's all in numpy; encode/search stay distributed).
    """
    import numpy as np

    X = _collect_train_sample(
        df, id_col, vec_col, max_train_rows or 256 * max(nlist, k)
    )
    if X is None:
        return [], []  # empty training input: no model (empty soak)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    coarse = _lloyd_numpy(X, nlist, iters)
    R = X - np.asarray(coarse)[_assign_numpy(X, np.asarray(coarse))]
    sub = dim // m
    codebooks = [
        _lloyd_numpy(R[:, s * sub : (s + 1) * sub], k, iters) for s in range(m)
    ]
    return coarse, codebooks


def ivfpq_encode(
    df: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors as (coarse cell, PQ codes of the residual). Entirely
    map-side: both codebook levels fold into the plan as literals — no
    shuffle, no UDF, no model broadcast. Output columns: ``ivf_cell int,
    pq_codes array<int>`` appended to the input. Degenerate vectors
    (``valid_vector``) and off-model-dim vectors (raggeddim) are
    uncodable — rows dropped."""
    if not coarse:
        # empty model: typed pass-through columns so downstream schemas
        # hold — ALL input rows kept (codability is a property of a trained
        # model; see pq_encode's empty branch, ADVICE r11)
        return df.withColumn("ivf_cell", F.lit(None).cast("int")).withColumn(
            "pq_codes", F.expr("CAST(array() AS ARRAY<INT>)")
        )
    df = df.filter(valid_vector(F.col(vec_col)))
    df = df.filter(F.size(F.col(vec_col)) == len(coarse[0]))
    # r14 (guide §1.2/§2.4): stage the double vector and the coarse
    # distance array (each was inlined into every consumer — the
    # CollapseProject trap), and make ivf_cell NON-NULLABLE via coalesce.
    # The nullable argmin made InferFiltersFromConstraints add
    # isnotnull(ivf_cell) for the ADC probe join, and predicate pushdown
    # substituted the FULL coarse-assign into the scan filter — q153's
    # before-plan carried a 94 kB filter condition with 44 zip_with
    # (re-)evaluations per row. The coalesce never fires at runtime
    # (valid_vector guarantees non-null distances, and the min of a
    # literal-length array is always found), it only fixes nullability.
    staged = df.withColumn("__v", as_double_array(F.col(vec_col)))
    staged = staged.withColumn(
        "__cd", F.array(*[_sq_dist_to_literal(F.col("__v"), c) for c in coarse])
    )
    cell = (F.array_position(F.col("__cd"), F.array_min("__cd")) - 1).cast("int")
    staged = staged.withColumn("ivf_cell", F.coalesce(cell, F.lit(-1)))
    clit = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in coarse])
    # try_element_at: the -1 coalesce fallback is unreachable on rows the
    # valid_vector+dim filters pass, but codegen subexpression elimination
    # may evaluate expressions EAGERLY on rows a sibling AND-branch is
    # about to drop — a throwing element_at(clit, 0) there would fail the
    # whole query (seen via pq_encode's pushed-down re-validation filters
    # on the raggeddim shape). NULL-for-impossible matches the old
    # nullable-cell semantics exactly.
    staged = staged.withColumn(
        "__resid",
        F.zip_with(
            F.col("__v"),
            F.try_element_at(clit, F.col("ivf_cell") + 1),
            lambda a, b: a - b,
        ),
    ).drop("__v", "__cd")
    return pq_encode(
        staged, codebooks, id_col, "__resid", pre_validated=True
    ).drop("__resid")


def ivfpq_adc_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    max_queries: int = 1024,
) -> DataFrame:
    """IVFADC search: each query probes its ``nprobe`` nearest coarse
    cells; within a probed cell the approximate squared L2 is the ADC sum
    over the RESIDUAL lookup table ``LUT[s][c] = ||(q - coarse[cell])_s -
    codebook[s][c]||²`` (the LUT is per (query, cell) — residuals are
    cell-relative, exactly the IVFADC estimator).

    Scale shape: the probe set (Q·nprobe rows of m·k doubles) is a
    driver-built broadcast side joined on ``ivf_cell`` — only vectors in
    probed cells are scored (the inverted-list pruning), the codes scan
    reads just the cell+code columns, and the kernel per candidate is m
    lookups + adds. Cell selection runs driver-side over the nlist coarse
    centroids (model state, not data). Output: ``query_id, neighbor_id,
    adc_dist``.
    """
    if not coarse or not codebooks:
        return _empty_adc_frame(codes_df, queries, id_col, query_id_col)
    nlist = len(coarse)
    # FAISS semantics: nprobe is clamped to nlist (probe everything). The
    # trained model can legitimately have fewer cells than the configured
    # nprobe when the corpus is tiny (k-means returns <= n_rows centroids
    # — the onerow soak shape); raising would make a valid index unusable.
    nprobe = min(nprobe, nlist)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    # degenerate / off-model-dim query vectors probe nothing
    # (valid_vector + raggeddim contracts)
    qrows = queries.filter(
        valid_vector(F.col(query_vec_col))
        & (F.size(F.col(query_vec_col)) == len(coarse[0]))
    ).select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(F.col(query_vec_col)).alias("v"),
    ).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"{len(qrows)} queries > max_queries={max_queries}: IVFADC builds "
            "one LUT per (query, probed cell) on the driver — chunk the probe set"
        )
    if not qrows:
        return _empty_adc_frame(codes_df, queries, id_col, query_id_col)
    probe_rows = []
    for r in qrows:
        q = list(r["v"])
        cd = sorted(
            (sum((a - b) * (a - b) for a, b in zip(q, c)), ci)
            for ci, c in enumerate(coarse)
        )[:nprobe]
        for _, ci in cd:
            resid = [a - b for a, b in zip(q, coarse[ci])]
            luts = [
                [
                    sum(
                        (a - b) * (a - b)
                        for a, b in zip(resid[s * sub : (s + 1) * sub], c)
                    )
                    for c in codebooks[s]
                ]
                for s in range(m)
            ]
            probe_rows.append((r["query_id"], ci, luts))
    spark = codes_df.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "query_id long, ivf_cell int, luts array<array<double>>"
    )
    # r14 (guide §6 / VERDICT r13 task 3): the probed-cell set is
    # driver-known — push it as an IN filter on the codes side instead of
    # relying on the join alone to drop unprobed cells. Over a PERSISTED
    # codes table this reaches the parquet scan (PushedFilters: In(ivf_cell,
    # ...)) and prunes row groups; over an inline-encoded frame it still
    # short-circuits the PQ-encode projection for rows whose coarse cell
    # is never probed. Applied only when it prunes (probed ⊂ all cells).
    probed_cells = sorted({ci for _, ci, _ in probe_rows})
    codes_side = codes_df.select(
        F.col(id_col).alias("neighbor_id"), "ivf_cell", "pq_codes"
    )
    if len(probed_cells) < nlist:
        codes_side = codes_side.filter(F.col("ivf_cell").isin(probed_cells))
    cand = F.broadcast(probes).join(codes_side, "ivf_cell")
    dist = sum(
        (
            F.element_at(
                F.element_at("luts", s + 1),
                F.element_at(F.col("pq_codes"), s + 1) + 1,
            )
            for s in range(m)
        ),
        start=F.lit(0.0),
    )
    scored = cand.select(
        "query_id", "neighbor_id", dist.alias("adc_dist")
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rk",
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Büttcher 2009) — the
    standard hybrid-retrieval combiner (lexical BM25 + embedding cosine,
    the RAG-stack default): ``rrf(d) = Σ_systems 1/(k + rank_system(d))``,
    with a system contributing 0 for documents outside its list. ``k=60``
    is the published constant.

    Determinism: each term is one exact IEEE division of integers and the
    terms are added in FIXED list order (a chained expression, not a SUM
    aggregate), so the fused score is bit-identical cross-engine. Scale
    shape: the ranking lists are top-k outputs (tiny); the fusion is
    full-outer joins on the id — at most |lists|·k rows ever move.

    Returns ``(id_col, rrf_score)`` — unsorted; callers order/limit.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    out = None
    for i, r in enumerate(rankings):
        ri = r.select(F.col(id_col), F.col(rank_col).alias(f"__rk{i}"))
        out = ri if out is None else out.join(ri, id_col, "full_outer")
    score = F.lit(0.0)
    for i in range(len(rankings)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"__rk{i}")), F.lit(0.0)
        )
    return out.select(F.col(id_col), score.alias("rrf_score"))
