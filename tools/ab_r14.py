"""Interleaved same-session A/B harness for the r14 adjudications
(VERDICT r13 task 1): alternate variant executions A,B,A,B,... in ONE
session so ambient drift hits both arms equally — the repo's r12
adjudication discipline. One untimed warm-up per arm first (C2 JIT).

Usage:
    python tools/ab_r14.py q45 [reps]      # pre_distinct True vs False
    python tools/ab_r14.py q143 [reps]     # window vs r13-before agg+join
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def q45_variants(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    def build(pre_distinct: bool):
        def fn():
            li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            tagged = li.select(
                F.lit("part").alias("tag"), F.col("l_partkey").alias("k")
            ).unionAll(
                li.select(F.lit("supp").alias("tag"), F.col("l_suppkey").alias("k"))
            )
            est = sketches.hll_estimate(
                sketches.hll_registers(
                    tagged, "k", group_cols=["tag"], pre_distinct=pre_distinct
                ),
                group_cols=["tag"],
            )
            return est.groupBy().agg(
                F.coalesce(
                    F.max(F.when(F.col("tag") == "part", F.col("est"))), F.lit(0.0)
                ).alias("n_part_approx"),
                F.coalesce(
                    F.max(F.when(F.col("tag") == "supp", F.col("est"))), F.lit(0.0)
                ).alias("n_supp_approx"),
            )

        return fn

    return {"pre_distinct": build(True), "instance_hash": build(False)}


def q143_variants(spark, sf_dir):
    from pyspark.sql import functions as F

    from data_engineering_nd_datalake_project_4_spark.operators import text
    from data_engineering_nd_datalake_project_4_spark.operators import (
        ensure_map_parallelism,
    )
    from data_engineering_nd_datalake_project_4_spark.operators.text import (
        _span_hash_rows,
        tokens,
    )

    def current():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return text.strip_duplicate_spans(d, "text", "doc_id", n=8, min_docs=2).orderBy(
            "doc_id"
        )

    def old_agg_join():
        # the r13-BEFORE formulation (f0e1fcc~1): COUNT(DISTINCT) agg +
        # left-semi join-back — spans subtree evaluated twice
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = 8
        spans = _span_hash_rows(d, "text", "doc_id", n)
        dup = (
            spans.groupBy("gram_h")
            .agg(F.countDistinct("doc_id").alias("__nd"))
            .filter(F.col("__nd") >= 2)
            .select("gram_h")
        )
        covered = (
            spans.join(dup, "gram_h", "left_semi")
            .select(
                F.col("doc_id"),
                F.explode(
                    F.sequence(F.col("start_pos"), F.col("start_pos") + (n - 1))
                ).alias("__pos"),
            )
            .groupBy("doc_id")
            .agg(F.collect_set("__pos").alias("__cov"))
        )
        base = ensure_map_parallelism(d.select("doc_id", F.col("text"))).join(
            covered, "doc_id", "left"
        )
        cov = F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
        staged = base.select(
            F.col("doc_id"),
            F.col("text"),
            tokens(F.col("text")).alias("__toks"),
            cov.alias("__covarr"),
        ).select(
            F.col("doc_id"),
            F.col("text"),
            F.col("__toks"),
            F.col("__covarr"),
            F.filter(
                F.col("__toks"),
                lambda t, i: ~F.array_contains(F.col("__covarr"), i.cast("int")),
            ).alias("__kept"),
        )
        return staged.select(
            F.col("doc_id"),
            F.when(F.col("text").isNull(), F.lit(None).cast("string"))
            .otherwise(F.array_join(F.col("__kept"), " "))
            .alias("new_text"),
            F.coalesce(F.size("__toks"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.size("__toks") - F.size("__kept"), F.lit(0)).alias(
                "n_removed_tokens"
            ),
        ).orderBy("doc_id")

    return {"window": current, "agg_join": old_agg_join}


def spanfam_variants(spark, sf_dir):
    """Old vs new _span_hash_rows shape on the q141 (duplicate_spans)
    query: pushed `size(split)>=n` scan filter vs the when-guarded
    explode_outer fan-out (r14)."""
    from pyspark.sql import functions as F

    from data_engineering_nd_datalake_project_4_spark.operators import (
        ensure_map_parallelism,
        text,
    )
    from data_engineering_nd_datalake_project_4_spark.operators.text import tokens

    n = 8

    def old_span_rows(df):
        toks = (
            df.filter(F.col("text").isNotNull())
            .select(F.col("doc_id"), tokens(F.col("text")).alias("__toks"))
            .filter(F.size("__toks") >= n)
        )
        toks = ensure_map_parallelism(toks)
        return toks.select(
            F.col("doc_id"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - n),
                    lambda i: F.xxhash64(
                        F.array_join(F.slice("__toks", i + 1, n), " ")
                    ),
                )
            ).alias("start_pos", "gram_h"),
        )

    def q141_from(span_fn):
        def fn():
            d = spark.read.parquet(f"{sf_dir}/documents.parquet")
            flagged = text._dup_flagged_spans(span_fn(d), "doc_id", 2)
            return (
                flagged.groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).alias("n_spans"),
                    F.count(F.when(F.col("__dup"), F.lit(1))).alias("n_dup_spans"),
                )
                .withColumn(
                    "dup_ratio",
                    F.col("n_dup_spans").cast("double") / F.col("n_spans"),
                )
                .orderBy("doc_id")
            )

        return fn

    return {
        "new_outer": q141_from(lambda d: text._span_hash_rows(d, "text", "doc_id", n)),
        "old_pushed": q141_from(old_span_rows),
    }


def bm25_variants(spark, sf_dir):
    """Old (plain explode, inferred size(split)>0 scan filter) vs new
    (explode_outer) bm25_topk on the q155 shape."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from data_engineering_nd_datalake_project_4_spark.operators import (
        ensure_map_parallelism,
        text,
    )
    from data_engineering_nd_datalake_project_4_spark.operators.text import tokens

    def new():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return text.bm25_topk(
            d, "text", "doc_id", ["spark", "join", "window"], k=10
        ).orderBy("rk")

    def old():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        k, k1, b = 10, 1.2, 0.75
        docs = ensure_map_parallelism(d.filter(F.col("text").isNotNull()))
        toked = docs.select(F.col("doc_id"), tokens("text").alias("__toks"))
        stats = toked.select(F.size("__toks").alias("__dl")).agg(
            F.count(F.lit(1)).alias("__n"), F.sum("__dl").alias("__sumdl")
        )
        tok = toked.select(
            F.col("doc_id"),
            F.size("__toks").alias("__dl"),
            F.explode("__toks").alias("__tok"),
        ).filter(F.col("__tok").isin(["spark", "join", "window"]))
        tf = tok.groupBy("doc_id", "__tok", "__dl").agg(
            F.count(F.lit(1)).alias("__tf")
        )
        dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
        avgdl = F.col("__sumdl").cast("double") / F.col("__n").cast("double")
        idf = (
            F.log(
                F.lit(1.0)
                + (F.col("__n").cast("double") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            )
            .cast("decimal(18,6)")
            .cast("double")
        )
        denom = F.col("__tf") + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__dl").cast("double") / avgdl
        )
        contrib = (idf * (F.col("__tf") * F.lit(k1 + 1.0)) / denom).cast(
            "decimal(18,6)"
        )
        scored = (
            tf.join(F.broadcast(dfreq), "__tok")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(F.sum(contrib).alias("__s"))
            .select(F.col("doc_id"), F.col("__s").cast("double").alias("score"))
        )
        topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return topk.withColumn("rk", F.row_number().over(w)).orderBy("rk")

    return {"new_outer": new, "old_explode": old}


def q147_variants(spark, sf_dir):
    """subdoc_dedup: current two-pass re-chunk vs staged-chunk reuse via
    localCheckpoint (the r13 deferred item, VERDICT r13 task 2). The staged
    variant computes chunk TEXT once on a checkpointed frame shared by the
    decision and reassembly branches; kept side broadcast-hinted (the
    checkpoint erases stats — q142 lesson)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_engineering_nd_datalake_project_4_spark.operators import (
        dedup,
        ensure_map_parallelism,
    )
    from data_engineering_nd_datalake_project_4_spark.operators.text import tokens

    size = 16

    def current():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return dedup.subdoc_dedup(d, "text", "doc_id", size=size).orderBy("doc_id")

    def staged():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = ensure_map_parallelism(d.select("doc_id", "text"))
        toks = tokens(F.col("text"))
        chunks = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(size)),
            lambda s: F.array_join(F.slice(toks, s + 1, size), " "),
        )
        staged0 = base.select(
            F.col("doc_id"), F.col("text"), chunks.alias("__chunks")
        ).localCheckpoint(eager=False)
        h_rows = (
            staged0.filter(F.col("text").isNotNull())
            .select(
                F.col("doc_id"),
                F.posexplode("__chunks").alias("__idx", "__c"),
            )
            .select("doc_id", "__idx", F.xxhash64("__c").alias("__h"))
        )
        w = Window.partitionBy("__h").orderBy(F.col("doc_id"), F.col("__idx"))
        kept = (
            h_rows.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("__idx")).alias("__kept_idx"))
        )
        out = staged0.join(F.broadcast(kept), "doc_id", "left")
        kept_chunks = F.filter(
            "__chunks", lambda c, i: F.array_contains("__kept_idx", i)
        )
        return out.select(
            F.col("doc_id"),
            F.when(F.col("text").isNull(), F.lit(0))
            .otherwise(F.size("__chunks"))
            .alias("n_paragraphs"),
            F.coalesce(F.size("__kept_idx"), F.lit(0)).alias("n_kept"),
            F.when(F.col("text").isNull(), F.lit(None).cast("string"))
            .otherwise(F.array_join(kept_chunks, " "))
            .alias("deduped_text"),
        ).orderBy("doc_id")

    return {"two_pass": current, "staged_ckpt": staged}


def q34_variants(spark, sf_dir):
    """ngram_jaccard_pairs rescore staging: old NULLABLE shingle-hash array
    (InferFiltersFromConstraints pushes the full transform into both pair-side
    scan filters) vs the r14 coalesced non-nullable staging + try_divide."""
    from pyspark.sql import functions as F

    from data_engineering_nd_datalake_project_4_spark.operators import (
        dedup,
        ensure_map_parallelism,
    )
    from data_engineering_nd_datalake_project_4_spark.operators.dedup import _shingles

    def load():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") < 300
        )
        cand = dedup.prefix_filter_candidate_pairs(
            d, "text", "doc_id", n=1, threshold=0.8, order="hash"
        )
        return d, cand

    def new():
        d, cand = load()
        pairs = dedup.ngram_jaccard_pairs(
            d, "text", "doc_id", n=1, threshold=0.8, candidates=cand
        )
        return pairs.select(
            "id_a", "id_b", F.round("jaccard", 3).alias("jac")
        ).orderBy("id_a", "id_b")

    def old():
        d, cand = load()
        df = ensure_map_parallelism(d)
        sh = df.select(
            F.col("doc_id").alias("__id"),
            F.transform(_shingles(F.col("text"), 1), lambda s: F.xxhash64(s)).alias(
                "__sh"
            ),
        ).withColumn("__n", F.size("__sh"))
        a = sh.select(
            F.col("__id").alias("id_a"),
            F.col("__sh").alias("__sha"),
            F.col("__n").alias("__na"),
        )
        b = sh.select(
            F.col("__id").alias("id_b"),
            F.col("__sh").alias("__shb"),
            F.col("__n").alias("__nb"),
        )
        joined = cand.join(a, "id_a").join(b, "id_b")
        inter = F.size(F.array_intersect("__sha", "__shb")).cast("double")
        union = (F.col("__na") + F.col("__nb")).cast("double") - inter
        pairs = joined.select(
            "id_a", "id_b", (inter / union).alias("jaccard")
        ).filter(F.col("jaccard") >= 0.8)
        return pairs.select(
            "id_a", "id_b", F.round("jaccard", 3).alias("jac")
        ).orderBy("id_a", "id_b")

    return {"coalesced": new, "nullable_pushed": old}


CASES = {
    "q45": q45_variants,
    "q143": q143_variants,
    "spanfam": spanfam_variants,
    "bm25": bm25_variants,
    "q147": q147_variants,
    "q34": q34_variants,
}


def main() -> None:
    case = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_engineering_nd_datalake_project_4_spark.session import get_spark

    spark = get_spark(app_name=f"ab-r14-{case}")
    spark.sparkContext.setLogLevel("ERROR")
    _noop(spark.read.parquet(f"{sf_dir}/region.parquet"))

    variants = CASES[case](spark, sf_dir)
    names = list(variants)
    # one untimed warm-up per arm
    for nm in names:
        spark.sparkContext.setJobDescription(f"ab-warmup:{nm}")
        _noop(variants[nm]())
    samples: dict[str, list[float]] = {nm: [] for nm in names}
    for r in range(reps):
        for nm in names:
            spark.sparkContext.setJobDescription(f"ab:{nm}:rep{r}")
            df = variants[nm]()
            t0 = time.perf_counter()
            _noop(df)
            samples[nm].append(round(time.perf_counter() - t0, 3))
    out = {}
    for nm in names:
        s = sorted(samples[nm])
        out[nm] = {"median": s[len(s) // 2], "samples": samples[nm]}
    print(json.dumps({"case": case, "reps": reps, "arms": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
