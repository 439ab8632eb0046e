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


CASES = {"q45": q45_variants, "q143": q143_variants}


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
