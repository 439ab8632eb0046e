"""Time a subset of registry queries with the bench protocol (fresh
session, one untimed warm-up per query, median of N reps into the noop
sink). For isolating the effect of a change on its target queries without
paying a full 172-query regeneration.

Usage:
    python tools/bench_subset.py q02 q96_global_threshold ...
    SPARK_GRAFT_BENCH_REPS=5 python tools/bench_subset.py q02
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY
    from data_engineering_nd_datalake_project_4_spark.session import get_spark

    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"subset:{name}")
        REGISTRY[name].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # untimed warm-up (C2 JIT)
        samples = []
        for _ in range(reps):
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        samples.sort()
        out[name] = samples[len(samples) // 2]
        print(f"{name:36s} {out[name]:7.3f}s  {samples}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
