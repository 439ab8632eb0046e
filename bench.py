"""Benchmark harness: runs the declared query contract at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {"q01": sec, ...}, "sf": 0.1}

Each query executes its full plan into a ``noop`` sink (no driver
collect bottleneck, no disk write skew). The session is warmed with one
trivial action first so JVM/codegen startup isn't billed to q01.
"""

from __future__ import annotations

import json
import os
import sys
import time

from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY
from data_engineering_nd_datalake_project_4_spark.session import get_spark


def _run_plan(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, codegen, parquet footers
    _run_plan(spark.read.parquet(f"{sf_dir}/region.parquet"))

    try:
        reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1")))
    except ValueError:
        reps = 1
    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        samples = []
        for _ in range(reps):
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            t0 = time.perf_counter()
            _run_plan(df)
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 3)  # median
        print(f"{name:28s} {timings[name]:7.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
