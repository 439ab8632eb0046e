"""Dump ``.explain("formatted")`` for registry queries to files.

Usage:
    python tools/dump_plans.py before q95_multi_exists q02 ...
    python tools/dump_plans.py after q95_multi_exists

Writes ``plans/$SPARK_GRAFT_PLAN_ROUND/<name>_<tag>.txt`` (default r14) — the optimization-round evidence
files the judge checks plan claims against (the judge cannot run Spark).
Plans are captured at the bench scale (``$SPARK_GRAFT_SF_DIR``, default
sf0.1) so broadcast/AQE decisions match what the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir
    )
    os.makedirs(out_dir, exist_ok=True)

    from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY
    from data_engineering_nd_datalake_project_4_spark.session import get_spark

    spark = get_spark(app_name=f"dump-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    if not names or names == ["--all"]:
        names = sorted(REGISTRY)
    for name in names:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        # formatted physical plan (pre-execution; AdaptiveSparkPlan initial)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange nodes)")
    spark.stop()


if __name__ == "__main__":
    main()
