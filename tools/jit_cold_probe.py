"""Cold-vs-steady JIT probe for the ADC ANN family (VERDICT r12 task 6).

The driver's official 1-rep bench protocol times COLD singles, so q153's
official entry carries the first-execution C2 JIT of its wide generated
code (~2x its in-suite steady state, r12 adjudication). This probe
measures, in ONE fresh session per invocation, the in-order sample
sequence of a query at sf0.1 (rep 1 = cold incl. JIT, reps 2+ = steady)
plus a stage split (training vs plan execution), so a structural change
to the codegen shape can be evaluated on data: did the COLD single drop,
and did steady state hold?

Usage: python tools/jit_cold_probe.py q151_pq_adc_topk q153_ivfpq_adc_topk
Writes/merges bench/jit_cold.json: {query: {"samples_in_order": [...],
"cold_sec": s, "steady_median_sec": s}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:] or ["q151_pq_adc_topk", "q153_ivfpq_adc_topk"]
    # same heap discipline as bench.py (pre-JVM)
    import bench

    bench._pin_driver_heap()
    from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY
    from data_engineering_nd_datalake_project_4_spark.session import session_builder

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = session_builder(app_name="jit_cold_probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    bench._run_plan(spark.read.parquet(f"{sf_dir}/region.parquet"))  # session warm-up

    out: dict = {}
    for name in names:
        samples = []
        for _ in range(4):
            t0 = time.perf_counter()
            bench._run_plan(REGISTRY[name].spark_fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        steady = sorted(samples[1:])[len(samples[1:]) // 2]
        out[name] = {
            "samples_in_order": samples,
            "cold_sec": samples[0],
            "steady_median_sec": steady,
            "cold_over_steady": round(samples[0] / max(steady, 1e-9), 2),
        }
        print(f"[jit] {name}: cold={samples[0]}s steady={steady}s "
              f"in-order={samples}", file=sys.stderr, flush=True)
    path = "bench/jit_cold.json"
    rec = {}
    if os.path.exists(path):
        with open(path) as f:
            rec = json.load(f)
    key = os.environ.get("SPARK_GRAFT_JIT_TAG", "head")
    rec.setdefault(key, {}).update(out)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"metric": "jit_cold_probe", "queries": {
        n: v["cold_over_steady"] for n, v in out.items()}}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
