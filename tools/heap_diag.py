"""Driver-heap growth diagnostic (VERDICT r11 task 2).

The round-11 lean bench run died of GC thrash at the JVM default heap
(~stage 2336 of the 170-query session); round 10's survived. This tool
re-runs the registry at the DEFAULT heap (no pin — deliberately the
crash condition) and samples the driver JVM every N queries:

- used heap before/after a forced ``System.gc()`` (the after-GC value is
  the LIVE SET — monotone growth there is a leak; growth only in the
  before-GC value is ordinary garbage pressure),
- ``memoryStore.blocksMemoryUsed`` (broadcast blocks + localCheckpoint
  RDD blocks live here — the two main suspects: every broadcast join
  leaves blocks until ContextCleaner's weak-ref pass, and localCheckpoint
  frames persist MEMORY_AND_DISK until driver GC drops the last ref),
- ``getPersistentRDDs`` count (localCheckpoint accumulation, visible
  directly).

Writes one JSON line per sample to ``/tmp/heap_diag.jsonl`` (flushed per
sample, so a GC-death run still leaves the growth curve) and a summary
to stdout. Run::

    python tools/heap_diag.py [sample_every]

Findings go to COVERAGE.md ("Driver-heap growth" note).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY
from data_engineering_nd_datalake_project_4_spark.session import get_spark

OUT = "/tmp/heap_diag.jsonl"


def _sample(spark, label: str, n_done: int, force_gc: bool) -> dict:
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()
    used_pre = rt.totalMemory() - rt.freeMemory()
    if force_gc:
        jvm.java.lang.System.gc()
        time.sleep(0.3)
    used_post = rt.totalMemory() - rt.freeMemory()
    env = jvm.org.apache.spark.SparkEnv.get()
    mem_store = env.blockManager().memoryStore()
    rec = {
        "label": label,
        "n_done": n_done,
        "max_mb": round(rt.maxMemory() / 2**20),
        "total_mb": round(rt.totalMemory() / 2**20),
        "used_pre_gc_mb": round(used_pre / 2**20),
        "used_post_gc_mb": round(used_post / 2**20),
        "memstore_blocks_mb": round(mem_store.blocksMemoryUsed() / 2**20, 1),
        "persistent_rdds": spark.sparkContext._jsc.getPersistentRDDs().size(),
        "t": round(time.perf_counter(), 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), file=sys.stderr)
    return rec


def main() -> None:
    every = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    open(OUT, "w").close()
    spark = get_spark(app_name="heap-diag")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    _sample(spark, "warm", 0, force_gc=True)
    names = sorted(REGISTRY)
    for i, name in enumerate(names, 1):
        try:
            df = REGISTRY[name].spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — the curve is the point
            with open(OUT, "a") as f:
                f.write(json.dumps({"label": name, "error": str(exc)[:200]}) + "\n")
            print(f"{name} FAILED: {exc}", file=sys.stderr)
        if i % every == 0:
            _sample(spark, name, i, force_gc=True)
    _sample(spark, "end", len(names), force_gc=True)
    spark.stop()
    print(f"samples in {OUT}")


if __name__ == "__main__":
    main()
