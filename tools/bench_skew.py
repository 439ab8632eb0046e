"""Skew PERFORMANCE lane: measure the join/window-heavy bench slice on
the ``skewkeys`` hot-key distribution at sf0.1 and compare against the
base medians (VERDICT r9 task 4).

The ``skewkeys`` soak variant gates SEMANTICS under skew (one customer
owns ~50% of orders, one part ~50% of lineitem, one user ~50% of events,
one embedding label ~50% of vectors, a stop-word-dominant corpus); this
lane measures what that histogram does to WALL TIME — the machinery that
should absorb it (AQE skew-join splitting, broadcast dimension joins,
salted/banded operators) has unit tests but, before round 10, no measured
number. A query whose skew median exceeds 2× its base median gets a
``skew.hot_cold_join``/AQE fix or a written floor analysis in the results
file.

The variant is built once into /tmp/spark_graft_scale/skew0.1 by reusing
``tools/soak_regen.build_variant`` (same rewrite that the semantics gate
runs at sf0.01) — measured data = gated data, one code path.

Usage:
    python tools/bench_skew.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
SKEW = "/tmp/spark_graft_scale/skew0.1"

#: the join/window-heavy graded slice: snowflake join+agg over the skewed
#: FK chain (q08), greatest-n-per-group over the skewed customer (q11),
#: 3-table volume join over the skewed part (q98), market-share join tree
#: (q120), and the banded-LSH dedup over the skewed label space (q142)
QUERIES = ["q08", "q11", "q98_volume_shipping", "q120_market_share",
           "q142_semantic_dedup"]


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    args = ap.parse_args()

    if not os.path.exists(f"{SKEW}/lineitem.parquet"):
        from tools.soak_regen import build_variant

        build_variant("skewkeys", Path(SKEW), src_dir=Path(BASE))

    from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY
    from data_engineering_nd_datalake_project_4_spark.session import get_spark

    spark = get_spark(app_name="bench_skew")
    spark.sparkContext.setLogLevel("ERROR")
    _run(spark.read.parquet(f"{BASE}/region.parquet"))  # warm-up

    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = REGISTRY[name].spark_fn
        entry: dict = {}
        for label, sf_dir in (("base", BASE), ("skew", SKEW)):
            for _ in range(2):  # page cache + C2 warm-ups (lane protocol)
                _run(fn(spark, sf_dir))
            samples = []
            for _ in range(args.reps):
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
                _run(df)
                samples.append(round(time.perf_counter() - t0, 3))
            samples.sort()
            entry[label] = {
                "median_sec": samples[len(samples) // 2],
                "samples": samples,
            }
        ratio = round(
            entry["skew"]["median_sec"] / max(entry["base"]["median_sec"], 1e-9), 2
        )
        entry["skew_over_base"] = ratio
        entry["exceeds_2x"] = ratio > 2.0
        out[name] = entry
        print(f"[skew] {name:22s} base={entry['base']['median_sec']:6.2f}s "
              f"skew={entry['skew']['median_sec']:6.2f}s ratio={ratio:5.2f}x"
              f"{'  ** >2x' if entry['exceeds_2x'] else ''}",
              file=sys.stderr, flush=True)

    result = {
        "description": "join/window-heavy slice at sf0.1: base vs the "
        "skewkeys hot-key variant (tools/soak_regen.py rewrite at sf0.1; "
        "one key owns ~50% of each fact table), local[32]. ratio = skew "
        "median / base median; > 2x requires a hot_cold_join/AQE fix or "
        "a floor analysis.",
        "reps": args.reps,
        "queries": out,
        "max_skew_over_base": max(e["skew_over_base"] for e in out.values()),
    }
    os.makedirs("bench", exist_ok=True)
    with open("bench/results_skew.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"metric": "skew_lane_max_ratio",
                      "value": result["max_skew_over_base"],
                      "unit": "x_vs_base"}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
