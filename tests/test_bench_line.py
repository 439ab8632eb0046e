"""Pin bench.py's stdout contract (VERDICT r10 task 1, the five-round
parsed:null regression): the summary line must stay far inside the
driver's 2000-char stdout capture, carry NO per-query map, and keep the
driver-parsed scalar fields."""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _bench():
    spec = importlib.util.spec_from_file_location("bench_mod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_is_scalar_only_and_fits_the_capture_buffer():
    bench = _bench()
    h = bench.build_headline(
        total=99999.999, sf=100.0, n_queries=9999, reps=99,
        sparkify_sec=99999.999, calib_sec=9999.999,
    )
    line = json.dumps(h, separators=(",", ":"))
    assert len(line) <= bench._MAX_LINE_BYTES <= 1500
    # no container values: a per-query map is exactly how rounds 6-10
    # silently lost the official bench metric
    assert all(not isinstance(v, (dict, list)) for v in h.values()), h
    # the fields the driver parses
    assert h["metric"] == "total_query_seconds" and h["unit"] == "sec"
    assert {"value", "sf", "n_queries", "reps", "calib_sec"} <= set(h)


def test_headline_zero_calibration_is_safe():
    bench = _bench()
    h = bench.build_headline(1.0, 0.1, 170, 1, 1.0, 0.0)
    assert h["value_per_calib"] is None


def test_headline_partial_run_is_parseable():
    """A crashed/partial run (null calib, null pipeline, failures) must
    still serialize to a small scalar-only line (VERDICT r11 task 1c)."""
    bench = _bench()
    h = bench.build_headline(12.3, 0.1, 170, 1, None, None, n_failed=42)
    line = json.dumps(h, separators=(",", ":"))
    parsed = json.loads(line)
    assert len(line) <= bench._MAX_LINE_BYTES
    assert parsed["n_failed"] == 42 and parsed["value"] == 12.3
    assert parsed["calib_sec"] is None and parsed["value_per_calib"] is None


def test_pin_driver_heap_merges_and_is_idempotent(monkeypatch):
    """The heap pin must run pre-JVM and survive caller-provided
    PYSPARK_SUBMIT_ARGS without doubling (VERDICT r11 task 1a)."""
    import os

    bench = _bench()
    monkeypatch.delenv("PYSPARK_SUBMIT_ARGS", raising=False)
    bench._pin_driver_heap()
    assert os.environ["PYSPARK_SUBMIT_ARGS"] == "--driver-memory 8g pyspark-shell"
    bench._pin_driver_heap()  # idempotent
    assert os.environ["PYSPARK_SUBMIT_ARGS"] == "--driver-memory 8g pyspark-shell"
    monkeypatch.setenv("PYSPARK_SUBMIT_ARGS", "--driver-memory 4g pyspark-shell")
    bench._pin_driver_heap()  # caller's explicit pin wins
    assert os.environ["PYSPARK_SUBMIT_ARGS"] == "--driver-memory 4g pyspark-shell"


def test_run_queries_survives_a_mid_registry_failure(spark, sf_dir):
    """RED CASE for the r11 crash class: one query raising mid-registry
    must record null + an error and let the rest of the run complete."""
    from types import SimpleNamespace

    from pyspark.sql import functions as F

    bench = _bench()

    def good(s, d):
        return s.range(10).select(F.col("id").alias("n"))

    def bad(s, d):
        raise MemoryError("simulated heap death")

    registry = {
        "q_aa_good": SimpleNamespace(spark_fn=good),
        "q_mm_bad": SimpleNamespace(spark_fn=bad),
        "q_zz_good": SimpleNamespace(spark_fn=good),
    }
    timings, samples, errors, _ = bench.run_queries(spark, sf_dir, registry, reps=1)
    assert timings["q_mm_bad"] is None
    assert "MemoryError" in errors["q_mm_bad"]
    # the queries sorted AFTER the failure still ran and timed
    assert timings["q_zz_good"] is not None and timings["q_aa_good"] is not None
    assert set(samples) == {"q_aa_good", "q_zz_good"}
    # and the partial headline is a parseable scalar line
    ok = {k: v for k, v in timings.items() if v is not None}
    h = bench.build_headline(
        round(sum(ok.values()), 3), 0.001, len(timings), 1, None, None,
        n_failed=len(timings) - len(ok),
    )
    assert json.loads(json.dumps(h))["n_failed"] == 1
