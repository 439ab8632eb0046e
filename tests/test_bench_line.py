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


def test_pin_driver_heap_merges_and_is_idempotent():
    """The heap pin must run pre-JVM and survive caller-provided
    PYSPARK_SUBMIT_ARGS without doubling (VERDICT r11 task 1a).

    Env restore is EXPLICIT, not monkeypatch (ADVICE r12): delenv on an
    absent var records nothing, _pin_driver_heap then writes the var
    outside monkeypatch's bookkeeping, and a later monkeypatch.setenv
    snapshots THAT value — so '--driver-memory 8g pyspark-shell' leaked
    into the pytest process env, silently re-heaping the session JVM if
    this test ran before the spark fixture."""
    import os

    bench = _bench()
    sentinel = object()
    original = os.environ.get("PYSPARK_SUBMIT_ARGS", sentinel)
    try:
        os.environ.pop("PYSPARK_SUBMIT_ARGS", None)
        bench._pin_driver_heap()
        assert os.environ["PYSPARK_SUBMIT_ARGS"] == "--driver-memory 8g pyspark-shell"
        bench._pin_driver_heap()  # idempotent
        assert os.environ["PYSPARK_SUBMIT_ARGS"] == "--driver-memory 8g pyspark-shell"
        os.environ["PYSPARK_SUBMIT_ARGS"] = "--driver-memory 4g pyspark-shell"
        bench._pin_driver_heap()  # caller's explicit pin wins
        assert os.environ["PYSPARK_SUBMIT_ARGS"] == "--driver-memory 4g pyspark-shell"
    finally:
        if original is sentinel:
            os.environ.pop("PYSPARK_SUBMIT_ARGS", None)
        else:
            os.environ["PYSPARK_SUBMIT_ARGS"] = original


def test_headline_fatal_is_surfaced_in_the_scalar_line():
    """A setup/warm-up death must be visible ON the line (ADVICE r12): a
    crash-before-any-query otherwise reads value=0.0, n_failed=0 and a
    line-only consumer mistakes it for a suspiciously fast clean run."""
    bench = _bench()
    h = bench.build_headline(0.0, 0.1, 0, 1, None, None, fatal=True)
    line = json.dumps(h, separators=(",", ":"))
    assert len(line) <= bench._MAX_LINE_BYTES
    assert json.loads(line)["fatal"] is True
    # the clean path carries no fatal key at all (line stays minimal)
    assert "fatal" not in bench.build_headline(1.0, 0.1, 170, 1, None, 1.0)


def test_calib_gate_refuses_ambient_slow_and_tracks_round_best(tmp_path):
    """VERDICT r12 task 1: the regeneration gate must refuse a session
    >15% ambient-slow vs the round's best, seed/update the rolling best,
    and expire a stale (previous-round) best."""
    bench = _bench()
    best = str(tmp_path / "calib_best.json")
    now = 1_000_000.0
    # first observation seeds the best and passes
    g = bench.calib_gate(2.0, now, best)
    assert g["pass"] and g["best"] is None
    # within 15% of best: pass, best unchanged (2.2 > 2.0)
    assert bench.calib_gate(2.2, now + 60, best)["pass"]
    assert json.loads(Path(best).read_text())["calib_sec"] == 2.0
    # >15% above best: REFUSE
    g = bench.calib_gate(2.5, now + 120, best)
    assert not g["pass"] and g["best"] == 2.0
    # a faster session lowers the best
    assert bench.calib_gate(1.8, now + 180, best)["pass"]
    assert json.loads(Path(best).read_text())["calib_sec"] == 1.8
    # stale best (older than the TTL = a previous round) is ignored:
    # ambient genuinely drifts across rounds, the gate is round-local
    g = bench.calib_gate(9.9, now + bench._CALIB_BEST_TTL_SEC + 181, best)
    assert g["pass"] and g["best"] is None
    # missing/corrupt best file never blocks
    (tmp_path / "calib_best.json").write_text("not json")
    assert bench.calib_gate(5.0, now, best)["pass"]


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
