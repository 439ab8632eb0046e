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
