"""Smoke-test the scoreboard deliverable itself.

``bench.py`` is what the round driver runs on real hardware; a syntax
error or broken phase there silently turns a measured round into an
empty BENCH_r{N}.json. This drives the real script end-to-end (tiny
config, CPU, in-process measurement path — the supervisor wrapper is
exercised separately by its own --cpu fallback machinery) and checks
the output contract: exactly one final JSON line with a positive
scans/sec value and the semantic-sanity fields.
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_args=(), env_extra=None, timeout=280):
    env = dict(os.environ)
    env.update(env_extra or {})
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--quick", "--no-supervise", "--bounds", "16", "--voxel",
         "0.25", "--frames", "2", "--stream", "2"] + list(extra_args),
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
        env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    # the final line is the driver-parsed JSON (RESULT lines may precede)
    return json.loads(lines[-1]), out


def test_bench_quick_cpu_emits_contract_json():
    rec, _ = _run_bench()
    assert rec["unit"] == "scans/sec"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert 0 < rec["hit_rate"] <= 1
    # the device-corruption canary must be present and healthy on CPU
    assert rec["label_fill"] == 1.0
    assert not rec.get("degraded", False)
    # provenance contract (VERDICT r4 weak #1): a healthy stream-enabled
    # run must prove its headline came from the streamed phase
    assert rec["streamed_measured"] is True
    assert rec["headline_phase"].startswith("stream")
    assert ", stream" in rec["metric"]


def test_bench_budget_starved_marks_pipelined_fallback_degraded():
    """VERDICT r4 weak #1: a stream-enabled point whose streamed phase
    is budget-skipped must self-mark degraded so pin_floor (and any
    human) can never mistake the pipelined fallback for the floor-pinned
    streamed headline. Round 4's artifact recorded 65.63/68.74 scans/s
    as clean=true exactly this way."""
    # the streamed phase gate is remaining() > 30; a 25 s deadline is
    # past that gate the moment the (untimed-phase) quick burst ends
    rec, out = _run_bench(env_extra={"LT_BENCH_DEADLINE": "25"},
                          timeout=280)
    assert rec["value"] > 0, out.stderr[-2000:]
    assert rec["streamed_measured"] is False
    # quick burst, or the full pipelined loop if its remaining()>20 gate
    # still passed — either way the headline is a pipelined phase
    assert rec["headline_phase"].startswith("pipelined")
    assert rec["degraded"] is True
    assert "streamed phase skipped" in rec["note"]


def _load_pin_floor():
    spec = importlib.util.spec_from_file_location(
        "pin_floor", os.path.join(REPO, "scripts", "pin_floor.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pin_floor_rejects_non_streamed_samples():
    classify = _load_pin_floor().classify_sample
    streamed = {"value": 120.0, "metric": "x, stream 64)",
                "headline_phase": "stream 64", "streamed_measured": True}
    assert classify(streamed) == (True, None)
    # the round-4 failure shape: positive value, not degraded, no
    # backend key, but the headline is the pipelined fallback
    fallback = {"value": 65.63, "metric": "x, nscans 1)",
                "headline_phase": "pipelined-quick",
                "streamed_measured": False}
    assert classify(fallback) == (False, "not-streamed")
    # with the new bench the fallback also self-marks degraded — both
    # defenses must hold independently
    assert classify({**fallback, "degraded": True})[1] == "degraded"
    # a pre-provenance JSON (no fields, no label suffix) is rejected too
    legacy = {"value": 89.0, "metric": "x, nscans 1)"}
    assert classify(legacy) == (False, "not-streamed")
    # cpu fallback / degraded / empty stay rejected
    assert classify({"value": 50.0, "backend": "cpu-fallback",
                     "metric": "x, stream 2)"})[1] == "cpu-fallback"
    assert classify({"value": None})[1] == "no-value"
    # --stream 0 points opt out of the streamed requirement
    assert classify(fallback, require_streamed=False) == (True, None)
