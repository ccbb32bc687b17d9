"""Smoke-test the scoreboard deliverable itself.

``bench.py`` is what the round driver runs on real hardware; a syntax
error or broken phase there silently turns a measured round into an
empty BENCH_r{N}.json. This drives the real script end-to-end (tiny
config, CPU, in-process measurement path — the supervisor wrapper is
exercised separately by its own --cpu fallback machinery) and checks
the output contract: exactly one final JSON line with a positive
scans/sec value and the semantic-sanity fields.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_quick_cpu_emits_contract_json():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--quick", "--no-supervise", "--bounds", "16", "--voxel",
         "0.25", "--frames", "2", "--stream", "2"],
        capture_output=True, text=True, timeout=280, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    # the final line is the driver-parsed JSON (RESULT lines may precede)
    rec = json.loads(lines[-1])
    assert rec["unit"] == "scans/sec"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert 0 < rec["hit_rate"] <= 1
    # the device-corruption canary must be present and healthy on CPU
    assert rec["label_fill"] == 1.0
    assert not rec.get("degraded", False)
