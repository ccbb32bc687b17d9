"""Execute the committed experiment driver scripts end to end (tiny CPU
configs) so the code paths behind the committed artifacts stay green.

Opt-in with the soak suites (LT_SOAK=1): each run trains real models for
a few steps and takes a couple of minutes on the 1-core host. The
artifact-producing invocations (documented in BASELINE.md) are the same
scripts at --steps 300 on the real chip.
"""

import json
import os
import subprocess
import sys

import pytest

SOAK = bool(os.environ.get("LT_SOAK"))
pytestmark = pytest.mark.skipif(not SOAK, reason="set LT_SOAK=1 to run")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, out, extra=()):
    cmd = [sys.executable, os.path.join(REPO, "scripts", script),
           "--cpu", "--steps", "6", "--frames", "3", "--out", out,
           *extra]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    return r


def test_upsample_workflow_script(tmp_path):
    out = str(tmp_path / "up")
    _run("run_upsample_workflow.py", out,
         extra=["--width", "256", "--work", str(tmp_path / "w1")])
    rows = {}
    for n in ("fake64_on_real64", "real32_on_real64", "real64_on_fake64"):
        with open(os.path.join(out, f"{n}.json")) as f:
            rows[n] = json.load(f)
    for n, r in rows.items():
        assert 0.0 <= r["acc"] <= 1.0 and "miou_present" in r, n
        assert r["bounds"] == 80.0
    # trained-on-real rows see in-distribution data even at 6 steps;
    # a near-zero acc would mean the pipeline itself is broken
    assert rows["real32_on_real64"]["acc"] > 0.3


def test_crossgeo_workflow_script(tmp_path):
    out = str(tmp_path / "cg")
    _run("run_crossgeo_workflow.py", out,
         extra=["--width", "256", "--work", str(tmp_path / "w2")])
    for n in ("fake_on_real", "real_on_fake_identity", "real_on_fake"):
        with open(os.path.join(out, f"{n}.json")) as f:
            r = json.load(f)
        assert 0.0 <= r["acc"] <= 1.0 and "miou_present" in r, n
        assert r["bounds"] == 80.0
