#!/usr/bin/env python3
"""Pin the worst-compile-regime throughput floor (VERDICT r2 #2).

The remote TPU compiler in this environment is nondeterministic about
lowering (the same HLO can get scalar vs vectorized gathers between
compile-cache misses — CLAUDE.md / docs/PERF.md). The headline number
therefore has a regime spread; the claim that matters is the WORST-regime
streamed throughput vs the >=50 scans/s target.

This harness samples that distribution: N bench.py runs, each with a
FRESH local persistent-cache dir (forcing remote compiles and thus fresh
lowering draws), recording each run's headline JSON. Output:
min / median / max + all samples, written to the given JSON path.

Usage: python scripts/pin_floor.py [-n 10] [-o floor_samples.json]
       [--bench-arg=--nscans --bench-arg=3]
(note the ``=``: argparse rejects option-like values given as separate
tokens for append options)
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=10)
    ap.add_argument("-o", default="floor_samples.json")
    ap.add_argument("--deadline", type=float, default=280.0,
                    help="per-run LT_BENCH_DEADLINE")
    ap.add_argument("--bench-arg", action="append", default=[],
                    help="extra args forwarded to bench.py (repeatable)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    samples = []
    clean = 0
    attempts = 0
    # keep sampling until n CLEAN (non-degraded, on-device) measurements
    # exist or 2n attempts are spent — sick-tunnel windows produce
    # degraded / cpu-fallback JSON that must NOT enter the floor stats
    while clean < args.n and attempts < 2 * args.n:
        i = attempts
        attempts += 1
        cache = tempfile.mkdtemp(prefix=f"lt_floor_cache_{i}_")
        env = dict(os.environ)
        env["LT_JAX_CACHE"] = cache          # fresh local cache ->
        env["LT_BENCH_DEADLINE"] = str(args.deadline)  # remote recompile
        t0 = time.time()
        try:
            # own session: on timeout the WHOLE process group dies —
            # killing only the supervisor would orphan its inner measure
            # child, which keeps dispatching TPU work and contends with
            # (i.e. corrupts) every subsequent sample
            proc = subprocess.Popen(
                [sys.executable, os.path.join(repo, "bench.py"),
                 "--quick"] + args.bench_arg,
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, start_new_session=True)
            try:
                stdout, _ = proc.communicate(timeout=args.deadline + 30)
            except subprocess.TimeoutExpired:
                import signal

                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                raise
            line = [ln for ln in stdout.splitlines()
                    if ln.startswith("{")]
            rec = json.loads(line[-1]) if line else {"value": None}
        except (subprocess.TimeoutExpired, ValueError) as e:
            rec = {"value": None, "error": str(e)[:200]}
        finally:
            shutil.rmtree(cache, ignore_errors=True)
        rec["wall_seconds"] = round(time.time() - t0, 1)
        rec["clean"] = (isinstance(rec.get("value"), (int, float))
                        and rec["value"] > 0
                        and not rec.get("degraded")
                        and "backend" not in rec)
        clean += bool(rec["clean"])
        samples.append(rec)
        print(f"run {i+1} (clean {clean}/{args.n}): "
              f"value={rec.get('value')} clean={rec['clean']} "
              f"({rec['wall_seconds']}s)", flush=True)

    vals = sorted(s["value"] for s in samples if s["clean"])
    summary = {
        "n_requested": args.n,
        "n_measured": len(vals),
        "min": vals[0] if vals else None,
        "median": (round((vals[(len(vals) - 1) // 2]
                          + vals[len(vals) // 2]) / 2, 2)
                   if vals else None),
        "max": vals[-1] if vals else None,
        "all_sorted": vals,
        "bench_args": args.bench_arg,
        "note": "each sample ran with a fresh local persistent-cache dir "
                "(fresh remote-compiler lowering draw); --quick headline "
                "= best of pipelined and streamed throughput",
        "samples": samples,
    }
    with open(args.o, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("n_measured", "min", "median", "max")}))


if __name__ == "__main__":
    main()
