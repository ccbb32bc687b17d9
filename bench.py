#!/usr/bin/env python3
"""Headline benchmark: virtual scans/sec/chip, 64-beam -> 32-beam transfer.

Protocol per BASELINE.md: source 64 x 2048 (HDL64-like), target 32 beams,
voxel 0.05 m, mergemesh adaption (the reference's main path, SURVEY.md §3.1).
The scene is the procedural synthetic world (the reference's minimal.zip
fixture is not shipped); point counts (~130k/scan) match SemanticKITTI.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "scans/sec", "vs_baseline": N}
vs_baseline is against the BASELINE.json north star of 50 scans/sec/chip.

Survivability (round-2 postmortem: the axon tunnel's first device->host
transfer regressed past 9 minutes and the driver's timeout killed the
bench before any output): by default the process SUPERVISES a child that
does the real measurement under a wall-clock budget (env LT_BENCH_DEADLINE,
default 300 s).  The child emits partial "RESULT {...}" lines the moment
each throughput number exists and heartbeats its current phase to stderr
every 10 s; if it hangs, the supervisor kills it, optionally re-measures
on the CPU backend with the leftover budget, and ALWAYS prints a JSON
line (marked "degraded" when the full protocol didn't run).

Usage: python bench.py [--frames N] [--warmup N] [--voxel V] [--cpu]
       LT_BENCH_DEADLINE=600 python bench.py        # larger budget
       python bench.py --no-supervise               # measure in-process
"""

import argparse
import contextlib
import json
import os
import subprocess
import sys
import threading
import time

_T0 = time.monotonic()
_PHASE = "startup"
_DEADLINE = float(os.environ.get("LT_BENCH_DEADLINE", "300"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def remaining():
    return _DEADLINE - (time.monotonic() - _T0)


def set_phase(name):
    global _PHASE
    _PHASE = name
    log(f"[{time.monotonic()-_T0:6.1f}s] phase: {name}")


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--voxel", type=float, default=0.05)
    ap.add_argument("--nscans", type=int, default=1)
    ap.add_argument("--stream", type=int, default=64,
                    help="Frames per device program (lax.scan mini-batch) "
                         "for the headline throughput; a 2x-batch point "
                         "is also taken when the budget allows; 0 = "
                         "per-frame dispatch only.")
    ap.add_argument("--identity", action="store_true",
                    help="identity 64x2048 target instead of 32 beams "
                         "(BASELINE.md protocol's second operating point)")
    ap.add_argument("--upsample", action="store_true",
                    help="128x2048 target (2x beam density): exercises "
                         "the chord-interpolated upsampling coverage "
                         "(ops/splat._interp_candidates; default-routes "
                         "to the classic deferred body — measured faster "
                         "than the interpolating fast body, which "
                         "LT_INTERP_STREAM_BODY=fast keeps for A/B)")
    ap.add_argument("--adaption", default="mergemesh",
                    choices=["mergemesh", "mesh", "cp", "catmesh"],
                    help="mesh = per-scan integrates (staged dispatch; "
                         "measures the materialized-fusion pipeline); "
                         "cp = pure projection resampling (no volume); "
                         "catmesh = per-category semantics on the splat "
                         "body (device engine, round 4)")
    ap.add_argument("--bounds", type=float, default=50.0,
                    help="Half-extent of the xy voxel bounds in meters "
                         "(50 = the reference's config/lidar_transfer.yaml "
                         "operating point).")
    ap.add_argument("--no-compact", action="store_true",
                    help="f32 volumes instead of the 8 B/voxel compact "
                         "layout (needs small --bounds to fit HBM).")
    ap.add_argument("--fusion", action="store_true",
                    help="Also measure materialized TSDF-integrate "
                         "throughput (the reference's 'fusion FPS' printed "
                         "field; the transfer itself defers this write).")
    ap.add_argument("--quick", action="store_true",
                    help="Headline throughput only: skip the latency loop, "
                         "miss decomposition, and fusion phases.")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-supervise", action="store_true",
                    help="Measure in this process (no watchdog child).")
    return ap.parse_args(argv)


# --------------------------------------------------------------- supervisor

def _reader(stream, sink_line, echo=None):
    def run():
        for raw in iter(stream.readline, b""):
            line = raw.decode("utf-8", "replace").rstrip("\n")
            if echo is not None:
                print(line, file=echo, flush=True)
            if sink_line is not None:
                sink_line(line)
        stream.close()
    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


class _Child:
    """An inner measurement child with live-parsed output."""

    def __init__(self, extra_args, budget, tag):
        env = dict(os.environ)
        env["LT_BENCH_INNER"] = "1"
        env["LT_BENCH_DEADLINE"] = str(max(budget, 10.0))
        cmd = [sys.executable, os.path.abspath(__file__)] + sys.argv[1:] \
            + extra_args
        log(f"supervisor: starting {tag} child (budget {budget:.0f}s): "
            f"{' '.join(cmd[1:])}")
        self.tag = tag
        self.final = None
        self.partial = None
        self.proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                                     stderr=subprocess.PIPE)
        self._t_out = _reader(self.proc.stdout, self._on_stdout)
        self._t_err = _reader(self.proc.stderr, None, echo=sys.stderr)

    def _on_stdout(self, line):
        line = line.strip()
        payload = key = None
        if line.startswith("RESULT "):
            payload, key = line[len("RESULT "):], "partial"
        elif line.startswith("{"):
            payload, key = line, "final"
        if payload:
            try:
                setattr(self, key, json.loads(payload))
            except ValueError:
                pass

    def done(self):
        return self.proc.poll() is not None

    def kill(self):
        if not self.done():
            self.proc.kill()
        self.proc.wait()
        self._t_out.join(timeout=5)
        self._t_err.join(timeout=5)
        if self.proc.returncode not in (0, None):
            if self.final is not None:
                # the supervisor kills every child once the final JSON is
                # in hand (teardown-hang insurance) — not a failure
                log(f"supervisor: {self.tag} child killed post-result "
                    f"(expected; rc={self.proc.returncode})")
            else:
                log(f"supervisor: {self.tag} child exited "
                    f"rc={self.proc.returncode}")


def supervise(args):
    """Always print exactly one JSON line on stdout, within the deadline.

    The TPU child gets (almost) the whole budget. If it has produced no
    number by 55% of the budget — the signature of the tunnel-warmup
    hang that killed round 2's driver bench — a CPU fallback child
    starts IN PARALLEL (the hung child is network-blocked, not
    CPU-bound), so a real measurement exists by the deadline either way;
    the TPU result is preferred whenever it lands.
    """
    reserve = 8.0                        # time to kill + print
    budget = remaining() - reserve
    tpu = _Child([], budget, "primary")
    cpu = None
    cpu_trigger = _T0 + 0.55 * budget
    while remaining() > reserve:
        if tpu.final is not None:
            break
        crashed = (tpu.done() and tpu.final is None
                   and tpu.partial is None)
        if (cpu is None and not args.cpu
                and tpu.partial is None
                and (crashed or time.monotonic() > cpu_trigger)):
            log("supervisor: primary child "
                + ("crashed without a number"
                   if crashed else "still numberless at 55% of budget")
                + " — starting CPU fallback")
            cpu = _Child(["--cpu", "--quick", "--frames", "4",
                          "--warmup", "1", "--stream", "2"],
                         remaining() - reserve, "cpu-fallback")
        if tpu.done() and (cpu is None or cpu.done()):
            break
        time.sleep(0.5)
    tpu.kill()
    if cpu is not None:
        if tpu.final is None:
            # give an in-flight cpu child a moment to finish its print
            t_end = time.monotonic() + max(remaining() - 2.0, 0.0)
            while not cpu.done() and time.monotonic() < t_end \
                    and cpu.final is None:
                time.sleep(0.25)
        # (the preferred TPU result already exists otherwise — don't
        # idle behind the fallback)
        cpu.kill()

    got = tpu.final or tpu.partial
    if got is not None:
        if got is tpu.partial:
            got["degraded"] = True
            got["note"] = "child hung/died after this measurement"
        print(json.dumps(got))
        return 0
    if cpu is not None and (cpu.final or cpu.partial) is not None:
        got = cpu.final or cpu.partial
        got["degraded"] = True
        got["backend"] = "cpu-fallback"
        got["note"] = ("TPU measurement hung (tunnel warmup pathology); "
                       "value measured on the host CPU")
        print(json.dumps(got))
        return 0
    print(json.dumps({
        "metric": "virtual scans/sec/chip (64x2048 transfer)",
        "value": 0.0, "unit": "scans/sec", "vs_baseline": 0.0,
        "degraded": True,
        "note": "no measurement completed within LT_BENCH_DEADLINE "
                f"({_DEADLINE:.0f}s); see stderr heartbeats for the "
                "phase that hung",
    }))
    return 0


# -------------------------------------------------------------------- inner

def _heartbeat():
    def run():
        while True:
            time.sleep(10)
            log(f"hb {time.monotonic()-_T0:6.1f}s elapsed, "
                f"{remaining():6.1f}s left, phase={_PHASE}")
    threading.Thread(target=run, daemon=True).start()


def _warm_transfer_path(jnp, np):
    """First device->host transfer, watchdog'd.

    It can take 25-100 s through the axon tunnel (minutes when the
    tunnel is sick).  Run it in a worker thread so this thread can
    heartbeat and retry with fresh dispatches; an unserviceable tunnel
    is ultimately the supervisor's problem (it kills us at budget).
    """
    done = threading.Event()
    errors = []

    def xfer():
        try:
            np.asarray(jnp.zeros((8, 128), jnp.float32))
            np.asarray(jnp.zeros((8, 128), bool))
            done.set()              # only a SUCCESSFUL transfer warms
        except Exception as e:      # a failed (not hung) transfer must
            errors.append(e)        # not silently count as warmed
            if len(errors) >= 3:
                done.set()

    t0 = time.monotonic()
    threading.Thread(target=xfer, daemon=True).start()
    attempt = 1
    while not done.wait(timeout=60.0):
        # Unsupervised (--no-supervise / direct LT_BENCH_INNER) there is
        # nobody to kill us at budget: give up when the deadline passes
        # rather than spawning retry threads forever.
        if remaining() <= 10.0:
            log(f"transfer-path warmup gave up after "
                f"{time.monotonic()-t0:.0f}s (budget exhausted) — timed "
                "phases will include the first transfer's cost")
            return
        attempt += 1
        log(f"warmup transfer still blocked after "
            f"{time.monotonic()-t0:.0f}s — dispatching retry {attempt}")
        threading.Thread(target=xfer, daemon=True).start()
    if errors:
        log(f"transfer-path warmup saw {len(errors)} error(s): "
            f"{errors[-1]!r} — timed phases may misattribute the first "
            "successful transfer's cost")
    log(f"transfer-path warmup: {time.monotonic()-t0:.1f}s")


def measure(args):
    """The real measurement. Emits RESULT lines as numbers appear and a
    final JSON line; budget-aware (optional phases are skipped when the
    remaining time would not cover them)."""
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    _heartbeat()
    set_phase("import jax")
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()

    from lidar_transfer_tpu.config import (HDL64, SensorSpec, TransferConfig)
    from lidar_transfer_tpu.datasets import kitti, synthetic
    from lidar_transfer_tpu.pipeline import TransferEngine
    from lidar_transfer_tpu.pipeline.multiscan import ScanWindow

    log(f"devices: {jax.devices()}")
    # The device->host transfer warmup (25-100 s healthy, 340+ s when the
    # tunnel is sick — it killed round 2's driver bench) must run BEFORE
    # any timed phase: until the first transfer initializes the sync
    # machinery, block_until_ready on this runtime is only an async ACK
    # (measured: a 30x4096^3 matmul chain "blocked" in 0.1 s pre-warmup,
    # 47 ms post-warmup) and every timed loop would measure dispatch
    # rate, not device time. The watchdog + supervisor deadline bound the
    # damage when the warmup hangs; timed loops additionally FETCH one
    # element of their final output so the measurement stays honest even
    # if the barrier semantics change again.
    set_phase("device->host transfer warmup")
    _warm_transfer_path(jnp, np)

    source = HDL64
    if args.identity:
        target = source          # 64x2048 -> 64x2048 (protocol's 2nd point)
    elif args.upsample:
        target = SensorSpec(name="HDL64x2", beams=128,
                            fov_up=source.fov_up,
                            fov_down=source.fov_down,
                            angle_res_hor=source.angle_res_hor)
    else:
        target = SensorSpec(name="HDL32-like", beams=32, fov_up=3.0,
                            fov_down=-25.0, angle_res_hor=360.0 / 2048.0)
    b = args.bounds
    cfg = TransferConfig(
        adaption=args.adaption, number_of_scans=args.nscans,
        voxel_size=args.voxel,
        voxel_bounds=((-b, b), (-b, b), (-5.0, 5.0)))

    metric_name = (f"virtual scans/sec/chip (64x2048 -> "
                   f"{target.H}x{target.W}, {args.adaption}, "
                   f"voxel {args.voxel}m, bounds +-{args.bounds:g}m, "
                   f"nscans {args.nscans}")
    # Provenance fields (VERDICT r4 weak #1): floor campaigns pin the
    # STREAMED figure; a budget-skipped streamed phase must be machine-
    # detectable, not inferred from the metric label.  headline_phase
    # names the phase whose measurement is the reported value;
    # streamed_measured says whether ANY streamed phase completed.
    result = {"metric": metric_name + ")", "value": 0.0,
              "unit": "scans/sec", "vs_baseline": 0.0,
              "streamed_measured": False,
              "headline_phase": "none"}

    def emit_partial():
        # the supervisor keeps the LAST partial: re-emit after every field
        # update so a reconstructed JSON (child killed mid-phase) carries
        # hit_rate / label_fill / sync_latency_ms, not just the number
        print("RESULT " + json.dumps(result), flush=True)

    def record(sps, note="", phase="pipelined"):
        # The headline of a stream-enabled point IS the streamed figure
        # (the floor-pinned claim): the FIRST streamed measurement
        # replaces any provisional pipelined value even downward, and
        # later pipelined figures go to a side field instead of the
        # headline (tiny CPU shapes can pipeline faster than they
        # stream, which round 4 proved can silently swap the claim).
        streamed = phase.startswith("stream")
        have_streamed = result["headline_phase"].startswith("stream")

        def set_headline():
            result["value"] = round(sps, 2)
            result["vs_baseline"] = round(sps / 50.0, 3)
            result["metric"] = metric_name + note + ")"
            result["headline_phase"] = phase

        if streamed:
            result["streamed_measured"] = True
            if not have_streamed or sps > result["value"]:
                set_headline()
        elif have_streamed:
            result["pipelined_scans_per_sec"] = max(
                result.get("pipelined_scans_per_sec", 0.0),
                round(sps, 2))
        elif sps > result["value"]:
            set_headline()
        emit_partial()

    set_phase("build inputs")
    # synthetic scans at slightly different poses (static shapes: capacity
    # fits the 64x2048 = 131k max return count)
    scene = synthetic.Scene.default()
    poses = synthetic.straight_line_poses(args.nscans, step=1.0)
    cap = 139264  # 64*2048 = 131072 returns, rounded up one 8k bucket

    pts_l, rem_l, lbl_l, val_l, rel_l = [], [], [], [], []
    inv0 = np.linalg.inv(poses[0])
    for i in range(args.nscans):
        pts, rem, lbl = synthetic.simulate_scan(scene, source, poses[i])
        p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
        pts_l.append(p)
        rem_l.append(r)
        lbl_l.append(l)
        val_l.append(m)
        rel_l.append((inv0 @ poses[i]).astype(np.float32))
    window = ScanWindow(
        points=jnp.asarray(np.stack(pts_l)),
        remissions=jnp.asarray(np.stack(rem_l)),
        labels=jnp.asarray(np.stack(lbl_l)),
        valid=jnp.asarray(np.stack(val_l)),
        rel_pose=jnp.asarray(np.stack(rel_l)),
        primary_index=0,
    )
    log(f"window: {window.nscans} scans x {cap} capacity, "
        f"{int(np.stack(val_l).sum())} real points")

    eng = TransferEngine(source, target, cfg, cap, fixed_bounds=True,
                         compact_volume=not args.no_compact)
    log(f"volume dims {eng.vol_dims} "
        f"({np.prod(eng.vol_dims)/1e6:.1f}M voxels)")

    def run_frame(w):
        # the production throughput entry: no per-frame RangeImage
        # assembly (its winner-attribute gathers dominated the frame
        # under the remote compiler's scalar-gather lowering)
        return eng.transfer_fast(w)

    def sync(x):
        """Completion barrier that cannot lie: fetch one element of the
        output (device->host), which orders after all prior device work.
        block_until_ready alone is an async ACK on some axon runtimes."""
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[:1, :1] if x.ndim >= 2 else x[:1]))

    set_phase("compile + warmup")
    t0 = time.perf_counter()
    for _ in range(args.warmup):
        vs = run_frame(window)
        sync(vs.range)
    log(f"warmup+compile: {time.perf_counter()-t0:.1f}s")

    # FIRST NUMBER ASAP — a short pipelined burst so a later hang still
    # leaves the supervisor a real throughput measurement
    set_phase("quick pipelined throughput")
    qf = max(4, min(args.frames, 8))
    t0 = time.perf_counter()
    outs = [run_frame(window) for _ in range(qf)]
    sync(outs[-1].range)
    record(qf / (time.perf_counter() - t0), phase="pipelined-quick")
    vs = outs[-1]
    rays = target.H * target.W

    # semantic sanity: on THIS bench's synthetic world every source
    # point carries a label > 0, so every hit pixel must too — catches
    # TPU-only data corruption the CPU tests can't (e.g. subnormal-flush
    # of bitcast label bits). NOTE: band membership itself is geometric
    # (label-0 surfaces are legitimately opaque since the round-3
    # alignment, ops/splat.py); a future bench fed real scans with
    # unlabeled points must drop or rescale this canary.
    # Recorded in the JSON (and echoed); never blocks the number.
    def canary(tag, out):
        hitm = np.asarray(out.mask)
        hit = float(hitm.mean())
        if tag == "pipelined":
            log(f"hit rate {hit:.3f}")
            result["hit_rate"] = round(hit, 4)
        if not hitm.any():
            # an all-miss output is the MOST broken case — never let it
            # pass as a clean sample (pin_floor trusts these fields)
            log(f"{tag} output has ZERO hits — marking degraded")
            result["label_fill"] = 0.0
            result["degraded"] = True
            result["note"] = f"{tag} transfer output has no hit pixels"
            return
        lbl_fill = float((np.asarray(out.label)[hitm] > 0).mean())
        log(f"label fill over hit pixels ({tag}): {lbl_fill:.4f}")
        result["label_fill"] = min(result.get("label_fill", 1.0),
                                   round(lbl_fill, 4))
        if lbl_fill <= 0.999:
            result["degraded"] = True
            result["note"] = (f"labels lost on device in the {tag} "
                              "program (see splat.py subnormal note)")

    # canary the pipelined output NOW: the streamed phase below pays a
    # separate remote compile (minutes on a sick tunnel) and a child
    # killed at budget must still carry the corruption-canary fields in
    # its reconstructed partial JSON
    set_phase("hit-rate + label-fill check (pipelined)")
    canary("pipelined", vs)
    emit_partial()

    # STREAMED throughput (the headline with --stream F): F frames per
    # device program via TransferEngine.transfer_stream — after the
    # gather-free rewrite the per-program launch overhead (~1.8 ms
    # through the remote runtime) dominates the 2.6 ms device frame;
    # mini-batching amortizes it.
    def streamed_phase(F):
        set_phase(f"streamed throughput (batch {F})")
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (F,) + x.shape), window)
        sv = eng.transfer_stream(stacked)          # compile
        sync(sv.range)
        # enough pipelined batches that one batch's launch/sync or a
        # single tunnel hiccup can't dominate (3 batches read 141 and
        # 356 scans/s back-to-back in the same compile regime)
        n_batches = max(6, args.frames // F)
        trace_dir = os.environ.get("LT_BENCH_TRACE_STREAM")
        trace = (jax.profiler.trace(trace_dir) if trace_dir
                 else contextlib.nullcontext())
        t0 = time.perf_counter()
        with trace:
            souts = [eng.transfer_stream(stacked)
                     for _ in range(n_batches)]
            sync(souts[-1].range)
        s_dt = time.perf_counter() - t0
        s_sps = n_batches * F / s_dt
        log(f"{n_batches}x{F} streamed frames in {s_dt:.2f}s -> "
            f"{s_sps:.2f} scans/s, "
            f"{s_sps*rays/1e6:.1f} Mrays/s synthesized")
        record(s_sps, note=f", stream {F}", phase=f"stream {F}")
        # last frame of the last batch, for the canary below: the
        # stream scan body is a DIFFERENT compiled program than
        # transfer_fast, and the remote compiler's lowering is
        # per-program — the headline's own output must be checked
        stream_last["vs"] = jax.tree.map(lambda x: x[-1], souts[-1])

    stream_last = {}

    # The STREAMED headline runs BEFORE the long pipelined loop: it is
    # the floor-pinned claim, and on a sick tunnel the warmup eats most
    # of the budget — round 4's upsample re-pin drew 89/97 scans/s in
    # 2/8 fresh samples purely because the streamed phase was skipped at
    # remaining()<=60 and the lower pipelined per-frame figure became
    # the headline. Attempting it on a thin budget is safe: the
    # pipelined number + canary fields are already emitted as partials,
    # so a child killed mid-compile still reconstructs a full JSON.
    if args.stream > 0 and remaining() > 30:
        streamed_phase(args.stream)
        # the measured batch curve keeps climbing toward the device
        # floor (16/32/64/128 -> 333/389/417/440 scans/s, docs/PERF.md);
        # when the budget is healthy, also take the 2F point
        if remaining() > 120:
            streamed_phase(2 * args.stream)
    elif args.stream > 0:
        log("skipping streamed phase (budget)")

    if "vs" in stream_last:
        set_phase("hit-rate + label-fill check (streamed)")
        canary("streamed", stream_last["vs"])
        emit_partial()

    # full pipelined loop — informational (no floor campaign of its own);
    # cheap once transfer_fast is compiled, so it follows the headline
    if remaining() > 20:
        set_phase("pipelined throughput")
        t0 = time.perf_counter()
        outs = [run_frame(window) for _ in range(args.frames)]
        sync(outs[-1].range)
        dt = time.perf_counter() - t0
        vs = outs[-1]
        scans_per_sec = args.frames / dt
        log(f"{args.frames} frames in {dt:.2f}s -> {scans_per_sec:.2f} "
            f"scans/s (pipelined), {scans_per_sec*rays/1e6:.1f} Mrays/s "
            "synthesized [informational — the pipelined per-frame figure "
            "has no floor campaign; the floor-pinned claim is the "
            "streamed headline]")
        record(scans_per_sec, phase="pipelined")

    # single-frame LATENCY: block after every frame (pays the tunnel's
    # per-dispatch round-trip in full — ~30 ms through the remote runtime
    # in this environment, unrelated to on-chip time)
    if not args.quick and remaining() > 45:
        set_phase("sync latency")
        nlat = min(args.frames, 10)
        t0 = time.perf_counter()
        for i in range(nlat):
            vs2 = run_frame(window)
            sync(vs2.range)
        lat_ms = (time.perf_counter() - t0) / nlat * 1e3
        log(f"latency (sync per frame): {lat_ms:.1f} ms/frame")
        result["sync_latency_ms"] = round(lat_ms, 1)
        emit_partial()

    # per-cause miss accounting (untimed; VERDICT r1 weak #5): every
    # no-data pixel attributed to out-of-source-FOV / empty direction /
    # outside volume bounds / genuine synthesis miss
    if not args.quick and remaining() > 40:
        set_phase("miss decomposition")
        from lidar_transfer_tpu.metrics.diagnostics import miss_decomposition
        from lidar_transfer_tpu.pipeline.multiscan import merge_window
        mpts, _, _, mvalid = merge_window(window)
        dec = miss_decomposition(
            mpts, mvalid, vs.mask, target_H=target.H, target_W=target.W,
            t_fov_up=target.fov_up, t_fov_down=target.fov_down,
            s_fov_up=source.fov_up, s_fov_down=source.fov_down,
            vol_bounds=cfg.voxel_bounds_array)
        log("miss decomposition: " + json.dumps(
            {k: round(v, 4) for k, v in dec.rates().items()}))

    if args.fusion and args.adaption == "cp":
        log("--fusion: the cp adaption never touches a volume — skipping")
    elif (args.fusion and args.adaption == "mesh"
          and not args.quick and remaining() > 60):
        # the S-scan fused chain (integrate_pallas_chain) — mesh defers
        # it off the hot path; measure the on-demand materialization
        set_phase("fusion throughput (S-scan chain)")
        state = eng.fused_state()       # projects + compiles the chain
        ris = [ri for ri, _, _ in eng._last_sources]
        origin = eng._last_origin
        active = jnp.asarray(eng.vol_spec.dims, jnp.int32)
        geom = eng._ensure_geom(source.fov_up, source.fov_down, source.H)
        # pre-compile the sync path: the tiny slice/squeeze programs the
        # fetch-sync creates (st.tsdf[:1,:1]) cost a ~300-500 ms REMOTE
        # COMPILE each on first use — round 3's "271 ms/integrate" was
        # 3 such compiles landing inside the timed window (xplane: the 5
        # integrates ran gap-free in 114 ms, then 1.47 s of sync compiles)
        sync(state.tsdf)
        n_f = 5
        t0 = time.perf_counter()
        st = eng._take_state()
        for _ in range(n_f):
            st = eng._integrate_chain(st, ris, source.fov_up,
                                      source.fov_down, origin, active,
                                      geom)
        sync(st.tsdf)
        eng._keep_state(st)
        f_dt = (time.perf_counter() - t0) / n_f
        log(f"fusion: {1.0/f_dt:.2f} {len(ris)}-scan chains/s "
            f"({len(ris)*np.prod(eng.vol_dims)/f_dt/1e9:.2f} Gvoxel/s, "
            f"{f_dt*1e3:.1f} ms per fused {len(ris)}-scan chain)")
        result["fusion_chains_per_sec"] = round(1.0 / f_dt, 2)
        emit_partial()
    elif args.fusion and not args.quick and remaining() > 60:
        # fusion FPS ≡ the reference's printed field (laserscan.py:971-977)
        # — the class-aware integrate at full volume scale (materialized;
        # the transfer itself never reads it and defers this write)
        set_phase("fusion throughput")
        state = eng.fused_state()       # builds geom + compiles once
        ri, fov_up, fov_down, origin, active = eng._pending_fusion
        geom = eng._ensure_geom(fov_up, fov_down, ri.range.shape[0])
        # pre-compile the sync path (see the chain phase note: the
        # st.tsdf[0] slice + [:1,:1] fetch programs remote-compile on
        # first use — ~1.5 s that previously landed inside the loop)
        sync(state.tsdf[0])
        n_f = 5
        trace_dir = os.environ.get("LT_BENCH_TRACE_FUSION")
        trace = (jax.profiler.trace(trace_dir) if trace_dir
                 else contextlib.nullcontext())
        t0 = time.perf_counter()
        st = eng._take_state()
        with trace:
            for i in range(n_f):
                td0 = time.perf_counter()
                st = eng._integrate(st, ri, fov_up, fov_down, origin,
                                    active, reset=True, geom=geom,
                                    write_weight=False)
                if trace_dir:
                    log(f"  dispatch {i}: "
                        f"{(time.perf_counter()-td0)*1e3:.1f} ms")
            sync(st.tsdf[0])
        eng._keep_state(st)
        f_dt = (time.perf_counter() - t0) / n_f
        log(f"fusion: {1.0/f_dt:.2f} integrates/s "
            f"({np.prod(eng.vol_dims)/f_dt/1e9:.2f} Gvoxel/s, "
            f"{f_dt*1e3:.1f} ms per full-volume class-aware integrate)")
        result["fusion_integrates_per_sec"] = round(1.0 / f_dt, 2)
        emit_partial()
    elif args.fusion:
        log("skipping fusion phase (budget/--quick)")

    set_phase("done")
    if args.stream > 0 and not result["streamed_measured"]:
        # VERDICT r4 weak #1: round 4's upsample re-pin recorded 65-69
        # scans/s clean=true samples whose streamed phase was budget-
        # skipped — the pipelined fallback must never pass as the
        # floor-pinned headline.  A stream-enabled point that never ran
        # its streamed phase is a degraded measurement BY DEFINITION.
        result["degraded"] = True
        result["note"] = (result.get("note", "") + " | " if
                          result.get("note") else "") + (
            "streamed phase skipped (budget) — value is the pipelined "
            "fallback, NOT the floor-pinned streamed headline")
        log("marking degraded: streamed phase never ran on a "
            "stream-enabled point")
    print(json.dumps(result), flush=True)
    return 0


def main():
    args = parse_args()
    if os.environ.get("LT_BENCH_INNER") or args.no_supervise:
        sys.exit(measure(args))
    sys.exit(supervise(args))


if __name__ == "__main__":
    main()
