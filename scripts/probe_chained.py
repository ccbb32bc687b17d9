#!/usr/bin/env python3
"""Probe 3: true device times via in-jit chaining (dispatch-free).

Per-dispatch host cost through the axon tunnel is ~3-5 ms even pipelined,
so any sub-10 ms op measured call-by-call reads as dispatch rate. Here
each candidate op is iterated N times INSIDE one jit (output feeding the
next input through a value perturbation XLA cannot elide), so per-iter
time is pure device time.

Targets:
  - the projection z-buffer pieces at production size (139k pts);
  - kernel-internal costs of the Pallas integrate (via reduced variants);
  - splat's second projection (131k candidates).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N_CHAIN = 20


def chain_bench(make_step, init_args, label, per_iter_elems=None):
    """make_step(args) -> args (same structure). Returns per-iter seconds."""
    @jax.jit
    def run(args):
        def body(_, a):
            return make_step(a)
        return jax.lax.fori_loop(0, N_CHAIN, body, args)

    args = jax.tree.map(jnp.asarray, init_args)
    out = run(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (reps * N_CHAIN)
    extra = ""
    if per_iter_elems:
        extra = f"  ({per_iter_elems/dt/1e9:6.2f} Gelem/s)"
    print(f"{label}: {dt*1e3:7.3f} ms/iter{extra}", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))
    rng = np.random.default_rng(0)

    n = 139264
    npix = 32 * 2048
    pix0 = rng.integers(0, npix, n).astype(np.int32)
    dpt0 = (rng.random(n) * 60).astype(np.float32)
    idx0 = np.arange(n, dtype=np.int32)

    # ---- sort variants (perturb pix each iter so nothing is cached) ----
    def sort3_step(a):
        pix, dpt, idx = a
        sp, sd, si = jax.lax.sort((pix, dpt, idx), num_keys=2)
        # feed back a permuted-but-equivalent input
        return (jnp.roll(sp, 1), sd, si)
    chain_bench(sort3_step, (pix0, dpt0, idx0), "lex sort 2keys+payload 139k")

    def sort1_step(a):
        pix, dpt, idx = a
        sp, si = jax.lax.sort((pix, idx), num_keys=1)
        return (jnp.roll(sp, 1), dpt, si)
    chain_bench(sort1_step, (pix0, dpt0, idx0), "sort 1key+payload 139k")

    def winner_step(a):
        sp, sd, si = a
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), sp[1:] != sp[:-1]]) & (sp < npix)
        tgt = jnp.where(is_first, sp, npix)
        win = jnp.full((npix + 1,), 2**31 - 1, jnp.int32).at[tgt].set(
            jnp.where(is_first, si, 2**31 - 1), mode="drop")[:npix]
        return (sp + (win[0] % 2), sd, si)
    sp, sd, si = jax.lax.sort((jnp.asarray(pix0), jnp.asarray(dpt0),
                               jnp.asarray(idx0)), num_keys=2)
    chain_bench(winner_step, (sp, sd, si), "winner scatter 139k->65k")

    def gather_step(a):
        win, dpt = a
        g = jnp.maximum(win, 0)
        d = dpt[g]
        return (win + (d[0] > 0).astype(jnp.int32) * 0, dpt)
    win0 = jnp.zeros((npix,), jnp.int32)
    chain_bench(gather_step, (win0, dpt0), "attr gather 65k from 139k")

    # one-hot-free alternative to the winner scatter: sorted positions are
    # npix-dense? try segment-min instead
    def segmin_step(a):
        pix, dpt, idx = a
        md = jax.ops.segment_min(dpt, pix, num_segments=npix + 1)
        return (pix, dpt + (md[0] * 0), idx)
    chain_bench(segmin_step, (pix0, dpt0, idx0), "segment_min 139k->65k")

    # ---- full projection fused (for comparison) ----
    from lidar_transfer_tpu.ops import projection as P

    pts0 = (rng.random((n, 3)) * 60 - 30).astype(np.float32)
    rem0 = rng.random(n).astype(np.float32)
    lbl0 = rng.integers(1, 30, n).astype(np.int32)
    val0 = rng.random(n) > 0.1

    def proj_step(a):
        pts, rem, lbl, val = a
        ri = P._range_project_impl(pts, rem, lbl, val,
                                   jnp.float32(3.0), jnp.float32(-25.0),
                                   None, 32, 2048)
        return (pts + ri.range[0, 0] * 0, rem, lbl, val)
    chain_bench(proj_step, (pts0, rem0, lbl0, val0),
                "full range_project 139k->32x2048")

    # ---- pallas integrate internals: reduced-variant kernels ----
    from lidar_transfer_tpu.ops import tsdf as TS
    from lidar_transfer_tpu.ops import tsdf_pallas as TP

    dims = (1024, 1024, 256)
    spec = TS.VolumeSpec(origin=(-25.6, -25.6, -6.4), voxel_size=0.05,
                         dims=dims)
    H, W = 64, 2048
    depth_im = jnp.asarray((rng.random((H, W)) * 20 + 2), jnp.float32)
    label_im = jnp.asarray(rng.integers(1, 20, (H, W)), jnp.int32)
    rem_im = jnp.asarray(rng.random((H, W)), jnp.float32)
    geom = TP.precompute_geometry(spec, 3.0, -25.0, H)
    jax.block_until_ready(geom)

    def integ_step(st):
        return TP.integrate_pallas(st, spec, depth_im, label_im, rem_im,
                                   fov_up_deg=3.0, fov_down_deg=-25.0,
                                   reset=True, geom=geom,
                                   write_weight=False)
    # chain via plain python loop inside one jit (state donation works
    # across fori_loop? use scan-free loop)
    state0 = spec.init_state_compact()

    @jax.jit
    def run_integrate(st):
        for _ in range(4):
            st = integ_step(st)
        return st

    st = run_integrate(state0)
    jax.block_until_ready(st.tsdf)
    t0 = time.perf_counter()
    st = run_integrate(st)
    jax.block_until_ready(st.tsdf)
    dt = (time.perf_counter() - t0) / 4
    print(f"pallas integrate 268M reset vtab noweight (chained): "
          f"{dt*1e3:7.2f} ms/iter ({np.prod(dims)*3/dt/1e9:5.1f} "
          f"Gelem-stores/s)", flush=True)


if __name__ == "__main__":
    main()
