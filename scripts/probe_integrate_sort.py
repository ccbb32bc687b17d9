#!/usr/bin/env python3
"""Probe 2: real integrate cost vs pure-write floor, and z-buffer sort cost.

Follow-up to probe_pallas_write.py which showed the round-1 "~900 GB/s XLA
write" no longer holds: XLA and Pallas writes are now equivalent and look
element-rate limited per output stream (~55-70 Gelem/s), overlapping
across concurrent output buffers (~2x for 3 streams).

Questions:
  a) where does the real integrate_pallas sit vs the pure-write floor at
     the same volume shape (1024x1024x256)? geom-table vs in-kernel atan?
     write_weight on/off?
  b) what do the projection z-buffer's pieces cost at production size
     (139k points): the 2-key lexicographic sort, the winner scatter, the
     attribute gathers?
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lidar_transfer_tpu.ops import projection as P
from lidar_transfer_tpu.ops import tsdf as TS
from lidar_transfer_tpu.ops.tsdf_pallas import (integrate_pallas,
                                                precompute_geometry)


def bench(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))

    # ---------------- integrate at probe scale ----------------
    dims = (1024, 1024, 256)            # 268M voxels
    spec = TS.VolumeSpec(origin=(-25.6, -25.6, -6.4), voxel_size=0.05,
                         dims=dims)
    H, W = 64, 2048
    rng = np.random.default_rng(0)
    depth_im = jnp.asarray((rng.random((H, W)) * 20 + 2), jnp.float32)
    label_im = jnp.asarray(rng.integers(1, 20, (H, W)), jnp.int32)
    rem_im = jnp.asarray(rng.random((H, W)), jnp.float32)
    fovu, fovd = 3.0, -25.0

    geom = precompute_geometry(spec, fovu, fovd, H)
    jax.block_until_ready(geom)
    nvox = np.prod(dims)

    for wname, ww in [("w", True), ("now", False)]:
        for gname, g in [("vtab", geom), ("atan", None)]:
            state = spec.init_state_compact()

            def run(st):
                return integrate_pallas(
                    st, spec, depth_im, label_im, rem_im,
                    fov_up_deg=fovu, fov_down_deg=fovd, reset=True,
                    geom=g, write_weight=ww)

            # donation: chain states
            st = run(state)
            jax.block_until_ready(st.tsdf)
            t0 = time.perf_counter()
            n = 8
            for _ in range(n):
                st = run(st)
            jax.block_until_ready(st.tsdf)
            dt = (time.perf_counter() - t0) / n
            nelem = nvox * (4 if ww else 3)
            print(f"integrate reset {gname} write_weight={ww}: "
                  f"{dt*1e3:7.2f} ms  {nelem/dt/1e9:6.1f} Gelem-stores/s",
                  flush=True)

    # non-reset (chained) integrate: reads state too
    state = spec.init_state_compact()

    def run2(st):
        return integrate_pallas(st, spec, depth_im, label_im, rem_im,
                                fov_up_deg=fovu, fov_down_deg=fovd,
                                reset=False, geom=geom)
    st = run2(state)
    jax.block_until_ready(st.tsdf)
    t0 = time.perf_counter()
    for _ in range(8):
        st = run2(st)
    jax.block_until_ready(st.tsdf)
    dt = (time.perf_counter() - t0) / 8
    print(f"integrate chained vtab: {dt*1e3:7.2f} ms", flush=True)

    # ---------------- sort / z-buffer pieces ----------------
    n = 139264
    npix = 32 * 2048
    pts = jnp.asarray(rng.random((n, 3)) * 60 - 30, jnp.float32)
    remv = jnp.asarray(rng.random(n), jnp.float32)
    lblv = jnp.asarray(rng.integers(1, 30, n), jnp.int32)
    vald = jnp.asarray(rng.random(n) > 0.1)

    def full_project(p, r, l, v):
        return P.range_project(p, r, l, v, H=32, W=2048,
                               fov_up_deg=3.0, fov_down_deg=-25.0)
    dt = bench(full_project, pts, remv, lblv, vald)
    print(f"range_project 139k -> 32x2048: {dt*1e3:7.2f} ms", flush=True)

    pix = jnp.asarray(rng.integers(0, npix, n), jnp.int32)
    dpt = jnp.asarray(rng.random(n) * 60, jnp.float32)
    idx = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def sort3(pix, dpt, idx):
        return jax.lax.sort((pix, dpt, idx), num_keys=2)
    dt = bench(sort3, pix, dpt, idx)
    print(f"lex sort (2 keys + payload) {n}: {dt*1e3:7.2f} ms", flush=True)

    @jax.jit
    def sort2(pix, dpt):
        return jax.lax.sort((pix, dpt), num_keys=2)
    dt = bench(sort2, pix, dpt)
    print(f"lex sort (2 keys) {n}: {dt*1e3:7.2f} ms", flush=True)

    @jax.jit
    def sort1(pix, idx):
        return jax.lax.sort((pix, idx), num_keys=1)
    dt = bench(sort1, pix, idx)
    print(f"sort (1 key + payload) {n}: {dt*1e3:7.2f} ms", flush=True)

    @jax.jit
    def sort1k(pix):
        return jax.lax.sort((pix,), num_keys=1)
    dt = bench(sort1k, pix)
    print(f"sort (1 key alone) {n}: {dt*1e3:7.2f} ms", flush=True)

    # packed single-key sort: (pix << 15) | idx-rank? just probe a packed
    # f32-monotonic key sort with one payload
    packed = (pix.astype(jnp.int64) if False else pix)

    @jax.jit
    def winner_scatter(sp, si):
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), sp[1:] != sp[:-1]]) & (sp < npix)
        tgt = jnp.where(is_first, sp, npix)
        return jnp.full((npix + 1,), 2**31 - 1, jnp.int32).at[tgt].set(
            jnp.where(is_first, si, 2**31 - 1), mode="drop")[:npix]
    sp, _, si = jax.lax.sort((pix, dpt, idx), num_keys=2)
    jax.block_until_ready(sp)
    dt = bench(winner_scatter, sp, si)
    print(f"winner scatter {n}->{npix}: {dt*1e3:7.2f} ms", flush=True)

    @jax.jit
    def attr_gather(win_idx, dpt, remv, lblv):
        g = jnp.maximum(win_idx, 0)
        return dpt[g], remv[g], lblv[g]
    win = winner_scatter(sp, si)
    jax.block_until_ready(win)
    dt = bench(attr_gather, win, dpt, remv, lblv)
    print(f"attr gather x3 {npix}: {dt*1e3:7.2f} ms", flush=True)

    # segmented-scan winner: sort by pix only (cheaper), then associative
    # scan with min-by-depth combiner
    @jax.jit
    def scan_winner(pix, dpt, idx):
        sp, sd, si = jax.lax.sort((pix, idx), num_keys=1) + (None,)[:0] \
            if False else jax.lax.sort((pix, dpt, idx), num_keys=1)
        # after a 1-key stable sort, runs are contiguous but unsorted by
        # depth; segmented min-scan over (depth, idx):
        def comb(a, b):
            seg_a, d_a, i_a = a
            seg_b, d_b, i_b = b
            same = seg_a == seg_b
            take_b = (~same) | (d_b < d_a) | ((d_b == d_a) & (i_b < i_a))
            return (seg_b,
                    jnp.where(take_b, d_b, d_a),
                    jnp.where(take_b, i_b, i_a))
        seg, dmin, imin = jax.lax.associative_scan(comb, (sp, sd, si))
        # winner of each run sits at the run's LAST position
        is_last = jnp.concatenate([sp[1:] != sp[:-1],
                                   jnp.ones((1,), bool)]) & (sp < npix)
        tgt = jnp.where(is_last, sp, npix)
        return jnp.full((npix + 1,), 2**31 - 1, jnp.int32).at[tgt].set(
            jnp.where(is_last, imin, 2**31 - 1), mode="drop")[:npix]
    dt = bench(scan_winner, pix, dpt, idx)
    print(f"1-key sort + seg-min-scan winner: {dt*1e3:7.2f} ms", flush=True)

    got = np.asarray(scan_winner(pix, dpt, idx))
    want = np.asarray(winner_scatter(sp, si))
    print(f"scan winner equals sort winner: {(got == want).all()}",
          flush=True)


if __name__ == "__main__":
    main()
