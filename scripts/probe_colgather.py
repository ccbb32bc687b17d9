#!/usr/bin/env python3
"""Probe 6: cost of the integrate's XLA column-gather formulations.

Current (tsdf_pallas cols_of): per image, take(img (CW,W), u, axis=1) ->
(CW, X, Y) then transpose to (X, CW, Y); two images (depth + packed lr).
Candidate: one fused table img2T (W, 128) [depth | packed], contiguous
ROW gather by u -> (X, Y, 128): no transpose, 128-lane minor (no HBM tile
padding), single array.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

X, Y = 1024, 1024
H, W, CW = 64, 2048, 64


def bench(fn, args, label):
    @jax.jit
    def run(a):
        def body(_, a):
            return fn(a)
        return jax.lax.fori_loop(0, 10, body, a)

    out = run(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (reps * 10)
    print(f"{label}: {dt*1e3:7.2f} ms", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.random((H, W)), jnp.float32)
    packed = jnp.asarray(rng.random((H, W)) * 16384, jnp.float32)
    u = jnp.asarray(rng.integers(0, W, (X, Y)), jnp.int32)

    def current(a):
        d, p, u = a

        def cols_of(img):
            if CW > H:
                img = jnp.pad(img, ((0, CW - H), (0, 0)))
            c = jnp.take(img, u, axis=1)
            return jnp.transpose(c, (1, 0, 2))
        dc = cols_of(d)
        lc = cols_of(p)
        return (d + dc[0, 0, 0] * 0, p + lc[0, 0, 0] * 0, u)
    bench(current, (depth, packed, u), "current cols_of x2 (X,CW,Y)")

    def fused_row(a):
        d, p, u = a
        img2 = jnp.concatenate(
            [jnp.pad(d, ((0, CW - H), (0, 0))),
             jnp.pad(p, ((0, CW - H), (0, 0)))], axis=0)   # (128, W)
        img2T = img2.T                                     # (W, 128)
        cols = jnp.take(img2T, u.reshape(-1), axis=0)      # (XY, 128)
        cols = cols.reshape(X, Y, 2 * CW)
        return (d + cols[0, 0, 0] * 0, p + cols[0, 0, 1] * 0, u)
    bench(fused_row, (depth, packed, u), "fused row-gather (X,Y,128)  ")

    def fused_row_noreshape(a):
        d, p, u = a
        img2T = jnp.concatenate(
            [jnp.pad(d, ((0, CW - H), (0, 0))),
             jnp.pad(p, ((0, CW - H), (0, 0)))], axis=0).T
        cols = img2T[u]                                    # (X, Y, 128)
        return (d + cols[0, 0, 0] * 0, p + cols[0, 0, 1] * 0, u)
    bench(fused_row_noreshape, (depth, packed, u), "fused adv-index (X,Y,128)   ")


if __name__ == "__main__":
    main()
