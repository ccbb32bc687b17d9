#!/usr/bin/env python3
"""Probe: lowering variants for the target-assemble hot ops at the
UPSAMPLE operating point's sizes (268k candidates -> 262k pixels).

The round-4 upsampling fast body measures ~10 ms/frame, dominated by
the win_idx scatter + the (P,8) winner-attribute row gather (xplane
trace, BASELINE.md round 4). This probes alternative formulations of
each stage in one chained jit per variant (fetch-synced, CLAUDE.md
microbench rules):

  scatter variants (densify win_idx):
    s_set   — .at[tgt].set with the npix dump slot (current)
    s_uniq  — lax.scatter with UNIQUE dump slots (npix+i for losers,
              unique_indices=True; may pick a faster lowering)
  gather variants (winner attributes):
    g_row8  — one (P,) row gather of the stacked (N,8) matrix (current)
    g_row4  — two (P,) row gathers of (N,4) halves
    g_col   — 8 separate 1-D gathers (known-bad scalar path; control)

Usage: python scripts/probe_assemble_variants.py [--iters 20] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=20)
ap.add_argument("--n", type=int, default=268288)
ap.add_argument("--p", type=int, default=262144)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
from lidar_transfer_tpu.utils import setup_compile_cache  # noqa: E402
setup_compile_cache()

N, P, IT = args.n, args.p, args.iters
IMAX = np.int32(2**31 - 1)


def log(m):
    print(m, file=sys.stderr, flush=True)


log(f"devices: {jax.devices()}  N={N} P={P} iters={IT}")
np.asarray(jnp.zeros((8, 128)))          # arm the sync machinery

rng = np.random.default_rng(0)
# sorted-by-pixel candidate stream like _winner_sort's output: ~P/2 of
# the pixels get a winner (the upsample hit pattern)
sp_np = np.sort(rng.integers(0, P, size=N)).astype(np.int32)
is_first_np = np.zeros(N, bool)
is_first_np[np.unique(sp_np, return_index=True)[1]] = True
rows_np = rng.standard_normal((N, 8)).astype(np.float32)

sp = jnp.asarray(sp_np)
is_first = jnp.asarray(is_first_np)
rows = jnp.asarray(rows_np)
win_np = np.full(P + 1, IMAX, np.int32)
win_np[sp_np[is_first_np]] = np.nonzero(is_first_np)[0]
win_ref = win_np[:P]


# --- scatter variants: (sp, is_first) -> win (P,) int32
def s_set_fn(shift):
    tgt = jnp.where(is_first, sp, P)
    src = jnp.where(is_first,
                    jnp.arange(N, dtype=jnp.int32), IMAX) + shift
    return jnp.full((P + 1,), IMAX, jnp.int32).at[tgt].set(
        src, mode="drop")[:P]


def s_uniq_fn(shift):
    # unique target slots: winners -> their pixel, losers -> P + i
    i = jnp.arange(N, dtype=jnp.int32)
    tgt = jnp.where(is_first, sp, P + i)[:, None]
    src = jnp.where(is_first, i, IMAX) + shift
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))
    out = jax.lax.scatter(
        jnp.full((P + N,), IMAX, jnp.int32), tgt, src, dn,
        indices_are_sorted=False, unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP)
    return out[:P]


# --- gather variants: win (P,) -> img (P, 8) f32
gidx_ref = jnp.asarray(np.where(win_ref == IMAX, 0, win_ref))


def g_row8(w):
    g = jnp.where(w == IMAX, 0, w)
    return rows[g]


def g_row4(w):
    g = jnp.where(w == IMAX, 0, w)
    return jnp.concatenate([rows[:, :4][g], rows[:, 4:][g]], axis=1)


def g_col(w):
    g = jnp.where(w == IMAX, 0, w)
    return jnp.stack([rows[:, j][g] for j in range(8)], axis=1)


def _g_split(w, k):
    """Row-split the INDEX vector into k chunks, gather each, concat.

    Round-5 xplane finding: the identity point's (131072,8) row gather
    lowers at 1.8 ns/row while the upsample point's (262144,8) draws
    11.0 ns/row — a SIZE-triggered regime. If the threshold sits
    between 131k and 262k, k gathers of P/k rows each dodge it."""
    g = jnp.where(w == IMAX, 0, w)
    c = P // k
    return jnp.concatenate([rows[g[i * c:(i + 1) * c]] for i in range(k)],
                           axis=0)


def g_split2(w):
    return _g_split(w, 2)


def g_split4(w):
    return _g_split(w, 4)


def timed(name, jfn, x0):
    out = jfn(x0)
    np.asarray(jnp.ravel(out)[:1])   # warm incl. sync-path compile
    t0 = time.perf_counter()
    out = jfn(x0)
    np.asarray(jnp.ravel(out)[:1])   # fetch-sync (CLAUDE.md rules)
    dt = (time.perf_counter() - t0) / IT * 1e3
    log(f"{name:8s} {dt:7.3f} ms/iter")
    return dt


results = {}
# scatter chains: carry the shift through iterations so each scan step
# depends on the previous (no DCE of the middle iterations)
for name, fn in (("s_set", s_set_fn), ("s_uniq", s_uniq_fn)):
    def step(shift, fn=fn):
        w = fn(shift)
        # derive the next shift from the output (cheap, keeps the
        # chain). min(w[0], 0) is 0 at runtime (w entries are winner
        # indices >= 0 or IMAX) but NOT foldable — `w[0] & 0` was: the
        # algebraic simplifier can rewrite and(x,0)->0 and DCE the
        # whole scatter out of the timed loop (round-4 review)
        return jnp.minimum(w[0], 0) + shift

    jfn = jax.jit(lambda s0, step=step: jax.lax.scan(
        lambda c, _: (step(c), 0.0), s0, None, length=IT)[0])
    # correctness first (single application)
    single = fn(jnp.int32(0))
    ok = np.array_equal(np.asarray(single), win_ref)
    if not ok:
        log(f"{name}: OUTPUT MISMATCH vs reference")
    results[name] = timed(name, jfn, jnp.int32(0))

# gather chains: fold the gathered matrix back into a win-permutation so
# successive gathers depend on each other
w0 = jnp.asarray(win_ref)
for name, fn in (("g_row8", g_row8), ("g_row4", g_row4),
                 ("g_col", g_col), ("g_split2", g_split2),
                 ("g_split4", g_split4)):
    def step(w, fn=fn):
        img = fn(w)
        # consume EVERY column: deriving bump from img[:, 0] alone let
        # the algebraic simplifier narrow slice(gather) to a 1-column
        # gather (and DCE 7 of g_col's 8 gathers), so all variants
        # timed the same narrowed op (round-4 review). The row-sum is
        # finite, so bump stays all-zero at runtime but unfoldable.
        bump = (img.sum(axis=1) == jnp.inf).astype(jnp.int32)
        return w + bump

    jfn = jax.jit(lambda w, step=step: jax.lax.scan(
        lambda c, _: (step(c), 0.0), w, None, length=IT)[0])
    single = fn(w0)
    ok = np.allclose(np.asarray(single),
                     rows_np[np.where(win_ref == IMAX, 0, win_ref)])
    if not ok:
        log(f"{name}: OUTPUT MISMATCH vs reference")
    results[name] = timed(name, jfn, w0)

print({k: round(v, 3) for k, v in results.items()})
