#!/usr/bin/env python3
"""A/B the named train-step memory-roofline levers (docs/PERF.md round 5).

The darknet21/53 train step is PROVEN memory-roofline-bound (AI ~40
flops/byte vs the ~240 v5e ridge; measured step time sits at/below the
XLA-cost-analysis HBM floor). The three levers that reduce HBM bytes
without changing the model's quality-bearing shape:

  * remat   — nn.remat on encoder ResBlocks: recompute activations in
              the backward instead of saving them (flops are ~6x from
              being the binding resource, so recompute is nearly free
              IF it removes real HBM traffic);
  * donate  — donate params/opt_state buffers to the step (lets XLA
              update in place instead of allocating + copying new
              param/opt trees every step);
  * mu_bf16 — optax.adam(mu_dtype=bfloat16): halve the first-moment
              read+write traffic.

Measures step time (fetch-synced, pre-warmed per CLAUDE.md) + XLA
cost-analysis flops/bytes for each variant on darknet21/darknet53 at
batch 2, 64x2048x5. Writes experiments_artifacts/train_remat_ab_r05.json.

Usage: python scripts/probe_train_remat.py [--arch darknet21,darknet53]
       [--variants base,remat,donate,remat_donate,mu_bf16,all3]
       [--iters 10] [--cpu] [--out PATH]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chip constants + measurement recipe shared with the roofline harness
# (one place to fix if the CLAUDE.md sync rules or chip constants change)
from scripts.roofline import (PEAK_BF16_FLOPS, PEAK_HBM_GBPS,  # noqa: E402
                              _sync, log)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="darknet21,darknet53")
    ap.add_argument("--variants",
                    default="base,remat,donate,remat_donate,mu_bf16,all3")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny arch/shape smoke (numbers meaningless)")
    ap.add_argument("--out",
                    default="experiments_artifacts/train_remat_ab_r05.json")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from lidar_transfer_tpu.models import RangeNet, RangeNetConfig
    from lidar_transfer_tpu.models.rangenet import (make_train_state,
                                                    train_step_body)
    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()
    log(f"devices: {jax.devices()}")
    t0 = time.time()
    np.asarray(jnp.zeros((8, 128)))          # arm the sync machinery
    log(f"transfer warmup {time.time()-t0:.1f}s")

    def sync(x):
        _sync(jax, np, x)

    h, w = (16, 64) if args.tiny else (64, 2048)
    variants = args.variants.split(",")
    rows = []
    for arch in (("tiny",) if args.tiny else args.arch.split(",")):
        for variant in variants:
            remat = "remat" in variant or variant == "all3"
            donate = "donate" in variant or variant == "all3"
            mu_bf16 = variant in ("mu_bf16", "all3")
            import dataclasses
            cfg = dataclasses.replace(
                getattr(RangeNetConfig, arch)(num_classes=34),
                remat=remat)
            model = RangeNet(cfg)
            params, opt_state, tx = make_train_state(
                model, jax.random.PRNGKey(0),
                (1, h, w, cfg.input_channels))
            if mu_bf16:
                tx = optax.adam(1e-3, mu_dtype=jnp.bfloat16)
                opt_state = tx.init(params)
            batch = dict(
                features=jnp.ones((args.batch, h, w, cfg.input_channels),
                                  jnp.float32),
                labels=jnp.zeros((args.batch, h, w), jnp.int32),
                weights=jnp.ones((args.batch, h, w), jnp.float32))
            donate_argnums = (0, 1) if donate else ()
            step = jax.jit(
                functools.partial(train_step_body, model, tx),
                donate_argnums=donate_argnums)
            lowered = step.lower(params, opt_state, batch)
            compiled = lowered.compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            bytes_acc = float(cost.get("bytes accessed", 0.0))
            # fresh copies so donation can't invalidate the originals
            p_t = jax.tree.map(jnp.copy, params)
            o_t = jax.tree.map(jnp.copy, opt_state)
            p_t, o_t, loss = step(p_t, o_t, batch)   # warm + compile-run
            sync(loss)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                p_t, o_t, loss = step(p_t, o_t, batch)
            sync(loss)
            dt = (time.perf_counter() - t0) / args.iters
            row = {"arch": arch, "variant": variant, "batch": args.batch,
                   "remat": remat, "donate": donate, "mu_bf16": mu_bf16,
                   "step_ms": round(dt * 1e3, 2),
                   "flops_per_step": flops,
                   "bytes_accessed_gb": round(bytes_acc / 1e9, 2),
                   "mfu_vs_bf16_peak": round(
                       flops / dt / PEAK_BF16_FLOPS, 4),
                   "hbm_bound_floor_ms": round(
                       bytes_acc / (PEAK_HBM_GBPS * 1e9) * 1e3, 1),
                   "final_loss": float(np.asarray(loss))}
            rows.append(row)
            log(f"{arch:10s} {variant:12s}: {dt*1e3:7.1f} ms/step  "
                f"{bytes_acc/1e9:6.1f} GB logical  "
                f"MFU {flops/dt/PEAK_BF16_FLOPS*100:.1f}%  "
                f"loss {row['final_loss']:.4f}")
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                json.dump({"rows": rows, "iters": args.iters,
                           "h": h, "w": w}, f, indent=2)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
