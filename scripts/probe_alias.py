#!/usr/bin/env python3
"""Probe 7: does input_output_aliasing cost 5x in the Pallas integrate?

Stripped write-heavy kernel (same shape as the integrate) with:
  a) no aliasing, fresh outputs
  b) input_output_aliases to 3 donated ANY-space inputs
  c) aliasing + 4th unused ANY input (the real reset-mode layout)
  d) aliasing with VMEM-blocked inputs (non-reset layout)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X, Y, Z = 1024, 1024, 256
BX, BY = 2, 1024


def kernel(params_ref, *refs, n_in):
    outs = refs[n_in:]
    for bx in range(BX):
        for i, o in enumerate(outs):
            o[bx, :, :] = jnp.full((BY, Z), i + 1.0, o.dtype)


def probe(mode):
    dtypes = [jnp.bfloat16, jnp.int16, jnp.bfloat16]
    state_spec = pl.BlockSpec((BX, BY, Z), lambda x, y: (x, y, 0),
                              memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec((2, 8), lambda x, y: (0, 0),
                             memory_space=pltpu.SMEM)
    params = jnp.zeros((2, 8), jnp.float32)

    if mode == "noalias":
        n_in, in_specs, aliases = 0, [], {}
    elif mode == "alias_any":
        n_in, in_specs = 3, [any_spec] * 3
        aliases = {1 + i: i for i in range(3)}
    elif mode == "alias_any4":
        n_in, in_specs = 4, [any_spec] * 4
        aliases = {1 + i: i for i in range(3)}
    elif mode == "alias_vmem":
        n_in, in_specs = 3, [state_spec] * 3
        aliases = {1 + i: i for i in range(3)}

    kern = functools.partial(kernel, n_in=n_in)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state):
        out = pl.pallas_call(
            kern,
            grid=(X // BX, Y // BY),
            in_specs=[smem_spec] + in_specs,
            out_specs=(state_spec,) * 3,
            out_shape=tuple(jax.ShapeDtypeStruct((X, Y, Z), dt)
                            for dt in dtypes),
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=64 * 1024 * 1024),
        )(params, *state[:n_in])
        return out + state[3:] if n_in == 4 else out

    state = tuple(jnp.zeros((X, Y, Z), dt)
                  for dt in (dtypes + [jnp.bfloat16])[:max(n_in, 3)])
    out = run(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters):
        out = run(tuple(out)[:max(n_in, 3)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{mode:12s}: {dt*1e3:7.2f} ms", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))
    for mode in ["noalias", "alias_any", "alias_any4", "alias_vmem"]:
        try:
            probe(mode)
        except Exception as e:
            print(f"{mode}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
