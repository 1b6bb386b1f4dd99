#!/usr/bin/env python3
"""Micro-benchmark: flat-Conv3d depth-tap combine — XLA roll+mask vs the
fused Pallas kernel (ops/combine_pallas.py) at the production Base3D
shape [512, 64, 96, 3x32] bf16.

Run: python benchmarks/micro_combine.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthestimation_tpu.utils.compile_cache import enable as _cc

_cc()

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.ops.combine_pallas import tap_combine, tap_combine_xla

B, D, H, W, F = 8, 64, 64, 96, 32
N = B * D


def timeit(fn, x, iters=30):
    from depthestimation_tpu.utils.timing import time_chain

    def step(a):
        y = fn(a)
        fb = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(a.dtype)
        return jnp.roll(a + fb, 1, axis=1)

    dt, _ = time_chain(step, x, iters)
    return dt * 1e3


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, 3 * F), jnp.bfloat16)
    g = jnp.asarray(rng.randn(N, H, W, F), jnp.bfloat16)

    f_xla = jax.jit(lambda a: tap_combine_xla(a, D, F))
    f_pl = jax.jit(lambda a: tap_combine(a, D, F))

    # correctness first
    ya, yb = f_xla(x), f_pl(x)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                - yb.astype(jnp.float32))))
    print(f"fwd max|diff| = {err:.3e}")
    assert err < 1e-2, err

    def vjp_of(fn):
        def run(a):
            _, pull = jax.vjp(lambda t: fn(t, D, F), a)
            return pull(g)[0]
        return jax.jit(run)

    ga, gb = vjp_of(tap_combine_xla)(x), vjp_of(tap_combine)(x)
    gerr = float(jnp.max(jnp.abs(ga.astype(jnp.float32)
                                 - gb.astype(jnp.float32))))
    print(f"bwd max|diff| = {gerr:.3e}")
    assert gerr < 1e-2, gerr

    mb = (N * H * W * 3 * F * 2 + N * H * W * F * 2) / 1e6
    for name, fn in (("xla  fwd", f_xla), ("plas fwd", f_pl),
                     ("xla  vjp", vjp_of(tap_combine_xla)),
                     ("plas vjp", vjp_of(tap_combine))):
        ms = timeit(fn, x)
        print(f"{name}: {ms:7.3f} ms   ({mb / ms:6.1f} GB/s fwd-traffic)")


if __name__ == "__main__":
    main()
