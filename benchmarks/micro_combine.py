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
        out = fn(a)
        total = sum(jnp.sum(leaf.astype(jnp.float32))
                    for leaf in jax.tree_util.tree_leaves(out))
        # content-dedupe guard (utils/timing.py): the feedback must SURVIVE
        # bf16 rounding against O(1) data and must never oscillate with a
        # short period — a strictly positive O(1e-2) drift does both
        fb = (0.02 + 0.03 * jnp.abs(jnp.tanh(total * 1e-6))).astype(a.dtype)
        return jnp.roll(a, 1, axis=1) + fb

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

    def fwd_vjp_of(fn):
        """Forward + backward together, with the cotangent DERIVED from the
        chained input so both pullbacks do data-dependent work every
        iteration (a constant cotangent lets XLA DCE the forward and
        constant-fold the backward for the pure-XLA path only, biasing the
        comparison)."""
        def run(a):
            y, pull = jax.vjp(lambda t: fn(t, D, F), a)
            return y, pull(a[..., :F])[0]
        return jax.jit(run)

    (_, ga), (_, gb) = fwd_vjp_of(tap_combine_xla)(x), fwd_vjp_of(tap_combine)(x)
    gerr = float(jnp.max(jnp.abs(ga.astype(jnp.float32)
                                 - gb.astype(jnp.float32))))
    print(f"bwd max|diff| = {gerr:.3e}")
    assert gerr < 1e-2, gerr

    mb = (N * H * W * 3 * F * 2 + N * H * W * F * 2) / 1e6
    for name, fn in (("xla  fwd    ", f_xla), ("plas fwd    ", f_pl),
                     ("xla  fwd+vjp", fwd_vjp_of(tap_combine_xla)),
                     ("plas fwd+vjp", fwd_vjp_of(tap_combine))):
        ms = timeit(fn, x)
        print(f"{name}: {ms:7.3f} ms   ({mb / ms:6.1f} GB/s fwd-traffic)")


if __name__ == "__main__":
    main()
