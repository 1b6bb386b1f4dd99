#!/usr/bin/env python3
"""Microbenchmarks of the plane-sweep gather hot path on the current backend."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, *a, iters=20):
    """Chains each iteration through the first (float) argument so the remote
    TPU runtime cannot dedupe identical dispatches (see bench.py)."""
    def step(args):
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if jnp.issubdtype(x.dtype, jnp.floating)]
        feedback = sum(jnp.sum(x) * 1e-20 for x in leaves)
        new0 = args[0] + feedback.astype(args[0].dtype)
        return (new0,) + tuple(args[1:])

    from depthestimation_tpu.utils.timing import time_chain

    def rollstep(args):
        args = step(args)
        return (jnp.roll(args[0], 1, axis=0),) + tuple(args[1:])

    dt, _ = time_chain(jax.jit(rollstep), tuple(a), iters)
    dt = dt * 1e3
    print(f"  {name:34s}: {dt:8.3f} ms")
    return dt


def main():
    print(f"backend: {jax.default_backend()}")
    H, W, D = 64, 96, 64
    C1, C2 = 67, 64
    HW = H * W
    HWp = (H + 2) * (W + 2)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    flat = jax.random.normal(k1, (C1 + C2, HWp), jnp.float32)
    idx = jax.random.randint(k2, (4, D, HW), 0, HWp, jnp.int32)
    wt = jax.random.uniform(k3, (4, D, HW), jnp.float32)
    ref = jax.random.normal(k4, (C1, HW), jnp.float32)

    # raw gather: one tap, all channels
    timeit("take 1 tap [C,HWp]->[C,D,HW]", lambda f, i: jnp.take(f, i[0], axis=1), flat, idx)

    # 4 taps + weighted sum (cost-volume core, no diagonal)
    def four_tap(f, i, w):
        acc = 0.0
        for t in range(4):
            acc = acc + jnp.take(f[:C1], i[t], axis=1) * w[t][None]
        return acc
    timeit("4 taps C1 only + wsum", four_tap, flat, idx, wt)

    def four_tap_all(f, i, w):
        acc = 0.0
        for t in range(4):
            acc = acc + jnp.take(f, i[t], axis=1) * w[t][None]
        return acc
    timeit("4 taps C1+C2 + wsum", four_tap_all, flat, idx, wt)

    # fused: cost + diagonal (current plane_sweep_and_warp inner)
    def fused(f, i, w, r):
        acc_cost = 0.0
        acc_diag = 0.0
        for t in range(4):
            vals = jnp.take(f, i[t], axis=1)          # [C1+C2, D, HW]
            acc_cost = acc_cost + vals[:C1] * w[t][None]
            diag = jnp.diagonal(vals[C1:], axis1=0, axis2=1)  # [HW, D]
            acc_diag = acc_diag + w[t] * diag.T
        diff = acc_cost - r[:, None, :]
        return jnp.sum(diff * diff, axis=0), acc_diag
    timeit("fused cost+diag (current)", fused, flat, idx, wt, ref)

    # diagonal-only gather: plane d gathers channel d -> flatten index into
    # [C2*HWp] so the gather is 1 channel x [D, HW] indices
    flat2 = flat[C1:].reshape(-1)                     # [C2*HWp]
    didx = (jnp.arange(D, dtype=jnp.int32)[:, None] * HWp + idx[0]) \
        .reshape(D, HW)
    def diag_flat(f2, di):
        return jnp.take(f2, di)
    timeit("diag via flat 1d take [D,HW]", diag_flat, flat2, didx)

    def fused_split(f, i, w, r, f2):
        acc_cost = 0.0
        acc_diag = 0.0
        for t in range(4):
            vals = jnp.take(f[:C1], i[t], axis=1)     # [C1, D, HW]
            acc_cost = acc_cost + vals * w[t][None]
            di = (jnp.arange(D, dtype=jnp.int32)[:, None] * HWp + i[t])
            acc_diag = acc_diag + w[t] * jnp.take(f2, di)
        diff = acc_cost - r[:, None, :]
        return jnp.sum(diff * diff, axis=0), acc_diag
    timeit("fused: C1 take + 1d diag take", fused_split, flat, idx, wt, ref, flat2)

    # cost only, fp32 vs bf16 gather source
    flatb = flat.astype(jnp.bfloat16)
    def four_tap_bf16(f, i, w):
        acc = 0.0
        for t in range(4):
            acc = acc + jnp.take(f[:C1], i[t], axis=1).astype(jnp.float32) * w[t][None]
        return acc
    timeit("4 taps C1 bf16 source", four_tap_bf16, flatb, idx, wt)

    # how does it scale with batch: vmap over 2
    flatB = jnp.stack([flat, flat])
    idxB = jnp.stack([idx, idx])
    wtB = jnp.stack([wt, wt])
    refB = jnp.stack([ref, ref])
    timeit("fused x2 (vmap)", jax.vmap(fused), flatB, idxB, wtB, refB)

    # index count vs channel count: 1 channel, same index count
    one = flat[:1]
    timeit("take 1 tap 1ch [1,HWp]->[1,D,HW]", lambda f, i: jnp.take(f, i[0], axis=1), one, idx)
    # all 4 taps in ONE take (4x index count, half channels)
    idx_flat = idx.reshape(4 * D, HW)
    timeit("take 4 taps as one [C,4D,HW]", lambda f, i: jnp.take(f[:C1], i, axis=1), flat, idx_flat)


if __name__ == "__main__":
    main()
