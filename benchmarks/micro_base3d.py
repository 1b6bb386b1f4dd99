#!/usr/bin/env python3
"""Micro-benchmarks for the Base3D hot path at B=8 production shapes.

Per trace_profile.py the B=8 train step spends (per step):
  ~106 ms  Base3D backward convs   (6x 15.9 + 10.2; 423 GB/s, HBM-bound)
  ~37 ms   Base3D forward convs    (578 GB/s)
  ~32 ms   BatchNorm f32 converts  (7x 4.6 ms — stats upcast materializes)
  ~40 ms   BatchNorm bwd reduce_sums
  ~23 ms   relu max + residual add

Questions measured here:
  conv    — fwd/bwd cost of one [B*D, H, W, 64] 3x3 bf16 conv (the Conv3d
            building block); same at C=128 to expose lane-padding effects
  conv3d  — native lax conv with (3,3,3) window vs sum of 3 shifted 2D convs
  bnstat  — sum/sumsq over all-but-C: convert+reduce (current) vs MXU
            ones-dot (f32 accumulation) vs Pallas one-pass kernel
  ew      — relu on the full activation (pure-BW reference)

Run: python benchmarks/micro_base3d.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from depthestimation_tpu.utils.compile_cache import enable as _cc
_cc()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, D, H, W, C = 8, 64, 64, 96, 64
N = B * D


def timeit(fn, *args, iters=20):
    """Time fn(*args) with each iteration chained through arg0 by a tiny
    NONZERO feedback term and a roll (the remote TPU runtime dedupes
    executions it has already seen the input contents for; a *0.0 chain —
    or a bf16 chain whose feedback rounds away — repeats the input and the
    iterations come back from cache). Completion is forced by a host
    readback: block_until_ready is NOT a reliable barrier on the tunneled
    runtime (utils/timing.py)."""
    from depthestimation_tpu.utils.timing import time_chain

    @jax.jit
    def step(a0):
        out = fn(a0, *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        fb = (jnp.sum(leaf.astype(jnp.float32)) * 1e-12).astype(a0.dtype)
        return jnp.roll(a0 + fb, 1, axis=0)

    dt, _ = time_chain(step, args[0], iters)
    return dt * 1e3


def bench_conv(c: int):
    x = jnp.asarray(np.random.RandomState(0).randn(N, H, W, c),
                    jnp.bfloat16)
    k = jnp.asarray(np.random.RandomState(1).randn(3, 3, c, c) * 0.05,
                    jnp.bfloat16)

    @jax.jit
    def fwd(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def fwdbwd(x, k):
        def f(x, k):
            return jnp.sum(fwd(x, k).astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))(x, k)

    print(f"conv2d C={c:4d}: fwd {timeit(fwd, x, k):7.2f} ms   "
          f"fwd+bwd {timeit(fwdbwd, x, k):7.2f} ms")


def bench_conv3d():
    x = jnp.asarray(np.random.RandomState(0).randn(B, D, H, W, C),
                    jnp.bfloat16)
    k3 = jnp.asarray(np.random.RandomState(1).randn(3, 3, 3, C, C) * 0.05,
                     jnp.bfloat16)

    @jax.jit
    def native(x, k3):
        return jax.lax.conv_general_dilated(
            x, k3, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    @jax.jit
    def sum2d(x, k3):
        xx = x.reshape(N, H, W, C)
        out = None
        for kd in range(3):
            y = jax.lax.conv_general_dilated(
                xx, k3[kd], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(B, D, H, W, C)
            shift = kd - 1
            if shift:
                y = jnp.roll(y, -shift, axis=1)
                mask = jnp.zeros((D,), jnp.bfloat16).at[
                    max(0, -shift):D - max(0, shift)].set(1.0)
                y = y * mask[None, :, None, None, None]
            out = y if out is None else out + y
        return out

    @jax.jit
    def native_bwd(x, k3):
        def f(x, k3):
            return jnp.sum(native(x, k3).astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))(x, k3)

    @jax.jit
    def sum2d_bwd(x, k3):
        def f(x, k3):
            return jnp.sum(sum2d(x, k3).astype(jnp.float32) ** 2)
        return jax.grad(f, argnums=(0, 1))(x, k3)

    a = np.asarray(native(x, k3), np.float32)
    b = np.asarray(sum2d(x, k3), np.float32)
    print(f"conv3d: native fwd {timeit(native, x, k3):7.2f} ms   "
          f"sum2d fwd {timeit(sum2d, x, k3):7.2f} ms   "
          f"maxdiff {np.abs(a - b).max():.2e}")
    print(f"conv3d: native f+b {timeit(native_bwd, x, k3):7.2f} ms   "
          f"sum2d f+b {timeit(sum2d_bwd, x, k3):7.2f} ms")


def bench_bnstat():
    x = jnp.asarray(np.random.RandomState(0).randn(B, D, H, W, C),
                    jnp.bfloat16)
    n = B * D * H * W

    @jax.jit
    def two_pass(x):
        xf = x.astype(jnp.float32)
        return jnp.mean(xf, axis=(0, 1, 2, 3)), \
            jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3))

    @jax.jit
    def ones_dot(x):
        xx = x.reshape(n, C)
        ones = jnp.ones((n,), jnp.bfloat16)
        s = jax.lax.dot_general(ones, xx, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        x2 = jnp.square(xx)      # bf16 squares — precision loss ~0.4%
        s2 = jax.lax.dot_general(ones, x2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return s / n, s2 / n

    ROWS = 1024

    def _bn_kernel(x_ref, sum_ref, sq_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sum_ref[:] = jnp.zeros_like(sum_ref)
            sq_ref[:] = jnp.zeros_like(sq_ref)
        xf = x_ref[:].astype(jnp.float32)          # upcast in-register
        sum_ref[:] += jnp.sum(xf, axis=0, keepdims=True)
        sq_ref[:] += jnp.sum(xf * xf, axis=0, keepdims=True)

    @jax.jit
    def pallas_pass(x):
        xx = x.reshape(n, C)
        s, s2 = pl.pallas_call(
            _bn_kernel,
            grid=(n // ROWS,),
            in_specs=[pl.BlockSpec((ROWS, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((1, C), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, C), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((1, C), jnp.float32),
                       jax.ShapeDtypeStruct((1, C), jnp.float32)),
        )(xx)
        return s[0] / n, s2[0] / n

    ref = jax.tree_util.tree_map(np.asarray, two_pass(x))
    for name, fn in [("two_pass", two_pass), ("ones_dot", ones_dot),
                     ("pallas", pallas_pass)]:
        got = jax.tree_util.tree_map(np.asarray, fn(x))
        err = max(np.abs(g - r).max() for g, r in zip(got, ref))
        print(f"bnstat {name:9s} {timeit(fn, x):7.2f} ms  maxdiff {err:.2e}")


def _conv3d_5d(x, k3):
    """Current production form: 5D input, per-tap depth slice of the padded
    volume, [B*D] reshape per conv (models/layers.py:Conv3d)."""
    b, d, h, w, c = x.shape
    f = k3.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    y = None
    for i in range(3):
        xi = jax.lax.dynamic_slice_in_dim(xp, i, d, axis=1)
        yi = jax.lax.conv_general_dilated(
            xi.reshape(b * d, h, w, c), k3[i], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = yi if y is None else y + yi
    return y.reshape(b, d, h, w, f)


def _conv3d_flat(x, k3, d):
    """Candidate: flattened [B*D, H, W, C] throughout; the 3 taps conv the
    SAME input (no pad/slice copies) and the depth shift happens on the
    conv OUTPUTS via roll + iota mask (fuses into the accumulate)."""
    n = x.shape[0]
    taps = [jax.lax.conv_general_dilated(
        x, k3[i], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) for i in range(3)]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1, 1), 0) % d
    y = taps[1]
    for i in (0, 2):
        s = i - 1
        ti = jnp.roll(taps[i], -s, axis=0)
        mask = (row + s >= 0) & (row + s < d)
        y = y + jnp.where(mask, ti, jnp.zeros((), ti.dtype))
    return y


def _bn_relu(x):
    mean, var = (jnp.mean(x.astype(jnp.float32), axis=tuple(range(x.ndim - 1))),
                 jnp.var(x.astype(jnp.float32), axis=tuple(range(x.ndim - 1))))
    a = jax.lax.rsqrt(var + 1e-5)
    b = -mean * a
    return jnp.maximum(x * a.astype(x.dtype) + b.astype(x.dtype), 0)


def bench_resblock():
    """One Base3D residual block (conv-bn-relu-conv-bn + add), 5D slice form
    vs flat-4D output-shift form, fwd and fwd+bwd."""
    rs = np.random.RandomState(0)
    x5 = jnp.asarray(rs.randn(B, D, H, W, C), jnp.bfloat16)
    ka = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.05, jnp.bfloat16)
    kb = jnp.asarray(rs.randn(3, 3, 3, C, C) * 0.05, jnp.bfloat16)

    @jax.jit
    def block5d(x, ka, kb):
        y = _bn_relu(_conv3d_5d(x, ka))
        y = _bn_relu(_conv3d_5d(y, kb))
        return y + x

    @jax.jit
    def block4d(x, ka, kb):
        x4 = x.reshape(N, H, W, C)
        y = _bn_relu(_conv3d_flat(x4, ka, D))
        y = _bn_relu(_conv3d_flat(y, kb, D))
        return (y + x4).reshape(B, D, H, W, C)

    def wrap_bwd(block):
        @jax.jit
        def fb(x, ka, kb):
            def f(x, ka, kb):
                return jnp.sum(block(x, ka, kb).astype(jnp.float32) ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(x, ka, kb)
        return fb

    a = np.asarray(block5d(x5, ka, kb), np.float32)
    b = np.asarray(block4d(x5, ka, kb), np.float32)
    print(f"resblock: 5d fwd {timeit(block5d, x5, ka, kb):7.2f} ms   "
          f"flat4d fwd {timeit(block4d, x5, ka, kb):7.2f} ms   "
          f"maxdiff {np.abs(a - b).max():.2e}")
    print(f"resblock: 5d f+b {timeit(wrap_bwd(block5d), x5, ka, kb):7.2f} ms  "
          f"flat4d f+b {timeit(wrap_bwd(block4d), x5, ka, kb):7.2f} ms")


def bench_ew():
    x = jnp.asarray(np.random.RandomState(0).randn(B, D, H, W, C),
                    jnp.bfloat16)

    @jax.jit
    def relu(x):
        return jnp.maximum(x, 0)

    print(f"elementwise relu on [B,D,H,W,C] bf16: {timeit(relu, x):7.2f} ms "
          f"(2x{x.size * 2 / 1e9:.2f} GB logical)")


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "conv"):
        bench_conv(64)
        bench_conv(128)
    if which in ("all", "conv3d"):
        bench_conv3d()
    if which in ("all", "resblock"):
        bench_resblock()
    if which in ("all", "bnstat"):
        bench_bnstat()
    if which in ("all", "ew"):
        bench_ew()
