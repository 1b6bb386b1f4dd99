#!/usr/bin/env python3
"""Micro-benchmark of bilinear-resample gather strategies on TPU.

The full-res loss warps (rsc/dsc, ops/resample.py:grid_sample) spend
~72 ms/step in gather custom-fusions at B=8 — latency-bound at ~8.6 ns per
gathered index. Candidates:

  taps4    — current: 4 independent jnp.take (one per bilinear tap)
  cat4     — one jnp.take with the 4 taps' indices concatenated
  patch    — ONE lax.gather of a [2, 2] window per output pixel from an
             [H+2, W+2, C] source (4x fewer indices)
  rows     — gather rows from a channels-minor [S, C] layout

Run: python benchmarks/micro_gather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, C = 256, 384, 3
B = 8
N = H * W
HP, WP = H + 2, W + 2


def timeit(fn, src, y0, x0, fx, fy, iters=20):
    """Readback-barrier timing with a content-changing chain: the runtime
    dedupes executions by input content, and block_until_ready is not a
    reliable completion barrier here (utils/timing.py)."""
    from depthestimation_tpu.utils.timing import time_chain

    def step(s):
        out = fn(s, y0, x0, fx, fy)
        fb = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(s.dtype)
        return jnp.roll(s + fb, 1, axis=0)

    dt, _ = time_chain(step, src, iters)
    return dt * 1e3


def main():
    rng = np.random.RandomState(0)
    base = rng.randn(B, HP, WP, C).astype(np.float32)
    img = jnp.asarray(np.ascontiguousarray(base.transpose(0, 3, 1, 2))
                      .reshape(B, C, HP * WP))
    imgr = jnp.asarray(base)
    # COHERENT stereo-like warp coords (smooth per-pixel disparity): real
    # loss warps have strong locality; fully random indices overstate
    # gather cost ~5x on TPU.
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    disp = (8.0 + 20.0 * rng.rand(B, 1, 1)
            * np.cos(yy / 31.0)[None] * np.sin(xx / 53.0)[None])
    xw = np.clip(xx[None] - disp, 0, W - 1.001)
    yw = np.clip(yy[None] + 0.5 * rng.randn(B, 1, 1), 0, H - 1.001)
    y0 = jnp.asarray(np.floor(yw).reshape(B, N).astype(np.int32))
    x0 = jnp.asarray(np.floor(xw).reshape(B, N).astype(np.int32))
    fx = jnp.asarray((xw - np.floor(xw)).reshape(B, N).astype(np.float32))
    fy = jnp.asarray((yw - np.floor(yw)).reshape(B, N).astype(np.float32))

    @jax.jit
    def taps4(img, y0, x0, fx, fy):
        def one(img, y0, x0, fx, fy):
            idx = y0 * WP + x0
            t00 = jnp.take(img, idx, axis=1)
            t01 = jnp.take(img, idx + 1, axis=1)
            t10 = jnp.take(img, idx + WP, axis=1)
            t11 = jnp.take(img, idx + WP + 1, axis=1)
            return (t00 * ((1 - fx) * (1 - fy))[None]
                    + t01 * (fx * (1 - fy))[None]
                    + t10 * ((1 - fx) * fy)[None]
                    + t11 * (fx * fy)[None])
        return jax.vmap(one)(img, y0, x0, fx, fy)

    @jax.jit
    def cat4(img, y0, x0, fx, fy):
        def one(img, y0, x0, fx, fy):
            idx = y0 * WP + x0
            allidx = jnp.concatenate([idx, idx + 1, idx + WP, idx + WP + 1])
            t = jnp.take(img, allidx, axis=1).reshape(C, 4, N)
            w = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                           (1 - fx) * fy, fx * fy])
            return jnp.einsum("ctn,tn->cn", t, w)
        return jax.vmap(one)(img, y0, x0, fx, fy)

    @jax.jit
    def patch(imgr, y0, x0, fx, fy):
        def one(imgr, y0, x0, fx, fy):
            starts = jnp.stack([y0, x0], axis=-1)  # [N, 2]
            dnums = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            t = jax.lax.gather(imgr, starts, dnums, slice_sizes=(2, 2, C),
                               mode=jax.lax.GatherScatterMode.CLIP)
            w = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                           (1 - fx) * fy, fx * fy], axis=-1).reshape(N, 2, 2)
            return jnp.einsum("nyxc,nyx->cn", t, w)
        return jax.vmap(one)(imgr, y0, x0, fx, fy)

    @jax.jit
    def rows(imgr, y0, x0, fx, fy):
        def one(imgr, y0, x0, fx, fy):
            flat = imgr.reshape(HP * WP, C)
            idx = y0 * WP + x0
            t00 = jnp.take(flat, idx, axis=0)
            t01 = jnp.take(flat, idx + 1, axis=0)
            t10 = jnp.take(flat, idx + WP, axis=0)
            t11 = jnp.take(flat, idx + WP + 1, axis=0)
            return (t00 * ((1 - fx) * (1 - fy))[:, None]
                    + t01 * (fx * (1 - fy))[:, None]
                    + t10 * ((1 - fx) * fy)[:, None]
                    + t11 * (fx * fy)[:, None]).T
        return jax.vmap(one)(imgr, y0, x0, fx, fy)

    ref = np.asarray(taps4(img, y0, x0, fx, fy))
    for name, fn, src in [("taps4", taps4, img), ("cat4", cat4, img),
                          ("patch", patch, imgr), ("rows", rows, imgr)]:
        out = np.asarray(fn(src, y0, x0, fx, fy))
        err = np.abs(out - ref).max()
        ms = timeit(fn, src, y0, x0, fx, fy)
        print(f"{name:6s} {ms:7.3f} ms  maxdiff {err:.2e}")


if __name__ == "__main__":
    main()
