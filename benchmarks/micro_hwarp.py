#!/usr/bin/env python3
"""Micro-benchmark: horizontal-only (rectified-stereo) warp strategies.

The stereo-consistency loss warps (rsc/dsc) are the train step's #1 op —
~62 ms/step at B=8 in gather custom-fusions (trace_profile.py), latency
bound at ~15 ns/index regardless of tap batching (micro_gather.py). For a
rectified rig the reprojection is HORIZONTAL (y' == y; synthetic t_l2r is
exactly pure-x translation, KITTI rectified within calibration noise), so
the warp is a per-row linear map — expressible as matmuls (MXU) or a
K-offset shift/select reduce (VPU) instead of a gather.

Candidates (out[c,y,x] = (1-fx)*img[c,y,x0] + fx*img[c,y,x0+1]):

  gather   — current grid_sample cat4 form (baseline)
  dense    — per-row one-hot [W_out, W_in] matrix, batched matmul
  shiftK   — sum_{k<K} w_k(y,x) * img[c,y,x-k]; disparity bounded by K
  banded   — shiftK expressed as block-banded matmul ([128, 128+K] blocks)

Run: python benchmarks/micro_hwarp.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

B, C, H, W = 8, 3, 256, 384
K = 64          # max disparity bound (px); fx*b/z_min ~ 40 at KITTI scale
N = H * W


def timeit(fn, *args, iters=20):
    # readback-barrier timing + content-changing chain (utils/timing.py)
    from depthestimation_tpu.utils.timing import time_chain

    def step(a0):
        out = fn(a0, *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        fb = (jnp.sum(leaf.astype(jnp.float32)) * 1e-12).astype(a0.dtype)
        return jnp.roll(a0 + fb, 1, axis=0)

    dt, _ = time_chain(step, args[0], iters)
    return dt * 1e3


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    # coherent positive disparity field (stereo-like), 4..K-4 px
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    disp = (8.0 + (K - 16) * rng.rand(B, 1, 1)
            * (0.5 + 0.5 * np.cos(yy / 31.0))[None]
            * (0.5 + 0.5 * np.sin(xx / 53.0))[None])
    xw = np.clip(xx[None] - disp, 0.0, W - 1.001)       # source x'
    x0 = np.floor(xw).astype(np.int32)                   # [B, H, W]
    fx = (xw - x0).astype(np.float32)
    x0j, fxj = jnp.asarray(x0), jnp.asarray(fx)

    # ---- gather (current grid_sample form, horizontal grid) -------------
    @jax.jit
    def gather(img, x0, fx):
        def one(img, x0, fx):
            flat = img.reshape(C, H * W)
            base = jnp.arange(H, dtype=jnp.int32)[:, None] * W
            i0 = (base + x0).ravel()
            idx = jnp.concatenate([i0, i0 + 1])
            t = jnp.take(flat, idx, axis=1).reshape(C, 2, N)
            w = jnp.stack([1 - fx.ravel(), fx.ravel()])
            return jnp.sum(t * w[None], axis=1).reshape(C, H, W)
        return jax.vmap(one)(img, x0, fx)

    # ---- dense one-hot matmul -------------------------------------------
    @jax.jit
    def dense(img, x0, fx):
        src = jnp.arange(W, dtype=jnp.int32)              # [W_in]
        m = ((src[None, None, None] == x0[..., None]) * (1 - fx)[..., None]
             + (src[None, None, None] == (x0 + 1)[..., None]) * fx[..., None])
        # m: [B, H, W_out, W_in]; img: [B, C, H, W_in]
        return jnp.einsum("bhxs,bchs->bchx", m, img,
                          precision=jax.lax.Precision.HIGHEST)

    # ---- shift-K select reduce (VPU) --------------------------------------
    @jax.jit
    def shiftK(img, x0, fx):
        xg = jnp.arange(W, dtype=jnp.int32)[None, None]   # [1, 1, W]
        k0 = xg - x0                                       # tap offset [B,H,W]
        out = jnp.zeros_like(img)
        for k in range(K):
            w_k = ((k0 == k) * (1 - fx) + (k0 == k + 1) * fx)  # [B, H, W]
            sh = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (k, 0)))[..., :W]
            out = out + sh * w_k[:, None]
        return out

    # ---- block-banded matmul ----------------------------------------------
    BLK = 128
    NB = W // BLK

    @jax.jit
    def banded(img, x0, fx):
        # output block j reads input [j*BLK - K, j*BLK + BLK)
        pad = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (K, 0)))
        # [B, C, H, NB, BLK+K] overlapping input blocks
        blocks = jnp.stack([pad[..., j * BLK:j * BLK + BLK + K]
                            for j in range(NB)], axis=3)
        src = jnp.arange(BLK + K, dtype=jnp.int32)
        # local source coordinate of x0 within block j: x0 - j*BLK + K
        xb = x0.reshape(B, H, NB, BLK)
        fb = fx.reshape(B, H, NB, BLK)
        base = (jnp.arange(NB, dtype=jnp.int32) * BLK)[None, None, :, None]
        loc = xb - base + K
        m = ((src == loc[..., None]) * (1 - fb)[..., None]
             + (src == (loc + 1)[..., None]) * fb[..., None])
        # m: [B, H, NB, BLK, BLK+K]; blocks: [B, C, H, NB, BLK+K]
        out = jnp.einsum("bhjxs,bchjs->bchjx", m, blocks,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(B, C, H, W)

    ref = np.asarray(gather(img, x0j, fxj))
    for name, fn in [("gather", gather), ("dense", dense),
                     ("shiftK", shiftK), ("banded", banded)]:
        out = np.asarray(fn(img, x0j, fxj))
        err = np.abs(out - ref).max()
        ms = timeit(fn, img, x0j, fxj)
        print(f"{name:7s} {ms:8.3f} ms  maxdiff {err:.2e}")


if __name__ == "__main__":
    main()
