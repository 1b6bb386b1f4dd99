#!/usr/bin/env python3
"""Prototype: fused Base3D block kernel v2 (transposed-activation layout).

The round-3 fused flat-Conv3d attempt (ops/conv3d_pallas.py) lost 3x to
XLA because its im2col ran nine masked rolls on [H*W, C] tiles — sublane
rolls that use C=32 of the VPU's 128 lanes, forced to f32 (Mosaic rejects
bf16 rotates). This prototype transposes the tile: activations flow as
[C, H*W] (channels on sublanes, flattened pixels on lanes), so

  * every spatial shift is a LANE roll at full 128-lane width,
  * the nine shifted copies concatenate along SUBLANES into a
    [9C=288, HW] tile -> ONE dot_general with K=288 (vs 9 K=32 matmuls),
  * the conv output [3F, HW] is already in the next layer's input layout.

Fused per grid step (one depth row of the flattened [B*D, C, H*W]
volume): BN normalize + ReLU on load (per-channel a,b), 9-tap stacked
conv, depth-tap combine via a 2-buffer ring (delayed write, grid N+1),
BN statistics (sum/sumsq) accumulated on store. This wipes the XLA
block's intermediates: the [N,H,W,3F] tap tensor, the combine
broadcast_select (2.5 ms/layer at B=8), and the BN stat tuple fusions
(2.2 ms/layer) never reach HBM.

Semantics matched against the production flat Conv3d (models/layers.py
tap-stacked path, reference models/models.py:377-439): out[n] = t1(n)
+ t0(n-1)*[n%D>0] + t2(n+1)*[n%D<D-1], taps in bf16, f32 conv
accumulation.

Run CPU parity:  JAX_PLATFORMS=cpu python benchmarks/micro_convcomb.py --interpret
Run TPU timing:  python benchmarks/micro_convcomb.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from depthestimation_tpu.utils.compile_cache import enable as _cc
_cc()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, D, H, W = 8, 64, 64, 96
C, F = 32, 32
N = B * D
HW = H * W


# ---------------------------------------------------------------- kernel

def _shift_hw(u, off, h, w, f32=True):
    """Lane-roll a [rows, H*W] tile by `off` pixels with image-boundary
    masking (off = dh*W + dw, |dh|,|dw| <= 1). Output row hw holds
    u[hw + off] where the source pixel is inside the image, else 0."""
    if off == 0:
        return u
    rows, hw = u.shape
    rolled = pltpu.roll(u, -off % hw, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, hw), 1)
    wpos = lane % w
    # decompose off into (dh, dw) with dw in {-1, 0, 1}
    dw = ((off + 1) % w) - 1
    dh = (off - dw) // w
    valid = jnp.ones((rows, hw), jnp.bool_)
    if dw:
        valid = valid & ((wpos + dw >= 0) & (wpos + dw < w))
    if dh:
        hpos = lane // w
        valid = valid & ((hpos + dh >= 0) & (hpos + dh < h))
    return jnp.where(valid, rolled, jnp.zeros((), u.dtype))


def _convcomb_kernel(ab_ref, x_ref, wm_ref, y_ref, stats_ref,
                     part_ref, t0_ref, acc_ref, *, n_rows, depth,
                     h, w, relu_in):
    """Grid step i: compute taps(i) for row i (clamped), write combined
    row i-1, maintain the (part, t0) ring, accumulate output stats."""
    i = pl.program_id(0)
    c, hw = x_ref.shape[1], x_ref.shape[2]
    f = y_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # --- load + normalize (+ReLU) in f32 (rolls need 32-bit data) ---
    x = x_ref[0].astype(jnp.float32)
    a = ab_ref[0].astype(jnp.float32)[:, None]
    b = ab_ref[1].astype(jnp.float32)[:, None]
    u = x * a + b
    if relu_in:
        u = jnp.maximum(u, 0.0)

    # --- nine shifted copies -> [9C, HW] bf16 ---
    cols = []
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            cols.append(_shift_hw(u, dh * w + dw, h, w).astype(jnp.bfloat16))
    u9 = jnp.concatenate(cols, axis=0)

    # --- one K=9C matmul on the MXU -> taps [3F, HW] ---
    taps = jax.lax.dot_general(
        wm_ref[:], u9, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    t0, t1, t2 = taps[:f], taps[f:2 * f], taps[2 * f:]

    # --- delayed-write combine: out[i-1] = part(i-1) + t2(i)*mask ---
    @pl.when(i > 0)
    def _write():
        up_ok = ((i - 1) % depth) < (depth - 1)   # row i-1 not item top
        y = part_ref[:] + jnp.where(up_ok, t2,
                                    jnp.zeros((), jnp.bfloat16))
        y_ref[0] = y
        yf = y.astype(jnp.float32)
        acc_ref[:, 0] += jnp.sum(yf, axis=1)
        acc_ref[:, 1] += jnp.sum(yf * yf, axis=1)

    @pl.when(i < n_rows)
    def _ring():
        dn_ok = (i % depth) > 0                    # row i not item bottom
        tp = t0_ref[:]
        part_ref[:] = t1 + jnp.where(dn_ok, tp,
                                     jnp.zeros((), jnp.bfloat16))
        t0_ref[:] = t0

    @pl.when(i == n_rows)
    def _stats():
        stats_ref[:] = acc_ref[:]


def convcomb_pallas(xt, wm, a, b, depth, h, w, relu_in=True,
                    interpret=False):
    """xt [N, C, H*W] bf16, wm [3F, 9C] bf16, a/b [C] f32 ->
    (y [N, F, H*W] bf16, stats [F, 2] f32)."""
    n, c, hw = xt.shape
    f3 = wm.shape[0]
    f = f3 // 3
    ab = jnp.stack([a, b]).astype(jnp.float32)          # [2, C]
    grid = (n + 1,)
    kernel = functools.partial(_convcomb_kernel, n_rows=n, depth=depth,
                               h=h, w=w, relu_in=relu_in)
    y, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c, hw), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
            pl.BlockSpec((f3, 9 * c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, f, hw), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((f, 2), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, f, hw), jnp.bfloat16),
            jax.ShapeDtypeStruct((f, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f, hw), jnp.bfloat16),   # part ring
            pltpu.VMEM((f, hw), jnp.bfloat16),   # t0 ring
            pltpu.VMEM((f, 2), jnp.float32),     # stats accumulator
        ],
        interpret=interpret,
    )(ab, xt, wm)
    return y, stats


# ------------------------------------------------------------- bwd kernel

def _convcomb_bwd_kernel(sb_ref, gy_ref, y_ref, x_ref, wmt_ref,
                         dx_ref, dw_ref,
                         gp_ref, gc_ref, dwacc_ref, *, n_rows, depth,
                         h, w):
    """Fused backward: grid step i loads row i's (gy, y) -> ge(i) =
    gy + s0 + 2*y*s1, maintains a (ge(i-2), ge(i-1)) ring, and emits
    dx(i-1) + accumulates dW from g_taps(i-1) and u9(i-1).

    g_taps(n) = [ge(n+1)*beta(n), ge(n), ge(n-1)*alpha(n)] (tap 0/1/2),
    dx(n) = sum_s shift_{-s}( (Wm^T g_taps)(s-block) ),
    dW += g_taps(n) @ u9(n)^T.
    """
    i = pl.program_id(0)
    f = gy_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        dwacc_ref[:] = jnp.zeros_like(dwacc_ref)

    # ge(i) for the ring (garbage at i == n_rows, masked later)
    s0 = sb_ref[0].astype(jnp.float32)[:, None]
    s1 = sb_ref[1].astype(jnp.float32)[:, None]
    gy = gy_ref[0].astype(jnp.float32)
    yv = y_ref[0].astype(jnp.float32)
    ge_new = (gy + s0 + 2.0 * yv * s1).astype(jnp.bfloat16)

    @pl.when(i > 0)
    def _emit():
        n = i - 1                       # row whose dx/dW we emit
        ge_n = gc_ref[:]
        ge_up = ge_new                  # ge(n+1), garbage at i == n_rows
        ge_dn = gp_ref[:]               # ge(n-1), garbage at n == 0
        alpha = (n % depth) > 0
        beta = (n % depth) < (depth - 1)
        zero = jnp.zeros((), jnp.bfloat16)
        g0 = jnp.where(beta, ge_up, zero)
        g2 = jnp.where(alpha, ge_dn, zero)
        g_taps = jnp.concatenate([g0, ge_n, g2], axis=0)   # [3F, HW]

        # dx(n) = sum_s shift_{-s}( m9[sC:(s+1)C] ),
        # m9 = Wm^T @ g_taps  [9C, HW]
        m9 = jax.lax.dot_general(
            wmt_ref[:], g_taps, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        c = dx_ref.shape[1]
        dx = jnp.zeros((c, m9.shape[1]), jnp.float32)
        s = 0
        for dh in (-1, 0, 1):
            for dw_ in (-1, 0, 1):
                blk = m9[s * c:(s + 1) * c]
                dx = dx + _shift_hw(blk, -(dh * w + dw_), h, w)
                s += 1
        dx_ref[0] = dx.astype(jnp.bfloat16)

        # dW accumulation: g_taps [3F, HW] x u9(n) [9C, HW] over lanes
        x = x_ref[0].astype(jnp.float32)
        cols = []
        for dh in (-1, 0, 1):
            for dw_ in (-1, 0, 1):
                cols.append(_shift_hw(x, dh * w + dw_, h, w)
                            .astype(jnp.bfloat16))
        u9 = jnp.concatenate(cols, axis=0)
        dwacc_ref[:] += jax.lax.dot_general(
            g_taps, u9, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i < n_rows)
    def _ring():
        gp_ref[:] = gc_ref[:]
        gc_ref[:] = ge_new

    @pl.when(i == n_rows)
    def _final():
        dw_ref[:] = dwacc_ref[:]


def convcomb_bwd_pallas(xt, wm, y, gy, gs, depth, h, w, interpret=False):
    """VJP of convcomb_pallas wrt (xt, wm). gs [F, 2] f32 stats cotangent."""
    n, c, hw = xt.shape
    f3 = wm.shape[0]
    f = f3 // 3
    sb = jnp.stack([gs[:, 0], gs[:, 1]]).astype(jnp.float32)   # [2, F]
    kernel = functools.partial(_convcomb_bwd_kernel, n_rows=n, depth=depth,
                               h=h, w=w)
    dx, dw = pl.pallas_call(
        kernel,
        grid=(n + 1,),
        in_specs=[
            pl.BlockSpec((2, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f, hw), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
            pl.BlockSpec((1, f, hw), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
            pl.BlockSpec((1, c, hw), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((f3, 9 * c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, hw), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((f3, 9 * c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, hw), jnp.bfloat16),
            jax.ShapeDtypeStruct((f3, 9 * c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f, hw), jnp.bfloat16),    # ge(i-2) -> ge(n-1)
            pltpu.VMEM((f, hw), jnp.bfloat16),    # ge(i-1) -> ge(n)
            pltpu.VMEM((f3, 9 * c), jnp.float32),  # dW accumulator
        ],
        interpret=interpret,
    )(sb, gy, y, xt, wm)
    return dx, dw


# ---------------------------------------------------------- XLA reference

def pack_wm(k3):
    """k3 [3, 3, 3, C, F] (tap, kh, kw, C, F) -> wm [3F, 9C]."""
    t, kh, kw, c, f = k3.shape
    # wm[tap*F + f, (kh*3+kw)*C + c]
    return k3.transpose(0, 4, 1, 2, 3).reshape(t * f, kh * kw * c)


def block_xla(x4, k3, a, b, depth, relu_in=True):
    """Production-form block: normalize(+relu) -> tap-stacked conv ->
    roll/mask combine -> stats. x4 [N, H, W, C] bf16."""
    n = x4.shape[0]
    u = x4 * a.astype(x4.dtype) + b.astype(x4.dtype)
    if relu_in:
        u = jnp.maximum(u, 0)
    kcat = jnp.concatenate([k3[i] for i in range(3)], axis=-1)  # [3,3,C,3F]
    tcat = jax.lax.conv_general_dilated(
        u, kcat.astype(x4.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    f = k3.shape[-1]
    taps = [tcat[..., i * f:(i + 1) * f] for i in range(3)]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1, 1), 0) % depth
    y = taps[1]
    for i in (0, 2):
        s = i - 1
        ti = jnp.roll(taps[i], -s, axis=0)
        valid = (row + s >= 0) & (row + s < depth)
        y = y + jnp.where(valid, ti, jnp.zeros((), ti.dtype))
    yf = y.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(yf, axis=(0, 1, 2)),
                       jnp.sum(yf * yf, axis=(0, 1, 2))], axis=-1)
    return y, stats


# ----------------------------------------------------------------- driver

def main():
    interpret = "--interpret" in sys.argv
    rs = np.random.RandomState(0)
    x4 = jnp.asarray(rs.randn(N, H, W, C), jnp.bfloat16)
    k3 = jnp.asarray(rs.randn(3, 3, 3, C, F) * 0.05, jnp.bfloat16)
    a = jnp.asarray(rs.rand(C) * 0.5 + 0.75, jnp.float32)
    b = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)

    xt = jnp.transpose(x4, (0, 3, 1, 2)).reshape(N, C, HW)
    wm = pack_wm(k3)

    y_ref, s_ref = jax.jit(functools.partial(block_xla, depth=D))(
        x4, k3, a, b)
    y_p, s_p = jax.jit(functools.partial(
        convcomb_pallas, depth=D, h=H, w=W, interpret=interpret))(
        xt, wm, a, b)
    y_p4 = jnp.transpose(y_p.reshape(N, F, H, W), (0, 2, 3, 1))

    err = float(jnp.max(jnp.abs(y_p4.astype(jnp.float32)
                                - y_ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))))
    cnt = float(N * HW)
    mean_p, mean_r = s_p[:, 0] / cnt, s_ref[:, 0] / cnt
    var_p = s_p[:, 1] / cnt - mean_p ** 2
    var_r = s_ref[:, 1] / cnt - mean_r ** 2
    merr = float(jnp.max(jnp.abs(mean_p - mean_r) / jnp.sqrt(var_r)))
    verr = float(jnp.max(jnp.abs(var_p - var_r) / var_r))
    print(f"parity: y maxdiff {err:.3e} (scale {scale:.2f})   "
          f"mean err/std {merr:.3e}   var relerr {verr:.3e}")
    assert err <= 0.05 * scale, (err, scale)
    assert merr < 1e-2 and verr < 1e-2, (merr, verr)

    # ---- backward parity: pure convcomb+stats (a=1, b=0, no relu) ----
    ones, zeros = jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32)

    def pure_xla(x4, k3):
        return block_xla(x4, k3, ones, zeros, D, relu_in=False)

    y0, s0 = jax.jit(pure_xla)(x4, k3)
    rs2 = np.random.RandomState(1)
    gy4 = jnp.asarray(rs2.randn(*y0.shape) * 0.1, jnp.bfloat16)
    gs = jnp.asarray(rs2.randn(F, 2) * 1e-4, jnp.float32)
    _, vjp = jax.vjp(pure_xla, x4, k3)
    dx4_ref, dk3_ref = vjp((gy4.astype(y0.dtype), gs))
    dw_ref = pack_wm(dk3_ref)

    gy_t = jnp.transpose(gy4, (0, 3, 1, 2)).reshape(N, F, HW)
    y0_t = jnp.transpose(y0, (0, 3, 1, 2)).reshape(N, F, HW)
    dx_p, dw_p = jax.jit(functools.partial(
        convcomb_bwd_pallas, depth=D, h=H, w=W, interpret=interpret))(
        xt, wm, y0_t, gy_t, gs)
    dx_p4 = jnp.transpose(dx_p.reshape(N, C, H, W), (0, 2, 3, 1))

    dxe = float(jnp.max(jnp.abs(dx_p4.astype(jnp.float32)
                                - dx4_ref.astype(jnp.float32))))
    dxs = float(jnp.max(jnp.abs(dx4_ref.astype(jnp.float32))))
    dwe = float(jnp.max(jnp.abs(dw_p - dw_ref)))
    dws = float(jnp.max(jnp.abs(dw_ref)))
    print(f"bwd parity: dx maxdiff {dxe:.3e} (scale {dxs:.2f})   "
          f"dw maxdiff {dwe:.3e} (scale {dws:.2f})")
    assert dxe <= 0.06 * dxs, (dxe, dxs)
    assert dwe <= 0.02 * dws, (dwe, dws)

    if interpret:
        print("interpret-mode parity OK (no timing on CPU)")
        return

    from depthestimation_tpu.utils.timing import time_chain

    def chain(f, *extra):
        @jax.jit
        def step(v):
            y, s = f(v, *extra)
            fb = (jnp.mean(s) * 1e-6).astype(v.dtype)
            r = jnp.roll(v, 1, axis=0) + fb
            return r
        return step

    def run(name, f, v, *extra):
        t, _ = time_chain(chain(f, *extra), v, 20)
        print(f"{name}: fwd {t*1e3:7.3f} ms/layer")
        return t * 1e3

    xla_ms = run("xla block ", functools.partial(block_xla, depth=D),
                 x4, k3, a, b)
    pal_ms = run("pallas v2 ", functools.partial(
        convcomb_pallas, depth=D, h=H, w=W), xt, wm, a, b)
    print(f"fwd speedup {xla_ms / pal_ms:.2f}x")

    # ---- bwd timing: XLA vjp of the pure block vs the fused bwd kernel
    # Big tensors (gy, y) must be runtime ARGUMENTS of the jitted fns, not
    # closure captures: captured jnp arrays are baked into the HLO as
    # literal constants, and a 192 MB constant blows the axon
    # remote-compile request body limit (HTTP 413).
    @jax.jit
    def xla_fb(v, gy4, gs):
        def f(x4, k3):
            y, s = pure_xla(x4, k3)
            return (jnp.sum(y.astype(jnp.float32) * gy4.astype(jnp.float32))
                    + jnp.sum(s * gs))
        gx, gk = jax.grad(f, argnums=(0, 1))(v, k3)
        fb = (jnp.mean(gx).astype(jnp.float32)
              + jnp.mean(gk).astype(jnp.float32))
        return jnp.roll(v, 1, axis=0) + (fb * 1e-2).astype(v.dtype)

    @jax.jit
    def pal_bwd(v, y0_t, gy_t, gs):
        dx, dw = convcomb_bwd_pallas(v, wm, y0_t, gy_t, gs, D, H, W)
        fb = (jnp.mean(dx).astype(jnp.float32) + jnp.mean(dw) * 1e-3)
        return jnp.roll(v, 1, axis=0) + (fb * 1e-2).astype(v.dtype)

    t_xla_fb, _ = time_chain(lambda v: xla_fb(v, gy4, gs), x4, 20)
    t_pal_b, _ = time_chain(lambda v: pal_bwd(v, y0_t, gy_t, gs), xt, 20)
    print(f"xla fwd+bwd {t_xla_fb*1e3:7.3f} ms  (bwd ~{t_xla_fb*1e3 - xla_ms:.3f})")
    print(f"pallas bwd  {t_pal_b*1e3:7.3f} ms   -> fused fwd+bwd "
          f"{pal_ms + t_pal_b*1e3:.3f} ms, speedup "
          f"{t_xla_fb*1e3 / (pal_ms + t_pal_b*1e3):.2f}x")


if __name__ == "__main__":
    main()
