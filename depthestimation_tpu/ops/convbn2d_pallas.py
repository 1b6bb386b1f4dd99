"""Fused 2D ConvBN strip kernel: normalize(+activation) -> 3x3 stride-1
'same' conv -> BN statistics, in the transposed [C, R*W] strip layout.

The 2D sibling of ops/convcomb_pallas.py, built for the encoder's
residual stages: the round-5 profile (benchmarks/profile_b8_top_ops.json)
puts ~65 ms of the 298 ms B=8 step in the encoder's stride-1 ConvBN
chains, whose channels-last XLA layout pads C=32/64 channels to 128
lanes (25-50% lane use) on every read. With channels on SUBLANES and a
strip of R consecutive image rows flattened onto LANES,

  * the nine 3x3 shifts are lane rolls of a [C, R*W] tile at full
    width (dh shifts move +-W lanes inside the strip, dw +-1),
  * the conv is ONE MXU dot with K = 9C per strip,
  * padding is 8-sublane, not 128-lane: a C=32 activation is stored
    dense instead of 4x-padded.

Layout: x [N_strips, C, L], L = R*W, strips H-major (each image's H/R
strips are consecutive; ``spi`` = strips per image). The in-strip im2col
masks shifts that cross the strip's top/bottom edge; the 1-row halo
between vertically adjacent strips is stitched by two [*, W] seam
corrections riding convcomb's delayed-write ring:

  y(i)[row 0]   += w_k0 @ im2col3(u_lastrow(i-1))   (kernel row kh=0)
  y(i)[row R-1] += w_k2 @ im2col3(u_firstrow(i+1))  (kernel row kh=2)

the second term arriving one grid step later (strip i is written at step
i+1), with image boundaries masked via ``spi``. Row strips live on
full-L "carriers" whose first W lanes are valid (roll + iota masks — no
unaligned lane slicing for Mosaic to reject). BN sum/sumsq accumulate on
store.

The custom VJP emits dx, dW and d(a,b) in one pass, folding the stats
cotangent on load (ge = gy + s0 + 2y*s1). At emit step for strip n the
rings hold ge_lastrow(n-1), ge(n), u_lastrow(n-1), and ge(n+1) is being
computed — exactly the operands of the four seam terms:

  du(n)[row 0]   += w_k2^T ge_lastrow(n-1)     [alpha = n has strip above]
  du(n)[row R-1] += w_k0^T ge_firstrow(n+1)    [beta  = n has strip below]
  dW[kh=0] += ge_firstrow(n) (x) im2col3(u_lastrow(n-1))   [alpha]
  dW[kh=2] += ge_lastrow(n-1) (x) im2col3(u_firstrow(n))   [alpha]

(the dW seam sums pair strips (n-1, n) once per adjacency). Semantics
matched against Conv(3, 1, 1, no bias) + BatchNorm of models/layers.py
(reference models/models.py:25-30 convbn); numerics pinned by
tests/test_convbn2d_pallas.py (interpret mode) and the on-chip gate in
benchmarks/micro_convbn2d.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depthestimation_tpu.ops import flop_log


def _shift_strip(u, dh, dw, rows, w):
    """Lane-roll a [C, rows*W] tile by (dh, dw) with edge masking: output
    position (r, c) holds u[r + dh, c + dw] where the source lies inside
    the strip (rows) and the image width (w), else 0."""
    off = dh * w + dw
    if off == 0:
        return u
    c_dim, L = u.shape
    rolled = pltpu.roll(u, -off % L, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (c_dim, L), 1)
    valid = jnp.ones((c_dim, L), jnp.bool_)
    if dw:
        wpos = lane % w
        valid = valid & ((wpos + dw >= 0) & (wpos + dw < w))
    if dh:
        rpos = lane // w
        valid = valid & ((rpos + dh >= 0) & (rpos + dh < rows))
    return jnp.where(valid, rolled, jnp.zeros((), u.dtype))


def _im2col9(u, rows, w):
    """[C, L] f32 -> nine (dh, dw) row-major shifted copies stacked on
    sublanes, [9C, L] bf16 (must match ``pack_wm2d``: kh = dh+1,
    kw = dw+1)."""
    cols = []
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            cols.append(_shift_strip(u, dh, dw, rows, w).astype(jnp.bfloat16))
    return jnp.concatenate(cols, axis=0)


def _im2col3(strip, w):
    """Row-strip carrier [C, L] (first W lanes valid, rest zero) ->
    [3C, L] bf16 of the three dw shifts, valid on the first W lanes.

    Full-L carriers, NOT [C, W] slices: Mosaic's sub-128-lane slices of
    rolled tiles miscompiled the seam terms at W=96 (dW 10% off on chip
    while interpret passed) and cost relayouts; carriers keep every op on
    the native tile grid. The seam dots therefore contract over L instead
    of W lanes — wasted MXU columns, paid for by these layers being
    bandwidth-bound (see module docstring)."""
    cols = [_shift_strip(strip, 0, dw, 1, w).astype(jnp.bfloat16)
            for dw in (-1, 0, 1)]
    return jnp.concatenate(cols, axis=0)


def _first_row(t, w):
    """[*, L] -> carrier with only the first image row's W lanes kept."""
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    return jnp.where(lane < w, t, jnp.zeros((), t.dtype))


def _last_row(t, w):
    """[*, L] f32 -> carrier holding the LAST image row's W lanes at
    positions [0, W)."""
    L = t.shape[1]
    return _first_row(pltpu.roll(t, -(L - w) % L, axis=1), w)


def _place_first(t, w):
    """Carrier -> only lanes [0, W) kept (row-0 positions)."""
    return _first_row(t, w)


def _place_last(t, w):
    """Carrier (first W lanes valid) -> lanes moved to [L-W, L)."""
    L = t.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    rolled = pltpu.roll(jnp.where(lane < w, t, jnp.zeros((), t.dtype)),
                        (L - w) % L, axis=1)
    return jnp.where(lane >= L - w, rolled, jnp.zeros((), t.dtype))


def _act(v, mode):
    if mode == "relu":
        return jnp.maximum(v, 0.0)
    if mode == "leaky":
        return jnp.where(v >= 0, v, jnp.float32(0.01) * v)
    return v


def _load_u(x_ref, ab_ref, act):
    x = x_ref[0].astype(jnp.float32)
    a = ab_ref[0].astype(jnp.float32)[:, None]
    b = ab_ref[1].astype(jnp.float32)[:, None]
    v = x * a + b
    return x, v, _act(v, act)


# ------------------------------------------------------------------ fwd

def _fwd_kernel(ab_ref, x_ref, wm_ref, w0_ref, w2_ref, y_ref, stats_ref,
                part_ref, ulast_ref, acc_ref, *, n_strips, spi, rows, w,
                act):
    i = pl.program_id(0)
    L = rows * w

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, _, u = _load_u(x_ref, ab_ref, act)
    u9 = _im2col9(u, rows, w)
    y_in = jax.lax.dot_general(
        wm_ref[:], u9, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [F, L]

    # top seam of strip i: u_lastrow(i-1) through kernel row 0
    top_ok = (i % spi) > 0
    top = jax.lax.dot_general(
        w0_ref[:], _im2col3(ulast_ref[:].astype(jnp.float32), w),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [F, L] carrier
    y_strip = y_in + jnp.where(top_ok, _place_first(top, w), 0.0)

    # bottom seam of strip i-1: u_firstrow(i) through kernel row 2
    @pl.when(i > 0)
    def _write():
        bot_ok = ((i - 1) % spi) < (spi - 1)
        bot = jax.lax.dot_general(
            w2_ref[:], _im2col3(_first_row(u, w), w),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = part_ref[:] + jnp.where(bot_ok, _place_last(bot, w), 0.0)
        yb = y.astype(jnp.bfloat16)
        y_ref[0] = yb
        yf = yb.astype(jnp.float32)
        acc_ref[:, 0] += jnp.sum(yf, axis=1)
        acc_ref[:, 1] += jnp.sum(yf * yf, axis=1)

    @pl.when(i < n_strips)
    def _ring():
        part_ref[:] = y_strip
        ulast_ref[:] = _last_row(u, w).astype(jnp.bfloat16)

    @pl.when(i == n_strips)
    def _stats():
        stats_ref[:] = acc_ref[:]


def _fwd_call(x, wm, w0, w2, a, b, spi, rows, w, act, interpret):
    n, c, L = x.shape
    f = wm.shape[0]
    ab = jnp.stack([a, b]).astype(jnp.float32)
    flop_log.log("convbn2d_fwd", 2.0 * n * f * 9 * c * L)
    kernel = functools.partial(_fwd_kernel, n_strips=n, spi=spi, rows=rows,
                               w=w, act=act)
    return pl.pallas_call(
        kernel,
        grid=(n + 1,),
        in_specs=[
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c, L), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
            pl.BlockSpec((f, 9 * c), lambda i: (0, 0)),
            pl.BlockSpec((f, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((f, 3 * c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, f, L), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((f, 2), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, f, L), jnp.bfloat16),
            jax.ShapeDtypeStruct((f, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f, L), jnp.float32),      # part ring
            pltpu.VMEM((c, L), jnp.bfloat16),     # u last-row carrier ring
            pltpu.VMEM((f, 2), jnp.float32),      # stats accumulator
        ],
        interpret=interpret,
    )(ab, x, wm, w0, w2)


# ------------------------------------------------------------------ bwd

def _bwd_kernel(sb_ref, ab_ref, gy_ref, y_ref, x_ref, wm_ref, w0_ref,
                w2_ref, dx_ref, dw9_ref, dws_ref, dab_ref,
                gplast_ref, gcur_ref, uplast_ref,
                dw9acc_ref, dwsacc_ref, dabacc_ref, *,
                n_strips, spi, rows, w, act, seam_dw):
    i = pl.program_id(0)
    L = rows * w
    c = dx_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        dw9acc_ref[:] = jnp.zeros_like(dw9acc_ref)
        dwsacc_ref[:] = jnp.zeros_like(dwsacc_ref)
        dabacc_ref[:] = jnp.zeros_like(dabacc_ref)
        # the first emit's seam terms multiply ring scratches before the
        # alpha mask can zero the RESULT — uninitialized garbage (NaN in
        # interpret mode) would poison the dots (0 * NaN = NaN)
        uplast_ref[:] = jnp.zeros_like(uplast_ref)
        gplast_ref[:] = jnp.zeros_like(gplast_ref)
        gcur_ref[:] = jnp.zeros_like(gcur_ref)

    gy = gy_ref[0].astype(jnp.float32)
    s0 = sb_ref[0].astype(jnp.float32)[:, None]
    s1 = sb_ref[1].astype(jnp.float32)[:, None]
    yv = y_ref[0].astype(jnp.float32)
    ge_new = (gy + s0 + 2.0 * yv * s1).astype(jnp.bfloat16)

    @pl.when(i > 0)
    def _emit():
        n = i - 1
        alpha = (n % spi) > 0
        beta = (n % spi) < (spi - 1)
        zero = jnp.zeros((), jnp.bfloat16)
        ge_n = gcur_ref[:]                                  # [F, L]

        # in-strip du
        m9 = jax.lax.dot_general(
            wm_ref[:], ge_n, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [9C, L]
        du = jnp.zeros((c, L), jnp.float32)
        s = 0
        for dh in (-1, 0, 1):
            for dw_ in (-1, 0, 1):
                du = du + _shift_strip(m9[s * c:(s + 1) * c], -dh, -dw_,
                                       rows, w)
                s += 1

        # seam du: row 0 from ge_lastrow(n-1) via kernel row 2
        ge_up = jnp.where(alpha, gplast_ref[:], zero)       # [F, W]
        m3t = jax.lax.dot_general(
            w2_ref[:], ge_up, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [3C, W]
        du_top = jnp.zeros((c, L), jnp.float32)
        for k, dw_ in enumerate((-1, 0, 1)):
            du_top = du_top + _shift_strip(m3t[k * c:(k + 1) * c], 0, -dw_,
                                           1, w)
        # seam du: row R-1 from ge_firstrow(n+1) via kernel row 0
        ge_dn = jnp.where(beta, _first_row(ge_new, w), zero)
        m3b = jax.lax.dot_general(
            w0_ref[:], ge_dn, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        du_bot = jnp.zeros((c, L), jnp.float32)
        for k, dw_ in enumerate((-1, 0, 1)):
            du_bot = du_bot + _shift_strip(m3b[k * c:(k + 1) * c], 0, -dw_,
                                           1, w)
        du = du + _place_first(du_top, w) + _place_last(du_bot, w)

        # chain through the fused load
        x, v, u = _load_u(x_ref, ab_ref, act)
        if act == "relu":
            dv = jnp.where(v > 0, du, 0.0)
        elif act == "leaky":
            dv = jnp.where(v >= 0, du, jnp.float32(0.01) * du)
        else:
            dv = du
        a = ab_ref[0].astype(jnp.float32)[:, None]
        dx_ref[0] = (dv * a).astype(jnp.bfloat16)
        dabacc_ref[0, :] += jnp.sum(dv * x, axis=1)
        dabacc_ref[1, :] += jnp.sum(dv, axis=1)

        # dW: in-strip outer product
        u9 = _im2col9(u, rows, w)
        dw9acc_ref[:] += jax.lax.dot_general(
            ge_n, u9, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [F, 9C]
        # dW seams for the (n-1, n) adjacency (mask alpha covers both).
        # These two dots contract over LANES (K = L) — the transposes
        # they imply made the kernel backward LOSE to XLA at C >= 64
        # (benchmarks/micro_convbn2d.json) — so the default "xla" seam
        # mode computes them OUTSIDE the kernel from edge strips
        # (_xla_seam_dw) and this block is compiled out.
        if seam_dw:
            ge_first_n = jnp.where(alpha, _first_row(ge_n, w), zero)
            u_last_prev = uplast_ref[:].astype(jnp.float32)
            dws0 = jax.lax.dot_general(
                ge_first_n, _im2col3(u_last_prev, w),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [F, 3C]
            dws2 = jax.lax.dot_general(
                ge_up, _im2col3(_first_row(u, w), w),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [F, 3C]
            dwsacc_ref[:] += jnp.concatenate([dws0, dws2], axis=0)
            uplast_ref[:] = _last_row(u, w).astype(jnp.bfloat16)

    @pl.when(i < n_strips)
    def _ring():
        # Mosaic only rotates 32-bit data — round-trip through f32
        gplast_ref[:] = _last_row(gcur_ref[:].astype(jnp.float32),
                                  w).astype(jnp.bfloat16)
        gcur_ref[:] = ge_new

    @pl.when(i == n_strips)
    def _final():
        dw9_ref[:] = dw9acc_ref[:]
        dws_ref[:] = dwsacc_ref[:]
        dab_ref[:] = dabacc_ref[:]


def _bwd_call(x, wm, w0, w2, a, b, y, gy, gs, spi, rows, w, act,
              interpret, seam_dw):
    n, c, L = x.shape
    f = wm.shape[0]
    sb = jnp.stack([gs[:, 0], gs[:, 1]]).astype(jnp.float32)
    ab = jnp.stack([a, b]).astype(jnp.float32)
    flop_log.log("convbn2d_bwd", 2.0 * 2.0 * n * f * 9 * c * L)
    kernel = functools.partial(_bwd_kernel, n_strips=n, spi=spi, rows=rows,
                               w=w, act=act, seam_dw=seam_dw)
    dx, dw9, dws, dab = pl.pallas_call(
        kernel,
        grid=(n + 1,),
        in_specs=[
            pl.BlockSpec((2, f), lambda i: (0, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((1, f, L), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
            pl.BlockSpec((1, f, L), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
            pl.BlockSpec((1, c, L), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((f, 9 * c), lambda i: (0, 0)),
            pl.BlockSpec((f, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((f, 3 * c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, L), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((f, 9 * c), lambda i: (0, 0)),
            pl.BlockSpec((2 * f, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, L), jnp.bfloat16),
            jax.ShapeDtypeStruct((f, 9 * c), jnp.float32),
            jax.ShapeDtypeStruct((2 * f, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f, L), jnp.bfloat16),     # ge_lastrow(n-1) carrier
            pltpu.VMEM((f, L), jnp.bfloat16),     # ge(n)
            pltpu.VMEM((c, L), jnp.bfloat16),     # u_lastrow(n-1) carrier
            pltpu.VMEM((f, 9 * c), jnp.float32),  # dW in-strip accumulator
            pltpu.VMEM((2 * f, 3 * c), jnp.float32),  # dW seam accumulator
            pltpu.VMEM((2, c), jnp.float32),      # d(a,b) accumulator
        ],
        interpret=interpret,
    )(sb, ab, gy, y, x, wm, w0, w2)
    return dx, dw9, dws, dab


# ------------------------------------------------------------ public API

def _xla_im2col3(strip, w):
    """[NS, C, W] f32 -> [NS, 3C, W]: the three dw shifts with image-edge
    masking, in plain XLA."""
    ns, c, w_ = strip.shape
    lane = jnp.arange(w_)
    outs = []
    for dw in (-1, 0, 1):
        rolled = jnp.roll(strip, -dw, axis=2)
        valid = (lane + dw >= 0) & (lane + dw < w_)
        outs.append(jnp.where(valid[None, None, :], rolled, 0.0))
    return jnp.concatenate(outs, axis=1)


def _xla_seam_dw(x, a, b, y, gy, gs, spi, w, act):
    """The two dW seam sums, computed in XLA from edge-row strips (the
    in-kernel lane-contracted versions lose at C >= 64). Returns
    (dws0 [F, 3C], dws2 [F, 3C]) for kernel rows 0 and 2."""
    ns, c, L = x.shape
    f32 = jnp.float32
    af = a.astype(f32)[None, :, None]
    bf = b.astype(f32)[None, :, None]

    def u_of(xs):
        return _act(xs.astype(f32) * af + bf, act)

    u_first = u_of(x[:, :, :w])
    u_last = u_of(x[:, :, L - w:])
    s0 = gs[:, 0].astype(f32)[None, :, None]
    s1 = gs[:, 1].astype(f32)[None, :, None]

    def ge_of(gs_, ys_):
        return gs_.astype(f32) + s0 + 2.0 * ys_.astype(f32) * s1

    ge_first = ge_of(gy[:, :, :w], y[:, :, :w])
    ge_last = ge_of(gy[:, :, L - w:], y[:, :, L - w:])
    alpha = ((jnp.arange(ns) % spi) > 0).astype(f32)[:, None, None]
    u3_last_prev = _xla_im2col3(jnp.roll(u_last, 1, axis=0), w)
    u3_first = _xla_im2col3(u_first, w)
    dws0 = jnp.einsum("nfw,nkw->fk", ge_first * alpha, u3_last_prev)
    dws2 = jnp.einsum("nfw,nkw->fk",
                      jnp.roll(ge_last, 1, axis=0) * alpha, u3_first)
    return dws0, dws2


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def convbn2d_block(x, wm, a, b, spi: int, rows: int, w: int,
                   act: str = "none", interpret: bool = False,
                   seam_dw: str = "xla"):
    """Fused normalize(+activation) -> 3x3 stride-1 conv -> BN stats.

    Args:
      x: [N_strips, C, rows*W] bf16 raw input strips, H-major per image
        (N_strips = N_images * spi, spi = H // rows).
      wm: [F, 9C] packed conv weights (``pack_wm2d``), bf16.
      a, b: [C] f32 per-channel normalize coefficients applied on load
        (a=1, b=0 for an un-normalized input); ``act`` in
        {"none", "relu", "leaky"} applies after the affine.
      seam_dw: "xla" (default — the two seam weight-gradient sums run as
        small XLA einsums on edge strips) or "kernel" (in-kernel dots;
        loses on chip at C >= 64, kept for tests).

    Returns (y [N_strips, F, rows*W] bf16 raw conv output, stats [F, 2]
    f32 with sum(y) and sum(y*y) over all strips/pixels).
    """
    w0 = wm[:, :3 * x.shape[1]]
    w2 = wm[:, 6 * x.shape[1]:]
    return _fwd_call(x, wm, w0, w2, a, b, spi, rows, w, act, interpret)


def _vjp_fwd(x, wm, a, b, spi, rows, w, act, interpret, seam_dw):
    out = convbn2d_block(x, wm, a, b, spi, rows, w, act, interpret,
                         seam_dw)
    return out, (x, wm, a, b, out[0])


def _vjp_bwd(spi, rows, w, act, interpret, seam_dw, res, cts):
    x, wm, a, b, y = res
    gy, gs = cts
    gy = gy.astype(jnp.bfloat16)
    gs = gs.astype(jnp.float32)
    c = x.shape[1]
    w0 = wm[:, :3 * c]
    w2 = wm[:, 6 * c:]
    dx, dw9, dws, dab = _bwd_call(
        x, wm, w0, w2, a, b, y, gy, gs, spi, rows, w, act, interpret,
        seam_dw == "kernel")
    f = wm.shape[0]
    if seam_dw == "kernel":
        dws0, dws2 = dws[:f], dws[f:]
    else:
        dws0, dws2 = _xla_seam_dw(x, a, b, y, gy, gs, spi, w, act)
    dw = jnp.concatenate([dw9[:, :3 * c] + dws0,
                          dw9[:, 3 * c:6 * c],
                          dw9[:, 6 * c:] + dws2], axis=1)
    return dx, dw.astype(wm.dtype), dab[0].astype(a.dtype), \
        dab[1].astype(b.dtype)


convbn2d_block.defvjp(_vjp_fwd, _vjp_bwd)


def pack_wm2d(kernel):
    """[kh=3, kw=3, C, F] conv kernel -> [F, 9C] matmul weights:
    wm[f, (kh*3 + kw)*C + c] = kernel[kh, kw, c, f]."""
    kh, kw, c, f = kernel.shape
    return kernel.transpose(3, 0, 1, 2).reshape(f, kh * kw * c)


def to_strips(x4, rows):
    """[N, H, W, C] -> [N * (H//rows), C, rows*W] (H-major strips)."""
    n, h, w, c = x4.shape
    spi = h // rows
    return jnp.transpose(
        x4.reshape(n * spi, rows, w, c), (0, 3, 1, 2)).reshape(
        n * spi, c, rows * w)


def from_strips(xt, rows, h):
    """[N_strips, C, rows*W] -> [N, H, W, C]."""
    ns, c, L = xt.shape
    w = L // rows
    spi = h // rows
    n = ns // spi
    return jnp.transpose(xt.reshape(ns, c, rows, w),
                         (0, 2, 3, 1)).reshape(n, h, w, c)
