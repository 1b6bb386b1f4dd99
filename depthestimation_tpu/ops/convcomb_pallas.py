"""Fused Base3D block kernel: normalize+ReLU -> 3x3x3 conv -> depth
combine -> BN statistics, in the transposed [N, C, H*W] activation layout.

Why transposed: the round-3 fused flat-Conv3d (ops/conv3d_pallas.py,
parked) lost 3x to XLA because its im2col ran nine masked rolls on
[H*W, C=32] tiles — sublane rolls at 25% lane use, f32-forced. With
channels on SUBLANES and flattened pixels on LANES,

  * every spatial shift is a lane roll at full 128-lane width,
  * the nine shifted copies concatenate along sublanes into a
    [9C, HW] tile -> ONE MXU dot with K=9C (vs nine K=C matmuls),
  * the output [3F, HW] is already the next layer's input layout.

Fused per grid step (one depth row of the flattened [B*D, C, H*W]
volume): BN normalize + optional ReLU on load (per-channel a, b), 9-tap
stacked conv, depth-tap ring combine (delayed write, grid N+1), BN
sum/sumsq accumulated on store. The XLA block's HBM intermediates — the
[N, H, W, 3F] tap tensor, the combine broadcast_selects, the BN stat
fusions — never leave VMEM. Measured on TPU v5e at the production B=8
volume (benchmarks/micro_convcomb.py): fwd 3.41 vs 4.26 ms/layer,
fwd+bwd 8.40 vs 10.60 ms (1.26x).

The fused backward emits dx, dW and d(a,b) in one pass with a rolling
cotangent window, folding the stats cotangent (gy + s0 + 2*y*s1) on
load and rebuilding the im2col tile from the saved bf16 input (nothing
but the raw input and raw output are stored for the backward).

Semantics matched against the production flat Conv3d + BatchNorm
(models/layers.py tap-stacked path; reference models/models.py:377-439,
nn.Conv3d + nn.BatchNorm3d): out[n] = t1(n) + t0(n-1)*[n%D>0]
+ t2(n+1)*[n%D<D-1], taps in bf16, f32 accumulation; stats are f32
sums of the bf16 output. Numerics pinned by tests/test_convcomb_pallas.py
(interpret mode) and the on-chip gate in benchmarks/micro_convcomb.py.

Multi-device: GSPMD cannot batch-partition an opaque pallas_call, so on
a data mesh the call runs under ``jax.shard_map`` over the batch items
(D-major rows keep every item's depth column inside one shard — no
halo); stats / dW / d(a,b) are psum'd (same contract as
ops/combine_pallas.py / the shard_map'd sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depthestimation_tpu.ops import flop_log


def _shift_hw(u, off, h, w):
    """Lane-roll a [rows, H*W] tile by ``off`` pixels with image-boundary
    masking (off = dh*W + dw, |dh|,|dw| <= 1). Output column hw holds
    u[hw + off] where the source pixel is inside the image, else 0."""
    if off == 0:
        return u
    rows, hw = u.shape
    rolled = pltpu.roll(u, -off % hw, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, hw), 1)
    wpos = lane % w
    dw = ((off + 1) % w) - 1                # dw in {-1, 0, 1}
    dh = (off - dw) // w
    valid = jnp.ones((rows, hw), jnp.bool_)
    if dw:
        valid = valid & ((wpos + dw >= 0) & (wpos + dw < w))
    if dh:
        hpos = lane // w
        valid = valid & ((hpos + dh >= 0) & (hpos + dh < h))
    return jnp.where(valid, rolled, jnp.zeros((), u.dtype))


def _im2col9(u, h, w):
    """[C, HW] f32 -> the nine shifted copies stacked on sublanes,
    [9C, HW] bf16 (the dot's K dimension)."""
    cols = []
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            cols.append(_shift_hw(u, dh * w + dw, h, w).astype(jnp.bfloat16))
    return jnp.concatenate(cols, axis=0)


def _load_u(x_ref, ab_ref, relu_in):
    """Normalize (+ReLU) the current input row in f32 (lane rolls need
    32-bit data). Returns (u [C, HW] f32, pre-activation v for the mask)."""
    x = x_ref[0].astype(jnp.float32)
    a = ab_ref[0].astype(jnp.float32)[:, None]
    b = ab_ref[1].astype(jnp.float32)[:, None]
    v = x * a + b
    u = jnp.maximum(v, 0.0) if relu_in else v
    return x, v, u


# ------------------------------------------------------------------ fwd

def _fwd_kernel(ab_ref, x_ref, wm_ref, y_ref, stats_ref,
                part_ref, t0_ref, acc_ref, *, n_rows, depth,
                h, w, relu_in):
    """Grid step i: taps(i) for row i (index clamped), write combined row
    i-1, maintain the (part, t0) ring, accumulate output stats."""
    i = pl.program_id(0)
    f = y_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, _, u = _load_u(x_ref, ab_ref, relu_in)
    u9 = _im2col9(u, h, w)

    taps = jax.lax.dot_general(
        wm_ref[:], u9, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    t0, t1, t2 = taps[:f], taps[f:2 * f], taps[2 * f:]

    # delayed-write combine: out[i-1] = part(i-1) + t2(i)*mask
    @pl.when(i > 0)
    def _write():
        up_ok = ((i - 1) % depth) < (depth - 1)   # row i-1 not item top
        y = part_ref[:] + jnp.where(up_ok, t2, jnp.zeros((), jnp.bfloat16))
        y_ref[0] = y
        yf = y.astype(jnp.float32)
        acc_ref[:, 0] += jnp.sum(yf, axis=1)
        acc_ref[:, 1] += jnp.sum(yf * yf, axis=1)

    @pl.when(i < n_rows)
    def _ring():
        dn_ok = (i % depth) > 0                    # row i not item bottom
        tp = t0_ref[:]
        part_ref[:] = t1 + jnp.where(dn_ok, tp, jnp.zeros((), jnp.bfloat16))
        t0_ref[:] = t0

    @pl.when(i == n_rows)
    def _stats():
        stats_ref[:] = acc_ref[:]


def _fwd_call(x, wm, a, b, depth, h, w, relu_in, interpret):
    n, c, hw = x.shape
    f3 = wm.shape[0]
    f = f3 // 3
    # cost_analysis cannot see into the pallas_call — log the dot's MXU
    # FLOPs (== XLA's count for the equivalent tap-stacked conv) for the
    # bench's MFU correction (ops/flop_log.py)
    flop_log.log("convcomb_fwd", 2.0 * n * f3 * 9 * c * hw)
    ab = jnp.stack([a, b]).astype(jnp.float32)           # [2, C]
    kernel = functools.partial(_fwd_kernel, n_rows=n, depth=depth,
                               h=h, w=w, relu_in=relu_in)
    return pl.pallas_call(
        kernel,
        grid=(n + 1,),
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
    )(ab, x, wm)


# ------------------------------------------------------------------ bwd

def _bwd_kernel(sb_ref, ab_ref, gy_ref, y_ref, x_ref, wm_ref,
                dx_ref, dw_ref, dab_ref,
                gp_ref, gc_ref, dwacc_ref, dabacc_ref, *, n_rows, depth,
                h, w, relu_in):
    """Fused backward. Grid step i loads row i's (gy, y) -> ge(i) =
    gy + s0 + 2*y*s1, maintains a (ge(i-2), ge(i-1)) ring, and emits
    dx(i-1) + accumulates dW, d(a,b) from row i-1.

    g_taps(n) = [ge(n+1)*[n%D<D-1], ge(n), ge(n-1)*[n%D>0]] (taps 0/1/2),
    du(n) = sum_s shift_{-s}( (Wm^T g_taps)(s-block) ),
    dv = du * relu_mask,  dx = dv * a,  da += sum dv*x,  db += sum dv,
    dW += g_taps(n) @ u9(n)^T  (u9 rebuilt from the saved bf16 input).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwacc_ref[:] = jnp.zeros_like(dwacc_ref)
        dabacc_ref[:] = jnp.zeros_like(dabacc_ref)

    # ge(i) for the ring (garbage at i == n_rows, masked by the depth-edge
    # selects below: row N-1 is always an item top, so the up-tap that
    # would consume it is zeroed)
    s0 = sb_ref[0].astype(jnp.float32)[:, None]
    s1 = sb_ref[1].astype(jnp.float32)[:, None]
    gy = gy_ref[0].astype(jnp.float32)
    yv = y_ref[0].astype(jnp.float32)
    ge_new = (gy + s0 + 2.0 * yv * s1).astype(jnp.bfloat16)

    @pl.when(i > 0)
    def _emit():
        n = i - 1                       # row whose dx/dW we emit
        ge_n = gc_ref[:]
        ge_up = ge_new                  # ge(n+1)
        ge_dn = gp_ref[:]               # ge(n-1), garbage at n == 0
        alpha = (n % depth) > 0
        beta = (n % depth) < (depth - 1)
        zero = jnp.zeros((), jnp.bfloat16)
        g0 = jnp.where(beta, ge_up, zero)
        g2 = jnp.where(alpha, ge_dn, zero)
        g_taps = jnp.concatenate([g0, ge_n, g2], axis=0)   # [3F, HW]

        # du(n) = sum_s shift_{-s}( m9[sC:(s+1)C] ), m9 = Wm^T @ g_taps
        m9 = jax.lax.dot_general(
            wm_ref[:], g_taps, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [9C, HW]
        c = dx_ref.shape[1]
        du = jnp.zeros((c, m9.shape[1]), jnp.float32)
        s = 0
        for dh in (-1, 0, 1):
            for dw_ in (-1, 0, 1):
                du = du + _shift_hw(m9[s * c:(s + 1) * c],
                                    -(dh * w + dw_), h, w)
                s += 1

        # chain through the fused load: v = x*a + b, u = relu?(v)
        x, v, u = _load_u(x_ref, ab_ref, relu_in)
        dv = jnp.where(v > 0, du, 0.0) if relu_in else du
        a = ab_ref[0].astype(jnp.float32)[:, None]
        dx_ref[0] = (dv * a).astype(jnp.bfloat16)
        dabacc_ref[0, :] += jnp.sum(dv * x, axis=1)
        dabacc_ref[1, :] += jnp.sum(dv, axis=1)

        # dW accumulation: g_taps [3F, HW] x u9(n) [9C, HW] over lanes
        u9 = _im2col9(u, h, w)
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
        dab_ref[:] = dabacc_ref[:]


def _bwd_call(x, wm, a, b, y, gy, gs, depth, h, w, relu_in, interpret):
    n, c, hw = x.shape
    f3 = wm.shape[0]
    f = f3 // 3
    # two dots per row (data-grad m9 + weight-grad dW), each the size of
    # the forward dot — same 2x convention XLA uses for conv backward
    flop_log.log("convcomb_bwd", 2.0 * 2.0 * n * f3 * 9 * c * hw)
    sb = jnp.stack([gs[:, 0], gs[:, 1]]).astype(jnp.float32)   # [2, F]
    ab = jnp.stack([a, b]).astype(jnp.float32)                 # [2, C]
    kernel = functools.partial(_bwd_kernel, n_rows=n, depth=depth,
                               h=h, w=w, relu_in=relu_in)
    dx, dw, dab = pl.pallas_call(
        kernel,
        grid=(n + 1,),
        in_specs=[
            pl.BlockSpec((2, f), lambda i: (0, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((1, f, hw), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
            pl.BlockSpec((1, f, hw), lambda i: (jnp.minimum(i, n - 1), 0, 0)),
            pl.BlockSpec((1, c, hw), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((f3, 9 * c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, c, hw), lambda i: (jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec((f3, 9 * c), lambda i: (0, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, hw), jnp.bfloat16),
            jax.ShapeDtypeStruct((f3, 9 * c), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f, hw), jnp.bfloat16),    # ge(i-2) -> ge(n-1)
            pltpu.VMEM((f, hw), jnp.bfloat16),    # ge(i-1) -> ge(n)
            pltpu.VMEM((f3, 9 * c), jnp.float32),  # dW accumulator
            pltpu.VMEM((2, c), jnp.float32),       # d(a,b) accumulator
        ],
        interpret=interpret,
    )(sb, ab, gy, y, x, wm)
    return dx, dw, dab


# ------------------------------------------------------------- shard_map

def _n_shards(mesh, axis):
    if mesh is None:
        return 1
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)


def _fwd_dispatch(x, wm, a, b, depth, h, w, relu_in, interpret, mesh, axis):
    shards = _n_shards(mesh, axis)
    items = x.shape[0] // depth
    if shards > 1 and items % shards == 0:
        from jax.sharding import PartitionSpec as P

        def body(x_, wm_, a_, b_):
            y, st = _fwd_call(x_, wm_, a_, b_, depth, h, w, relu_in,
                              interpret)
            return y, jax.lax.psum(st, axis)

        return jax.shard_map(body, mesh=mesh,
                             in_specs=(P(axis), P(), P(), P()),
                             out_specs=(P(axis), P()),
                             check_vma=False)(x, wm, a, b)
    return _fwd_call(x, wm, a, b, depth, h, w, relu_in, interpret)


def _bwd_dispatch(x, wm, a, b, y, gy, gs, depth, h, w, relu_in, interpret,
                  mesh, axis):
    shards = _n_shards(mesh, axis)
    items = x.shape[0] // depth
    if shards > 1 and items % shards == 0:
        from jax.sharding import PartitionSpec as P

        def body(x_, wm_, a_, b_, y_, gy_, gs_):
            dx, dw, dab = _bwd_call(x_, wm_, a_, b_, y_, gy_, gs_, depth,
                                    h, w, relu_in, interpret)
            return dx, jax.lax.psum(dw, axis), jax.lax.psum(dab, axis)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(), P(), P(), P(axis), P(axis), P()),
            out_specs=(P(axis), P(), P()),
            check_vma=False)(x, wm, a, b, y, gy, gs)
    return _bwd_call(x, wm, a, b, y, gy, gs, depth, h, w, relu_in,
                     interpret)


# ------------------------------------------------------------ public API

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def convbn_block(x, wm, a, b, depth: int, h: int, w: int,
                 relu_in: bool = False, interpret: bool = False,
                 mesh=None, axis: str = "data"):
    """Fused normalize(+ReLU) -> 3x3x3 conv -> depth combine -> BN stats.

    Args:
      x: [N, C, H*W] bf16 raw input rows, N = B*depth (D-major).
      wm: [3F, 9C] packed conv weights (see ``pack_wm``), bf16.
      a, b: [C] f32 per-channel normalize coefficients applied to x on
        load (a=1, b=0 for an un-normalized input); ``relu_in`` applies
        ReLU after the affine.
      mesh/axis: optional data mesh — the kernel runs per-device under
        shard_map with stats/dW/d(a,b) psum'd across it.

    Returns (y [N, F, H*W] bf16 raw conv output, stats [F, 2] f32 with
    stats[:, 0] = sum(y) and stats[:, 1] = sum(y*y) over all rows/pixels).
    """
    return _fwd_dispatch(x, wm, a, b, depth, h, w, relu_in, interpret,
                         mesh, axis)


def _vjp_fwd(x, wm, a, b, depth, h, w, relu_in, interpret, mesh, axis):
    y, stats = _fwd_dispatch(x, wm, a, b, depth, h, w, relu_in, interpret,
                             mesh, axis)
    return (y, stats), (x, wm, a, b, y)


def _vjp_bwd(depth, h, w, relu_in, interpret, mesh, axis, res, cts):
    x, wm, a, b, y = res
    gy, gs = cts
    dx, dw, dab = _bwd_dispatch(
        x, wm, a, b, y, gy.astype(jnp.bfloat16), gs.astype(jnp.float32),
        depth, h, w, relu_in, interpret, mesh, axis)
    return dx, dw.astype(wm.dtype), dab[0].astype(a.dtype), \
        dab[1].astype(b.dtype)


convbn_block.defvjp(_vjp_fwd, _vjp_bwd)


def pack_wm(kernel):
    """[kd=3, kh=3, kw=3, C, F] conv kernel -> the kernel's [3F, 9C]
    matmul weights: wm[tap*F + f, (kh*3 + kw)*C + c] = kernel[tap, kh,
    kw, c, f]."""
    t, kh, kw, c, f = kernel.shape
    return kernel.transpose(0, 4, 1, 2, 3).reshape(t * f, kh * kw * c)


def to_transposed(x4):
    """[N, H, W, C] -> [N, C, H*W] (the kernel's activation layout)."""
    n, h, w, c = x4.shape
    return jnp.transpose(x4, (0, 3, 1, 2)).reshape(n, c, h * w)


def from_transposed(xt, h, w):
    """[N, C, H*W] -> [N, H, W, C]."""
    n, c, _ = xt.shape
    return jnp.transpose(xt.reshape(n, c, h, w), (0, 2, 3, 1))
