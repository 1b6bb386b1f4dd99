"""Fused Pallas TPU kernel for the flat-layout 3D convolution.

``layers.Conv3d(depth=D)`` computes, over the flattened volume
``x [N=B*D, H, W, C]`` (reference ``models/models.py:377-439`` runs the
same stack as torch Conv3d over ``[B, C, D, H, W]``):

    out[n] = conv2d(x[n-1], k[0]) + conv2d(x[n], k[1]) + conv2d(x[n+1], k[2])

with the n-1 / n+1 terms masked at batch-item depth boundaries.  The XLA
lowering materializes the three per-tap conv outputs in HBM (3 writes +
3 reads of the full activation per layer) plus a roll/select combine pass
— at the production B=8 Base3D shapes ([512, 64, 96, 32]) that is ~1.2 GB
of HBM traffic per layer for 201 MB of real output, and the per-layer
convs run at C=32 (a quarter of the MXU's 128 lanes).

This kernel fuses the whole thing: grid over n, one fused matmul per
image, tap tensors never leave VMEM.

- im2col: the [H*W, C] image block becomes ``[H*W, 9C]`` by nine masked
  sublane rolls (lane-dim reshapes are not lowerable by Mosaic; rolling
  the flattened row axis with iota validity masks is).
- one tapcat matmul ``[H*W, 9C] @ [9C, 3F]`` computes ALL THREE depth
  taps at once (N=3F=96 lanes instead of three N=32 matmuls).
- the depth combine runs on a 2-step ring of VMEM scratch: at grid step
  ``i`` the kernel computes taps(i) and writes out[i-1] = tap1(i-1) +
  tap0(i-2)*mask + tap2(i)*mask (delayed-write grid of N+1 steps).

The custom VJP reuses the same kernel for dx (transposed conv == the same
flat conv with a spatially-flipped, io-swapped, tap-reversed kernel) and a
second accumulating kernel for dw.

STATUS — experimental, NOT wired into the model. Readback-barrier
measurements at the production shape ([512, 64, 96, 32] -> 32, v5e):
XLA tap-stacked path fwd 4.0 ms / fwd+bwd 10.0 ms per layer; this kernel
13.5 / 34.9 ms. The im2col is VPU-bound: nine masked rolls of [6144, 32]
blocks use a quarter of the VPU's 128 lanes and (Mosaic rejects bf16
rotates) must run on f32 copies, costing ~24 us/grid-step against a
1.6 us DMA + 3.3 us MXU budget. Kept as a correct, tested reference
(numerics pinned by ``tests/test_conv3d_pallas.py``) for a future
attempt with a lane-efficient shift scheme; ``layers.Conv3d`` keeps the
XLA tap-stacked formulation, which measured fastest end-to-end
(B=8 train step 371.9 -> 347.8 ms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_DNUMS = (((0,), (0,)), ((), ()))   # [M,K] x [M,N] -> [K,N]


def _im2col(xb, h: int, w: int):
    """[H*W, C] -> [H*W, 9C]: nine masked rolls of the flattened rows.

    Column group s = di*3+dj holds x[(i+di-1)*W + (j+dj-1), :] where the
    source pixel is inside the image, else 0.
    """
    m, c = xb.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (m, c), 0)
    jj = r % w
    ii = r // w
    # Mosaic's rotate only handles 32-bit element types ("Rotate with
    # non-32-bit data"); roll a f32 copy and cast the masked groups back.
    xr = xb.astype(jnp.float32)
    cols = []
    for di in range(3):
        vi = jnp.logical_and(ii + di - 1 >= 0, ii + di - 1 < h)
        for dj in range(3):
            off = (di - 1) * w + (dj - 1)
            vj = jnp.logical_and(jj + dj - 1 >= 0, jj + dj - 1 < w)
            rolled = pltpu.roll(xr, -off % m, axis=0)
            mask = jnp.logical_and(vi, vj)
            cols.append(jnp.where(mask, rolled,
                                  jnp.zeros((), jnp.float32)).astype(xb.dtype))
    return jnp.concatenate(cols, axis=1)


def _fwd_kernel(x_ref, w_ref, out_ref, taps_s, t0_s, t1_s,
                *, depth: int, h: int, w: int, f: int, n: int):
    """Grid step i of n+1: compute taps(i), write out[i-1]."""
    i = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(i < n)
    def _():
        xcol = _im2col(x_ref[0], h, w)                    # [M, 9C]
        taps_s[:] = jnp.dot(xcol, w_ref[:],
                            preferred_element_type=f32).astype(taps_s.dtype)

    @pl.when(i >= 1)
    def _():
        m = i - 1
        dm = m % depth
        val = t1_s[:].astype(f32)                         # tap1(m)
        t0 = t0_s[i % 2].astype(f32)                      # tap0(i-2 = m-1)
        val = val + jnp.where(dm > 0, t0, jnp.zeros((), f32))
        t2 = taps_s[:, 2 * f:3 * f].astype(f32)           # tap2(i = m+1)
        val = val + jnp.where(dm < depth - 1, t2, jnp.zeros((), f32))
        out_ref[0] = val.astype(out_ref.dtype)

    # save tap1(i) / tap0(i) for the next two steps AFTER the combine has
    # consumed tap1(i-1) and tap0(i-2); tap2 is consumed fresh from taps_s.
    @pl.when(i < n)
    def _():
        t1_s[:] = taps_s[:, f:2 * f]
        t0_s[i % 2] = taps_s[:, 0:f]


def _fwd_call(x3, wcat, depth: int, h: int, w: int, interpret: bool):
    n, m, c = x3.shape
    k9c, f3 = wcat.shape
    f = f3 // 3
    grid = (n + 1,)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_fwd_kernel, depth=depth, h=h, w=w, f=f, n=n),
        out_shape=jax.ShapeDtypeStruct((n, m, f), x3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m, c), lambda i: (jnp.minimum(i, n - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k9c, f3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, f),
                               lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, f3), x3.dtype),   # taps(i)
            pltpu.VMEM((2, m, f), x3.dtype),  # tap0 ring
            pltpu.VMEM((m, f), x3.dtype),     # tap1(i-1)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(x3, wcat)


def _dw_kernel(x_ref, dyp_ref, dy_ref, dyn_ref, dw_ref,
               *, depth: int, h: int, w: int, n: int):
    """Grid step i of n: dw[(s,c),(t,f)] += X_col(x[i])^T @ dy_cat.

    dy_cat lane groups: t=0 pairs x[i] with dy[i+1] (valid below the depth
    boundary), t=1 with dy[i], t=2 with dy[i-1].
    """
    i = pl.program_id(0)
    f32 = jnp.float32
    di = i % depth
    zero = jnp.zeros((), dy_ref.dtype)
    dy_cat = jnp.concatenate([
        jnp.where(di < depth - 1, dyn_ref[0], zero),
        dy_ref[0],
        jnp.where(di > 0, dyp_ref[0], zero),
    ], axis=1)                                            # [M, 3F]
    xcol = _im2col(x_ref[0], h, w)                        # [M, 9C]
    contrib = jax.lax.dot_general(xcol, dy_cat, _ROW_DNUMS,
                                  preferred_element_type=f32)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = contrib

    @pl.when(i > 0)
    def _():
        dw_ref[:] += contrib


def _dw_call(x3, dy3, depth: int, h: int, w: int, interpret: bool):
    n, m, c = x3.shape
    f = dy3.shape[2]
    return pl.pallas_call(
        functools.partial(_dw_kernel, depth=depth, h=h, w=w, n=n),
        out_shape=jax.ShapeDtypeStruct((9 * c, 3 * f), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, m, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, f), lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, f), lambda i: (jnp.minimum(i + 1, n - 1),
                                               0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * c, 3 * f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x3, dy3, dy3, dy3)


def _wcat(kernel):
    """[3,3,3,C,F] (kd,kh,kw,C,F) -> [9C, 3F] matching _im2col columns."""
    k = jnp.transpose(kernel, (1, 2, 3, 0, 4))            # [kh,kw,C,kd,F]
    kh, kw, c, kd, f = k.shape
    return k.reshape(kh * kw * c, kd * f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_flat_pallas(x, kernel, depth: int, interpret: bool = False):
    """Fused flat Conv3d: x [N,H,W,C] (N=B*depth), kernel [3,3,3,C,F].

    Stride-1 'same' geometry only. Returns [N,H,W,F] in x.dtype.
    """
    return _fwd(x, kernel, depth, interpret)


def _fwd(x, kernel, depth, interpret):
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    wc = _wcat(kernel).astype(x.dtype)
    y = _fwd_call(x.reshape(n, h * w, c), wc, depth, h, w, interpret)
    return y.reshape(n, h, w, f)


def _conv_fwd(x, kernel, depth, interpret):
    return _fwd(x, kernel, depth, interpret), (x, kernel)


def _conv_bwd(depth, interpret, res, dy):
    x, kernel = res
    n, h, w, c = x.shape
    # dx: transposed conv == same flat conv with the kernel spatially
    # flipped, io-swapped, and tap-reversed.
    kt = jnp.transpose(kernel[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))
    dx = _fwd(dy, kt.astype(dy.dtype), depth, interpret)
    dwf = _dw_call(x.reshape(n, h * w, c),
                   dy.reshape(n, h * w, dy.shape[-1]),
                   depth, h, w, interpret)                # [9C, 3F]
    f = kernel.shape[-1]
    dk = dwf.reshape(3, 3, c, 3, f).transpose(3, 0, 1, 2, 4)
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


conv3d_flat_pallas.defvjp(_conv_fwd, _conv_bwd)
