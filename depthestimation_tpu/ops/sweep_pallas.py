"""Pallas TPU kernel for the decomposed plane sweep's stage 2.

Stage 2 of the decomposed sweep (ops/plane_sweep.py) computes, per source
view n and depth d,

    warped_d = Ry_d . F . Rx_d^T          (per feature channel)
    cost_d   = sum_c (warped_d - ref)^2
    diag_d   = Ry_d . Fr[d] . Rx_d^T      (raw-feature channel d only)

The XLA einsum formulation materializes the ``[C, D, H, W]`` ``tmp`` /
``warped`` intermediates in HBM (~100 MB per view at the production
64x96 x C67 x D64 shapes, ~850 MB per B=8 train step) — stage 2 is
HBM-bound even though it is pure matmul work.  This kernel keeps the whole
per-view working set (~2 MB) resident in VMEM across the depth sweep: the
grid is ``(N, D)`` with depth minor, the per-view feature block and the
reference block are fetched once per view, and only the ``[D, H, W]``
cost/diag planes (plus the small per-depth band matrices) ever cross HBM.

Mosaic layout rules shape the kernel (tested on v5e):

- reshapes may only touch LEADING dims (``[C,H,W] -> [C*H, W]`` is free;
  ``[H,C,X] -> [H, C*X]`` needs a relayout and fails to lower);
- so the W-contraction runs as one big 2D matmul ``[C*H, W] @ [W, X]`` and
  the H-contraction as a channel-BATCHED ``dot_general``
  ``[C,Y,H] @ [C,H,X] -> [C,Y,X]`` (supported; keeps X on the lane dim);
- every tensor stays in the natural ``[C, H, W]`` layout — no transposes
  in or out of the kernel.

The custom VJP recomputes the forward matmuls in-kernel (cheaper than
storing ``[C, D, H, W]`` residuals) and accumulates ``dfa``/``dref`` in the
revisited output blocks across the depth iterations (initialized at d == 0,
flushed when the view index advances).

Gradients flow to the features only; the band matrices Rx/Ry derive from
camera poses (training data, never learned — the reference's
``warping/homography.py:98-198`` likewise treats them as constants).

The production entry point is
``ops.plane_sweep.plane_sweep_and_warp_decomposed_batched``; equivalence
with the XLA einsum path is pinned by ``tests/test_sweep_pallas.py``
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depthestimation_tpu.ops import flop_log

_BATCH_DNUMS = (((2,), (1,)), ((0,), (0,)))   # [C,Y,H] @ [C,H,X] -> [C,Y,X]
_LAST_DNUMS = (((1,), (1,)), ((), ()))        # [M,K] @ [N,K] -> [M,N]


def _sweep_chw(fa, rxt, ry, cdt):
    """warped[c, y, x] = sum_{h, w} ry[y, h] fa[c, h, w] rxt[w, x]."""
    f32 = jnp.float32
    c, h, w = fa.shape
    x = rxt.shape[1]
    y = ry.shape[0]
    s1 = jnp.dot(fa.reshape(c * h, w), rxt,
                 preferred_element_type=f32)             # [C*H, X]
    s1 = s1.reshape(c, h, x).astype(cdt)
    ryb = jnp.broadcast_to(ry[None], (c, y, h))
    return jax.lax.dot_general(ryb, s1, _BATCH_DNUMS,
                               preferred_element_type=f32)   # [C, Y, X]


def _fwd_kernel(fa_ref, ref_ref, fr_ref, rxt_ref, ry_ref,
                cost_ref, diag_ref):
    """Forward grid step (n, d).

    Blocks: fa [1, C, H, W]; ref [1, C, H, W]; fr/cost/diag [1, 1, H, W];
    rxt [1, 1, W, X]; ry [1, 1, Y, H].
    """
    f32 = jnp.float32
    fa = fa_ref[0]                                       # [C, H, W]
    rxt = rxt_ref[0, 0]                                  # [W, X]
    ry = ry_ref[0, 0]                                    # [Y, H]
    cdt = fa.dtype

    warped = _sweep_chw(fa, rxt, ry, cdt)                # [C, Y, X] f32
    diff = warped - ref_ref[0].astype(f32)
    cost_ref[0, 0] = jnp.sum(diff * diff, axis=0)        # [Y, X]

    fr = fr_ref[0, 0]                                    # [H, W]
    s2 = jnp.dot(fr, rxt, preferred_element_type=f32)    # [H, X]
    diag_ref[0, 0] = jnp.dot(ry, s2.astype(cdt),
                             preferred_element_type=f32)


def _bwd_kernel(fa_ref, ref_ref, fr_ref, rxt_ref, ry_ref,
                gcost_ref, gdiag_ref,
                dfa_ref, dref_ref, dfr_ref, *, v: int):
    """Backward grid step (n, d): recompute the forward, accumulate
    dfa/dref into the revisited [n]-indexed output blocks."""
    f32 = jnp.float32
    fa = fa_ref[0]
    c, h, w = fa.shape
    rxt = rxt_ref[0, 0]                                  # [W, X]
    ry = ry_ref[0, 0]                                    # [Y, H]
    x = rxt.shape[1]
    y = ry.shape[0]
    cdt = fa.dtype

    warped = _sweep_chw(fa, rxt, ry, cdt)                # [C, Y, X] f32
    diff = warped - ref_ref[0].astype(f32)

    g = gcost_ref[0, 0]                                  # [Y, X] f32
    dwarped = 2.0 * diff * g[None]                       # [C, Y, X] f32

    rybt = jnp.broadcast_to(ry.T[None], (c, h, y))
    ds1 = jax.lax.dot_general(rybt, dwarped.astype(cdt), _BATCH_DNUMS,
                              preferred_element_type=f32)   # [C, H, X]
    dfa_d = jax.lax.dot_general(
        ds1.reshape(c * h, x).astype(cdt), rxt, _LAST_DNUMS,
        preferred_element_type=f32).reshape(c, h, w)

    gd = gdiag_ref[0, 0]                                 # [Y, X] f32
    ds2 = jnp.dot(ry.T, gd.astype(cdt), preferred_element_type=f32)  # [H, X]
    dfr_ref[0, 0] = jax.lax.dot_general(
        ds2.astype(cdt), rxt, _LAST_DNUMS,
        preferred_element_type=f32)                      # [H, W]

    first_d = pl.program_id(1) == 0
    # the dref block is shared by all V views of a batch item (index n // V):
    # initialize it only on the item's FIRST view, accumulate otherwise
    first_ref = jnp.logical_and(first_d, pl.program_id(0) % v == 0)

    @pl.when(first_d)
    def _():
        dfa_ref[0] = dfa_d

    @pl.when(jnp.logical_not(first_d))
    def _():
        dfa_ref[0] += dfa_d

    @pl.when(first_ref)
    def _():
        dref_ref[0] = -dwarped

    @pl.when(jnp.logical_not(first_ref))
    def _():
        dref_ref[0] += -dwarped


def _fwd_call(fa, ref, fr, rxt, ry, v: int, interpret: bool):
    n, c1, h, w = fa.shape
    d = fr.shape[1]
    x = rxt.shape[3]
    y = ry.shape[2]
    spec = pl.BlockSpec
    # per grid step: s1 [C*H,W]@[W,X] + batched [C,Y,H]@[C,H,X] +
    # s2 [H,W]@[W,X] + diag [Y,H]@[H,X]; cost_analysis cannot see them
    # (ops/flop_log.py)
    flop_log.log("sweep_fwd",
                 2.0 * n * d * h * x * (c1 * w + c1 * y + w + y))

    return pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, d, y, x), jnp.float32),
            jax.ShapeDtypeStruct((n, d, y, x), jnp.float32),
        ),
        grid=(n, d),
        in_specs=[
            spec((1, c1, h, w), lambda i, j: (i, 0, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, c1, h, w), lambda i, j: (i // v, 0, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, w, x), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, y, h), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
        ],
        out_specs=(
            spec((1, 1, y, x), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, y, x), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(fa, ref, fr, rxt, ry)


def _bwd_call(fa, ref, fr, rxt, ry, gcost, gdiag, v: int, interpret: bool):
    n, c1, h, w = fa.shape
    d = fr.shape[1]
    x = rxt.shape[3]
    y = ry.shape[2]
    spec = pl.BlockSpec
    # forward recompute (s1 + warped) + ds1 batched [C,H,Y]@[C,Y,X] +
    # dfa [CH,X]@[W,X] + ds2 [H,Y]@[Y,X] + dfr [H,X]@[W,X]
    flop_log.log("sweep_bwd",
                 2.0 * n * d * h * x * (c1 * w + c1 * y          # recompute
                                        + c1 * y + c1 * w        # ds1, dfa
                                        + y + w))                # ds2, dfr

    return pl.pallas_call(
        functools.partial(_bwd_kernel, v=v),
        out_shape=(
            jax.ShapeDtypeStruct((n, c1, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n // v, c1, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, d, h, w), jnp.float32),
        ),
        grid=(n, d),
        in_specs=[
            spec((1, c1, h, w), lambda i, j: (i, 0, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, c1, h, w), lambda i, j: (i // v, 0, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, w, x), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, y, h), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, y, x), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, y, x), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
        ],
        out_specs=(
            spec((1, c1, h, w), lambda i, j: (i, 0, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, c1, h, w), lambda i, j: (i // v, 0, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(fa, ref, fr, rxt, ry, gcost, gdiag)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def sweep_stage2(fa, ref, fr, rxt, ry, v: int, interpret: bool = False):
    """Fused stage-2 sweep.

    Args:
      fa:   [N, C1, H, W] stage-1 resampled cost features (N = B*V).
      ref:  [B, C1, H, W] reference features.
      fr:   [N, D, H, W]  stage-1 resampled raw features (plane d only).
      rxt:  [N, D, W, X]  transposed x-band matrices (Rx[d]^T).
      ry:   [N, D, Y, H]  y-band matrices.
      v:    views per batch item (N = B*V).

    Returns (cost [N, D, H, W] f32 per-view squared-diff sums,
             diag [N, D, H, W] f32).
    """
    return _fwd_call(fa, ref, fr, rxt, ry, v, interpret)


def _sweep_fwd(fa, ref, fr, rxt, ry, v, interpret):
    out = _fwd_call(fa, ref, fr, rxt, ry, v, interpret)
    return out, (fa, ref, fr, rxt, ry)


def _sweep_bwd(v, interpret, res, g):
    fa, ref, fr, rxt, ry = res
    gcost, gdiag = g
    dfa, dref, dfr = _bwd_call(
        fa, ref, fr, rxt, ry,
        gcost.astype(jnp.float32), gdiag.astype(jnp.float32), v, interpret)
    return (dfa.astype(fa.dtype), dref.astype(ref.dtype),
            dfr.astype(fr.dtype), jnp.zeros_like(rxt), jnp.zeros_like(ry))


sweep_stage2.defvjp(_sweep_fwd, _sweep_bwd)
