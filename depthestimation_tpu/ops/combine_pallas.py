"""Pallas TPU kernel for the flat-Conv3d depth-tap combine.

The flat-4D Conv3d (models/layers.py) computes all three depth taps with
one stacked 2D conv ``tcat [N, H, W, 3F]`` (N = B*D rows) and then forms

    y[n] = t1[n] + t0[n-1] + t2[n+1]        (zero outside each item's
                                             d in [0, D) depth range)

where ``ti = tcat[..., i*F:(i+1)*F]``.  XLA lowers this to %split ops plus
``broadcast_select_fusion``s that roll along the minor/lane axis at
~80 GB/s — together ~26 ms select + ~11 ms split of the 350 ms B=8 train
step (benchmarks/PROFILE_b8.md).

This kernel fuses split + shift + mask + accumulate into one pass:

- the grid is ``(B, H)`` and each block is ONE batch item's full depth
  column ``[D, 1, W, 3F]`` — the +-1 depth shifts stay inside the block,
  so the depth-edge validity mask falls out of the block boundary for
  free (shifted-in rows are zeros; no iota mask, no select);
- tap extraction runs as MXU matmuls against constant one-hot selection
  matrices ``S_i [3F, F]`` instead of lane slicing (reshapes/slices that
  touch the lane dim need a Mosaic relayout; a [D*W, 3F] @ [3F, F] dot
  keeps everything in natural layout — same trick as ops/sweep_pallas.py);
- the backward is the SAME kernel with transposed selection matrices and
  the shift roles swapped: dtcat[n] = g[n+1] @ S0^T + g[n] @ S1^T +
  g[n-1] @ S2^T.

Reference behavior: the depth dimension of ``nn.Conv3d`` in the
reference's Base3D stack (models.py:32-36, 404); numerics pinned against
the XLA roll+mask form by tests/test_combine_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, m_ref, o_ref):
    """One (item, H-row) block: o = up(x) @ m0 + x @ m1 + dn(x) @ m2.

    Blocks: x [D, 1, W, Cin]; m [3, Cin, Cout]; o [D, 1, W, Cout].
    up(x)[n] = x[n-1], dn(x)[n] = x[n+1], zero rows shifted in.
    """
    f32 = jnp.float32
    x = x_ref[:, 0]                                   # [D, W, Cin]
    d, w, cin = x.shape
    x2 = x.reshape(d * w, cin)                        # leading fold: free
    z = jnp.zeros((w, cin), x2.dtype)
    up = jnp.concatenate([z, x2[:-w]], axis=0)        # rows n-1
    dn = jnp.concatenate([x2[w:], z], axis=0)         # rows n+1
    y = (jnp.dot(up, m_ref[0], preferred_element_type=f32)
         + jnp.dot(x2, m_ref[1], preferred_element_type=f32)
         + jnp.dot(dn, m_ref[2], preferred_element_type=f32))
    o_ref[:, 0] = y.reshape(d, w, -1).astype(o_ref.dtype)


def _call_local(x, mats, depth: int, interpret: bool):
    n, h, w, cin = x.shape
    cout = mats.shape[-1]
    b = n // depth
    spec = pl.BlockSpec
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        grid=(b, h),
        in_specs=[
            spec((depth, 1, w, cin), lambda i, j: (i, j, 0, 0),
                 memory_space=pltpu.VMEM),
            spec((3, cin, cout), lambda i, j: (0, 0, 0),
                 memory_space=pltpu.VMEM),
        ],
        out_specs=spec((depth, 1, w, cout), lambda i, j: (i, j, 0, 0),
                       memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, mats)


def _call(x, mats, depth: int, interpret: bool, mesh=None, axis="data"):
    """``mesh``: shard_map the kernel over the batch-item rows (axis 0) of
    ``mesh``'s ``axis`` dimension — GSPMD cannot batch-partition an opaque
    pallas_call (same contract as ops/plane_sweep.py's batched sweep). The
    D-major flattening keeps every item's depth column inside one shard, so
    the per-block edge masking needs no cross-device halo."""
    n_shards = (dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)
                if mesh is not None else 1)
    items = x.shape[0] // depth
    if n_shards > 1 and items % n_shards == 0:
        from jax.sharding import PartitionSpec as P
        run = jax.shard_map(
            lambda x_, m_: _call_local(x_, m_, depth, interpret),
            mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis),
            check_vma=False)
        return run(x, mats)
    return _call_local(x, mats, depth, interpret)


@functools.lru_cache(maxsize=8)
def _sel_mats_np(f: int):
    """[3, 3F, F] one-hot tap selectors (fwd) and [3, F, 3F] adjoints.

    Cached as NUMPY arrays only: caching jnp arrays would capture the
    tracer when the first call happens inside a jit/custom_vjp trace and
    leak it into later traces (UnexpectedTracerError). The jnp.asarray
    conversion happens per call site — it constant-folds under jit."""
    eye = np.eye(f, dtype=np.float32)
    fwd = np.zeros((3, 3 * f, f), dtype=np.float32)
    bwd = np.zeros((3, f, 3 * f), dtype=np.float32)
    for i in range(3):
        fwd[i, i * f:(i + 1) * f, :] = eye
    # dtcat[n] = g[n+1] @ S0^T + g[n] @ S1^T + g[n-1] @ S2^T:
    # the kernel's up-slot (rows n-1) carries S2^T, the dn-slot S0^T.
    bwd[0, :, 2 * f:] = eye            # up(g) -> tap 2 lanes
    bwd[1, :, f:2 * f] = eye           # g     -> tap 1 lanes
    bwd[2, :, :f] = eye                # dn(g) -> tap 0 lanes
    return fwd, bwd


def _sel_mats(f: int, dtype_name: str):
    fwd, bwd = _sel_mats_np(f)
    dt = jnp.dtype(dtype_name)
    return jnp.asarray(fwd, dt), jnp.asarray(bwd, dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def tap_combine(tcat, depth: int, features: int, interpret: bool = False,
                mesh=None, axis: str = "data"):
    """Fused depth-tap combine of a stacked flat-Conv3d output.

    Args:
      tcat: [N, H, W, 3F] stacked tap conv output, N = B*depth (D-major).
      depth: D — rows per batch item.
      features: F — output channels per tap.
      mesh/axis: optional jax.sharding.Mesh whose ``axis`` shards the batch
        items — the kernel runs per-device under shard_map (see _call).

    Returns y [N, H, W, F] with y[n] = t1[n] + t0[n-1] + t2[n+1], taps
    zeroed across batch-item depth edges.
    """
    fwd_m, _ = _sel_mats(features, jnp.dtype(tcat.dtype).name)
    return _call(tcat, fwd_m, depth, interpret, mesh, axis)


def _fwd(tcat, depth, features, interpret, mesh, axis):
    return tap_combine(tcat, depth, features, interpret, mesh, axis), None


def _bwd(depth, features, interpret, mesh, axis, _, g):
    _, bwd_m = _sel_mats(features, jnp.dtype(g.dtype).name)
    return (_call(g, bwd_m, depth, interpret, mesh, axis),)


tap_combine.defvjp(_fwd, _bwd)


def tap_combine_xla(tcat, depth: int, features: int):
    """Pure-XLA reference (the roll + iota-mask form from Conv3d)."""
    n = tcat.shape[0]
    f = features
    taps = [tcat[..., i * f:(i + 1) * f] for i in range(3)]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1, 1), 0) % depth
    y = taps[1]
    for i, shift in ((0, -1), (2, 1)):
        ti = jnp.roll(taps[i], -shift, axis=0)
        valid = (row + shift >= 0) & (row + shift < depth)
        y = y + jnp.where(valid, ti, jnp.zeros((), ti.dtype))
    return y
