"""Base3D: PSMNet-basic 3D CNN over the combined volume.

Input [B, D, H, W, C_in] (C_in = BV + prev_output (+prev_lc) + warped views),
residual 3D conv stack, 1-channel classifier; optional log-softmax over the
depth axis (reference models/models.py:377-439).

``flat=True`` (default) runs the whole stack in the FLATTENED
[B*D, H, W, C] layout: one reshape at entry/exit instead of a 5D<->4D
layout flip at every conv boundary, and the Conv3d depth taps become
roll+mask combines of full-volume 2D convs (see layers.Conv3d.depth).

``convcomb_pallas`` (resolved by BaseModelNet; single-TPU/bf16 auto, or
a data mesh via shard_map) runs the stack through the FUSED Pallas block
kernel instead (ops/convcomb_pallas.py): activations flow as raw
[B*D, C, H*W] conv outputs, each layer's BN normalize + ReLU is applied
inside the NEXT layer's kernel on load, and the depth-tap combine + BN
statistics never leave VMEM. Residual adds and the block-entry
materializations stay in XLA (cheap fused elementwise). Same parameter
tree as the XLA paths — checkpoints are interchangeable.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from depthestimation_tpu.models.layers import Conv3d, ConvBN3d


class Base3D(nn.Module):
    feature_dim: int = 32
    dres_count: int = 4
    bn_avg: bool = False
    dtype: Any = None
    flat: bool = True
    #: fused Pallas tap-combine for the flat Conv3d path (resolved by
    #: BaseModelNet; see layers.Conv3d.combine_pallas)
    combine_pallas: Any = False
    combine_mesh: Any = None
    combine_axis: str = "data"
    #: fused conv+combine+stats block kernel (ops/convcomb_pallas.py):
    #: False = off, True = compiled kernel, "interpret" = Pallas
    #: interpreter (CPU tests / multichip dryrun). Resolved by
    #: BaseModelNet (backend/dtype/mesh gates live there). Falls back to
    #: the XLA flat path below 192 flattened rows (same gate as the
    #: tap-stacked conv — the per-layer grid overhead loses at B=1) or
    #: when H*W is not lane-aligned.
    convcomb_pallas: Any = False
    convcomb_mesh: Any = None
    convcomb_axis: str = "data"

    def _use_fused(self, b: int, d: int, h: int, w: int) -> bool:
        if not (self.convcomb_pallas and self.flat):
            return False
        if self.convcomb_mesh is not None:
            shards = dict(zip(self.convcomb_mesh.axis_names,
                              self.convcomb_mesh.devices.shape)
                          ).get(self.convcomb_axis, 1)
            if shards > 1 and b % shards != 0:
                # GSPMD cannot partition the opaque pallas_call, and the
                # shard_map dispatch needs whole items per shard — an
                # unsharded fallback would fully REPLICATE the
                # production-size [N, C, HW] tensors on every device
                # (OOM on 15.75 GB chips). Use the XLA stack instead.
                return False
        if self.convcomb_pallas == "interpret":
            import jax
            if jax.default_backend() == "tpu":
                import warnings
                warnings.warn(
                    "convcomb_pallas='interpret' on a TPU backend runs "
                    "the whole Base3D stack through the Pallas "
                    "interpreter (orders of magnitude slower) — meant "
                    "for CPU tests / the multichip dryrun only")
            return True
        return b * d >= 192 and (h * w) % 128 == 0

    @nn.compact
    def __call__(self, volume, train: bool = True, prob: bool = True):
        b, d, h, w, c = volume.shape
        if self._use_fused(b, d, h, w):
            x = self._fused_stack(volume, train)
        else:
            x = self._xla_stack(volume, train)
        if prob:
            return nn.log_softmax(x, axis=1)
        return x

    def _layer_args(self):
        return dict(bn_running_avg=self.bn_avg, dtype=self.dtype,
                    combine_pallas=self.combine_pallas,
                    combine_mesh=self.combine_mesh,
                    combine_axis=self.combine_axis)

    def _xla_stack(self, volume, train):
        b, d, h, w, c = volume.shape
        dep = d if self.flat else None
        cp = self._layer_args()
        x = volume.reshape(b * d, h, w, c) if self.flat else volume

        x = ConvBN3d(self.feature_dim, 3, 1, 1, depth=dep, **cp)(x, train)
        x = nn.relu(x)
        x = ConvBN3d(self.feature_dim, 3, 1, 1, depth=dep, **cp)(x, train)
        x = nn.relu(x)

        for _ in range(self.dres_count):
            y = ConvBN3d(self.feature_dim, 3, 1, 1, depth=dep, **cp)(x, train)
            y = nn.relu(y)
            y = ConvBN3d(self.feature_dim, 3, 1, 1, depth=dep, **cp)(y, train)
            x = y + x

        x = ConvBN3d(self.feature_dim, 3, 1, 1, depth=dep, **cp)(x, train)
        x = nn.relu(x)
        x = Conv3d(1, 3, 1, 1, use_bias=False, dtype=self.dtype,
                   depth=dep, combine_pallas=self.combine_pallas,
                   combine_mesh=self.combine_mesh,
                   combine_axis=self.combine_axis)(x)
        x = x.astype(jnp.float32)
        if self.flat:
            return x.reshape(b, d, h, w)
        return x[..., 0]                             # [B, D, H, W]

    def _fused_stack(self, volume, train):
        """Same math/modules/params as _xla_stack, but every
        conv+combine+BN-stats triplet runs as ONE Pallas kernel and the
        pending normalize+ReLU rides the next kernel's load. Only the
        residual adds / block-entry materializations touch XLA (they are
        required elementwise traffic either way)."""
        b, d, h, w, c = volume.shape
        fd = self.feature_dim
        fi = dict(h=h, w=w,
                  interpret=(self.convcomb_pallas == "interpret"),
                  mesh=self.convcomb_mesh, axis=self.convcomb_axis)
        cp = self._layer_args()
        f32 = jnp.float32
        ident_c = (jnp.ones((c,), f32), jnp.zeros((c,), f32))
        ident_f = (jnp.ones((fd,), f32), jnp.zeros((fd,), f32))

        def mk():
            return ConvBN3d(fd, 3, 1, 1, depth=d, **cp)

        def materialize(z, a, bb, relu):
            """Apply a layer's pending BN normalize outside the kernel
            (needed where a tensor is consumed twice: residual adds)."""
            y = (z * a.astype(z.dtype)[None, :, None]
                 + bb.astype(z.dtype)[None, :, None])
            return jnp.maximum(y, 0) if relu else y

        # entry: [B, D, H, W, C] -> transposed [B*D, C, H*W]
        x4 = volume.reshape(b * d, h, w, c).astype(jnp.bfloat16)
        xt = jnp.transpose(x4, (0, 3, 1, 2)).reshape(b * d, c, h * w)

        z, a, bb = mk()(xt, train, fused_in=dict(
            a=ident_c[0], b=ident_c[1], relu=False, **fi))
        z, a, bb = mk()(z, train, fused_in=dict(
            a=a, b=bb, relu=True, **fi))
        x = materialize(z, a, bb, relu=True)         # block input [N, F, HW]

        for _ in range(self.dres_count):
            za, aa, ba = mk()(x, train, fused_in=dict(
                a=ident_f[0], b=ident_f[1], relu=False, **fi))
            zb, ab_, bb_ = mk()(za, train, fused_in=dict(
                a=aa, b=ba, relu=True, **fi))
            x = materialize(zb, ab_, bb_, relu=False) + x

        z, a, bb = mk()(x, train, fused_in=dict(
            a=ident_f[0], b=ident_f[1], relu=False, **fi))
        y, _ = Conv3d(1, 3, 1, 1, use_bias=False, dtype=self.dtype,
                      depth=d, combine_pallas=self.combine_pallas,
                      combine_mesh=self.combine_mesh,
                      combine_axis=self.combine_axis)(
            z, fused_in=dict(a=a, b=bb, relu=True, **fi))
        # classifier output [N, 1, HW] is already depth-major rows x HW
        return y.astype(jnp.float32).reshape(b, d, h, w)
