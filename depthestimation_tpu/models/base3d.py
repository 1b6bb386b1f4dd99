"""Base3D: PSMNet-basic 3D CNN over the combined volume.

Input [B, D, H, W, C_in] (C_in = BV + prev_output (+prev_lc) + warped views),
residual 3D conv stack, 1-channel classifier; optional log-softmax over the
depth axis (reference models/models.py:377-439).

``flat=True`` (default) runs the whole stack in the FLATTENED
[B*D, H, W, C] layout: one reshape at entry/exit instead of a 5D<->4D
layout flip at every conv boundary, and the Conv3d depth taps become
roll+mask combines of full-volume 2D convs (see layers.Conv3d.depth).
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

    @nn.compact
    def __call__(self, volume, train: bool = True, prob: bool = True):
        b, d, h, w, c = volume.shape
        dep = d if self.flat else None
        cp = dict(combine_pallas=self.combine_pallas,
                  combine_mesh=self.combine_mesh,
                  combine_axis=self.combine_axis)
        x = volume.reshape(b * d, h, w, c) if self.flat else volume

        x = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                     dtype=self.dtype, depth=dep, **cp)(x, train)
        x = nn.relu(x)
        x = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                     dtype=self.dtype, depth=dep, **cp)(x, train)
        x = nn.relu(x)

        for _ in range(self.dres_count):
            y = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                         dtype=self.dtype, depth=dep, **cp)(x, train)
            y = nn.relu(y)
            y = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                         dtype=self.dtype, depth=dep, **cp)(y, train)
            x = y + x

        x = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                     dtype=self.dtype, depth=dep, **cp)(x, train)
        x = nn.relu(x)
        x = Conv3d(1, 3, 1, 1, use_bias=False, dtype=self.dtype,
                   depth=dep, **cp)(x)
        x = x.astype(jnp.float32)
        if self.flat:
            x = x.reshape(b, d, h, w)
        else:
            x = x[..., 0]                            # [B, D, H, W]

        if prob:
            return nn.log_softmax(x, axis=1)
        return x
