"""Base3D: PSMNet-basic 3D CNN over the combined volume.

Input [B, D, H, W, C_in] (C_in = BV + prev_output (+prev_lc) + warped views),
residual 3D conv stack, 1-channel classifier; optional log-softmax over the
depth axis (reference models/models.py:377-439).
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

    @nn.compact
    def __call__(self, volume, train: bool = True, prob: bool = True):
        x = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                     dtype=self.dtype)(volume, train)
        x = nn.relu(x)
        x = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                     dtype=self.dtype)(x, train)
        x = nn.relu(x)

        for _ in range(self.dres_count):
            y = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                         dtype=self.dtype)(x, train)
            y = nn.relu(y)
            y = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                         dtype=self.dtype)(y, train)
            x = y + x

        x = ConvBN3d(self.feature_dim, 3, 1, 1, self.bn_avg,
                     dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv3d(1, 3, 1, 1, use_bias=False, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)                   # [B, D, H, W, 1]
        x = x[..., 0]                                # [B, D, H, W]

        if prob:
            return nn.log_softmax(x, axis=1)
        return x
