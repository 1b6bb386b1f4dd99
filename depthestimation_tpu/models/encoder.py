"""BaseEncoder: PSMNet-style pyramid feature extractor.

Rebuilt from the reference architecture (models/models.py:150-269): strided
stem, four residual stages (dilated stage 4), spatial-pyramid pooling
branches, fused 1x1 head producing ``feature_dim`` channels at 1/4
resolution. Channel-last layout throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from typing import Any

from depthestimation_tpu.models.layers import BatchNorm, Conv, ConvBN, avg_pool
from depthestimation_tpu.ops.resample import resize_bilinear_align_corners


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    downsample: bool = False
    bn_avg: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = ConvBN(self.planes, 3, self.stride, self.pad, self.dilation,
                     self.bn_avg, dtype=self.dtype)(x, train)
        out = nn.relu(out)
        out = ConvBN(self.planes, 3, 1, self.pad, self.dilation,
                     self.bn_avg, dtype=self.dtype)(out, train)
        if self.downsample:
            x = Conv(self.planes, 1, self.stride, 0, use_bias=False,
                     dtype=self.dtype)(x)
            x = BatchNorm(self.bn_avg)(x, train)
        return out + x


class _Stage(nn.Module):
    planes: int
    blocks: int
    stride: int
    pad: int
    dilation: int
    in_planes: int
    bn_avg: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        need_ds = self.stride != 1 or self.in_planes != self.planes
        x = BasicBlock(self.planes, self.stride, self.pad, self.dilation,
                       downsample=need_ds, bn_avg=self.bn_avg,
                       dtype=self.dtype)(x, train)
        for _ in range(1, self.blocks):
            x = BasicBlock(self.planes, 1, self.pad, self.dilation,
                           downsample=False, bn_avg=self.bn_avg,
                           dtype=self.dtype)(x, train)
        return x


class BaseEncoder(nn.Module):
    """Input [B, H, W, 3] -> (layer1 [B,H/2,W/2,S1], raw [B,H/4,W/4,S2],
    features [B,H/4,W/4,feature_dim])."""
    feature_dim: int = 32
    bn_avg: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        mul = self.feature_dim / 64.0
        s0, s1, s2, s3 = int(16 * mul), int(32 * mul), int(64 * mul), int(128 * mul)

        # stem: stride-2 conv + 2 convs
        for i, stride in enumerate((2, 1, 1)):
            x = ConvBN(s1, 3, stride, 1, 1, self.bn_avg, dtype=self.dtype)(x, train)
            x = nn.relu(x)

        out1 = _Stage(s1, 3, 1, 1, 1, in_planes=s1, bn_avg=self.bn_avg,
                      dtype=self.dtype)(x, train)
        raw = _Stage(s2, s0, 2, 1, 1, in_planes=s1, bn_avg=self.bn_avg,
                     dtype=self.dtype)(out1, train)
        l3 = _Stage(s3, 3, 1, 1, 1, in_planes=s2, bn_avg=self.bn_avg,
                    dtype=self.dtype)(raw, train)
        skip = _Stage(s3, 3, 1, 1, 2, in_planes=s3, bn_avg=self.bn_avg,
                      dtype=self.dtype)(l3, train)

        h, w = skip.shape[1], skip.shape[2]
        branches = []
        for win in (64, 32, 16, 8):
            win_eff = min(win, h, w)
            b = avg_pool(skip, win_eff)
            b = ConvBN(s1, 1, 1, 0, 1, self.bn_avg, dtype=self.dtype)(b, train)
            b = nn.relu(b)
            b = jnp.moveaxis(
                resize_bilinear_align_corners(jnp.moveaxis(b, -1, 1), (h, w)),
                1, -1)
            branches.append(b)

        feat = jnp.concatenate([raw, skip] + branches[::-1], axis=-1)
        feat = ConvBN(s3, 3, 1, 1, 1, self.bn_avg, dtype=self.dtype)(feat, train)
        feat = nn.relu(feat)
        feat = Conv(self.feature_dim, 1, 1, 0, use_bias=False,
                    dtype=self.dtype)(feat)
        return out1, raw, feat
