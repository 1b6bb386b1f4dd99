"""SweepModel: per-pixel curtain-response predictor.

Predicts the curtain response parameters at every pixel — peak intensity
``pp`` in [0, 1] (sigmoid) and response width ``ps`` in [0.1, 4.1] — at 1/4
and full resolution, from a single RGB frame (reference models/sweep.py:
78-356: 3-stage residual SweepEncoder + skip-connected SweepDecoder +
sigmoid constraint).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from depthestimation_tpu.models.encoder import _Stage
from depthestimation_tpu.models.layers import (
    Conv,
    ConvBN,
    ConvTranspose,
    avg_pool,
    leaky_relu,
)


class SweepEncoder(nn.Module):
    """[B, H, W, 3] -> (f1 [H/2, S1], f2 [H/4, S2], out [H/4, 2])."""
    feature_dim: int = 32
    bn_avg: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        mul = self.feature_dim / 64.0
        s1, s2 = int(32 * mul), int(64 * mul)
        for stride in (2, 1, 1):
            x = ConvBN(s1, 3, stride, 1, 1, self.bn_avg)(x, train)
            x = nn.relu(x)
        f1 = _Stage(s1, 3, 1, 1, 1, in_planes=s1, bn_avg=self.bn_avg)(x, train)
        raw = _Stage(s2, 3, 2, 1, 1, in_planes=s1, bn_avg=self.bn_avg)(f1, train)
        skip = _Stage(s2, 3, 1, 1, 1, in_planes=s2, bn_avg=self.bn_avg)(raw, train)
        feat = jnp.concatenate([raw, skip], axis=-1)
        feat = ConvBN(32, 1, 1, 0, 1, self.bn_avg)(feat, train)
        feat = nn.relu(feat)
        out = Conv(2, 1, 1, 0, use_bias=False)(feat)
        return f1, raw, out


class SweepDecoder(nn.Module):
    """Skip-connected 4x upsampler -> 2 channels (sweep.py:78-165)."""

    @nn.compact
    def __call__(self, raw, skips):
        x = jnp.concatenate([raw, skips[0]], axis=-1)
        x = leaky_relu(Conv(32, 3, 1, 1)(x))
        x = leaky_relu(Conv(32, 3, 1, 1)(x))
        x = leaky_relu(ConvTranspose(16, 4, 2, 1)(x))
        x = jnp.concatenate([x, skips[1]], axis=-1)
        x = leaky_relu(Conv(32, 3, 1, 1)(x))
        x = leaky_relu(Conv(32, 3, 1, 1)(x))
        x = leaky_relu(ConvTranspose(16, 4, 2, 1)(x))
        x = jnp.concatenate([x, skips[2]], axis=-1)
        x = leaky_relu(Conv(16, 3, 1, 1)(x))
        x = leaky_relu(Conv(16, 3, 1, 1)(x))
        return Conv(2, 3, 1, 1)(x)


def constrain_output(x):
    """pp -> sigmoid [0,1]; ps -> 0.1 + 4*sigmoid (sweep.py:308-325).
    x: [..., 2] channel-last."""
    pp = nn.sigmoid(x[..., 0])
    ps = 0.1 + nn.sigmoid(x[..., 1]) * 4.0
    return jnp.stack([pp, ps], axis=-1)


class SweepModel(nn.Module):
    feature_dim: int = 32
    bn_avg: bool = False

    @nn.compact
    def __call__(self, model_input: dict, train: bool = True) -> dict:
        rgb = model_input["rgb"]
        if rgb.ndim == 5:
            rgb = rgb[:, -1]
        x = jnp.moveaxis(rgb, -3, -1)                 # [B, H, W, 3]
        f1, f2, small = SweepEncoder(self.feature_dim, self.bn_avg)(x, train)
        small = constrain_output(small)
        big = SweepDecoder()(small, [f2, f1, x])
        big = constrain_output(big)
        to_nchw = lambda t: jnp.moveaxis(t, -1, -3)
        return {"output": [to_nchw(small)], "output_refined": [to_nchw(big)],
                "flow": None, "flow_refined": None}
