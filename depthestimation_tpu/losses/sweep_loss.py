"""SweepLoss: MSLE between the predicted peak-intensity image and the
max-over-planes ground-truth sweep intensity, masked, at both scales
(reference losses/losses.py:241-368)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthestimation_tpu.ops.dpv import EPS


def _msle(peak_pred, peak_gt, mask):
    """sqrt(mean((log(gt) - log(pred))^2)) over masked pixels."""
    count = jnp.sum(mask)
    pg = peak_gt * mask
    pp = peak_pred * mask
    sq = (jnp.log(pg + EPS) - jnp.log(pp + EPS)) ** 2
    return jnp.sqrt(jnp.sum(sq * mask) / jnp.maximum(count, 1.0))


def _nearest_down(x, k: int = 4):
    return x[..., ::k, ::k]


class SweepLoss:
    def __init__(self, cfg, id: int = 0):
        self.cfg = cfg
        self.id = id

    def _side(self, output, target):
        # large scale
        out_large = output["output_refined"][0]         # [B, 2, H, W]
        feat_int = target["feat_int_tensor"]            # [B, 128, H, W]
        mask = target["mask_tensor"]                    # [B, 1, H, W]
        img_mult = float(self.cfg.loss.get("img_mult", 1.0))

        def per_item(out, fi, m):
            peak_gt = jnp.max(fi, axis=0) / 255.0
            skip = jnp.sum(m) == 0
            return jnp.where(skip, 0.0, _msle(out[0], peak_gt, m[0]))

        large = jnp.sum(jax.vmap(per_item)(out_large, feat_int, mask))

        out_small = output["output"][0]
        fi_small = _nearest_down(feat_int)
        m_small = _nearest_down(mask)
        small = jnp.sum(jax.vmap(per_item)(out_small, fi_small, m_small))
        return (large + small) * img_mult

    def __call__(self, outputs, targets):
        out_l, out_r = outputs
        gt_l, gt_r = targets
        bsize = 2.0 * out_l["output_refined"][0].shape[0]
        return (self._side(out_l, gt_l) + self._side(out_r, gt_r)) / bsize
