"""Unsupervised flow loss (ARFlow lineage; reference losses/flow_loss.py:
8-118): photometric (L1 + SSIM + ternary) + edge-aware smoothness with
occlusion masking from forward/backward consistency."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthestimation_tpu.losses.blocks import ssim
from depthestimation_tpu.models.pwclite import flow_warp


def occlusion_mask_bidirection(flow_fw, flow_bw, scale: float = 0.01,
                               bias: float = 0.5):
    """[B, 2, H, W] flows -> [B, 1, H, W] occlusion masks (warp_utils.py:
    43-108 semantics: fb-consistency threshold)."""
    flow_bw_warped = flow_warp(flow_bw, flow_fw)
    diff = flow_fw + flow_bw_warped
    mag = (jnp.sum(flow_fw**2, 1, keepdims=True)
           + jnp.sum(flow_bw_warped**2, 1, keepdims=True))
    occ = jnp.sum(diff**2, 1, keepdims=True) > (scale * mag + bias)
    return (~occ).astype(flow_fw.dtype)


class UnFlowLoss:
    def __init__(self, cfg, id: int = 0):
        self.cfg = cfg
        self.w_ssim = float(cfg.loss.get("w_ssim", 0.85))
        self.w_smooth = float(cfg.loss.get("w_smooth", 75.0))
        self.w_ternary = float(cfg.loss.get("w_ternary", 0.0))

    def photometric(self, img1, img2_warped, mask):
        l1 = jnp.abs(img1 - img2_warped) * mask
        s = ssim(img1[0], img2_warped[0])[None]
        total = ((1 - self.w_ssim) * jnp.mean(l1)
                 + self.w_ssim * jnp.mean(s))
        if self.w_ternary > 0:
            from depthestimation_tpu.losses.blocks import ternary_loss
            t = ternary_loss(img1 * mask, img2_warped * mask)
            total = total + self.w_ternary * jnp.mean(t)
        return total

    def smooth(self, flow, img):
        def gx(t):
            return t[..., :, :-1] - t[..., :, 1:]

        def gy(t):
            return t[..., :-1, :] - t[..., 1:, :]

        wx = jnp.exp(-jnp.mean(jnp.abs(gx(img)), 1, keepdims=True) * 10)
        wy = jnp.exp(-jnp.mean(jnp.abs(gy(img)), 1, keepdims=True) * 10)
        return (jnp.mean(jnp.abs(gx(flow)) * wx)
                + jnp.mean(jnp.abs(gy(flow)) * wy))

    def __call__(self, output: dict, target, return_terms: bool = False):
        """output: PWCLite dict; target: [B, 6, H, W] image pair.

        With ``return_terms`` also returns the per-term breakdown the
        reference's sintel trainers log — (l_ph, l_sm, flow_mean) — plus
        the finest-scale non-occlusion mask its AR trainer feeds to the
        spatial-transform self-supervision (sintel_trainer.py:56,
        sintel_trainer_ar.py:58)."""
        img1, img2 = target[:, :3], target[:, 3:]
        total = l_ph = l_sm = 0.0
        noc_finest = None
        weights = [1.0, 1.0, 1.0, 1.0, 0.32]
        flows_fw = output["flows_fw"]
        flows_bw = output.get("flows_bw", [None] * len(flows_fw))
        for i, (ffw, fbw) in enumerate(zip(flows_fw, flows_bw)):
            h, w = ffw.shape[-2:]
            i1 = jax.image.resize(img1, img1.shape[:2] + (h, w), "linear")
            i2 = jax.image.resize(img2, img2.shape[:2] + (h, w), "linear")
            mask = (occlusion_mask_bidirection(ffw, fbw)
                    if fbw is not None else jnp.ones_like(ffw[:, :1]))
            if noc_finest is None:
                noc_finest = mask
            warped = flow_warp(i2, ffw)
            ph = weights[min(i, 4)] * self.photometric(i1, warped, mask)
            sm = (weights[min(i, 4)] * self.w_smooth / (2**i)
                  * self.smooth(ffw, i1))
            l_ph, l_sm = l_ph + ph, l_sm + sm
            total = total + ph + sm
        if return_terms:
            terms = {"l_ph": l_ph, "l_sm": l_sm,
                     "flow_mean": jnp.mean(jnp.abs(flows_fw[0])),
                     "noc_mask": noc_finest}
            return total, terms
        return total
