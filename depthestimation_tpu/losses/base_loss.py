"""BaseLoss: the production depth loss (reference losses/losses.py:8-210).

Sum of: soft cross-entropy at low & high res (over the whole output pyramid),
downsample consistency, depth stereo consistency (both directions, both
scales), RGB stereo photometric consistency (high and optionally low res),
and edge-aware smoothness — weighted by cfg.loss.*_mul and batch-normalized.

Unlike the reference's per-batch-item Python loops, every term is vmapped
over batch and the whole loss is a single jit-compatible function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthestimation_tpu.losses import blocks
from depthestimation_tpu.ops.dpv import dpv_to_depthmap
from depthestimation_tpu.ops.resample import resize_bilinear_align_corners


class BaseLoss:
    def __init__(self, cfg, id: int = 0):
        self.cfg = cfg
        self.id = id

    def __call__(self, outputs, targets):
        out_l, out_r = outputs
        gt_l, gt_r = targets
        c = self.cfg.loss
        # stereo-warp implementation: 'hwarp' (default) = rectified-rig
        # block-banded MXU matmul (ops/resample.py:hwarp — the reference's
        # rigs are all rectified; identical outputs for pure-x baselines);
        # 'gather' = general grid_sample, bit-parity with the torch oracle
        # (losses/loss_blocks.py:133-190) — used by the parity harnesses.
        warp_impl = c.get("warp_impl", "hwarp")
        d_candi = jnp.asarray(gt_l["d_candi"], jnp.float32)
        t_l2r = jnp.asarray(gt_l["T_left2right"], jnp.float32)

        # ---- soft cross-entropy over the full output pyramid ------------
        ce_terms = []
        for side_out, side_gt in ((out_l, gt_l), (out_r, gt_r)):
            for bv in side_out["output"]:
                ce_terms.append(jnp.mean(jax.vmap(blocks.soft_cross_entropy_loss)(
                    side_gt["soft_labels"], bv, side_gt["masks"])))
            for bv in side_out["output_refined"]:
                ce_terms.append(jnp.mean(jax.vmap(blocks.soft_cross_entropy_loss)(
                    side_gt["soft_labels_imgsize"], bv,
                    side_gt["masks_imgsizes"])))
        ce_loss = sum(ce_terms) / len(ce_terms)

        # ---- depth maps from the last pyramid entries -------------------
        def dm(bv):
            return dpv_to_depthmap(bv, d_candi, log=True)   # [B, h, w]

        small_l, small_r = dm(out_l["output"][-1]), dm(out_r["output"][-1])
        large_l, large_r = (dm(out_l["output_refined"][-1]),
                            dm(out_r["output_refined"][-1]))

        bsize = 2.0 * small_l.shape[0]
        pose_t2s = t_l2r
        pose_s2t = jnp.linalg.inv(t_l2r)

        # ---- downsample consistency -------------------------------------
        dc_loss = 0.0
        if c.dc_mul:
            dc = jax.vmap(blocks.depth_consistency_loss)
            dc_loss = (jnp.sum(dc(large_l, small_l))
                       + jnp.sum(dc(large_r, small_r))) / bsize

        # ---- depth stereo consistency ------------------------------------
        dsc_loss = 0.0
        if c.dsc_mul:
            def dsc(src_d, tgt_d, src_m, pose, intr):
                return jax.vmap(
                    lambda *a: blocks.depth_stereo_consistency_loss(
                        *a, warp_impl=warp_impl),
                    in_axes=(0, 0, 0, None, 0))(src_d, tgt_d, src_m, pose,
                                                intr)

            intr_up_l = gt_l["intrinsics_up"]
            intr_l = gt_l["intrinsics"]
            intr_up_r = gt_r["intrinsics_up"]
            intr_r = gt_r["intrinsics"]
            terms = (
                dsc(large_r, large_l, gt_r["masks_imgsizes"], pose_t2s, intr_up_l)
                + dsc(small_r, small_l, gt_r["masks"], pose_t2s, intr_l)
                + dsc(large_l, large_r, gt_l["masks_imgsizes"], pose_s2t, intr_up_r)
                + dsc(small_l, small_r, gt_l["masks"], pose_s2t, intr_r))
            dsc_loss = jnp.sum(terms) / bsize

        # ---- RGB stereo consistency --------------------------------------
        rsc_loss = 0.0
        if c.rsc_mul:
            rsc = jax.vmap(
                lambda *a: blocks.rgb_stereo_consistency_loss(
                    *a, warp_impl=warp_impl),
                in_axes=(0, 0, 0, None, 0))
            rgb_l = gt_l["rgb"][:, -1]
            rgb_r = gt_r["rgb"][:, -1]
            terms = (rsc(rgb_r, rgb_l, large_l, pose_t2s, gt_l["intrinsics_up"])
                     + rsc(rgb_l, rgb_r, large_r, pose_s2t, gt_r["intrinsics_up"]))
            rsc_loss = jnp.sum(terms) / bsize

        rsc_low_loss = 0.0
        if c.rsc_low_mul:
            rsc = jax.vmap(
                lambda *a: blocks.rgb_stereo_consistency_loss(
                    *a, warp_impl=warp_impl),
                in_axes=(0, 0, 0, None, 0))
            h4, w4 = small_l.shape[-2:]
            rgb_l = resize_bilinear_align_corners(gt_l["rgb"][:, -1], (h4, w4))
            rgb_r = resize_bilinear_align_corners(gt_r["rgb"][:, -1], (h4, w4))
            terms = (rsc(rgb_r, rgb_l, small_l, pose_t2s, gt_l["intrinsics"])
                     + rsc(rgb_l, rgb_r, small_r, pose_s2t, gt_r["intrinsics"]))
            rsc_low_loss = jnp.sum(terms) / bsize

        # ---- smoothness ---------------------------------------------------
        smooth_loss = 0.0
        if c.smooth_mul:
            sm = jax.vmap(blocks.edge_aware_smoothness_loss)
            smooth_loss = (jnp.sum(sm(large_l, gt_l["rgb"][:, -1]))
                           + jnp.sum(sm(large_r, gt_r["rgb"][:, -1]))) / bsize

        return (ce_loss * c.ce_mul + dsc_loss * c.dsc_mul + dc_loss * c.dc_mul
                + rsc_loss * c.rsc_mul + rsc_low_loss * c.rsc_low_mul
                + smooth_loss * c.smooth_mul)


class DefaultLoss:
    """Trivial L1-to-zero debug loss (losses.py:212-239)."""

    def __init__(self, cfg, id: int = 0):
        self.cfg = cfg

    def __call__(self, outputs, targets):
        out_l, out_r = outputs
        return (jnp.sum(jnp.abs(out_l["output"][-1]))
                + jnp.sum(jnp.abs(out_r["output"][-1])))
