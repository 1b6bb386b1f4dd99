"""Plane-sweep cost volume — the framework's #1 hot op.

For every source view and candidate depth d, the source features are warped
into the reference view by the depth-parametrized homography
``p_src ~ K t + K R r d`` (r = unit ray through the reference pixel) and an
L1/L2 feature distance is accumulated into a ``[D, H, W]`` cost volume.

The reference implements this as per-batch-item Python loops of torch
``grid_sample`` calls (warping/homography.py:98-198). Here it is a single
fully-vectorized XLA program: coordinates for all (V, D) pairs come from one
batched matmul (MXU) and the gather is one vectorized ``grid_sample`` — and
the whole thing is ``vmap``-ed over batch by the model.

Parity notes:
- pixel normalization by the principal point (u - cx) / cx, matching
  homography.py:194-196 (NOT the usual W/2 convention).
- z-division epsilon 1e-10 (homography.py:188).
- ``warp_feature_volume`` keeps the (depth plane d -> feature channel d)
  diagonal of the full warp, matching homography.py:165-167.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthestimation_tpu.ops.resample import grid_sample_pixel


def _homography_grid(d_candi, rot, tra, intr, unit_rays, h: int, w: int):
    """Normalized sampling grid for all depths of one source view.

    Returns [D, H, W, 2] grid in the reference's principal-point-normalized
    coordinates.
    """
    hi = jax.lax.Precision.HIGHEST
    term1 = jnp.matmul(intr, tra, precision=hi)                      # [3]
    term2 = jnp.matmul(jnp.matmul(intr, rot, precision=hi),
                       unit_rays, precision=hi)                      # [3, HW]
    d = jnp.asarray(d_candi, term2.dtype)
    p = term1[:, None, None] + term2[:, None, :] * d[None, :, None]   # [3,D,HW]
    p = p / (p[2:3] + 1e-10)
    # Unit rays are built at pixel CENTERS ((x+0.5)/W, view.py:28), so the
    # projected coordinates live in center-of-pixel space; subtract 0.5 to
    # get array indices. (The reference reaches the same result for centered
    # principal points through two cancelling half-pixel conventions:
    # homography.py:194-196 + torch grid_sample align_corners=False.)
    return jnp.stack([p[0] - 0.5, p[1] - 0.5],
                     axis=-1).reshape((len(d_candi), h, w, 2))


def plane_sweep_volume(feat_ref, feat_srcs, d_candi, rots, tras, intr,
                       unit_rays, sigma: float, dist: str = "L2"):
    """Cost volume for one batch item.

    Args:
      feat_ref:  [C, H, W] reference-view features.
      feat_srcs: [V, C, H, W] source-view features.
      d_candi:   [D] candidate depths.
      rots/tras: [V, 3, 3] / [V, 3] source<-reference rotations/translations.
      intr:      [3, 3] intrinsics at feature resolution.
      unit_rays: [3, H*W] unit-z rays of the reference camera.
      sigma:     cost scaling (sigma_soft_max).

    Returns [D, H, W] accumulated feature distance.
    """
    c, h, w = feat_ref.shape

    def per_view(rot, tra, feat_src):
        grid = _homography_grid(d_candi, rot, tra, intr, unit_rays, h, w)
        warped = grid_sample_pixel(feat_src, grid)  # [C, D, H, W]
        diff = warped - feat_ref[:, None]
        if dist == "L2":
            return jnp.sum(diff * diff, axis=0)
        return jnp.sum(jnp.abs(diff), axis=0)

    costs = jax.vmap(per_view)(rots, tras, feat_srcs)  # [V, D, H, W]
    return jnp.sum(costs, axis=0) / sigma


def warp_feature_volume(feat_srcs, d_candi, rots, tras, intr, unit_rays):
    """Per-view diagonal warp: depth plane d samples feature CHANNEL d at the
    depth-d homography (requires C == D).

    feat_srcs: [V, C=D, H, W]; returns [V, D, H, W].
    """
    v, c, h, w = feat_srcs.shape
    assert c == len(d_candi), "warp_feature_volume requires C == D"

    def per_view(rot, tra, feat_src):
        grid = _homography_grid(d_candi, rot, tra, intr, unit_rays, h, w)

        def per_depth(channel, g):
            return grid_sample_pixel(channel[None], g)[0]   # [H, W]

        return jax.vmap(per_depth)(feat_src, grid)      # [D, H, W]

    return jax.vmap(per_view)(rots, tras, feat_srcs)
