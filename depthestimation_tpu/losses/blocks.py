"""Loss building blocks (reference losses/loss_blocks.py), vmap-friendly.

Each block operates on a single item ([C, H, W] / [H, W]); ``BaseLoss``
vmaps/volumizes them over batch instead of the reference's Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthestimation_tpu.ops.geometry import inverse_warp, minpool, transform_dmap


def mean_on_mask(diff, mask):
    """Masked mean with the mask broadcast over channels
    (loss_blocks.py:68-71: denominator is the EXPANDED mask sum).
    Empty masks (possible with very sparse lidar) contribute 0, not NaN."""
    mask_full = jnp.broadcast_to(mask, diff.shape)
    total = jnp.sum(mask_full)
    return jnp.where(total > 0,
                     jnp.sum(diff * mask_full) / jnp.maximum(total, 1.0), 0.0)


def soft_cross_entropy_loss(soft_label, log_pred, mask=None):
    """-sum_d q(d) log p(d), optionally masked (loss_blocks.py:205-221).

    soft_label/log_pred: [D, H, W]; mask: [1, H, W].
    """
    loss = -jnp.sum(soft_label * log_pred, axis=0)   # [H, W]
    if mask is None:
        return jnp.mean(loss)
    m = mask[0]
    count = jnp.sum(m == 1)
    return jnp.where(count == 0, 0.0, jnp.sum(loss * m) / jnp.maximum(count, 1))


def _tophalf_mask(h, w, frac: int = 3):
    """True below row h/frac (the reference zeroes the top third)."""
    rows = jnp.arange(h) >= (h // frac)
    return jnp.broadcast_to(rows[:, None], (h, w))


def rgb_stereo_consistency_loss(src_rgb, target_rgb, target_depth,
                                pose_target2src, intr, warp_impl="gather"):
    """Photometric L1 between target and the source warped by target depth
    (loss_blocks.py:133-149). src_rgb/target_rgb: [3, H, W]."""
    warped, valid = inverse_warp(src_rgb, target_depth, pose_target2src, intr,
                                 impl=warp_impl)
    h, w = target_depth.shape
    full = (valid & _tophalf_mask(h, w)).astype(src_rgb.dtype)[None]
    diff = jnp.abs(target_rgb * full - warped * full)
    return mean_on_mask(diff, full)


def depth_stereo_consistency_loss(src_depth, target_depth, src_mask,
                                  pose_target2src, intr, warp_impl="gather"):
    """Warp source depth into the target view and compare relative depth
    (loss_blocks.py:166-190). depths: [H, W], src_mask: [1, H, W]."""
    src_trans = transform_dmap(src_depth, jnp.linalg.inv(pose_target2src), intr)
    src_trans = (src_trans * src_mask[0])[None]      # [1, H, W]
    warped, valid = inverse_warp(src_trans, target_depth, pose_target2src,
                                 intr, mode="nearest", impl=warp_impl)
    warped = warped[0]
    h, w = target_depth.shape
    full = (valid & _tophalf_mask(h, w) & (warped > 0)).astype(src_depth.dtype)
    t = jnp.clip(target_depth * full, 1e-3, None)
    s = jnp.clip(warped * full, 1e-3, None)
    diff = jnp.clip(jnp.abs(t - s) / jnp.abs(t + s), 0.0, 1.0)
    return mean_on_mask(diff[None], full[None])


def depth_consistency_loss(large_dm, small_dm):
    """minpool(high-res depth) vs low-res depth, relative difference
    (loss_blocks.py:192-203). large_dm: [H, W]; small_dm: [h, w]."""
    down = minpool(large_dm[None], 4)[0]
    s = jnp.clip(small_dm, 1e-3, None)
    d = jnp.clip(down, 1e-3, None)
    diff = jnp.clip(jnp.abs(d - s) / jnp.abs(d + s), 0.0, 1.0)
    h, w = small_dm.shape
    return mean_on_mask(diff[None], _tophalf_mask(h, w).astype(diff.dtype)[None])


def edge_aware_smoothness_loss(depth, rgb):
    """Edge-weighted first-order smoothness (loss_blocks.py:73-112, single
    scale). depth: [H, W]; rgb: [3, H, W]."""
    def gx(t):
        return t[..., :-1, :] - t[..., 1:, :]

    def gy(t):
        return t[..., :, :-1] - t[..., :, 1:]

    wx = jnp.exp(-jnp.mean(jnp.abs(gx(rgb)), axis=0))
    wy = jnp.exp(-jnp.mean(jnp.abs(gy(rgb)), axis=0))
    sx = jnp.abs(gx(depth)) * wx
    sy = jnp.abs(gy(depth)) * wy
    return jnp.mean(sx) + jnp.mean(sy)


def ternary_loss(im, im_warp, max_distance: int = 1):
    """Census/ternary-transform distance (loss_blocks.py:8-44, after UnFlow).

    im/im_warp: [B, 3, H, W] RGB in [0, 1]. Returns [B, 1, H, W] distance,
    zeroed on the ``max_distance`` border.
    """
    k = 2 * max_distance + 1

    def grayscale(img):
        return (img[:, 0] * 0.2989 + img[:, 1] * 0.5870
                + img[:, 2] * 0.1140)[:, None] * 255.0

    def census(img):
        """[B, 1, H, W] -> [B, k*k, H, W] normalized neighborhood diffs."""
        g = grayscale(img)
        pad = jnp.pad(g, ((0, 0), (0, 0), (max_distance, max_distance),
                          (max_distance, max_distance)))
        h, w = g.shape[-2:]
        patches = jnp.concatenate(
            [pad[:, :, dy:dy + h, dx:dx + w]
             for dy in range(k) for dx in range(k)], axis=1)
        diff = patches - g
        return diff / jnp.sqrt(0.81 + diff * diff)

    d = (census(im) - census(im_warp)) ** 2
    dist = jnp.mean(d / (0.1 + d), axis=1, keepdims=True)

    b, _, h, w = im.shape
    inner = jnp.ones((b, 1, h - 2 * max_distance, w - 2 * max_distance),
                     im.dtype)
    mask = jnp.pad(inner, ((0, 0), (0, 0), (max_distance, max_distance),
                           (max_distance, max_distance)))
    return dist * mask


def ssim(x, y, md: int = 1):
    """SSIM distance map (loss_blocks.py:47-66). x/y: [C, H, W]."""
    k = 2 * md + 1
    c1, c2 = 0.01**2, 0.03**2

    def pool(t):
        win = jnp.ones((k, k), t.dtype) / (k * k)
        return jax.vmap(lambda ch: jax.scipy.signal.convolve2d(ch, win, mode="valid"))(t)

    mu_x, mu_y = pool(x), pool(y)
    sig_x = pool(x * x) - mu_x**2
    sig_y = pool(y * y) - mu_y**2
    sig_xy = pool(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sig_x + sig_y + c2)
    return jnp.clip((1 - num / den) / 2, 0, 1)
