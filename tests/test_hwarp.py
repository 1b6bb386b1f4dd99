"""hwarp (block-banded MXU stereo warp) vs the gather grid_sample oracle.

The stereo-consistency losses default to ``warp_impl='hwarp'``
(losses/base_loss.py) — valid exactly when the rig pose is pure-x
translation, the case for the synthetic rig and (to calibration noise)
rectified KITTI. These tests pin bit-parity with the general gather path
(reference semantics: torch F.grid_sample, losses/loss_blocks.py:133-190).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.losses import blocks
from depthestimation_tpu.ops.geometry import inverse_warp
from depthestimation_tpu.ops.resample import grid_sample, hwarp


def _hgrid(h, w, disp, rng):
    """Normalized align_corners=False grid with EXACT identity y rows and a
    smooth horizontal displacement (xn chosen so the grid_sample-internal
    unnormalization lands on the intended pixel coordinate)."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    xw = xx - disp * (0.5 + 0.5 * np.sin(xx / 17.0) * np.cos(yy / 13.0))
    xn = (2.0 * xw + 1.0) / w - 1.0
    yn = (2.0 * yy + 1.0) / h - 1.0
    return np.stack([xn, yn], axis=-1).astype(np.float32)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("w", [96, 384, 100])
def test_hwarp_matches_grid_sample(mode, w):
    rng = np.random.RandomState(3)
    h, c = 32, 3
    img = jnp.asarray(rng.randn(c, h, w).astype(np.float32))
    grid = jnp.asarray(_hgrid(h, w, disp=9.0, rng=rng))

    want = grid_sample(img, grid, mode=mode, align_corners=False)
    got, in_band = hwarp(img, grid[..., 0], mode=mode, align_corners=False)
    np.testing.assert_array_equal(np.asarray(in_band),
                                  np.ones((h, w), bool))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_hwarp_band_masks_large_disparity():
    rng = np.random.RandomState(0)
    h, w = 16, 96
    img = jnp.asarray(rng.randn(1, h, w).astype(np.float32))
    # uniform displacement beyond band (w//6 = 16)
    grid = jnp.asarray(_hgrid(h, w, disp=0.0, rng=rng))
    xn = grid[..., 0] - 2.0 * 40.0 / (w - 1)
    out, in_band = hwarp(img, xn, band=16)
    assert not bool(jnp.any(in_band[:, 41:]))
    # masked-out pixels read zero
    np.testing.assert_allclose(np.asarray(out)[0][~np.asarray(in_band)], 0.0)


def _stereo_setup(rng, h=32, w=96):
    intr = np.array([[0.58 * w, 0, 0.5 * w],
                     [0, 0.58 * w * 2, 0.5 * h],
                     [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = -0.3                                    # pure-x baseline
    depth = (4.0 + 10.0 * rng.rand(h, w)).astype(np.float32)
    img = rng.rand(3, h, w).astype(np.float32)
    return (jnp.asarray(img), jnp.asarray(depth), jnp.asarray(pose),
            jnp.asarray(intr))


def test_inverse_warp_hwarp_parity_pure_x_pose():
    rng = np.random.RandomState(7)
    img, depth, pose, intr = _stereo_setup(rng)
    w_g, v_g = inverse_warp(img, depth, pose, intr, impl="gather")
    w_h, v_h = inverse_warp(img, depth, pose, intr, impl="hwarp")
    np.testing.assert_array_equal(np.asarray(v_g), np.asarray(v_h))
    # f32 roundoff: the gather path's per-pixel y comes through
    # intr @ intr^-1 (~1e-6 off exact rows); the hwarp path uses exact rows
    np.testing.assert_allclose(np.asarray(w_h), np.asarray(w_g), atol=1e-4)


def test_stereo_loss_blocks_grad_parity():
    """Loss values AND depth-gradients agree between warp impls."""
    rng = np.random.RandomState(11)
    img, depth, pose, intr = _stereo_setup(rng)
    tgt_rgb = jnp.asarray(rng.rand(3, *depth.shape).astype(np.float32))

    def rsc(d, impl):
        return blocks.rgb_stereo_consistency_loss(img, tgt_rgb, d, pose,
                                                  intr, warp_impl=impl)

    vg, gg = jax.value_and_grad(rsc)(depth, "gather")
    vh, gh = jax.value_and_grad(rsc)(depth, "hwarp")
    np.testing.assert_allclose(float(vh), float(vg), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gg), atol=1e-4)

    src_d = (4.0 + 10.0 * rng.rand(*depth.shape)).astype(np.float32)
    mask = jnp.ones((1,) + depth.shape, jnp.float32)

    def dsc(d, impl):
        return blocks.depth_stereo_consistency_loss(jnp.asarray(src_d), d,
                                                    mask, pose, intr,
                                                    warp_impl=impl)

    # dsc warps with mode='nearest' whose row rounding sits exactly on a
    # floor boundary at the first/last row (y_eff + 0.5 integer there), so
    # f32 epsilon in the gather path's intr@intr^-1 roundtrip flips whole-
    # row taps — compare with a tolerance that absorbs one boundary row
    vg, gg = jax.value_and_grad(dsc)(depth, "gather")
    vh, gh = jax.value_and_grad(dsc)(depth, "hwarp")
    np.testing.assert_allclose(float(vh), float(vg), rtol=5e-3)
    interior = np.asarray(gh - gg)[1:-1]
    np.testing.assert_allclose(interior, 0.0, atol=1e-4)
