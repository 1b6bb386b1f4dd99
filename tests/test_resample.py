"""grid_sample parity vs torch (the reference's warp primitive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from depthestimation_tpu import ops


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(mode, align_corners):
    rng = np.random.default_rng(42)
    img = rng.standard_normal((3, 10, 14)).astype(np.float32)
    grid = (rng.random((7, 9, 2)).astype(np.float32) * 2.6 - 1.3)  # incl. OOB

    ours = np.asarray(ops.grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                      mode=mode, align_corners=align_corners))
    theirs = F.grid_sample(torch.tensor(img)[None], torch.tensor(grid)[None],
                           mode=mode, padding_mode="zeros",
                           align_corners=align_corners)[0].numpy()
    if mode == "nearest":
        # rounding of exact .5 ties may differ; compare where not on a tie
        close = np.isclose(ours, theirs, atol=1e-5)
        assert close.mean() > 0.99
    else:
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_bilinear_align_corners_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 5, 7)).astype(np.float32)
    ours = np.asarray(ops.resize_bilinear_align_corners(jnp.asarray(img), (10, 13)))
    theirs = F.interpolate(torch.tensor(img), size=(10, 13), mode="bilinear",
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_from_1x1_broadcasts():
    img = jnp.ones((1, 4, 1, 1)) * 3.0
    out = ops.resize_bilinear_align_corners(img, (8, 12))
    np.testing.assert_allclose(np.asarray(out), 3.0)


def test_shift_rows():
    img = jnp.arange(12.0).reshape(4, 3)
    down = np.asarray(ops.shift_rows(img, 2))
    assert np.all(down[:2] == 0)
    np.testing.assert_allclose(down[2:], np.asarray(img)[:2])
    up = np.asarray(ops.shift_rows(img, -1))
    assert np.all(up[-1] == 0)
    np.testing.assert_allclose(up[:-1], np.asarray(img)[1:])
