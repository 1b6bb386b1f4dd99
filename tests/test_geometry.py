import jax.numpy as jnp
import numpy as np

from depthestimation_tpu import ops
from depthestimation_tpu.ops import geometry


def _intr(fx=50.0, fy=60.0, cx=16.0, cy=12.0):
    return jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)


def test_depth_to_pts_roundtrip():
    intr = _intr()
    depth = jnp.full((24, 32), 7.0)
    pts = ops.depth_to_pts(depth, intr)
    # reproject: u = fx * X/Z + cx should give back the pixel grid
    u = intr[0, 0] * pts[0] / pts[2] + intr[0, 2]
    v = intr[1, 1] * pts[1] / pts[2] + intr[1, 2]
    np.testing.assert_allclose(np.asarray(u), np.arange(32)[None].repeat(24, 0),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(v), np.arange(24)[:, None].repeat(32, 1),
                               atol=1e-4)


def test_unit_ray_consistency_with_fov():
    w, h = 32, 24
    hfov, vfov = 60.0, 45.0
    rays = geometry.unit_ray_array_2d(w, h, hfov, vfov)
    assert rays.shape == (3, w * h)
    assert np.all(rays[2] == 1.0)
    # edge pixel x ray ~ tan(hfov/2) scaled by pixel-center offset
    assert abs(rays[0].max() - np.tan(np.radians(30)) * (2 * (w - 0.5) / w - 1)) < 1e-5


def test_minpool():
    x = jnp.arange(16.0).reshape(1, 4, 4)
    out = ops.minpool(x, 2)
    np.testing.assert_allclose(np.asarray(out),
                               [[[0.0, 2.0], [8.0, 10.0]]])
    # sentinel for zeros
    x0 = x.at[0, 0, 0].set(0.0)
    out0 = ops.minpool(x0, 2, default=1000.0)
    assert out0[0, 0, 0] == 1.0  # skips the zero, takes next min


def test_inverse_warp_matches_torch_reference_semantics():
    """Oracle test: same math as the reference inverse_warp (align_corners=True
    coordinate construction sampled with torch's default align_corners=False —
    a quirk we reproduce faithfully, see utils/inverse_warp.py:65-66,206)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    img = rng.standard_normal((3, 16, 20)).astype(np.float32)
    depth = np.full((16, 20), 5.0, np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[0, 3] = 0.3  # small stereo-like baseline
    intr = np.asarray(_intr(cx=10.0, cy=8.0))

    warped, valid = ops.inverse_warp(jnp.asarray(img), jnp.asarray(depth),
                                     jnp.asarray(pose), jnp.asarray(intr))

    # torch oracle implementing the reference's formulas
    h, w = depth.shape
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    pix = np.stack([jj, ii, np.ones_like(jj)], 0).reshape(3, -1).astype(np.float32)
    cam = (np.linalg.inv(intr) @ pix) * depth.reshape(1, -1)
    proj = intr @ pose[:3, :]
    p = proj[:, :3] @ cam + proj[:, 3:]
    z = np.clip(p[2], 1e-3, None)
    xn = 2 * (p[0] / z) / (w - 1) - 1
    yn = 2 * (p[1] / z) / (h - 1) - 1
    grid = torch.tensor(np.stack([xn, yn], -1).reshape(1, h, w, 2))
    oracle = F.grid_sample(torch.tensor(img)[None], grid, mode="bilinear",
                           padding_mode="zeros", align_corners=False)[0].numpy()

    np.testing.assert_allclose(np.asarray(warped), oracle, atol=1e-4)
    # valid must match the oracle's |grid| <= 1 definition
    valid_oracle = np.max(np.abs(np.asarray(grid[0])), axis=-1) <= 1.0
    assert (np.asarray(valid) == valid_oracle).mean() > 0.98


def test_transform_dmap_translation():
    depth = jnp.full((8, 10), 5.0)
    pose = jnp.eye(4).at[2, 3].set(2.0)  # push 2m along z
    out = ops.transform_dmap(depth, pose, _intr(cx=5.0, cy=4.0))
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_add_noise_to_pose_shape_and_validity():
    import jax
    poses = jnp.tile(jnp.eye(4).at[0, 3].set(1.0)[None, None], (2, 3, 1, 1))
    noisy = geometry.add_noise_to_pose(jax.random.PRNGKey(0), poses, 0.05)
    assert noisy.shape == (2, 3, 4, 4)
    # rotations stay near-orthonormal
    r = np.asarray(noisy[0, 0, :3, :3])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=0.15)
    assert float(noisy[0, 0, 3, 3]) == 1.0
