"""Camera geometry: rays, back-projection, view synthesis, pose noise.

Reference parity (file:line cite the reference repo):
- ``pixel_to_ray_array``/``unit_ray_array_2d`` <- warping/view.py:16-62
- ``depth_to_pts``                             <- utils/img_utils.py:269-293
- ``intr_scale``/``intr_scale_unit``           <- utils/img_utils.py:255-267
- ``minpool``                                  <- utils/img_utils.py:245-253
- ``pixel2cam``/``cam2pixel``/``inverse_warp`` <- utils/inverse_warp.py:26-210
- ``transform_dmap``                           <- utils/inverse_warp.py:212-253
- ``add_noise_to_pose``                        <- utils/img_utils.py:724-753
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.ops.resample import (grid_sample, hwarp,
                                              static_row_resample)

# Geometry matmuls feed pixel coordinates: bf16 MXU precision (the TPU
# default) visibly corrupts warps, so they are pinned to float32.
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


# ---------------------------------------------------------------------------
# Rays & intrinsics


def pixel_to_ray_array(width: int, height: int, hfov: float = 60.0,
                       vfov: float = 45.0) -> np.ndarray:
    """[H, W, 3] unit-z rays from per-axis FOVs (host numpy, setup path)."""
    x = np.arange(width, dtype=np.float64)
    y = np.arange(height, dtype=np.float64)
    xv = math.tan(math.radians(hfov / 2.0)) * (2.0 * (x + 0.5) / width - 1.0)
    yv = math.tan(math.radians(vfov / 2.0)) * (2.0 * (y + 0.5) / height - 1.0)
    out = np.empty((height, width, 3), np.float64)
    out[..., 0] = xv[None, :]
    out[..., 1] = yv[:, None]
    out[..., 2] = 1.0
    return out


def unit_ray_array_2d(width: int, height: int, hfov: float, vfov: float) -> np.ndarray:
    """[3, H*W] matrix form consumed by the plane-sweep warp."""
    rays = pixel_to_ray_array(width, height, hfov, vfov)
    return rays.reshape((-1, 3)).T.astype(np.float32)


def fov_from_intrinsics(intr, width: int, height: int) -> tuple:
    """(hfov, vfov) degrees implied by a pinhole intrinsic matrix."""
    hfov = math.degrees(math.atan(width / 2.0 / float(intr[0, 0]))) * 2.0
    vfov = math.degrees(math.atan(height / 2.0 / float(intr[1, 1]))) * 2.0
    return hfov, vfov


def intr_scale(intr, raw_img_size, img_size):
    intr = np.array(intr, copy=True)
    intr[0, :] *= float(img_size[0]) / float(raw_img_size[0])
    intr[1, :] *= float(img_size[1]) / float(raw_img_size[1])
    return intr


def intr_scale_unit(intr, scale: float = 1.0):
    intr = np.array(intr, copy=True)
    intr[0, :] *= scale
    intr[1, :] *= scale
    return intr


# ---------------------------------------------------------------------------
# Back-projection


def depth_to_pts(depth, intr):
    """Back-project a depth map. depth: [H, W]; returns [3, H, W]."""
    h, w = depth.shape
    fx, cx = intr[0, 0], intr[0, 2]
    fy, cy = intr[1, 1], intr[1, 2]
    ys = (jnp.arange(h, dtype=depth.dtype) - cy) / fy
    xs = (jnp.arange(w, dtype=depth.dtype) - cx) / fx
    x = xs[None, :] * depth
    y = ys[:, None] * depth
    return jnp.stack([x, y, depth], axis=0)


def minpool(x, scale: int, default: float = 0.0):
    """Min-pool ([..., H, W]) by ``scale``; optional sentinel for zeros."""
    if default:
        x = jnp.where(x == 0, default, x)
    windows = x.reshape(x.shape[:-2] + (x.shape[-2] // scale, scale,
                                        x.shape[-1] // scale, scale))
    out = jnp.min(windows, axis=(-3, -1))
    if default:
        out = jnp.where(out == default, 0.0, out)
    return out


# ---------------------------------------------------------------------------
# View synthesis (stereo losses)


def pixel2cam(depth, intr_inv):
    """depth: [H, W] -> cam coords [3, H, W]."""
    h, w = depth.shape
    ones = jnp.ones((h, w), depth.dtype)
    jr = jnp.broadcast_to(jnp.arange(w, dtype=depth.dtype)[None, :], (h, w))
    ir = jnp.broadcast_to(jnp.arange(h, dtype=depth.dtype)[:, None], (h, w))
    pix = jnp.stack([jr, ir, ones], axis=0).reshape((3, -1))
    cam = _mm(intr_inv, pix).reshape((3, h, w))
    return cam * depth[None]


def cam2pixel(cam_coords, rot, tr):
    """cam coords [3, H, W] -> normalized pixel grid [H, W, 2] in [-1, 1]
    (align_corners=True convention, matching inverse_warp.py:65-66)."""
    _, h, w = cam_coords.shape
    p = _mm(rot, cam_coords.reshape((3, -1))) + tr
    z = jnp.clip(p[2], 1e-3, None)
    xn = 2.0 * (p[0] / z) / (w - 1) - 1.0
    yn = 2.0 * (p[1] / z) / (h - 1) - 1.0
    return jnp.stack([xn, yn], axis=-1).reshape((h, w, 2))


def inverse_warp(img, depth, pose, intr, mode: str = "bilinear",
                 impl: str = "gather"):
    """Warp ``img`` (source) into the target frame given target ``depth``.

    img: [C, H, W]; depth: [H, W]; pose: [4, 4] target->source; intr: [3, 3].
    Returns (warped [C, H, W], valid [H, W] bool).

    impl: 'gather' — general 2-D grid_sample (bit-parity with the torch
    oracle, any pose); 'hwarp' — rectified-rig fast path (y' == y) as a
    block-banded MXU matmul, ~17x faster at B=8 loss-warp shapes
    (ops/resample.py:hwarp). Identical outputs when the pose is pure-x
    translation (the synthetic rig exactly; KITTI rectified to calibration
    noise); out-of-band pixels (|disparity| > W//6) are folded into
    ``valid`` instead of sampled.
    """
    cam = pixel2cam(depth, jnp.linalg.inv(intr))
    proj = _mm(intr, pose[:3, :])
    grid = cam2pixel(cam, proj[:, :3], proj[:, 3:])
    if impl == "hwarp":
        img_v = static_row_resample(img, mode=mode, align_corners=False)
        warped, in_band = hwarp(img_v, grid[..., 0], mode=mode,
                                align_corners=False)
        valid = (jnp.max(jnp.abs(grid), axis=-1) <= 1.0) & in_band
        return warped, valid
    warped = grid_sample(img, grid, mode=mode, align_corners=False)
    valid = jnp.max(jnp.abs(grid), axis=-1) <= 1.0
    return warped, valid


def transform_dmap(depth, pose, intr):
    """Re-project a depth map's z through ``pose``. depth: [H, W] -> [H, W]."""
    d = jnp.clip(depth, 1e-3, None)
    pts = depth_to_pts(d, intr).reshape((3, -1))
    pts = jnp.concatenate([pts, jnp.ones((1, pts.shape[1]), d.dtype)], axis=0)
    tp = _mm(pose, pts)
    return tp[2].reshape(depth.shape)


# ---------------------------------------------------------------------------
# Pose noise (training augmentation)


def _quat_to_rot(q):
    """TUM [x, y, z, w] quaternion -> rotation matrix (jnp)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    s = 1.0 / (w * w + x * x + y * y + z * z)
    return jnp.array([
        [1 - 2 * s * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * s * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * s * (x * x + y * y)],
    ])


def _rot_to_unitq(r):
    """Rotation -> xyz unit-quaternion parameterization (assumes trace>-1
    branch, valid for the small inter-frame rotations this augments)."""
    qw = 0.5 * jnp.sqrt(jnp.clip(r[0, 0] + r[1, 1] + r[2, 2] + 1.0, 1e-12, None))
    s = 1.0 / (4.0 * qw)
    qx = s * (r[2, 1] - r[1, 2])
    qy = s * (r[0, 2] - r[2, 0])
    qz = s * (r[1, 0] - r[0, 1])
    alpha2 = (1.0 - qz) / (1.0 + qz)
    half = (alpha2 + 1.0) * 0.5
    return jnp.array([qw * half, qx * half, qy * half])


def _unitq_to_rot(uq):
    x, y, z = uq[0], uq[1], uq[2]
    a2 = x * x + y * y + z * z
    quat = jnp.array([2 * y / (a2 + 1), 2 * z / (a2 + 1),
                      (1 - a2) / (1 + a2), 2 * x / (a2 + 1)])
    return _quat_to_rot(quat)


def add_noise_to_pose(key, poses, noise_level: float = 0.2):
    """Gaussian pose noise: rotation in unit-quaternion space, translation in
    raw space, sigma proportional to each component's norm.

    poses: [B, V, 4, 4]; returns same shape.
    """
    def one(key, pose):
        kr, kt = jax.random.split(key)
        r = _rot_to_unitq(pose[:3, :3])
        t = pose[:3, 3]
        r = r + jax.random.normal(kr, r.shape) * (noise_level * jnp.linalg.norm(r))
        t = t + jax.random.normal(kt, t.shape) * (noise_level * jnp.linalg.norm(t))
        out = jnp.zeros((4, 4), pose.dtype)
        out = out.at[:3, :3].set(_unitq_to_rot(r))
        out = out.at[:3, 3].set(t)
        return out.at[3, 3].set(1.0)

    b, v = poses.shape[:2]
    keys = jax.random.split(key, b * v).reshape((b, v, 2))
    return jax.vmap(jax.vmap(one))(keys, poses)
