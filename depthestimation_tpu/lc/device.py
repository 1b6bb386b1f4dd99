"""Light-curtain device simulator (pure JAX).

Re-derivation of the CMU ``lcsim`` ``LCDevice.get_return`` (the submodule is
not vendored in the reference; semantics reconstructed from call sites
lc/light_curtain.py:268-330, 741-926 and the observation-model math in
utils/img_utils.py:144-157):

A light curtain is a vertical ruled surface: a galvo-steered laser sheet
swept synchronously with a rolling-shutter NIR camera, one laser angle per
camera column. Imaging a scene with true depth z_gt(r, c):

  * the curtain intersects camera column c's ray at depth z_cur(c);
  * the sheet has finite thickness t(c) set by the laser beam width and the
    triangulation angle between the camera ray and the laser ray;
  * the received intensity falls off as a Gaussian in the depth error:
        I(r, c) = 255 * exp(-((z_gt - z_cur) / (t/4))^2)  (+ hit noise).
    t is the FULL overlap width of the laser sheet with the camera-pixel
    frustum, so a Gaussian fit to the intensity profile has sigma ~ t/4
    (zero at the +/- t/2 edges), not t/2 — using t/2 made off-curtain
    surfaces return dim-but-nonzero light over a ~2 sigma-thick shell,
    which feeds the planner false positive evidence (A > 0 in
    img_utils.mapping) for curtains metres from the surface.

``get_return`` mirrors the reference contract: returns
``output[H, W, 4] = (x, y, z, intensity)`` of the curtain point seen by each
pixel (NaN -> 0 handled by callers) and ``thickness[H, W]``.

Everything is static-shape JAX: the curtain profile is interpolated in
camera-angle space (single-valued curtains, which is what the planner
produces), so a batch of sensings jits into one program.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def camera_angles(intr, width: int) -> np.ndarray:
    """Per-column azimuth angle (degrees) of the camera rays.

    Equivalent of ``pylc.generateCameraAngles`` (lc/light_curtain.py:37-42)
    for zero distortion.
    """
    cols = np.arange(width, dtype=np.float64)
    return np.degrees(np.arctan2(cols - intr[0, 2], intr[0, 0]))


class LCDevice:
    """CAMERA_PARAMS: {width, height, matrix, distortion, hit_mode,
    hit_noise}; LASER_PARAMS: {lTc, fov, laser_timestep, (max_omega)} —
    the reference's constructor contract (lc/light_curtain.py:270-301)."""

    def __init__(self, CAMERA_PARAMS: dict, LASER_PARAMS: dict):
        self.width = int(CAMERA_PARAMS["width"])
        self.height = int(CAMERA_PARAMS["height"])
        self.intr = np.asarray(CAMERA_PARAMS["matrix"], np.float64)
        self.hit_noise = float(CAMERA_PARAMS.get("hit_noise", 0.0))
        self.hit_mode = int(CAMERA_PARAMS.get("hit_mode", 1))
        self.lTc = np.asarray(LASER_PARAMS["lTc"], np.float64)
        self.fov = float(LASER_PARAMS.get("fov", 80.0))
        self.laser_timestep = float(LASER_PARAMS.get("laser_timestep", 3.5e-5))
        # galvo spec: max angular velocity (deg/s); sets reachable curtains
        self.max_omega = float(LASER_PARAMS.get("max_omega", 25000.0))
        # optional galvo angular-acceleration limit (deg/s²). When set, the
        # planner runs the full (ray, range_prev, range) constraint graph
        # (planner.py:_dp_solve_accel); None keeps velocity-only planning.
        ma = LASER_PARAMS.get("max_alpha", None)
        self.max_alpha = None if ma is None else float(ma)
        # laser sheet geometry (beam waist + divergence, meters / rad)
        self.beam_width = float(LASER_PARAMS.get("beam_width", 0.01))
        self.beam_divergence = float(LASER_PARAMS.get("beam_divergence", 1.2e-3))
        # floor on the triangulation angle (caps thickness growth at range)
        self.sin_clip = float(LASER_PARAMS.get("sin_clip", 0.02))
        # intensity-falloff sigma as a fraction of curtain thickness; t is a
        # full width, so a Gaussian fit has sigma ~ t/4 (see module docstring)
        self.i_sigma_frac = float(LASER_PARAMS.get("i_sigma_frac", 0.25))

        self.thetas = camera_angles(self.intr, self.width)   # [W] degrees
        self._theta_rad = jnp.asarray(np.radians(self.thetas), jnp.float32)
        fy, cy = self.intr[1, 1], self.intr[1, 2]
        self._yfac = jnp.asarray((np.arange(self.height) - cy) / fy, jnp.float32)

    # -- curtain geometry --------------------------------------------------

    def curtain_profile(self, design_pts):
        """Per-column curtain depth z_cur [W] from design points [N, 2]=(x,z).

        Interpolates the design polyline in camera-angle space; columns
        outside the polyline's angular support get NaN.
        """
        x, z = design_pts[:, 0], design_pts[:, 1]
        ang = jnp.arctan2(x, z)                                  # [N]
        order = jnp.argsort(ang)
        ang_s, z_s = ang[order], z[order]
        zc = jnp.interp(self._theta_rad, ang_s, z_s,
                        left=jnp.nan, right=jnp.nan)
        return zc

    def curtain_thickness(self, design_pts):
        """Per-column curtain thickness [W] (meters along the camera ray).

        t = beam_width_at_range / |sin(angle between camera and laser rays)|
        — the standard triangulation-uncertainty geometry.
        """
        zc = self.curtain_profile(design_pts)
        xc = jnp.tan(self._theta_rad) * zc
        yc = jnp.zeros_like(zc)
        pts_c = jnp.stack([xc, yc, zc, jnp.ones_like(zc)], 0)   # [4, W]
        ltc = jnp.asarray(self.lTc, jnp.float32)
        pts_l = jnp.matmul(ltc, pts_c,
                           precision=jax.lax.Precision.HIGHEST)  # [4, W]
        r_l = jnp.sqrt(pts_l[0] ** 2 + pts_l[2] ** 2)
        laser_dir = jnp.stack([pts_l[0], pts_l[2]], 0) / (r_l + 1e-9)
        cam_dir = jnp.stack([jnp.sin(self._theta_rad),
                             jnp.cos(self._theta_rad)], 0)
        # rotate laser dir back into camera frame for the angle
        rot = ltc[:3, :3]
        lx = rot[0, 0] * laser_dir[0] + rot[2, 0] * laser_dir[1]
        lz = rot[0, 2] * laser_dir[0] + rot[2, 2] * laser_dir[1]
        sin_a = jnp.abs(cam_dir[0] * lz - cam_dir[1] * lx)
        width = self.beam_width + self.beam_divergence * r_l
        return width / jnp.clip(sin_a, self.sin_clip, None)

    # -- sensing -------------------------------------------------------------

    def get_return(self, depth_image, design_pts, want_thickness: bool = True,
                   key: Optional[jax.Array] = None):
        """Simulate one curtain. All-JAX; jit/vmap-compatible.

        depth_image: [H, W] true depth in the LC camera frame;
        design_pts:  [N, 2] (x, z) curtain control points in the camera frame.

        Returns (output [H, W, 4] = x, y, z, intensity; thickness [H, W]).
        NaN where the curtain does not cover a column (callers zero them,
        matching light_curtain.py:759-760).
        """
        depth_image = jnp.asarray(depth_image, jnp.float32)
        zc = self.curtain_profile(jnp.asarray(design_pts, jnp.float32))  # [W]
        thick = self.curtain_thickness(jnp.asarray(design_pts, jnp.float32))

        sigma = jnp.clip(thick * self.i_sigma_frac, 1e-6, None)  # [W]
        derr = depth_image - zc[None, :]
        inten = 255.0 * jnp.exp(-((derr / sigma[None, :]) ** 2))
        inten = jnp.where(depth_image > 0, inten, 0.0)
        if key is not None and self.hit_noise > 0:
            noise = 1.0 + self.hit_noise * jax.random.normal(key, inten.shape)
            inten = jnp.clip(inten * noise, 0.0, 255.0)

        xc = jnp.tan(self._theta_rad) * zc                        # [W]
        x = jnp.broadcast_to(xc[None, :], depth_image.shape)
        z = jnp.broadcast_to(zc[None, :], depth_image.shape)
        y = self._yfac[:, None] * z
        out = jnp.stack([x, y, z, inten], axis=-1)
        thickness = jnp.broadcast_to(thick[None, :], depth_image.shape)
        thickness = jnp.where(jnp.isnan(z), jnp.nan, thickness)
        return out, thickness
