"""LightCurtain: planning + sensing orchestration.

Mirrors the reference ``LightCurtain`` class surface (lc/light_curtain.py:
255-1125): two simulated devices (full/quarter res), two planners, two field
warps; planners ``plan_default`` / ``plan_m1`` / ``plan_sweep`` /
``plan_empty`` (each in a ``_high``/``_low`` variant) and sensing
``sense_high`` / ``sense_low`` -> measurement DPV.

TPU-native differences:
- every plan/sense is a pure jittable function on device arrays; no numpy
  round-trips, no on-disk flow-field caches;
- plan_m1's B-spline densification is replaced by a soft Gaussian
  rasterization of the per-ray sampled curve (same role: a smooth
  attraction field through the samples);
- planners return a STATIC number of paths, so the whole Bayes loop jits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.lc.device import LCDevice
from depthestimation_tpu.lc.fieldwarp import FieldWarp
from depthestimation_tpu.lc.planner import PlannerRT
from depthestimation_tpu.lc.transform import transform_points
from depthestimation_tpu.ops.dpv import (
    EPS,
    gen_soft_label,
    gen_uniform,
    intensity_to_confidence,
    invert_curve,
    lc_intensities_to_dist,
    mixed_model,
    powerf,
)
from depthestimation_tpu.ops.geometry import depth_to_pts, intr_scale_unit


def _normalize_columns(field):
    mn = jnp.min(field, axis=0, keepdims=True)
    mx = jnp.max(field, axis=0, keepdims=True)
    return (field - mn) / (mx - mn)


def _fix_sides(field):
    field = field.at[:, 0].set(field[:, 1])
    return field.at[:, -1].set(field[:, -2])


def _nan_columns_to_back(field):
    """Columns containing NaN -> eps everywhere, 1 at the farthest bin
    (light_curtain.py:656-662)."""
    bad = jnp.any(jnp.isnan(field), axis=0)          # [W]
    back = jnp.full_like(field, EPS).at[-1, :].set(1.0)
    return jnp.where(bad[None, :], back, field)


def _mean_kernel_smooth(field, n: int = 5):
    """5-tap mean along the depth axis (create_mean_kernel,
    light_curtain.py:213-218)."""
    pad = n // 2
    padded = jnp.pad(field, ((pad, pad), (0, 0)))
    out = sum(padded[k:k + field.shape[0]] for k in range(n))
    return out / n


def _gaussian_blur_1d(x, sigma: float, axis: int, radius: int = 2):
    offs = np.arange(-radius, radius + 1)
    k = np.exp(-offs**2 / (2 * sigma**2))
    k = (k / k.sum()).astype(np.float32)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (radius, radius)
    xp = jnp.pad(x, pad)
    out = jnp.zeros_like(x)
    for i, w in enumerate(k):
        out = out + w * jax.lax.dynamic_slice_in_dim(xp, i, x.shape[axis], axis)
    return out


class LightCurtain:
    def __init__(self):
        self.initialized = False
        self.sensed_arr = None

    # -- setup (host side; mirrors light_curtain.py:268-373) --------------

    def init(self, PARAMS: dict):
        self.PARAMS = PARAMS
        size_lc = PARAMS["size_lc"]
        cam_large = {
            "width": size_lc[0], "height": size_lc[1],
            "matrix": PARAMS["intr_lc"], "distortion": PARAMS["dist_lc"],
            "hit_mode": 1, "hit_noise": 0.01,
        }
        cam_small = {
            "width": size_lc[0] // 4, "height": size_lc[1] // 4,
            "matrix": intr_scale_unit(PARAMS["intr_lc"], 0.25),
            "distortion": PARAMS["dist_lc"], "hit_mode": 1, "hit_noise": 0.01,
        }
        laser_large = {"lTc": PARAMS["lTc"], "fov": PARAMS["laser_fov"],
                       "laser_timestep": PARAMS["laser_timestep"]}
        for k in ("beam_width", "beam_divergence", "max_omega", "sin_clip",
                  "i_sigma_frac"):
            if k in PARAMS:
                laser_large[k] = PARAMS[k]
        laser_small = dict(laser_large, laser_timestep=PARAMS["laser_timestep"] * 4)

        PARAMS["intr_rgb_small"] = intr_scale_unit(PARAMS["intr_rgb"], 0.25)
        PARAMS["intr_lc_small"] = intr_scale_unit(PARAMS["intr_lc"], 0.25)
        PARAMS["size_rgb_small"] = (PARAMS["size_rgb"][0] // 4,
                                    PARAMS["size_rgb"][1] // 4)
        PARAMS["size_lc_small"] = (size_lc[0] // 4, size_lc[1] // 4)

        self.lightcurtain_large = LCDevice(cam_large, laser_large)
        self.lightcurtain_small = LCDevice(cam_small, laser_small)
        self.planner_large = PlannerRT(self.lightcurtain_large,
                                       PARAMS["r_candi_up"], size_lc[0])
        self.planner_small = PlannerRT(self.lightcurtain_small,
                                       PARAMS["r_candi_up"],
                                       PARAMS["size_lc_small"][0])
        dist = np.zeros((1, 5), np.float32)
        self.fw_large = FieldWarp(PARAMS["intr_rgb"], dist, PARAMS["size_rgb"],
                                  PARAMS["intr_lc"], dist, PARAMS["size_lc"],
                                  PARAMS["rTc"], PARAMS.get("name", "fw"))
        self.fw_small = FieldWarp(PARAMS["intr_rgb_small"], dist,
                                  PARAMS["size_rgb_small"],
                                  PARAMS["intr_lc_small"], dist,
                                  PARAMS["size_lc_small"], PARAMS["rTc"],
                                  PARAMS.get("name", "fw") + "_small")
        self.d_candi = np.asarray(PARAMS["d_candi"])
        self.r_candi = np.asarray(PARAMS["r_candi"])
        self.d_candi_up = np.asarray(PARAMS["d_candi_up"])
        self.r_candi_up = np.asarray(PARAMS["r_candi_up"])
        self.PARAMS["cTr"] = np.linalg.inv(PARAMS["rTc"])
        self.expand_A = PARAMS["expand_A"]
        self.expand_B = PARAMS["expand_B"]
        self.transform_needed = not (
            np.allclose(PARAMS["rTc"], np.eye(4))
            and tuple(PARAMS["size_rgb"]) == tuple(PARAMS["size_lc"]))
        # precompute warp grids eagerly (lazy build inside jit leaks tracers)
        names = ("z2r_in", "z2r_out", "transform") if self.transform_needed \
            else ("z2r_in", "z2r_out")
        self.fw_large.warm(self.d_candi_up, self.r_candi_up, names)
        self.fw_small.warm(self.d_candi_up, self.r_candi_up, names)
        self.initialized = True

    def expand_params(self, PARAMS, cfg, expand_A: int, expand_B: int,
                      add_name: str = ""):
        d = powerf(cfg.var.d_min, cfg.var.d_max, expand_A, cfg.var.qpower)
        d_up = powerf(cfg.var.d_min, cfg.var.d_max, expand_B, cfg.var.qpower)
        PARAMS.update({"d_candi": d, "r_candi": d, "d_candi_up": d_up,
                       "r_candi_up": d_up, "expand_A": expand_A,
                       "expand_B": expand_B,
                       "name": cfg.data.exp_name + add_name})
        return PARAMS

    def gen_params_from_model_input(self, model_input):
        intr_up = np.asarray(model_input["intrinsics_up"][0])
        h, w = model_input["rgb"].shape[3], model_input["rgb"].shape[4]
        return {
            "intr_rgb": intr_up, "dist_rgb": [0.0] * 5, "size_rgb": [w, h],
            "intr_lc": intr_up, "dist_lc": [0.0] * 5, "size_lc": [w, h],
            "rTc": np.eye(4, dtype=np.float32),
            "lTc": np.array([[1, 0, 0, 0.2], [0, 1, 0, 0],
                             [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
            "laser_fov": 80.0, "laser_timestep": 3.5e-5,
            "d_candi": np.asarray(model_input["d_candi"]),
            "r_candi": np.asarray(model_input["d_candi"]),
            "d_candi_up": np.asarray(model_input["d_candi_up"]),
            "r_candi_up": np.asarray(model_input["d_candi_up"]),
            "name": "default",
        }

    # -- shared field preparation (light_curtain.py:646-688) ---------------

    def _prepare_field(self, field, fw: FieldWarp, kw: str,
                       normalize: bool = True, force_back: bool = True):
        field = _fix_sides(field)
        if force_back:
            field = _nan_columns_to_back(field)
        field = fw.preprocess(field, self.d_candi, self.d_candi_up)
        field = _mean_kernel_smooth(field, 5)
        if self.transform_needed:
            field = fw.transformZTheta(field, self.d_candi_up, self.d_candi_up,
                                       "transform_" + kw)
        if normalize:
            field = _normalize_columns(field)
            field = jnp.nan_to_num(field, nan=EPS)
        field_range = fw.ztheta2zrange_output(field, self.d_candi_up,
                                              self.r_candi_up, "z2rwarp_" + kw)
        return field, field_range

    # -- planners ----------------------------------------------------------

    def plan_default(self, field, planner: PlannerRT, fw: FieldWarp, kw: str,
                     cfg: dict, yield_mode: bool = False):
        """Returns [1 + 2*len(step), C, 2] design points.

        ``yield_mode=True`` returns a generator producing one path at a time
        (each its own DP dispatch) so a real device can expose curtain i
        while path i+1 is being planned — the reference's streaming planner
        contract (light_curtain.py:376-394, ros_all.py:411)."""
        def fields_iter():
            field_z, field_range = self._prepare_field(field, fw, kw)
            fr = _fix_sides(field_range)
            yield fr

            # per-ray peak split (vectorized; reference loops: lines 696-703)
            idx = jnp.argmax(fr, axis=0)                          # [C]
            rows = jnp.arange(fr.shape[0])[:, None]
            left = jnp.where(rows < idx[None, :], 1.0, fr)
            right = jnp.where(rows >= idx[None, :], 1.0, fr)
            for pval in cfg["step"]:
                yield invert_curve(left, pval)
                yield invert_curve(right, pval)

        if yield_mode:
            return (planner.get_design_points(f) for f in fields_iter())
        # all fields are independent of each other's solves: batch the DP
        # into ONE vmapped scan (3x fewer sequential column loops on TPU)
        return jax.vmap(planner.solve_fn())(jnp.stack(list(fields_iter())))

    def plan_m1(self, field, planner: PlannerRT, fw: FieldWarp, kw: str,
                cfg: dict, key: jax.Array, yield_mode: bool = False):
        """Sampling planner: [1 + step, C, 2]."""
        def fields_iter():
            field_z, field_range = self._prepare_field(field, fw, kw,
                                                       normalize=False)
            fr = _fix_sides(field_range)
            yield fr

            r_bins, c_bins = fr.shape
            interval = int(cfg.get("interval", 1))
            # every iteration samples from and fuses with the ORIGINAL
            # field — the reference takes a fresh copy of
            # field_preprocessed_range inside its loop
            # (light_curtain.py:573-575), so its `step` curtains are
            # INDEPENDENT draws. Chaining the refined field instead (the
            # pre-round-4 form) correlates successive curtains around the
            # first sample and starves early high-entropy rounds of
            # exploration (m1 converged 2-3 iterations late in the
            # plots.py ablation).
            base = jnp.nan_to_num(fr, nan=1e-5)
            logits = jnp.log(jnp.clip(base.T, 1e-12, None))       # [C, R]
            rows = jnp.arange(r_bins, dtype=jnp.float32)[:, None]
            k = key
            for i in range(int(cfg["step"])):
                k, sub = jax.random.split(k)
                sampled = jax.random.categorical(sub, logits)     # [C]
                ctrl_cols = jnp.arange(0, c_bins, interval)
                curve = jnp.interp(jnp.arange(c_bins, dtype=jnp.float32),
                                   ctrl_cols.astype(jnp.float32),
                                   sampled[ctrl_cols].astype(jnp.float32))
                # Attraction field = the RASTERIZED interpolated curve,
                # Gaussian-blurred in 2D — the reference draws its fitted
                # B-spline into an empty field and blurs it with three
                # 5x5 sigma=1 cv2.GaussianBlur passes
                # (light_curtain.py:597-624). Rasterization makes the
                # attraction width ADAPTIVE: where consecutive samples
                # disagree (high-entropy rays) the steep segment lights
                # every row it crosses, so the fused field keeps broad
                # mass and the next solve keeps exploring — the fixed
                # sigma=1.5 Gaussian of the pre-r5 form starved exactly
                # those rays and lagged the reference 1.3-1.5x over
                # iterations 5-7 of the plots.py ablation.
                # Per column the segment spans the rows between the
                # entering/leaving midpoints; box x Gaussian = erf pair
                # (sigma = sqrt(3): three composed sigma=1 blurs).
                y_prev = jnp.concatenate([curve[:1], curve[:-1]])
                y_next = jnp.concatenate([curve[1:], curve[-1:]])
                y_in = 0.5 * (y_prev + curve)
                y_out = 0.5 * (curve + y_next)
                lo = jnp.minimum(jnp.minimum(y_in, y_out), curve)
                hi = jnp.maximum(jnp.maximum(y_in, y_out), curve)
                sig = float(cfg.get("sigma", np.sqrt(3.0)))
                s2 = sig * np.sqrt(2.0)
                attract = 0.5 * (jax.lax.erf((rows - lo[None, :] + 0.5) / s2)
                                 - jax.lax.erf((rows - hi[None, :] - 0.5)
                                               / s2))
                # the cv2 blur is 2D — mix neighbouring columns too
                attract = _gaussian_blur_1d(attract, sig, axis=1)
                attract = attract / jnp.sum(attract, axis=0, keepdims=True)
                mult = base * attract
                yield jnp.nan_to_num(mult / jnp.sum(mult, axis=0,
                                                    keepdims=True))

        if yield_mode:
            return (planner.get_design_points(f) for f in fields_iter())
        # the field refinement chain does not depend on the solves: batch
        # all DP solves into one vmapped scan
        return jax.vmap(planner.solve_fn())(jnp.stack(list(fields_iter())))

    def plan_sweep(self, field, planner, fw, kw: str, cfg: dict,
                   yield_mode: bool = False):
        """Flat curtains z = start : step : end; [n, 2000, 2].

        ``cfg["offset"]`` (default 0) shifts every curtain by a constant
        depth — the phased-sweep ablation advances it each round so a
        sparse sweep's union covers the volume over ``phases`` rounds
        (see runtime.planner_runtime.PlannerRuntime.run)."""
        zs = np.arange(cfg["start"], cfg["end"], cfg["step"]) \
            + float(cfg.get("offset", 0.0))
        xs = np.arange(-10.0, 10.0, 0.01, dtype=np.float32)
        paths = np.stack([np.stack([xs, np.full_like(xs, z)], -1) for z in zs])
        if yield_mode:
            return (jnp.asarray(p) for p in paths)
        return jnp.asarray(paths)

    def plan_empty(self, field, planner, fw, kw: str, cfg: dict):
        _, field_range = self._prepare_field(field, fw, kw)
        return _fix_sides(field_range)

    # public wrappers (reference naming)
    def plan_default_high(self, field, cfg):
        return self.plan_default(field, self.planner_large, self.fw_large,
                                 "high", cfg)

    def plan_default_low(self, field, cfg):
        return self.plan_default(field, self.planner_small, self.fw_small,
                                 "low", cfg)

    def plan_m1_high(self, field, cfg, key=None):
        return self.plan_m1(field, self.planner_large, self.fw_large, "high",
                            cfg, key if key is not None else jax.random.PRNGKey(0))

    def plan_m1_low(self, field, cfg, key=None):
        return self.plan_m1(field, self.planner_small, self.fw_small, "low",
                            cfg, key if key is not None else jax.random.PRNGKey(0))

    def plan_sweep_high(self, field, cfg):
        return self.plan_sweep(field, self.planner_large, self.fw_large,
                               "high", cfg)

    def plan_empty_high(self, field, cfg):
        return self.plan_empty(field, self.planner_large, self.fw_large,
                               "high", cfg)

    def plan_empty_low(self, field, cfg):
        return self.plan_empty(field, self.planner_small, self.fw_small,
                               "low", cfg)

    # -- sensing (light_curtain.py:741-926) ---------------------------------

    def _sense(self, device: LCDevice, intr_rgb, intr_lc, size_rgb, size_lc,
               depth_rgb, design_pts, key: Optional[jax.Array]):
        if self.transform_needed:
            pts_rgb = depth_to_pts(jnp.asarray(depth_rgb), intr_rgb)
            n = pts_rgb.shape[1] * pts_rgb.shape[2]
            pts4 = jnp.concatenate([pts_rgb.reshape(3, n),
                                    jnp.zeros((1, n))], 0).T
            depth_lc, _, _ = transform_points(
                pts4, jnp.ones((n,)), jnp.asarray(intr_lc),
                jnp.asarray(self.PARAMS["cTr"]), size_lc[0], size_lc[1])
        else:
            depth_lc = jnp.asarray(depth_rgb)

        out, thick = device.get_return(depth_lc, design_pts, True, key=key)
        out = jnp.nan_to_num(out)
        thick = jnp.nan_to_num(thick)

        if self.transform_needed:
            flat = out.reshape(-1, 4)
            depth_s, int_s, thick_s = transform_points(
                flat, thick.reshape(-1), jnp.asarray(intr_rgb),
                jnp.asarray(self.PARAMS["rTc"]), size_rgb[0], size_rgb[1])
        else:
            depth_s, int_s, thick_s = out[..., 2], out[..., 3], thick

        mask = (jnp.asarray(depth_rgb) > 0).astype(jnp.float32)
        return depth_s * mask, int_s * mask, thick_s * mask

    def sense_high(self, depth_rgb, design_pts, key=None):
        """-> measurement DPV [D, H, W] (+ sensed xyz-int for viz callers)."""
        depth_s, int_s, thick_s = self._sense(
            self.lightcurtain_large, jnp.asarray(self.PARAMS["intr_rgb"]),
            jnp.asarray(self.PARAMS["intr_lc"]), self.PARAMS["size_rgb"],
            self.PARAMS["size_lc"], depth_rgb, design_pts, key)
        return self._measurement_dpv(depth_s, int_s, thick_s)

    def sense_low(self, depth_rgb, design_pts, key=None):
        depth_s, int_s, thick_s = self._sense(
            self.lightcurtain_small, jnp.asarray(self.PARAMS["intr_rgb_small"]),
            jnp.asarray(self.PARAMS["intr_lc_small"]),
            self.PARAMS["size_rgb_small"], self.PARAMS["size_lc_small"],
            depth_rgb, design_pts, key)
        return self._measurement_dpv(depth_s, int_s, thick_s)

    def _measurement_dpv(self, depth_s, int_s, thick_s):
        """Approximate observation model (light_curtain.py:883-888)."""
        a = intensity_to_confidence(int_s / 255.0)
        unc = (thick_s / 10.0) ** 2
        return mixed_model(jnp.asarray(self.d_candi, jnp.float32), depth_s,
                           unc, a, 1.0 - a)

    # -- measurement-tensor paths (real/sweep data) -------------------------

    def transform_measurement(self, output_lc, thickness_lc):
        """(output [H, W, 4], thickness [H, W]) -> sensed_arr [3, H, W] in the
        RGB frame (light_curtain.py:1076-1089)."""
        flat = jnp.asarray(output_lc).reshape(-1, 4)
        d, i, t = transform_points(flat, jnp.asarray(thickness_lc).reshape(-1),
                                   jnp.asarray(self.PARAMS["intr_rgb"]),
                                   jnp.asarray(self.PARAMS["rTc"]),
                                   self.PARAMS["size_rgb"][0],
                                   self.PARAMS["size_rgb"][1])
        # pure (jit-safe): no state is retained on the object
        return jnp.stack([d, i, t])

    def gen_lc_dpv_approx(self, sensed_arr, std_div: float):
        depth_s = sensed_arr[0]
        mask = (depth_s > 0).astype(jnp.float32)
        int_s = sensed_arr[1] * mask
        thick_s = sensed_arr[2] * mask
        a = intensity_to_confidence(int_s / 255.0)
        unc = (thick_s / std_div) ** 2
        return mixed_model(jnp.asarray(self.d_candi, jnp.float32), depth_s,
                           unc, a, 1.0 - a)

    def gen_lc_dpv_true(self, sensed_arr, std_div: float, peak_img=None):
        depth_s = sensed_arr[0]
        mask = (depth_s > 0).astype(jnp.float32)
        int_s = sensed_arr[1] * mask
        thick_s = sensed_arr[2] * mask
        peak = (jnp.asarray(peak_img)[..., None] if peak_img is not None
                else jnp.full(depth_s.shape + (1,), 0.2))
        _, dpv = lc_intensities_to_dist(
            jnp.asarray(self.d_candi, jnp.float32), depth_s[..., None],
            (int_s / 255.0)[..., None], (thick_s / std_div)[..., None],
            0.1, peak)
        return jnp.moveaxis(dpv, -1, 0)
