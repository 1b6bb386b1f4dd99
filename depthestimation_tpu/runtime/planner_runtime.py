"""Headless sense-plan-integrate runtime.

Rebuild of ``ros_all.Planner`` (reference ros/ros_all.py:93-477) without
ROS: a persistent log-space DPV fused with per-iteration curtain
measurements. The sim path is fully on-device (one jitted step); the real
path swaps the sensing stage for a host callback (``sense_fn``) to a serial
curtain driver — the same pipelined send/receive contract as
ros_all.py:330-384.

Also provides ``ReplayDriver``: feeds recorded/simulated depth+DPV frames
through the planner, replacing the ROS topic plumbing of ros_net/ros_all.
Sensor parameter JSONs (real_sensor.json etc.) load via
``config_from_sensor_json`` which mirrors process_lc_json/update_for_algo
(utils/img_utils.py:109-142).
"""

from __future__ import annotations

import copy
import json
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.lc.curtain import LightCurtain
from depthestimation_tpu.ops import dpv as dpv_ops
from depthestimation_tpu.ops.dpv import EPS
from depthestimation_tpu.ops.ufield import UFieldParams, gen_ufield


def process_lc_json(param: dict) -> dict:
    """Sensor JSON -> LC params (img_utils.py:109-126)."""
    param = copy.deepcopy(param)
    for k in ("intr_rgb", "intr_lc", "lTc", "rTc"):
        param[k] = np.array(param[k], np.float32)
    d = dpv_ops.powerf(param["s_range"], param["e_range"], param["N"],
                       param.get("q_power", 1.0))
    param.update({"d_candi": d, "d_candi_up": d, "r_candi": d,
                  "r_candi_up": d, "cTr": np.linalg.inv(param["rTc"]),
                  "expand_A": param["N"], "expand_B": param["N"],
                  "name": param.get("name", "sensor")})
    return param


def update_for_algo(param: dict) -> dict:
    """Rescale LC intrinsics to the RGB scale + crop top/bottom
    (img_utils.py:128-142)."""
    param = copy.deepcopy(param)
    lc_scale = float(param["size_rgb"][0]) / float(param["size_lc"][0])
    param["laser_timestep"] = 2.5e-5 / lc_scale
    intr = param["intr_lc"]
    param["intr_lc"] = np.array([
        [intr[0, 0] * lc_scale, 0, intr[0, 2] * lc_scale],
        [0, intr[1, 1] * lc_scale, intr[1, 2] * lc_scale],
        [0, 0, 1]], np.float32)
    param["size_lc"] = [int(512 * lc_scale), int(640 * lc_scale)]
    top_cut = bot_cut = 72
    param["size_lc"] = [param["size_lc"][0],
                        param["size_lc"][1] - top_cut - bot_cut]
    param["intr_lc"][1, 2] -= (top_cut / 2 + bot_cut / 2)
    return param


class PlannerRuntime:
    """Persistent recursive-Bayes planner over a curtain device."""

    def __init__(self, sensor_json: str | dict, mode: str = "sim",
                 planner: str = "default", params: Optional[dict] = None,
                 sense_fn: Optional[Callable] = None):
        raw = (json.load(open(sensor_json)) if isinstance(sensor_json, str)
               else sensor_json)
        self.real_param = process_lc_json(raw)
        self.algo_param = update_for_algo(self.real_param)
        self.mode = mode
        self.sense_fn = sense_fn  # real-device callback: path -> (out, thick)

        self.real_lc = LightCurtain()
        self.real_lc.init(copy.deepcopy(self.real_param))
        self.algo_lc = LightCurtain()
        self.algo_lc.init(copy.deepcopy(self.algo_param))

        self.uf_params = UFieldParams.from_sensor(
            raw.get("unc_shift", 1.0), raw.get("unc_span", 0.3),
            raw.get("unc_ang", 0)) if "unc_shift" in raw else UFieldParams(
            pshift=0, zstart=1.0, zend=1.3, maxd=100.0, mind=3.0, quash=True)

        self.planner = planner
        self.params = dict(params or {"step": [0.75], "std_div": 5.0})
        self.counter = 0
        self.unc_scores: list = []
        self.key = jax.random.PRNGKey(0)
        self.init_unc_field()

    # -- state -------------------------------------------------------------

    def init_unc_field(self):
        """Wide prior at 4 m (ros_all.py:165-167)."""
        h = self.real_param["size_rgb"][1]
        w = self.real_param["size_rgb"][0]
        init_depth = jnp.full((1, h, w), 4.0)
        dpv = dpv_ops.gen_dpv_withmask(init_depth,
                                       jnp.ones((1, 1, h, w)),
                                       self.algo_lc.d_candi, 10.0)
        self.final = jnp.log(dpv)
        self.counter = 0

    def integrate(self, dpvs):
        """Log-space Bayes update + early-frame spreading
        (ros_all.py:169-203)."""
        curr = jnp.clip(jnp.exp(self.final), EPS, 1.0)
        for dpv in dpvs:
            dpv = jnp.clip(dpv, EPS, 1.0)
            curr = curr * dpv
            curr = curr / jnp.sum(curr, axis=1, keepdims=True)
        if self.counter < 100:
            curr = dpv_ops.spread_dpv(curr, 3)
        self.final = jnp.log(jnp.clip(curr, EPS, 1.0))

    # -- one sense-plan-integrate round -------------------------------------

    def run(self, dpv_r=None, depth_r=None, iterations: int = 1):
        """dpv_r: optional [1, D, H, W] network log-DPV to integrate;
        depth_r: [H, W] true depth (sim sensing). Returns (final_depth,
        variance_mask) after the fused update (ros_all.py:221-477)."""
        self.counter += 1
        intr = jnp.asarray(self.real_param["intr_rgb"], jnp.float32)
        d_candi = jnp.asarray(self.algo_lc.d_candi, jnp.float32)

        if dpv_r is not None:
            up = dpv_ops.upsample_dpv(dpv_r, self.real_lc.expand_A, log=True)
            self.integrate([jnp.exp(up)])

        for _ in range(iterations):
            uf, _ = gen_ufield(self.final[0], d_candi, intr, self.uf_params,
                               log=True)
            self.key, k_plan, k_sense = jax.random.split(self.key, 3)
            if self.planner == "default":
                paths = self.algo_lc.plan_default(
                    uf, self.algo_lc.planner_large, self.algo_lc.fw_large,
                    "high", self.params)
            elif self.planner == "m1":
                paths = self.algo_lc.plan_m1(
                    uf, self.algo_lc.planner_large, self.algo_lc.fw_large,
                    "high", self.params, k_plan)
            elif self.planner == "sweep":
                paths = self.algo_lc.plan_sweep(
                    uf, self.algo_lc.planner_large, self.algo_lc.fw_large,
                    "high", self.params)
            else:  # empty: no sensing
                self._extract = None
                break

            lc_dpvs = []
            for p in range(paths.shape[0]):
                if self.mode == "real" and self.sense_fn is not None:
                    out_lc, thick_lc = self.sense_fn(np.asarray(paths[p]))
                    out_lc = np.nan_to_num(out_lc)
                    thick_lc = np.nan_to_num(thick_lc)
                else:
                    keys = jax.random.split(k_sense, paths.shape[0])
                    out_lc, thick_lc = self.real_lc.lightcurtain_large.\
                        get_return(self._depth_lc(depth_r), paths[p], True,
                                   key=keys[p])
                    out_lc = jnp.nan_to_num(out_lc)
                    thick_lc = jnp.nan_to_num(thick_lc)
                sensed = self.real_lc.transform_measurement(out_lc, thick_lc) \
                    if self.real_lc.transform_needed else jnp.stack(
                        [jnp.asarray(out_lc)[..., 2],
                         jnp.asarray(out_lc)[..., 3],
                         jnp.asarray(thick_lc)])
                lc_dpvs.append(self.real_lc.gen_lc_dpv_approx(
                    sensed, self.params.get("std_div", 5.0))[None])
            self.integrate(lc_dpvs)

        return self.extract_depth()

    def _depth_lc(self, depth_r):
        """RGB-frame depth -> LC-frame depth for the simulator."""
        depth_r = jnp.asarray(depth_r)
        if not self.real_lc.transform_needed:
            return depth_r
        from depthestimation_tpu.lc.transform import transform_points
        from depthestimation_tpu.ops.geometry import depth_to_pts
        pts = depth_to_pts(depth_r, jnp.asarray(self.real_param["intr_rgb"]))
        n = pts.shape[1] * pts.shape[2]
        pts4 = jnp.concatenate([pts.reshape(3, n), jnp.zeros((1, n))], 0).T
        d, _, _ = transform_points(pts4, jnp.ones((n,)),
                                   jnp.asarray(self.real_param["intr_lc"]),
                                   jnp.asarray(self.real_param["cTr"]),
                                   self.real_param["size_lc"][0],
                                   self.real_param["size_lc"][1])
        return d

    def extract_depth(self, var_thresh: float = 2.0):
        """Variance-masked expected depth (ros_all.py:445-455)."""
        z = jnp.exp(self.final[0])
        d = jnp.asarray(self.algo_lc.d_candi, z.dtype)[:, None, None]
        mean = jnp.sum(d * z, axis=0)
        var = jnp.sum(((d - mean) ** 2) * z, axis=0)
        mask = (var < var_thresh).astype(z.dtype)
        return mean * mask, mask

    def score(self, depth_truth):
        """UF error vs a GT depth map, appended to unc_scores
        (the ros/plots.py metric)."""
        from depthestimation_tpu.ops.ufield import compute_unc_rmse
        intr = jnp.asarray(self.real_param["intr_rgb"], jnp.float32)
        d_candi = jnp.asarray(self.algo_lc.d_candi, jnp.float32)
        mask = (jnp.asarray(depth_truth) > 0).astype(jnp.float32)
        dpv_t = dpv_ops.gen_dpv_withmask(jnp.asarray(depth_truth)[None],
                                         mask[None, None],
                                         self.algo_lc.d_candi, 0.3)
        uf_t, _ = gen_ufield(dpv_t[0], d_candi, intr, self.uf_params,
                             log=False)
        uf_p, _ = gen_ufield(self.final[0], d_candi, intr, self.uf_params,
                             log=True)
        s = float(compute_unc_rmse(uf_t, uf_p, d_candi))
        self.unc_scores.append(s)
        return s


class ReplayDriver:
    """Feed frames (depth + optional network DPV) through a PlannerRuntime —
    the ROS-free equivalent of the ros_all/ros_net topic loop."""

    def __init__(self, runtime: PlannerRuntime):
        self.runtime = runtime

    def play(self, frames, score: bool = True):
        """frames: iterable of dicts {"depth": [H, W], "dpv": optional}.
        Returns the per-frame UF scores (convergence curve)."""
        scores = []
        for frame in frames:
            self.runtime.run(frame.get("dpv"), frame["depth"])
            if score:
                scores.append(self.runtime.score(frame["depth"]))
        return scores
