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
import hashlib
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
                 sense_fn: Optional[Callable] = None,
                 send_fn: Optional[Callable] = None,
                 recv_fn: Optional[Callable] = None):
        raw = (json.load(open(sensor_json)) if isinstance(sensor_json, str)
               else sensor_json)
        self.real_param = process_lc_json(raw)
        self.algo_param = update_for_algo(self.real_param)
        self.mode = mode
        self.sense_fn = sense_fn  # real-device callback: path -> (out, thick)
        # pipelined serial-device contract (lc_wrapper sendCurtain /
        # receiveCurtainAndProcess, ros_all.py:330-384): send_fn(path) starts
        # an exposure, recv_fn() blocks for its (output, thickness)
        self.send_fn = send_fn
        self.recv_fn = recv_fn

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
        variance_mask) after the fused update (ros_all.py:221-477).

        The sim path runs as ONE jitted step per (has_dpv, iterations)
        signature — calling the plan/sense/integrate chain eagerly walks
        hundreds of primitives through the host per round (the same
        disease fixed in trainer._run_lc). The real path stays host-driven
        (serial device I/O between stages)."""
        self.counter += 1
        if self.mode != "real" and self.planner != "empty":
            sig = (dpv_r is not None, int(iterations), self._sweep_offset())
            step = self._sim_steps.get(sig) if hasattr(self, "_sim_steps") \
                else None
            if step is None:
                if not hasattr(self, "_sim_steps"):
                    self._sim_steps = {}
                step = jax.jit(lambda final, key, spread, dpv, depth:
                               self._sim_rounds(final, key, spread, dpv,
                                                depth, sig[0], sig[1],
                                                sig[2]))
                self._sim_steps[sig] = step
            self.key, k = jax.random.split(self.key)
            self.final, depth, mask = step(
                self.final, k, jnp.asarray(self.counter < 100),
                dpv_r if dpv_r is not None else jnp.zeros((), jnp.float32),
                jnp.asarray(depth_r, jnp.float32))
            return depth, mask

        intr = jnp.asarray(self.real_param["intr_rgb"], jnp.float32)
        d_candi = jnp.asarray(self.algo_lc.d_candi, jnp.float32)

        if dpv_r is not None:
            up = dpv_ops.upsample_dpv(dpv_r, self.real_lc.expand_A, log=True)
            self.integrate([jnp.exp(up)])

        for _ in range(iterations):
            uf, _ = gen_ufield(self.final[0], d_candi, intr, self.uf_params,
                               log=True)
            self.key, k_plan, k_sense = jax.random.split(self.key, 3)
            stream = self.mode == "real"
            if self.planner == "default":
                paths = self.algo_lc.plan_default(
                    uf, self.algo_lc.planner_large, self.algo_lc.fw_large,
                    "high", self.params, yield_mode=stream)
            elif self.planner == "m1":
                paths = self.algo_lc.plan_m1(
                    uf, self.algo_lc.planner_large, self.algo_lc.fw_large,
                    "high", self.params, k_plan, yield_mode=stream)
            elif self.planner == "sweep":
                paths = self.algo_lc.plan_sweep(
                    uf, self.algo_lc.planner_large, self.algo_lc.fw_large,
                    "high", {**self.params, "offset": self._sweep_offset()},
                    yield_mode=stream)
            else:  # empty: no sensing
                self._extract = None
                break

            if stream:
                lc_dpvs = self._sense_real_pipelined(paths)
            else:
                lc_dpvs = self._sense_sim(depth_r, paths, k_sense)
            self.integrate(lc_dpvs)

        return self.extract_depth()

    def _sense_sim(self, depth_r, paths, k_sense):
        keys = jax.random.split(k_sense, paths.shape[0])
        depth_lc = self._depth_lc(depth_r)
        lc_dpvs = []
        for p in range(paths.shape[0]):
            out_lc, thick_lc = self.real_lc.lightcurtain_large.get_return(
                depth_lc, paths[p], True, key=keys[p])
            lc_dpvs.append(self._measurement_dpv(
                jnp.nan_to_num(out_lc), jnp.nan_to_num(thick_lc),
                # Sim sensing uses std_div=10 regardless of planner
                # params (ros_all.py:438).
                self.params.get("sim_std_div", 10.0)))
        return lc_dpvs

    def _sweep_offset(self) -> float:
        """Phased-sweep ablation: with ``params["phases"] = k`` the flat
        sweep advances by step/k each round, so the union of k consecutive
        rounds covers the volume at step/k resolution. A sparse sweep then
        needs ~k rounds to converge — giving an informative convergence
        curve, unlike the one-shot 52-curtain full sweep (0.68 m after a
        single round) that cannot surface a sensing regression."""
        if self.planner != "sweep":
            return 0.0
        k = int(self.params.get("phases", 0))
        if k <= 1:
            return 0.0
        return ((self.counter - 1) % k) * float(self.params["step"]) / k

    def _sim_rounds(self, final, key, spread, dpv_r, depth_r,
                    has_dpv: bool, iterations: int,
                    sweep_offset: float = 0.0):
        """Pure jittable body of ``run``'s sim path: (final, key) ->
        (final', depth, mask). ``spread`` is the traced counter<=100 flag
        (early-frame spreading, ros_all.py:199-201)."""
        intr = jnp.asarray(self.real_param["intr_rgb"], jnp.float32)
        d_candi = jnp.asarray(self.algo_lc.d_candi, jnp.float32)

        def integrate(final, dpvs):
            curr = jnp.clip(jnp.exp(final), EPS, 1.0)
            for dpv in dpvs:
                curr = curr * jnp.clip(dpv, EPS, 1.0)
                curr = curr / jnp.sum(curr, axis=1, keepdims=True)
            curr = jnp.where(spread, dpv_ops.spread_dpv(curr, 3), curr)
            return jnp.log(jnp.clip(curr, EPS, 1.0))

        if has_dpv:
            up = dpv_ops.upsample_dpv(dpv_r, self.real_lc.expand_A, log=True)
            final = integrate(final, [jnp.exp(up)])

        for _ in range(iterations):
            uf, _ = gen_ufield(final[0], d_candi, intr, self.uf_params,
                               log=True)
            key, k_plan, k_sense = jax.random.split(key, 3)
            if self.planner == "default":
                paths = self.algo_lc.plan_default(
                    uf, self.algo_lc.planner_large, self.algo_lc.fw_large,
                    "high", self.params)
            elif self.planner == "m1":
                paths = self.algo_lc.plan_m1(
                    uf, self.algo_lc.planner_large, self.algo_lc.fw_large,
                    "high", self.params, k_plan)
            else:
                paths = self.algo_lc.plan_sweep(
                    uf, self.algo_lc.planner_large, self.algo_lc.fw_large,
                    "high", {**self.params, "offset": sweep_offset})
            final = integrate(final, self._sense_sim(depth_r, paths,
                                                     k_sense))

        z = jnp.exp(final[0])
        d = jnp.asarray(self.algo_lc.d_candi, z.dtype)[:, None, None]
        mean = jnp.sum(d * z, axis=0)
        var = jnp.sum(((d - mean) ** 2) * z, axis=0)
        mask = (var < 2.0).astype(z.dtype)
        return final, mean * mask, mask

    def _measurement_dpv(self, out_lc, thick_lc, std_div):
        sensed = self.real_lc.transform_measurement(out_lc, thick_lc) \
            if self.real_lc.transform_needed else jnp.stack(
                [jnp.asarray(out_lc)[..., 2],
                 jnp.asarray(out_lc)[..., 3],
                 jnp.asarray(thick_lc)])
        return self.real_lc.gen_lc_dpv_approx(sensed, std_div)[None]

    def _sense_real_pipelined(self, path_gen):
        """Overlapped serial-device loop (ros_all.py:330-404): curtain i+1 is
        sent to the device BEFORE measurement i is transformed/converted, so
        host processing hides behind the device's exposure latency. Plans are
        consumed from a generator, so path i+1 is also planned while the
        device exposes curtain i.

        Uses (send_fn, recv_fn) when provided; falls back to the combined
        ``sense_fn`` (send+wait) with plan/processing overlap only."""
        std_div = self.params.get("std_div", 5.0)
        send = self.send_fn or (lambda p: None)
        recv = self.recv_fn

        lc_dpvs = []
        if self.send_fn is not None and recv is not None:
            it = iter(path_gen)
            path = next(it, None)
            prev = None
            while path is not None:
                send(np.asarray(path))            # device exposing curtain i
                nxt = next(it, None)              # plan i+1 during exposure
                if prev is not None:              # process i-1 during exposure
                    lc_dpvs.append(self._measurement_dpv(*prev, std_div))
                out, thick = recv()               # block for curtain i
                prev = (np.nan_to_num(out), np.nan_to_num(thick))
                path = nxt
            if prev is not None:
                lc_dpvs.append(self._measurement_dpv(*prev, std_div))
            return lc_dpvs

        assert self.sense_fn is not None, \
            "real mode needs sense_fn or (send_fn, recv_fn)"
        prev = None
        for path in path_gen:
            out, thick = self.sense_fn(np.asarray(path))
            if prev is not None:
                lc_dpvs.append(self._measurement_dpv(*prev, std_div))
            prev = (np.nan_to_num(out), np.nan_to_num(thick))
        if prev is not None:
            lc_dpvs.append(self._measurement_dpv(*prev, std_div))
        return lc_dpvs

    def _depth_lc(self, depth_r, pool_val: int = 4):
        """RGB-frame depth -> LC-frame depth for the simulator, hole-filled by
        minpool + nearest upsample (ros_all.py:205-220)."""
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
        # minpool(4, default=1000) + nearest x4: fills z-buffer holes
        h, w = d.shape
        hp, wp = h - h % pool_val, w - w % pool_val
        dc = jnp.where(d[:hp, :wp] == 0, 1000.0, d[:hp, :wp])
        small = dc.reshape(hp // pool_val, pool_val,
                           wp // pool_val, pool_val).min(axis=(1, 3))
        small = jnp.where(small == 1000.0, 0.0, small)
        filled = jnp.repeat(jnp.repeat(small, pool_val, 0), pool_val, 1)
        return jnp.pad(filled, ((0, h - hp), (0, w - wp)))

    def extract_depth(self, var_thresh: float = 2.0):
        """Variance-masked expected depth (ros_all.py:445-455)."""
        z = jnp.exp(self.final[0])
        d = jnp.asarray(self.algo_lc.d_candi, z.dtype)[:, None, None]
        mean = jnp.sum(d * z, axis=0)
        var = jnp.sum(((d - mean) ** 2) * z, axis=0)
        mask = (var < var_thresh).astype(z.dtype)
        return mean * mask, mask

    def _to_lc_field(self, uf_rgb):
        """RGB-frame z-theta field -> LC-frame (preprocess + transformZTheta),
        the 'score in LC space as it is zoomed in' step (ros_all.py:244-245,
        313-314)."""
        fw = self.algo_lc.fw_large
        f = fw.preprocess(uf_rgb, self.algo_lc.d_candi, self.algo_lc.d_candi_up)
        return fw.transformZTheta(f, self.algo_lc.d_candi_up,
                                  self.algo_lc.d_candi_up, "transform_large")

    def truth_uf_lc(self, depth_truth, edge_cut: int = 50):
        """Ground-truth UF in LC space with NaN'd edge columns
        (ros_all.py:238-247)."""
        intr = jnp.asarray(self.real_param["intr_rgb"], jnp.float32)
        d_candi = jnp.asarray(self.algo_lc.d_candi, jnp.float32)
        depth_truth = jnp.asarray(depth_truth, jnp.float32)
        mask = (depth_truth > 0).astype(jnp.float32)
        dpv_t = dpv_ops.gen_dpv_withmask(depth_truth[None], mask[None, None],
                                         self.algo_lc.d_candi, 0.3)
        uf_t, _ = gen_ufield(dpv_t[0], d_candi, intr, self.uf_params,
                             log=False, mask=mask)
        uf_t = self._to_lc_field(uf_t)
        uf_t = uf_t.at[:, 0:edge_cut].set(jnp.nan)
        uf_t = uf_t.at[:, -edge_cut:-1].set(jnp.nan)
        return uf_t

    def score(self, depth_truth):
        """UF error vs a GT depth map, appended to unc_scores (the
        ros/plots.py metric). Scored in LC space when the sensor has a real
        RGB<->LC transform (ros_all.py:313-317), else in the RGB frame."""
        from depthestimation_tpu.ops.ufield import compute_unc_rmse
        intr = jnp.asarray(self.real_param["intr_rgb"], jnp.float32)
        d_candi = jnp.asarray(self.algo_lc.d_candi, jnp.float32)
        uf_p, _ = gen_ufield(self.final[0], d_candi, intr, self.uf_params,
                             log=True)
        if self.real_lc.transform_needed:
            # Cache the (expensive) truth-field warp keyed on CONTENT, not
            # id(): CPython reuses freed addresses, so an id() key can hand a
            # new frame the previous frame's cached truth field.
            arr = np.ascontiguousarray(np.asarray(depth_truth))
            key = (arr.shape, hashlib.blake2b(arr.tobytes(),
                                              digest_size=16).digest())
            if getattr(self, "_truth_key", None) != key:
                self._truth_lc = self.truth_uf_lc(depth_truth)
                self._truth_key = key
            uf_p = self._to_lc_field(uf_p)
            s = float(compute_unc_rmse(self._truth_lc, uf_p, d_candi))
        else:
            depth_truth = jnp.asarray(depth_truth, jnp.float32)
            mask = (depth_truth > 0).astype(jnp.float32)
            dpv_t = dpv_ops.gen_dpv_withmask(depth_truth[None],
                                             mask[None, None],
                                             self.algo_lc.d_candi, 0.3)
            uf_t, _ = gen_ufield(dpv_t[0], d_candi, intr, self.uf_params,
                                 log=False)
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
