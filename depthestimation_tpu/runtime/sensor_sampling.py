"""Offline planner-ablation harness against static sweep data.

Rebuild of ros/real_sensor_sampling.py:120-497: arbitrary curtain
placements are emulated by nearest-z lookup into a recorded 128-plane sweep
tensor; ``iterate`` runs plan->sample->integrate->score rounds and returns
the UF-error convergence curve per planner — the experiment behind the
reference's ros/plots.py ablation numbers (see BASELINE.md).

``synthesize_sweep`` builds a physically-consistent synthetic sweep from a
GT depth map so the harness runs without the (unreleased) recorded dataset.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.lc.process_real import sample_sweep_intensity
from depthestimation_tpu.ops import dpv as dpv_ops
from depthestimation_tpu.ops.dpv import EPS
from depthestimation_tpu.ops.ufield import gen_ufield
from depthestimation_tpu.runtime.planner_runtime import PlannerRuntime


def synthesize_sweep(depth_gt, d_min: float, d_max: float, planes: int = 128,
                     sigma: float = 0.3):
    """GT depth [H, W] -> (sweep_z, sweep_int) [planes, H, W]: Gaussian
    intensity response around the true surface at each plane depth."""
    zs = np.linspace(d_min, d_max, planes, dtype=np.float32)
    sweep_z = np.broadcast_to(zs[:, None, None],
                              (planes,) + depth_gt.shape).copy()
    err = sweep_z - np.asarray(depth_gt, np.float32)[None]
    sweep_int = 255.0 * np.exp(-(err / sigma) ** 2)
    sweep_int = np.where(depth_gt[None] > 0, sweep_int, 0.0)
    return sweep_z, sweep_int.astype(np.float32)


class SensorSamplingHarness:
    """Plan->sample->integrate->score against a static sweep tensor."""

    def __init__(self, runtime: PlannerRuntime, sweep_z, sweep_int,
                 depth_truth):
        self.rt = runtime
        self.sweep_z = jnp.where(jnp.isnan(jnp.asarray(sweep_z)), 1000.0,
                                 jnp.asarray(sweep_z))
        self.sweep_int = jnp.asarray(sweep_int)
        self.depth_truth = np.asarray(depth_truth)

    def _sense(self, path):
        dev = self.rt.real_lc.lightcurtain_large
        zc = jnp.nan_to_num(dev.curtain_profile(path))
        h = self.sweep_z.shape[1]
        curtain_z = jnp.broadcast_to(zc[None, :], (h, zc.shape[0]))
        inten = sample_sweep_intensity(curtain_z, self.sweep_z, self.sweep_int)
        thick = jnp.nan_to_num(jnp.broadcast_to(
            dev.curtain_thickness(path)[None, :], curtain_z.shape))
        sensed = jnp.stack([curtain_z * (inten > 0), inten, thick])
        return self.rt.real_lc.gen_lc_dpv_approx(
            sensed, self.rt.params.get("std_div", 5.0))[None]

    def _round(self, final, key, spread):
        """One jitted plan->sample->integrate round (eager dispatch of the
        chain costs hundreds of host round-trips per iteration on the
        tunneled runtime — same fix as PlannerRuntime._sim_rounds)."""
        intr = jnp.asarray(self.rt.real_param["intr_rgb"], jnp.float32)
        d_candi = jnp.asarray(self.rt.algo_lc.d_candi, jnp.float32)
        uf, _ = gen_ufield(final[0], d_candi, intr, self.rt.uf_params,
                           log=True)
        if self.rt.planner == "default":
            paths = self.rt.algo_lc.plan_default(
                uf, self.rt.algo_lc.planner_large, self.rt.algo_lc.fw_large,
                "high", self.rt.params)
        elif self.rt.planner == "m1":
            paths = self.rt.algo_lc.plan_m1(
                uf, self.rt.algo_lc.planner_large, self.rt.algo_lc.fw_large,
                "high", self.rt.params, key)
        else:
            paths = self.rt.algo_lc.plan_sweep(
                uf, self.rt.algo_lc.planner_large, self.rt.algo_lc.fw_large,
                "high", self.rt.params)
        curr = jnp.clip(jnp.exp(final), EPS, 1.0)
        for p in range(paths.shape[0]):
            curr = curr * jnp.clip(self._sense(paths[p]), EPS, 1.0)
            curr = curr / jnp.sum(curr, axis=1, keepdims=True)
        curr = jnp.where(spread, dpv_ops.spread_dpv(curr, 3), curr)
        return jnp.log(jnp.clip(curr, EPS, 1.0))

    def iterate(self, iterations: int = 20) -> list:
        """Returns the UF-error convergence curve (the ros/plots.py metric:
        reference best configs reach ~1.3-1.9 m from ~10.8 m)."""
        if getattr(self, "_round_jit", None) is None:
            self._round_jit = jax.jit(self._round)
        scores = []
        for _ in range(iterations):
            self.rt.counter += 1
            self.rt.key, k = jax.random.split(self.rt.key)
            self.rt.final = self._round_jit(
                self.rt.final, k, jnp.asarray(self.rt.counter < 100))
            scores.append(self.rt.score(self.depth_truth))
        return scores
