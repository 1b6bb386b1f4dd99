"""Real-sensor fusion path: sample recorded sweep intensities instead of the
simulator (reference models/models.py:839-978 ``lc_process_real``).

Given the static 128-plane sweep tensor (per-pixel intensity at 128 recorded
curtain depths) the "sensing" of an arbitrary planned curtain reduces to a
nearest-depth gather into the sweep planes — pure JAX, so the whole loop
stays jitted like the simulated path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from depthestimation_tpu.lc.curtain import LightCurtain
from depthestimation_tpu.ops.dpv import EPS, spread_dpv, upsample_dpv
from depthestimation_tpu.ops.ufield import UFieldParams, gen_ufield


def sample_sweep_intensity(curtain_z, feat_z, feat_int):
    """Nearest-z lookup into the recorded sweep (models.py:924-927).

    curtain_z: [H, W] planned curtain depth per pixel;
    feat_z/feat_int: [128, H, W] recorded plane depths/intensities.
    Returns [H, W] sampled intensity.
    """
    inds = jnp.argmin(jnp.abs(curtain_z[None] - feat_z), axis=0)   # [H, W]
    return jnp.take_along_axis(feat_int, inds[None], axis=0)[0]


def lc_process_real(bv_refined, sweep_z, sweep_int, intr_up,
                    algo_lc: LightCurtain, real_lc: LightCurtain,
                    uf_params: UFieldParams, iterations: int = 5,
                    planner: str = "default", params: Optional[dict] = None,
                    key: Optional[jax.Array] = None):
    """Batch plan->sample->fuse against recorded sweep tensors.

    bv_refined: [B, D, H, W] log DPV; sweep_z/sweep_int: [B, 128, H, W]
    (NaN z planes pre-replaced with 1000, models.py:852).
    """
    params = dict(params or {"step": [0.5], "spread_iter": 2, "spread_n": 5})
    bv_refined = jax.lax.stop_gradient(bv_refined)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, bv_refined.shape[0])
    fn = functools.partial(_item, algo_lc=algo_lc, real_lc=real_lc,
                           uf_params=uf_params, iterations=int(iterations),
                           planner=planner, params=params,
                           out_d=bv_refined.shape[1])
    return jax.vmap(fn)(bv_refined, sweep_z, sweep_int, intr_up, keys)


def _item(bv, sweep_z, sweep_int, intr_up, key, *, algo_lc, real_lc,
          uf_params, iterations, planner, params, out_d):
    d_candi = jnp.asarray(algo_lc.d_candi, jnp.float32)
    final = upsample_dpv(bv[None], algo_lc.expand_A, log=True)[0]
    sweep_z = jnp.where(jnp.isnan(sweep_z), 1000.0, sweep_z)

    dev = real_lc.lightcurtain_large

    def sense_one(path, k):
        # curtain geometry from the real device; intensity from the sweep
        zc = jnp.nan_to_num(dev.curtain_profile(path))       # [W_lc]
        h = sweep_z.shape[1]
        curtain_z = jnp.broadcast_to(zc[None, :], (h, zc.shape[0]))
        inten = sample_sweep_intensity(curtain_z, sweep_z, sweep_int)
        thick = jnp.nan_to_num(jnp.broadcast_to(
            dev.curtain_thickness(path)[None, :], curtain_z.shape))
        if real_lc.transform_needed:
            # LC frame -> RGB frame splat (models.py:929-930)
            xc = jnp.tan(dev._theta_rad)[None, :] * curtain_z
            yc = dev._yfac[:, None] * curtain_z
            out4 = jnp.stack([xc, yc, curtain_z, inten], axis=-1)
            sensed = real_lc.transform_measurement(out4, thick)
        else:
            sensed = jnp.stack([curtain_z, inten, thick])
        # measurement DPV via the true observation model (models.py:936)
        return real_lc.gen_lc_dpv_true(sensed, 2.0)

    def body(_, carry):
        final, key = carry
        key, k_plan, k_sense = jax.random.split(key, 3)
        uf, _ = gen_ufield(final, d_candi, intr_up, uf_params, log=True)
        if planner == "default":
            paths = algo_lc.plan_default(uf, algo_lc.planner_large,
                                         algo_lc.fw_large, "high", params)
        elif planner == "m1":
            paths = algo_lc.plan_m1(uf, algo_lc.planner_large,
                                    algo_lc.fw_large, "high", params, k_plan)
        else:
            paths = algo_lc.plan_sweep(uf, algo_lc.planner_large,
                                       algo_lc.fw_large, "high", params)
        sense_keys = jax.random.split(k_sense, paths.shape[0])
        dpvs = jax.vmap(sense_one)(paths, sense_keys)

        curr = jnp.clip(jnp.exp(final), EPS, 1.0)

        def fuse(p, c):
            m = jnp.clip(jnp.nan_to_num(dpvs[p]), EPS, 1.0)
            c = c * m
            return c / jnp.sum(c, axis=0, keepdims=True)

        curr = jax.lax.fori_loop(0, paths.shape[0], fuse, curr)

        def spread(_, c):
            return spread_dpv(c[None], int(params.get("spread_n", 5)))[0]

        curr = jax.lax.fori_loop(0, int(params.get("spread_iter", 0)),
                                 spread, curr)
        return jnp.log(jnp.clip(curr, EPS, 1.0)), key

    final, _ = jax.lax.fori_loop(0, iterations, body, (final, key))
    return upsample_dpv(final[None], out_d, log=True)[0]
