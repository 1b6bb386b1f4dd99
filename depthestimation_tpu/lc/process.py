"""The recursive Bayes loop (``lc_process``) as one jitted program.

Reference: models/models.py:980-1129 — for each batch item, ``iterations``
rounds of (UF generation -> curtain planning -> curtain sensing -> Bayesian
DPV update -> motion-model spread). The reference crosses the CPU/GPU
boundary at every stage (fields to numpy for the C++ planner/simulator,
results back to tensors) — its main runtime bottleneck.

Here the entire loop is pure JAX: ``jit(vmap(...))`` over the batch, planner
DP as ``lax.scan``, simulator as vectorized math, so one XLA program covers
all iterations with zero host round-trips.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from depthestimation_tpu.lc.curtain import LightCurtain
from depthestimation_tpu.ops.dpv import EPS, spread_dpv, upsample_dpv
from depthestimation_tpu.ops.ufield import UFieldParams, gen_ufield


def lc_process(bv_refined, dmaps_up, intr_up, lc: LightCurtain,
               uf_params: UFieldParams, iterations: int = 5,
               planner: str = "default", params: Optional[dict] = None,
               key: Optional[jax.Array] = None, mode: str = "high"):
    """Run the plan->sense->fuse loop on a batch.

    Args:
      bv_refined: [B, D, H, W] log DPV (gradients are stopped, matching the
        reference's ``.detach()`` boundary).
      dmaps_up:   [B, H, W] true depth at the DPV resolution (simulator GT).
      intr_up:    [B, 3, 3].
      params:     {"step": [...], "spread_iter": int, "spread_n": int, ...}.

    Returns [B, D, H, W] log DPV fused with the curtain measurements.
    """
    params = dict(params or {"step": [0.5], "spread_iter": 2, "spread_n": 5})
    bv_refined = jax.lax.stop_gradient(bv_refined)
    d = bv_refined.shape[1]
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, bv_refined.shape[0])

    fn = functools.partial(_lc_process_item, lc=lc, uf_params=uf_params,
                           iterations=int(iterations), planner=planner,
                           params=params, out_d=d, mode=mode)
    return jax.vmap(fn)(bv_refined, dmaps_up, intr_up, keys)


def _lc_process_item(bv, dmap, intr_up, key, *, lc, uf_params, iterations,
                     planner, params, out_d, mode):
    d_candi = jnp.asarray(lc.d_candi, jnp.float32)
    final = upsample_dpv(bv[None], lc.expand_A, log=True)[0]

    if mode == "high":
        plan_default = lambda f: lc.plan_default(f, lc.planner_large,
                                                 lc.fw_large, "high", params)
        plan_m1 = lambda f, k: lc.plan_m1(f, lc.planner_large, lc.fw_large,
                                          "high", params, k)
        plan_sweep = lambda f: lc.plan_sweep(f, lc.planner_large, lc.fw_large,
                                             "high", params)
        sense = lc.sense_high
    else:
        plan_default = lambda f: lc.plan_default(f, lc.planner_small,
                                                 lc.fw_small, "low", params)
        plan_m1 = lambda f, k: lc.plan_m1(f, lc.planner_small, lc.fw_small,
                                          "low", params, k)
        plan_sweep = None
        sense = lc.sense_low

    def body(_, carry):
        # the carry stays in PROBABILITY space: the reference's per-
        # iteration final=log(curr) / curr=exp(final) round trip
        # (models.py:1107-1122) is an identity that costs two full
        # [A, H, W] HBM passes per iteration here
        curr, key = carry
        key, k_plan, k_sense = jax.random.split(key, 3)
        uf, _ = gen_ufield(curr, d_candi, intr_up, uf_params, log=False)

        if planner == "default":
            paths = plan_default(uf)
        elif planner == "m1":
            paths = plan_m1(uf, k_plan)
        elif planner == "sweep":
            paths = plan_sweep(uf)
        else:
            raise ValueError(f"unknown planner {planner!r}")

        sense_keys = jax.random.split(k_sense, paths.shape[0])
        lc_dpvs = jax.vmap(lambda p, k: sense(dmap, p, key=k))(paths,
                                                               sense_keys)

        # The reference renormalizes after every measurement
        # (models.py:1107-1112), but per-pixel normalization telescopes:
        # c·m0/s0·m1/s1···/sn == (c·∏m)/s. Fusing the product collapses
        # the loop's dominant HBM traffic (P+1 full [A, H, W] passes with
        # intermediate writes) into one fused read of the P measurement
        # volumes. Floor-clip the product — EPS^P underflows f32 where
        # every curtain missed, and the subsequent normalize would 0/0.
        m = jnp.prod(jnp.clip(jnp.nan_to_num(lc_dpvs), EPS, 1.0), axis=0)
        curr = curr * jnp.clip(m, 1e-30, 1.0)

        spread_iter = int(params.get("spread_iter", 0))
        if spread_iter:
            # iterated-kernel spread: all spread_iter applications in one
            # [A, H, W] pass (exact — see ops/dpv.spread_dpv). The spread
            # renormalizes, and a per-pixel scalar divides straight through
            # the linear box filter — so the usual post-fuse normalize is
            # skipped here (it would be a full extra read+write pass).
            curr = spread_dpv(curr[None], int(params.get("spread_n", 5)),
                              iters=spread_iter)[0]
        else:
            curr = curr / jnp.sum(curr, axis=0, keepdims=True)
        curr = jnp.clip(curr, EPS, 1.0)
        return curr, key

    # one compiled iteration body, looped on device; prob-space carry
    curr0 = jnp.clip(jnp.exp(final), EPS, 1.0)
    curr, _ = jax.lax.fori_loop(0, iterations, body, (curr0, key))
    return upsample_dpv(jnp.log(curr)[None], out_d, log=True)[0]
