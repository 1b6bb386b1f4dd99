#!/usr/bin/env python3
"""Honest timing of the fused sense-plan-refine loop (lc/process.py).

Production shape: 256x384 DPV, D=64 expanded to 128 bins, 5 Bayes
iterations of plan_default (1 + 2*len(step) curtains per iteration).
The reference runs this loop on the host, crossing the CPU/GPU boundary
per stage (SURVEY §3.3, models/models.py:980-1129); here it is one XLA
program. Readback-barrier timing (utils/timing.py) — block_until_ready
is not a reliable completion barrier on the tunneled runtime.

Run: python benchmarks/bench_lc_loop.py [--batches 1 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from depthestimation_tpu.utils.compile_cache import enable as _cc
_cc()

import jax
import jax.numpy as jnp
import numpy as np

H, W, D, D_UP = 256, 384, 64, 128


def make_lc():
    from depthestimation_tpu.lc.curtain import LightCurtain
    from depthestimation_tpu.ops import dpv as ops

    lc = LightCurtain()
    intr = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]],
                    np.float32)
    params = {
        "intr_rgb": intr, "dist_rgb": [0.0] * 5, "size_rgb": [W, H],
        "intr_lc": intr, "dist_lc": [0.0] * 5, "size_lc": [W, H],
        "rTc": np.eye(4, dtype=np.float32),
        "lTc": np.array([[1, 0, 0, 0.2], [0, 1, 0, 0], [0, 0, 1, 0],
                         [0, 0, 0, 1]], np.float32),
        "laser_fov": 80.0, "laser_timestep": 2e-4,
        # production synthetic path (trainer/default.py:_ensure_lc):
        # expand_A = ndepth (64 loop bins), expand_B = 2*ndepth
        "d_candi": ops.powerf(5.0, 40.0, D, 1.0),
        "r_candi": ops.powerf(5.0, 40.0, D, 1.0),
        "d_candi_up": ops.powerf(5.0, 40.0, D_UP, 1.0),
        "r_candi_up": ops.powerf(5.0, 40.0, D_UP, 1.0),
        "expand_A": D, "expand_B": D_UP, "name": "bench",
    }
    lc.init(params)
    return lc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--lc-iterations", type=int, default=5)
    args = ap.parse_args()

    from depthestimation_tpu.lc.process import lc_process
    from depthestimation_tpu.ops import dpv as ops
    from depthestimation_tpu.ops.ufield import UFieldParams
    from depthestimation_tpu.utils.timing import time_chain

    lc = make_lc()
    ufp = UFieldParams(pshift=0, zstart=-1e6, zend=1e6, maxd=1e6, mind=0.0,
                       quash=False)
    d_candi = np.asarray(lc.d_candi)
    results = []
    for b in args.batches:
        rs = np.random.RandomState(0)
        depth_gt = jnp.asarray(15.0 + 5.0 * rs.rand(b, H, W).astype("f4"))
        soft = np.asarray(ops.gen_soft_label(
            d_candi, 20.0 * np.ones((H, W), np.float32), 25.0))
        prior = jnp.asarray(
            np.broadcast_to(np.log(np.clip(soft, 1e-16, 1))[None],
                            (b, D, H, W)).copy())
        intr = jnp.asarray(np.broadcast_to(
            np.asarray(lc.PARAMS["intr_rgb"], np.float32), (b, 3, 3)).copy())

        @jax.jit
        def step(carry):
            prior, k = carry
            out = lc_process(prior, depth_gt, intr, lc, ufp,
                             iterations=args.lc_iterations,
                             planner="default",
                             params={"step": [0.5], "spread_iter": 2,
                                     "spread_n": 5}, key=k)
            # chain: feed a fraction of the fused DPV back so every
            # dispatch input differs (content-keyed execution dedupe)
            k2 = jax.random.fold_in(k, 1)
            return (prior + 1e-3 * out, k2)

        dt, _ = time_chain(step, (prior, jax.random.PRNGKey(0)), args.iters)
        results.append({"batch": b, "lc_loop_ms": round(dt * 1e3, 2),
                        "loops_per_sec": round(b / dt, 2)})
        print(json.dumps(results[-1]))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_lc_loop.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
