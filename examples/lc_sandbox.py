#!/usr/bin/env python3
"""Algorithm sandbox: run the plan->sense->Bayes loop offline on a toy scene
and print/plot the UF-error convergence curve.

Equivalent of the reference's snippet.py (the harness used to develop the
update rule) — but fully on-device and headless. Run:

    JAX_PLATFORMS=cpu python examples/lc_sandbox.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from depthestimation_tpu import ops
from depthestimation_tpu.lc import LightCurtain
from depthestimation_tpu.lc.process import lc_process
from depthestimation_tpu.ops.ufield import UFieldParams

W, H, D = 96, 64, 32


def main():
    intr = np.array([[0.8 * W, 0, W / 2], [0, 0.8 * W, H / 2], [0, 0, 1]],
                    np.float32)
    lc = LightCurtain()
    d = ops.powerf(3.0, 30.0, D, 1.0)
    d_up = ops.powerf(3.0, 30.0, 2 * D, 1.0)
    lc.init({
        "intr_rgb": intr, "dist_rgb": [0] * 5, "size_rgb": [W, H],
        "intr_lc": intr, "dist_lc": [0] * 5, "size_lc": [W, H],
        "rTc": np.eye(4, dtype=np.float32),
        "lTc": np.array([[1, 0, 0, 0.2], [0, 1, 0, 0], [0, 0, 1, 0],
                         [0, 0, 0, 1]], np.float32),
        "laser_fov": 80.0, "laser_timestep": 1.5e-4,
        "d_candi": d, "r_candi": d, "d_candi_up": d_up, "r_candi_up": d_up,
        "expand_A": D, "expand_B": 2 * D, "name": "sandbox",
    })

    # toy scene: slanted wall 8..22 m
    xs = np.linspace(8.0, 22.0, W, dtype=np.float32)
    depth_gt = np.tile(xs[None, :], (H, 1))

    # weak wrong prior at 25 m
    soft = np.asarray(ops.gen_soft_label(d, np.full((H, W), 25.0, np.float32),
                                         36.0))
    prior = np.log(np.clip(soft, 1e-16, 1))[None]
    ufp = UFieldParams(pshift=0, zstart=-1e6, zend=1e6, maxd=1e6, mind=0.0,
                       quash=False)

    final = jnp.asarray(prior)
    for it in range(6):
        final = lc_process(final, jnp.asarray(depth_gt)[None],
                           jnp.asarray(intr)[None], lc, ufp, iterations=1,
                           planner="default",
                           params={"step": [0.25, 0.5, 0.75],
                                   "spread_iter": 1, "spread_n": 3},
                           key=jax.random.PRNGKey(it))
        dm = np.asarray(ops.dpv_to_depthmap(final, d, log=True))[0]
        err = np.abs(dm - depth_gt).mean()
        print(f"iteration {it + 1}: mean depth error = {err:.3f} m")


if __name__ == "__main__":
    main()
