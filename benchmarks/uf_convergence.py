#!/usr/bin/env python3
"""UF-RMSE convergence ablation: the ros/plots.py experiment, reproduced.

Replicates the reference's real-sensor convergence study (ros/ros_all.py
run loop + ros/plots.py recorded curves) against a synthetic basement scene:
the persistent log-DPV starts as a wide wrong prior at 4 m
(ros_all.py:165-167), each round plans curtains from the current uncertainty
field, senses them with the simulated device at full LC resolution
(ros_all.py:425), fuses the measurement DPVs multiplicatively with a
3-bin depth spread (ros_all.py:169-203), and scores the per-column UF depth
error in LC space against ground truth (ros_all.py:238-317).

Reference curves to match (BASELINE.md / ros/plots.py):
  default        10.8 -> ~1.9 m over ~20 rounds      (N=64,  step [0.75])
  default_128_3modes  10.9 -> ~1.3-1.7 m, <2 by ~5   (N=128, steps .25/.5/.75)
  m1             10.8 -> ~1.9 m (~8 iters to <2.1)   (N=64)
  sweep: monotone baseline

Run:  JAX_PLATFORMS=cpu python benchmarks/uf_convergence.py [--iters 20]
Writes benchmarks/uf_convergence_curves.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENSOR_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "configs", "sensors", "basement_sensor.json")

# plots.py reference values (first 20 iterations), for the comparison table
REF_DEFAULT = [10.805, 9.582, 10.032, 9.102, 7.320, 5.780, 5.828, 5.151,
               3.124, 3.379, 3.202, 3.058, 3.327, 2.829, 2.792, 2.587,
               2.227, 2.175, 2.027, 1.965]
REF_128_3MODES = [10.925, 7.080, 8.505, 2.754, 1.876, 1.329, 1.693, 1.675,
                  1.889, 1.699, 1.820, 1.694, 1.516, 1.816, 1.814, 1.642,
                  1.763, 1.908, 1.802, 1.720]
REF_M1 = [10.771, 11.568, 9.447, 8.158, 6.241, 3.200, 2.616, 2.082, 1.939,
          1.849, 1.904, 1.977, 1.896, 2.004, 1.888, 1.893, 1.866, 1.928,
          1.823, 1.982]


def make_basement_scene(intr, w: int, h: int, far_wall: float = 16.5,
                        side_x: float = 10.0, floor_y: float = 1.6):
    """Ray-cast a basement corridor: far wall, side walls, floor, ceiling,
    and a few crates at intermediate depths. Returns depth [h, w] (m).

    The scene is shaped so the sensor's y-band (unc_shift..+unc_span below
    the camera) lands on the far wall / crate faces — the same structure the
    reference's basement captures have.
    """
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    dx = (u - cx) / fx
    dy = (v - cy) / fy

    depth = np.full((h, w), far_wall, np.float64)

    # side walls at x = +/- side_x
    with np.errstate(divide="ignore"):
        z_side = np.where(np.abs(dx) > 1e-9, side_x / np.abs(dx), np.inf)
    depth = np.minimum(depth, z_side)

    # floor at y = +floor_y (below camera), ceiling at y = -1.0
    with np.errstate(divide="ignore"):
        z_floor = np.where(dy > 1e-9, floor_y / dy, np.inf)
        z_ceil = np.where(dy < -1e-9, -1.0 / dy, np.inf)
    depth = np.minimum(depth, np.minimum(z_floor, z_ceil))

    # crates: frontal faces (x0, x1, y0, y1, z) — narrow, so the truth field
    # is dominated by the far wall like the reference's basement captures
    crates = [(-1.2, -0.8, 0.6, 1.8, 8.0),
              (1.0, 1.4, 0.8, 1.8, 11.0)]
    for x0, x1, y0, y1, z in crates:
        px, py = dx * z, dy * z
        hit = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1) & (depth > z)
        depth = np.where(hit, z, depth)

    return depth.astype(np.float32)


def run_config(name: str, planner: str, params: dict, n_bins: int,
               iters: int, seed: int = 0, verbose: bool = True):
    import jax
    from depthestimation_tpu.utils.compile_cache import honor_jax_platforms_env
    honor_jax_platforms_env()  # make JAX_PLATFORMS=cpu actually stick
    from depthestimation_tpu.runtime.planner_runtime import PlannerRuntime

    raw = json.load(open(SENSOR_JSON))
    raw["N"] = n_bins
    # Curtain-sheet geometry calibrated so the simulated thickness matches
    # the magnitude the reference's observation model was built around
    # (inten_sigma ~ 1-3 m at range, notebooks/lc_model.ipynb sliders;
    # unc = (thickness/10)^2 at gen_lc_dpv, light_curtain.py:1100).
    raw.setdefault("beam_width", 0.025)
    raw.setdefault("beam_divergence", 3.0e-3)
    raw.setdefault("sin_clip", 0.02)
    rt = PlannerRuntime(raw, mode="sim", planner=planner, params=params)
    rt.key = jax.random.PRNGKey(seed)

    w, h = raw["size_rgb"]
    intr = np.array(raw["intr_rgb"], np.float32)
    depth = make_basement_scene(intr, w, h)

    scores = []
    for it in range(iters):
        # score BEFORE the round's update, like the reference loop
        # (ros_all.py:302-317 scores, then plans/senses/integrates)
        s = rt.score(depth)
        scores.append(round(s, 4))
        if verbose:
            print(f"  [{name}] iter {it + 1:2d}: UF error = {s:.3f} m",
                  flush=True)
        rt.run(None, depth)
    return scores


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--configs", nargs="*",
                    default=["default", "default_128_3modes", "m1", "sweep",
                             "sweep_sparse4"])
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "uf_convergence_curves.json"))
    args = ap.parse_args()

    runs = {
        # ros_all.py:259 — the planner configs behind the plots.py curves
        "default": ("default", {"step": [0.75], "std_div": 5.0}, 64),
        "default_128_3modes": ("default",
                               {"step": [0.25, 0.5, 0.75], "std_div": 5.0},
                               128),
        "m1": ("m1", {"step": 3, "interval": 15, "std_div": 3.0}, 64),
        "sweep": ("sweep", {"start": 4.0, "end": 17.0, "step": 0.25}, 64),
        # 4 curtains/round instead of 52: the full sweep saturates the whole
        # volume in ONE round (0.68 m after iter 1) and cannot detect a
        # sensing regression — the sparse variant needs several rounds, so
        # its curve actually exercises plan->sense->integrate over time.
        # phases=5 advances the flat set by step/5 each round (a FIXED
        # sparse set senses the same 4 depths forever and plateaus at
        # ~9.7 m — no convergence signal at all).
        "sweep_sparse4": ("sweep", {"start": 4.0, "end": 17.0, "step": 3.25,
                                    "phases": 5}, 64),
    }
    refs = {"default": REF_DEFAULT, "default_128_3modes": REF_128_3MODES,
            "m1": REF_M1}

    out = {}
    for name in args.configs:
        planner, params, bins = runs[name]
        print(f"== {name} (planner={planner}, N={bins}) ==", flush=True)
        out[name] = run_config(name, planner, params, bins, args.iters)
        if name in refs:
            out[name + "_reference"] = refs[name][:args.iters]

    json.dump(out, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")
    for name in args.configs:
        c = out[name]
        print(f"{name}: {c[0]:.2f} -> {min(c):.2f} m (final {c[-1]:.2f})")


if __name__ == "__main__":
    main()
