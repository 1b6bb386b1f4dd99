#!/usr/bin/env python3
"""Diagnose the default_128_3modes convergence gap (VERDICT r3 item 3).

Instruments the sense->measure->integrate chain of the uf_convergence
harness per iteration: curtain hit coverage, sensed intensity/confidence
(A), measurement variance vs bin spacing, and the fused DPV's per-column
entropy — to localize where sharpness is lost relative to the reference's
recorded curve (ros/plots.py:36-37).

Run:  JAX_PLATFORMS=cpu python benchmarks/diag_128modes.py [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.uf_convergence import SENSOR_JSON, make_basement_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bins", type=int, default=128)
    ap.add_argument("--steps", type=float, nargs="*", default=[0.25, 0.5, 0.75])
    ap.add_argument("--sim-std-div", type=float, default=10.0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from depthestimation_tpu.runtime import planner_runtime as prt  # noqa: E402

    raw = json.load(open(SENSOR_JSON))
    raw["N"] = args.bins
    raw.setdefault("beam_width", 0.025)
    raw.setdefault("beam_divergence", 3.0e-3)
    raw.setdefault("sin_clip", 0.02)
    rt = prt.PlannerRuntime(raw, mode="sim", planner="default",
                            params={"step": list(args.steps),
                                    "std_div": 5.0,
                                    "sim_std_div": args.sim_std_div})
    rt.key = jax.random.PRNGKey(0)

    w, h = raw["size_rgb"]
    intr = np.array(raw["intr_rgb"], np.float32)
    depth = make_basement_scene(intr, w, h)
    d_candi = np.asarray(rt.algo_lc.d_candi)
    bin_w = float(np.diff(d_candi).mean())
    print(f"bins={args.bins} bin_width~{bin_w:.3f} m  steps={args.steps}")

    # wrap the measurement-DPV stage to capture statistics
    orig_mdpv = rt._measurement_dpv
    stats = []

    def spy_mdpv(out_lc, thick_lc, std_div):
        dpv = orig_mdpv(out_lc, thick_lc, std_div)
        o = np.asarray(out_lc)
        t = np.asarray(thick_lc)
        z = o[..., 2]
        inten = o[..., 3]
        hit = z > 0
        d = np.asarray(dpv)[0]
        ent = -(d * np.log(np.clip(d, 1e-12, 1))).sum(0)
        stats.append({
            "curtain_z_mean": float(z[hit].mean()) if hit.any() else 0.0,
            "curtain_z_max": float(z[hit].max()) if hit.any() else 0.0,
            "hit_frac": float(hit.mean()),
            "int_mean_hit": float(inten[hit].mean()) if hit.any() else 0.0,
            "thick_mean_hit": float(t[hit].mean()) if hit.any() else 0.0,
            "meas_sigma_m": float(np.sqrt(((t[hit] / std_div) ** 2).mean()))
            if hit.any() else 0.0,
            "dpv_entropy_mean": float(ent.mean()),
        })
        return dpv

    rt._measurement_dpv = spy_mdpv

    for it in range(args.iters):
        s = rt.score(depth)
        fused = np.exp(np.asarray(rt.final)[0])        # [D, H, W]
        ent = -(fused * np.log(np.clip(fused, 1e-12, 1))).sum(0)
        exp_depth = (d_candi[:, None, None] * fused).sum(0)
        agg = ({k: round(float(np.mean([s[k] for s in stats])), 4)
                for k in stats[0]} if stats else {})
        print(f"iter {it:2d}: UF={s:6.3f} m  fused_entropy={ent.mean():.3f} "
              f"depth_err={np.abs(exp_depth - depth).mean():.3f} m  {agg}",
              flush=True)
        stats.clear()
        rt.run(None, depth)


if __name__ == "__main__":
    main()
