#!/usr/bin/env python3
"""Eval-path throughput: per-frame jitted dispatch vs the in-graph
lax.scan trajectory rollout (models/rollout.py), full-size flagship model.

The per-frame path pays a host round-trip + dispatch per frame (the
reference's loop structure, default_trainer.py:260-290); the scan rollout
consumes a whole trajectory chunk as ONE device program. Prints one JSON
line per mode.

Run (TPU):  python benchmarks/bench_eval_rollout.py [--frames 8] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from depthestimation_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cfg, _sample_input
    from depthestimation_tpu.models import get_model
    from depthestimation_tpu.models.rollout import make_rollout

    cfg = _cfg(nmode="exp7")
    cfg["tpu"] = {"dtype": "bfloat16"}
    model = get_model(cfg)
    mi, _ = _sample_input(cfg, batch=1)
    mi = dict(mi)
    mi["prev_output"] = None
    mi["prev_lc"] = None
    rngs = {"params": jax.random.PRNGKey(0), "lc_drop": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(rngs, mi)

    per_frame_keys = ("rgb", "src_cam_poses", "dmaps", "masks", "dmaps_up")
    f = args.frames
    rng = np.random.default_rng(0)
    frames = {}
    for k in per_frame_keys:
        if k not in mi or mi[k] is None:
            continue
        base = np.asarray(mi[k])
        stack = np.stack([base] * f)
        # perturb each frame so dispatch dedup can't collapse the loop
        stack = stack + rng.normal(0, 1e-3, stack.shape).astype(stack.dtype)
        frames[k] = jnp.asarray(stack)
    static = {k: v for k, v in mi.items()
              if k not in per_frame_keys
              and k not in ("prev_output", "prev_lc")}

    # -- per-frame loop ----------------------------------------------------
    single = jax.jit(lambda v, m: model.apply(v, m, train=False))
    d = model.d
    h4, w4 = np.asarray(mi["rgb"]).shape[-2] // 4, \
        np.asarray(mi["rgb"]).shape[-1] // 4

    # every iteration is chained through a feedback scalar so the remote
    # runtime cannot dedupe repeated identical dispatches (bench.py trick)
    def run_loop(fb):
        prev = jnp.full((1, d, h4, w4), jnp.log(1.0 / d), jnp.float32)
        out = None
        for t in range(f):
            m = dict(static)
            m.update({k: v[t] for k, v in frames.items()})
            m["rgb"] = m["rgb"] + fb
            m["prev_output"] = prev
            m["prev_lc"] = None
            out = single(variables, m)
            prev = out["output_refined"][-1][:, :, ::4, ::4]
        return jnp.sum(out["output_refined"][-1]) * 1e-12

    from depthestimation_tpu.utils.timing import readback, roundtrip_s
    fb = run_loop(jnp.float32(0.0))
    readback(fb)                            # compile
    rtt = roundtrip_s(fb)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        fb = run_loop(fb)
    readback(fb)
    dt_loop = max(time.perf_counter() - t0 - rtt, 1e-9) / args.iters

    # -- scan rollout ------------------------------------------------------
    rollout_raw = make_rollout(model)

    @jax.jit
    def rollout_step(fb):
        fr = dict(frames)
        fr["rgb"] = fr["rgb"] + fb
        out = rollout_raw(variables, fr, static)
        return jnp.sum(out["output_refined"]) * 1e-12

    fb = rollout_step(jnp.float32(0.0))
    readback(fb)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        fb = rollout_step(fb)
    readback(fb)
    dt_scan = max(time.perf_counter() - t0 - rtt, 1e-9) / args.iters

    res = {"metric": "eval_rollout_fps", "frames": f,
           "per_frame_loop_fps": round(f / dt_loop, 2),
           "scan_rollout_fps": round(f / dt_scan, 2),
           "speedup": round(dt_loop / dt_scan, 3)}
    print(json.dumps(res))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_eval_rollout.json")
    json.dump(res, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
