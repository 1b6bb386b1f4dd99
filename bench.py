#!/usr/bin/env python3
"""Benchmark: frames/sec of the flagship forward (BaseModel exp7_lc, KITTI
resolution 384x256, D=64) on the available accelerator, vs a PyTorch-CPU
baseline of the same architecture (the reference's runtime substrate).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The torch-CPU baseline is measured once and cached in
``benchmarks/baseline_torch_cpu.json`` (delete to re-measure).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "baseline_torch_cpu.json")
BATCH = 1
ITERS = 20
WARMUP = 3


def bench_jax() -> float:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import entry

    fn, (variables, mi) = entry()

    # Chain iterations through the input so every call is a distinct
    # execution (the remote TPU runtime dedupes identical dispatches, which
    # would otherwise fake the measurement), while keeping the loop
    # pipelined (single block at the end) so host sync latency is excluded.
    def step(m):
        out = fn(variables, m)
        feedback = jnp.sum(out["output_refined"][-1]) * 1e-12
        m = dict(m)
        m["rgb"] = m["rgb"] + feedback
        return m

    jstep = jax.jit(step)
    m = jstep(mi)
    jax.block_until_ready(m)
    for _ in range(WARMUP):
        m = jstep(m)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        m = jstep(m)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH / dt


def bench_torch_cpu() -> float:
    """Same-architecture forward in torch on CPU (reference substrate)."""
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return float(json.load(f)["fps"])
    from benchmarks.torch_baseline import measure_fps

    fps = measure_fps(batch=BATCH, iters=3, warmup=1)
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"fps": fps}, f)
    return fps


def main():
    fps = bench_jax()
    try:
        base = bench_torch_cpu()
        vs = fps / base if base > 0 else float("nan")
    except Exception as e:  # baseline failure must not kill the bench
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        vs = float("nan")
    print(json.dumps({"metric": "forward_fps_kitti_384x256_d64",
                      "value": round(fps, 3), "unit": "frames/sec",
                      "vs_baseline": round(vs, 3) if vs == vs else None}))


if __name__ == "__main__":
    main()
