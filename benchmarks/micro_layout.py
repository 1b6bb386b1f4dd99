#!/usr/bin/env python3
"""Micro-benchmark: HBM bandwidth of Base3D-shaped elementwise/BN traffic
as a function of layout.

Hypothesis under test (round-4 Base3D attack): the flat-4D Base3D interior
tensor [B*D, H, W, C] = [512, 64, 96, 32] keeps C=32 in the minor (lane)
dim; if XLA pads lanes to 128 this wastes 75% of every vector register and
possibly of the HBM tiles too, which would explain the measured ~80 GB/s
elementwise fusions (PROFILE_b8.md) on an ~819 GB/s part. The control
shapes keep the same element count with a 128-multiple minor dim.

Measures, per layout:
  - ew:    y = x * a + b           (1 read + 1 write of the full tensor)
  - bnfwd: per-C mean/var reduce + normalize+relu (2 reads + 1 write)

Run: python benchmarks/micro_layout.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthestimation_tpu.utils.compile_cache import enable as _cc

_cc()

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.utils.timing import time_chain

# same element count everywhere: 512*64*96*32 = 100.7M elements (201 MB bf16)
SHAPES = {
    "nhwc_c32": (512, 64, 96, 32),       # production Base3D interior
    "nhwc_c128": (128, 64, 96, 128),     # lane-full control, same bytes
    "fold_wc": (512, 64, 96 * 32),       # W*C folded into lanes (3072)
    "nchw_w96": (512, 32, 64, 96),       # C as sublane, W=96 lanes
}
ITERS = 30


def bench(shape, iters=ITERS):
    n_el = int(np.prod(shape))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
    a = jnp.asarray(rng.randn(*shape[-1:]).astype(np.float32), jnp.bfloat16)

    def ew_step(x):
        y = x * a + jnp.bfloat16(0.5)
        # content chain that survives bf16 rounding (CLAUDE.md dedupe trap)
        fb = (0.02 + 0.03 * jnp.abs(jnp.tanh(
            jnp.sum(y.astype(jnp.float32)) * 1e-7))).astype(x.dtype)
        return jnp.roll(y, 1, axis=1) + fb

    def bn_step(x):
        red = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=red)
        var = jnp.mean((xf - mu) ** 2, axis=red)
        y = jax.nn.relu((x - mu.astype(x.dtype))
                        * jax.lax.rsqrt(var + 1e-5).astype(x.dtype))
        fb = (0.02 + 0.03 * jnp.abs(jnp.tanh(
            jnp.sum(mu) * 1e-3))).astype(x.dtype)
        return jnp.roll(y, 1, axis=1) + fb

    out = {}
    for name, fn, passes in (("ew", ew_step, 2.0), ("bnfwd", bn_step, 3.0)):
        dt, _ = time_chain(jax.jit(fn), x, iters)
        gbs = passes * n_el * 2 / dt / 1e9
        out[name + "_ms"] = round(dt * 1e3, 3)
        out[name + "_gbs"] = round(gbs, 1)
    return out


def main():
    results = {}
    for name, shape in SHAPES.items():
        results[name] = bench(shape)
        print(f"{name:11s} {str(shape):22s} "
              f"ew {results[name]['ew_ms']:7.3f} ms "
              f"({results[name]['ew_gbs']:6.1f} GB/s)   "
              f"bn {results[name]['bnfwd_ms']:7.3f} ms "
              f"({results[name]['bnfwd_gbs']:6.1f} GB/s)", flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "micro_layout.json")
    json.dump(results, open(out, "w"), indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
