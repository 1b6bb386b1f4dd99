#!/usr/bin/env python3
"""Base3D roofline: analytic bytes/FLOPs per op class vs measured time.

VERDICT r3 #3: Base3D owns ~47% of the B=8 train step. This script pins
whether that time is recoverable: it builds the PRODUCTION Base3D
(feature_dim=32, dres_count=2, C_in=5, flat tap-stacked layout — the
exact module BaseModelNet instantiates at models/base_model.py:189) at
the production B=8 volume [8, 64, 64, 96, 5], measures fwd and fwd+bwd
with honest chained-readback timing, and compares against the v5e
rooflines (197 bf16 TFLOP/s MXU, 819 GB/s HBM) using a per-op-class
traffic/FLOP inventory of the SAME graph.

The inventory counts the minimum HBM traffic of each op class as XLA
schedules it (tap-stacked conv -> [.., 3*F] intermediate -> roll/mask
combine; BN fwd single-pass via bn_train_apply; remat=none so every
backward conv re-reads stored activations), i.e. the bound is for THIS
op choice, not an idealized fully-fused kernel. A second set of rows
("fused-ideal") gives the floor if conv+combine+BN+ReLU chains were one
kernel — the gap between the two is what only a custom conv kernel could
recover (the Pallas im2col attempt is parked as VPU-bound at C=32,
ops/conv3d_pallas.py).

Run on TPU:  python benchmarks/base3d_roofline.py
Writes benchmarks/base3d_roofline.json.
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

B, D, H, W = 8, 64, 64, 96
CIN, F = 5, 32            # exp7_lc comb volume channels; Base3D width
P = B * D * H * W         # flattened conv positions
BF2 = 2                   # bytes per bf16
PEAK_TF = 197e12          # v5e bf16 MXU
PEAK_BW = 819e9           # v5e HBM


def conv_class(name, cin, cout_stacked, count, bwd=False):
    """One tap-stacked 2D conv [P, cin] -> [P, cout_stacked] (3x3)."""
    flops = 2 * P * 9 * cin * cout_stacked * count
    if not bwd:
        bytes_ = (P * cin + P * cout_stacked) * BF2 * count
    else:
        # data-grad (read stacked cotangent, write dx) + weight-grad
        # (read stored x + stacked cotangent, write small dW)
        flops *= 2
        bytes_ = ((P * cout_stacked + P * cin)
                  + (P * cin + P * cout_stacked)) * BF2 * count
    return dict(name=name, count=count, gflops=flops / 1e9,
                gbytes=bytes_ / 1e9)


def ew_class(name, reads, writes, count):
    """Elementwise class: reads/writes in units of [P, F] bf16 tensors."""
    return dict(name=name, count=count, gflops=0.0,
                gbytes=(reads + writes) * P * F * BF2 * count / 1e9)


def inventory():
    """(class rows, fused-ideal rows) for fwd and bwd of production
    Base3D: conv1(5->32) + conv2 + 2 dres blocks (2 convs each) +
    conv7 + classifier(32->1); 7 BN+ReLU, 2 residual adds."""
    ops = [
        conv_class("fwd conv 5->3x32", CIN, 3 * F, 1),
        conv_class("fwd conv 32->3x32", F, 3 * F, 6),
        conv_class("fwd conv 32->3x1 (classifier)", F, 3, 1),
        ew_class("fwd tap combine (read 3F, write F)", 3, 1, 7),
        ew_class("fwd BN+ReLU", 1, 1, 7),
        ew_class("fwd residual add", 2, 1, 2),
        conv_class("bwd conv 5->3x32", CIN, 3 * F, 1, bwd=True),
        conv_class("bwd conv 32->3x32", F, 3 * F, 6, bwd=True),
        conv_class("bwd conv 32->3x1", F, 3, 1, bwd=True),
        ew_class("bwd tap combine (read F, write 3F)", 1, 3, 7),
        ew_class("bwd BN (read x+g, write dx)", 2, 1, 7),
    ]
    # fully-fused floor: each conv reads its input once and writes the
    # combined+normalized F-channel output once; backward reads x + g
    # and writes dx once per conv
    fused = [
        conv_class("FUSED fwd conv+combine+BN+ReLU", CIN, F, 1),
        conv_class("FUSED fwd conv+combine+BN+ReLU", F, F, 6),
        dict(name="FUSED fwd classifier", count=1,
             gflops=2 * P * 9 * F * 3 / 1e9,
             gbytes=(P * F + P) * BF2 / 1e9),
        dict(name="FUSED bwd convs", count=7,
             gflops=2 * sum(2 * P * 9 * c * 3 * F for c in [CIN] + [F] * 6)
             / 1e9,
             gbytes=sum((2 * P * c + 2 * P * F) * BF2
                        for c in [CIN] + [F] * 6) / 1e9),
    ]
    # fused floor keeps the true stacked-tap FLOPs (3 taps) — only the
    # intermediate traffic disappears
    for row in fused[:2]:
        row["gflops"] *= 3
    return ops, fused


def bound_ms(rows):
    """Roofline time: each class takes max(flops/MXU, bytes/HBM)."""
    t = 0.0
    for r in rows:
        t += max(r["gflops"] * 1e9 / PEAK_TF, r["gbytes"] * 1e9 / PEAK_BW)
    return t * 1e3


def measure():
    """Honest fwd / fwd+bwd time of the production Base3D at B=8."""
    from depthestimation_tpu.models.base3d import Base3D
    from depthestimation_tpu.utils.timing import time_chain

    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.randn(B, D, H, W, CIN), jnp.bfloat16)
    mod = Base3D(feature_dim=F, dres_count=2, bn_avg=False,
                 dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), vol, train=True)

    @jax.jit
    def fwd_step(v):
        out, _ = mod.apply(params, v, train=True,
                           mutable=["batch_stats"])
        # MEAN-scaled feedback: a raw sum over the 12.6M-element log-prob
        # volume saturates bf16 and NaNs the chain — identical (NaN)
        # iterations then come back from the runtime's content-dedupe
        # cache as 0 ms (CLAUDE.md trap #2)
        fb = (jnp.mean(out) * 1e-2).astype(v.dtype)
        return jnp.roll(v + fb, 1, axis=0)

    @jax.jit
    def fwdbwd_step(v):
        def loss(p, v):
            out, _ = mod.apply(p, v, train=True, mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(params, v)
        # touch EVERY grad leaf: consuming only one lets XLA dead-code-
        # eliminate the other layers' weight-grad convs (measured 0.9 ms
        # "backward" before this)
        fb = sum(jnp.mean(l).astype(jnp.float32)
                 for l in jax.tree_util.tree_leaves(g))
        fb = (fb * 1e-2).astype(v.dtype)
        return jnp.roll(v + fb, 1, axis=0)

    fwd_s, _ = time_chain(fwd_step, vol, 20)
    fb_s, _ = time_chain(fwdbwd_step, vol, 20)
    return fwd_s * 1e3, fb_s * 1e3


def main():
    ops, fused = inventory()
    fwd_rows = [r for r in ops if r["name"].startswith("fwd")]
    bwd_rows = [r for r in ops if r["name"].startswith("bwd")]
    out = {
        "shape": dict(B=B, D=D, H=H, W=W, cin=CIN, width=F),
        "peak_tflops": PEAK_TF / 1e12, "peak_gbps": PEAK_BW / 1e9,
        "classes": ops,
        "bound_fwd_ms": round(bound_ms(fwd_rows), 2),
        "bound_bwd_ms": round(bound_ms(bwd_rows), 2),
        "bound_total_ms": round(bound_ms(ops), 2),
        "fused_ideal_ms": round(bound_ms(fused), 2),
    }

    print(f"{'class':44s} {'GF':>8s} {'GB':>7s} {'bound ms':>9s} bound")
    for r in ops:
        t_f = r["gflops"] * 1e9 / PEAK_TF * 1e3
        t_b = r["gbytes"] * 1e9 / PEAK_BW * 1e3
        which = "MXU" if t_f > t_b else "HBM"
        print(f"{r['name']:44s} {r['gflops']:8.1f} {r['gbytes']:7.2f} "
              f"{max(t_f, t_b):9.2f} {which}")
    print(f"\nroofline bound:  fwd {out['bound_fwd_ms']:.1f} ms   "
          f"bwd {out['bound_bwd_ms']:.1f} ms   "
          f"total {out['bound_total_ms']:.1f} ms   "
          f"(fully-fused floor {out['fused_ideal_ms']:.1f} ms)")

    if "--analytic-only" not in sys.argv:
        fwd_ms, fb_ms = measure()
        bwd_ms = fb_ms - fwd_ms
        out.update(
            measured_fwd_ms=round(fwd_ms, 2),
            measured_fwdbwd_ms=round(fb_ms, 2),
            eff_fwd=round(out["bound_fwd_ms"] / fwd_ms, 3),
            eff_bwd=round(out["bound_bwd_ms"] / max(bwd_ms, 1e-9), 3),
            eff_total=round(out["bound_total_ms"] / fb_ms, 3),
        )
        print(f"measured:        fwd {fwd_ms:.1f} ms   fwd+bwd {fb_ms:.1f} "
              f"ms   -> roofline efficiency fwd {out['eff_fwd']:.0%} "
              f"bwd {out['eff_bwd']:.0%} total {out['eff_total']:.0%}")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "base3d_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
