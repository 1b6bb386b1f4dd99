#!/usr/bin/env python3
"""On-chip A/B + correctness gate for the fused 2D ConvBN strip kernel
(ops/convbn2d_pallas.py) at the encoder's production geometries:

  half-res stem/stage1:  [16, 128, 192, 32]
  quarter-res stage2:    [16, 64, 96, 64]
  quarter-res stage3:    [16, 64, 96, 128]

For each: compiled-kernel parity vs the XLA reference (fwd y/stats, bwd
dx/dW/da/db), then honest chained timing (utils/timing.py) of fwd and
fwd+bwd for the kernel vs the XLA ConvBN block XLA actually runs
(channels-last conv + fused normalize + f32 stat reduction).

Run on TPU:  python -m benchmarks.micro_convbn2d
Writes benchmarks/micro_convbn2d.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from depthestimation_tpu.utils.compile_cache import enable as _cc
_cc()

import jax
import jax.numpy as jnp

from depthestimation_tpu.ops.convbn2d_pallas import (
    convbn2d_block, from_strips, pack_wm2d, to_strips)

GEOMS = [
    dict(name="half_c32", n=16, h=128, w=192, c=32, f=32, rows=8),
    dict(name="quarter_c64", n=16, h=64, w=96, c=64, f=64, rows=16),
    dict(name="quarter_c128", n=16, h=64, w=96, c=128, f=128, rows=16),
]


def xla_block(x4, k, a, b, act="relu"):
    u = x4.astype(jnp.float32) * a + b
    if act == "relu":
        u = jnp.maximum(u, 0)
    u = u.astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        u, k.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yf = y.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(yf, axis=(0, 1, 2)),
                       jnp.sum(yf * yf, axis=(0, 1, 2))], axis=-1)
    return y, stats


def run_geom(g, report, interpret=False):
    n, h, w, c, f, rows = g["n"], g["h"], g["w"], g["c"], g["f"], g["rows"]
    spi = h // rows
    rs = np.random.RandomState(0)
    x4 = jnp.asarray(rs.randn(n, h, w, c) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rs.randn(3, 3, c, f) * (1.5 / np.sqrt(9 * c)),
                    jnp.bfloat16)
    a = jnp.asarray(rs.rand(c) * 0.5 + 0.75, jnp.float32)
    b = jnp.asarray(rs.randn(c) * 0.1, jnp.float32)
    gy = jnp.asarray(rs.randn(n, h, w, f) * 0.1, jnp.bfloat16)
    gs = jnp.asarray(rs.randn(f, 2) * 1e-3, jnp.float32)
    xt, wm, gyt = to_strips(x4, rows), pack_wm2d(k), to_strips(gy, rows)

    # ---- parity (compiled kernel vs XLA) ----
    y_ref, s_ref = jax.jit(xla_block)(x4, k, a, b)
    pal = jax.jit(functools.partial(convbn2d_block, spi=spi, rows=rows,
                                    w=w, act="relu", interpret=interpret))
    y_p, s_p = pal(xt, wm, a, b)
    y_p4 = from_strips(y_p, rows, h)
    scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
    ye = float(jnp.max(jnp.abs(y_p4.astype(jnp.float32)
                               - y_ref.astype(jnp.float32))))
    cnt = float(n * h * w)
    mean_e = float(jnp.max(jnp.abs(s_p[:, 0] - s_ref[:, 0]))) / cnt
    ok = ye <= 0.05 * scale and mean_e < 1e-2
    print(f"[{g['name']}] fwd parity: y maxdiff {ye:.3e} (scale {scale:.2f})"
          f" mean err {mean_e:.2e} {'OK' if ok else 'FAIL'}")

    def ref_loss(x4_, k_, a_, b_):
        y, s = xla_block(x4_, k_, a_, b_)
        return (jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))
                + jnp.sum(s * gs))

    def pal_loss(xt_, wm_, a_, b_):
        y, s = convbn2d_block(xt_, wm_, a_, b_, spi, rows, w, "relu",
                              interpret)
        return (jnp.sum(y.astype(jnp.float32) * gyt.astype(jnp.float32))
                + jnp.sum(s * gs))

    dref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2, 3)))(x4, k, a, b)
    dpal = jax.jit(jax.grad(pal_loss, argnums=(0, 1, 2, 3)))(xt, wm, a, b)
    v = np.asarray(x4, np.float32) * np.asarray(a) + np.asarray(b)
    interior = np.abs(v) > 0.02
    dx_got = np.asarray(from_strips(dpal[0], rows, h), np.float32)
    dx_want = np.asarray(dref[0], np.float32)
    dscale = float(np.max(np.abs(dx_want))) + 1e-6
    dxe = float(np.max(np.abs(dx_got[interior] - dx_want[interior])))
    okx = dxe <= 0.03 * dscale
    pairs = [(dpal[1], pack_wm2d(dref[1]), "dW", 0.03),
             (dpal[2], dref[2], "da", 0.10), (dpal[3], dref[3], "db", 0.10)]
    grad_ok = okx
    msgs = [f"dx {dxe:.3e}/{dscale:.2f}"]
    for got, want, nm, tol in pairs:
        w_ = np.asarray(want, np.float32)
        sc = float(np.max(np.abs(w_))) + 1e-6
        e = float(np.max(np.abs(np.asarray(got, np.float32) - w_)))
        grad_ok &= e <= tol * sc
        msgs.append(f"{nm} {e:.3e}/{sc:.2f}")
    print(f"[{g['name']}] bwd parity: " + "  ".join(msgs)
          + ("  OK" if grad_ok else "  FAIL"))
    report[g["name"]] = {"fwd_ok": bool(ok), "bwd_ok": bool(grad_ok)}
    if interpret:
        return ok and grad_ok

    # ---- timing ----
    from depthestimation_tpu.utils.timing import time_chain

    def chain_fwd(fn, pack):
        @jax.jit
        def step(t):
            y, s = fn(t)
            fb = (jnp.mean(s) * 1e-6).astype(t.dtype)
            return jnp.roll(t, 1, axis=0) + fb
        return step

    t_x, _ = time_chain(chain_fwd(lambda t: xla_block(t, k, a, b), None),
                        x4, 30)
    t_p, _ = time_chain(chain_fwd(
        lambda t: convbn2d_block(t, wm, a, b, spi, rows, w, "relu", False),
        None), xt, 30)

    @jax.jit
    def xla_fb(t, gy_, gs_):
        gx, gk = jax.grad(lambda x4_, k_: ref_loss(x4_, k_, a, b),
                          argnums=(0, 1))(t, k)
        fb = (jnp.mean(gx).astype(jnp.float32) + jnp.mean(gk)) * 1e-3
        return jnp.roll(t, 1, axis=0) + fb.astype(t.dtype)

    @jax.jit
    def pal_fb(t, gyt_, gs_):
        gx, gk = jax.grad(lambda xt_, wm_: pal_loss(xt_, wm_, a, b),
                          argnums=(0, 1))(t, wm)
        fb = (jnp.mean(gx).astype(jnp.float32) + jnp.mean(gk)) * 1e-3
        return jnp.roll(t, 1, axis=0) + fb.astype(t.dtype)

    t_xfb, _ = time_chain(lambda t: xla_fb(t, gy, gs), x4, 30)
    t_pfb, _ = time_chain(lambda t: pal_fb(t, gyt, gs), xt, 30)
    print(f"[{g['name']}] fwd  xla {t_x*1e3:7.3f}  pallas {t_p*1e3:7.3f} ms"
          f"  ({t_x/t_p:.2f}x)")
    print(f"[{g['name']}] f+b  xla {t_xfb*1e3:7.3f}  pallas {t_pfb*1e3:7.3f}"
          f" ms  ({t_xfb/t_pfb:.2f}x)")
    report[g["name"]].update(
        fwd_xla_ms=round(t_x * 1e3, 3), fwd_pal_ms=round(t_p * 1e3, 3),
        fwdbwd_xla_ms=round(t_xfb * 1e3, 3),
        fwdbwd_pal_ms=round(t_pfb * 1e3, 3))
    return ok and grad_ok


def main():
    interpret = "--interpret" in sys.argv
    report = {}
    allok = True
    for g in GEOMS:
        allok &= run_geom(g, report, interpret)
    report["ok"] = bool(allok)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "micro_convbn2d.json")
    json.dump(report, open(out, "w"), indent=1)
    print(f"{'OK' if allok else 'FAIL'} -> {out}")
    sys.exit(0 if allok else 1)


if __name__ == "__main__":
    main()
