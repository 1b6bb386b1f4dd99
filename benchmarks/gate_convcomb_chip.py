#!/usr/bin/env python3
"""On-chip correctness gate for the PRODUCTION fused convcomb kernel
(ops/convcomb_pallas.convbn_block, compiled Mosaic — not interpret).

Two levels, both at production-like geometry (n_rows=192, HW=96*64):

1. single block: every gradient the kernel emits (dx, dW, da, db) vs
   autodiff of the XLA reference of the same math — one rounding step,
   tight atol (tests/TOLERANCES.md rule 3).
2. full Base3D stack (production feature_dim=32, dres_count=4): fwd +
   every param grad INCLUDING the chained BN scale/bias (the hole the r4
   on-chip gate left open, VERDICT r4 Weak #1) — measured against the
   f32-activation oracle with the bf16 XLA flat path as calibration:
   dist(fused, oracle) <= 3 * dist(xla, oracle) + 0.4%% floor
   (tests/TOLERANCES.md rule 4; impl-vs-impl per-element pins through 7
   bf16 BN layers are not meaningful).

Writes benchmarks/gate_convcomb_chip.json; exits nonzero on failure.
Run on the TPU:  python -m benchmarks.gate_convcomb_chip
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

from depthestimation_tpu.models.base3d import Base3D
from depthestimation_tpu.ops.convcomb_pallas import (
    convbn_block, from_transposed, pack_wm, to_transposed)

# production-like gate geometry (n_rows = B*D = 192 rides the compiled
# kernel's own gate in Base3D._use_fused; HW = 6144 lane-aligned)
B, D, H, W = 3, 64, 96, 64
C = F = 32
N, HW = B * D, H * W


def _xla_block(x4, k3, a, b, relu_in, depth):
    """Same reference math as tests/test_convcomb_pallas._xla_block."""
    n = x4.shape[0]
    u = x4 * a.astype(x4.dtype) + b.astype(x4.dtype)
    if relu_in:
        u = jnp.maximum(u, 0)
    kcat = jnp.concatenate([k3[i] for i in range(3)], axis=-1)
    tcat = jax.lax.conv_general_dilated(
        u, kcat.astype(x4.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    f = k3.shape[-1]
    taps = [tcat[..., i * f:(i + 1) * f] for i in range(3)]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1, 1), 0) % depth
    y = taps[1]
    for i in (0, 2):
        s = i - 1
        ti = jnp.roll(taps[i], -s, axis=0)
        valid = (row + s >= 0) & (row + s < depth)
        y = y + jnp.where(valid, ti, jnp.zeros((), ti.dtype))
    yf = y.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(yf, axis=(0, 1, 2)),
                       jnp.sum(yf * yf, axis=(0, 1, 2))], axis=-1)
    return y, stats


def gate_single_block(report):
    rs = np.random.RandomState(0)
    x4 = jnp.asarray(rs.randn(N, H, W, C), jnp.bfloat16)
    k3 = jnp.asarray(rs.randn(3, 3, 3, C, F) * 0.1, jnp.bfloat16)
    a = jnp.asarray(rs.rand(C) * 0.5 + 0.75, jnp.float32)
    b = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    gy4 = jnp.asarray(rs.randn(N, H, W, F) * 0.1, jnp.bfloat16)
    gs = jnp.asarray(rs.randn(F, 2) * 1e-3, jnp.float32)

    def ref_loss(x4_, k3_, a_, b_):
        y, s = _xla_block(x4_, k3_, a_, b_, True, D)
        return (jnp.sum(y.astype(jnp.float32) * gy4.astype(jnp.float32))
                + jnp.sum(s * gs))

    def pal_loss(xt_, wm_, a_, b_):
        y, s = convbn_block(xt_, wm_, a_, b_, D, H, W, True, False)
        return (jnp.sum(y.astype(jnp.float32)
                        * to_transposed(gy4).astype(jnp.float32))
                + jnp.sum(s * gs))

    dref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2, 3)))(x4, k3, a, b)
    dpal = jax.jit(jax.grad(pal_loss, argnums=(0, 1, 2, 3)))(
        to_transposed(x4), pack_wm(k3), a, b)

    # dx: exclude ReLU-boundary elements (kernel masks the f32
    # pre-activation, XLA the bf16 one — documented, test does the same)
    v = np.asarray(x4, np.float32) * np.asarray(a) + np.asarray(b)
    interior = np.abs(v) > 0.02
    dx_got = np.asarray(from_transposed(dpal[0], H, W), np.float32)
    dx_want = np.asarray(dref[0], np.float32)
    scale = float(np.max(np.abs(dx_want))) + 1e-6
    dxe = float(np.max(np.abs(dx_got[interior] - dx_want[interior])))
    ok = dxe <= 0.03 * scale
    report["block_dx"] = {"maxdiff": dxe, "scale": scale, "ok": ok}
    print(f"block dx : maxdiff {dxe:.4g} scale {scale:.4g} "
          f"{'OK' if ok else 'FAIL'}")
    allok = ok

    pairs = [(np.asarray(dpal[1], np.float32),
              np.asarray(pack_wm(dref[1]), np.float32), "dW", 0.03),
             (np.asarray(dpal[2], np.float32),
              np.asarray(dref[2], np.float32), "da", 0.10),
             (np.asarray(dpal[3], np.float32),
              np.asarray(dref[3], np.float32), "db", 0.10)]
    for got, want, name, tol in pairs:
        scale = float(np.max(np.abs(want))) + 1e-6
        e = float(np.max(np.abs(got - want)))
        ok = e <= tol * scale
        report[f"block_{name}"] = {"maxdiff": e, "scale": scale, "ok": ok}
        print(f"block {name:3s}: maxdiff {e:.4g} scale {scale:.4g} "
              f"{'OK' if ok else 'FAIL'}")
        allok &= ok
    return allok


def _mk(kind):
    if kind == "oracle":
        return Base3D(feature_dim=F, dres_count=4, dtype=jnp.float32,
                      flat=True, convcomb_pallas=False)
    if kind == "xla":
        return Base3D(feature_dim=F, dres_count=4, dtype=jnp.bfloat16,
                      flat=True, convcomb_pallas=False)
    return Base3D(feature_dim=F, dres_count=4, dtype=jnp.bfloat16,
                  flat=True, convcomb_pallas=True)


def gate_full_stack(report):
    rs = np.random.RandomState(3)
    vol = jnp.asarray(rs.randn(B, D, H, W, 5).astype(np.float32) * 0.5)
    m_o, m_x, m_p = _mk("oracle"), _mk("xla"), _mk("fused")
    params = m_o.init(jax.random.PRNGKey(0), vol, True, True)

    fwd_o = jax.jit(lambda p, v: m_o.apply(p, v, True, False))(params, vol)
    fwd_p = jax.jit(lambda p, v: m_p.apply(p, v, True, False))(params, vol)
    scale = float(jnp.max(jnp.abs(fwd_o))) + 1e-6
    fe = float(jnp.max(jnp.abs(fwd_p - fwd_o)))
    ok = fe <= 0.05 * scale
    report["stack_fwd"] = {"maxdiff": fe, "scale": scale, "ok": ok}
    print(f"stack fwd: maxdiff {fe:.4g} scale {scale:.4g} "
          f"{'OK' if ok else 'FAIL'}")
    allok = ok

    def loss(m):
        def f(p, v):
            return jnp.sum(m.apply(p, v, True, False) ** 2) / float(vol.size)
        return f

    g_o = jax.jit(jax.grad(loss(m_o), argnums=(0, 1)))(params, vol)
    g_x = jax.jit(jax.grad(loss(m_x), argnums=(0, 1)))(params, vol)
    g_p = jax.jit(jax.grad(loss(m_p), argnums=(0, 1)))(params, vol)

    worst = 0.0
    for (path, go), (_, gx), (_, gp) in zip(
            jax.tree_util.tree_leaves_with_path(g_o),
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_p)):
        go = np.asarray(go, np.float64)
        norm_o = np.linalg.norm(go)
        d_xla = np.linalg.norm(np.asarray(gx, np.float64) - go)
        d_fus = np.linalg.norm(np.asarray(gp, np.float64) - go)
        bound = max(3.0 * d_xla, 4e-3 * norm_o)
        ok = d_fus <= bound
        name = jax.tree_util.keystr(path)
        ratio = d_fus / (d_xla + 1e-300)
        worst = max(worst, d_fus / (bound + 1e-300))
        report.setdefault("stack_grads", {})[name] = {
            "d_fused": d_fus, "d_xla": d_xla, "norm_oracle": norm_o,
            "ok": bool(ok)}
        print(f"stack grad {name:55s} fused/oracle {d_fus/ (norm_o+1e-300):8.4f} "
              f"xla/oracle {d_xla/(norm_o+1e-300):8.4f} ratio {ratio:6.2f} "
              f"{'OK' if ok else 'FAIL'}")
        allok &= ok
    report["stack_worst_frac_of_bound"] = worst
    return allok


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    report = {"device": str(dev.device_kind), "geometry":
              {"B": B, "D": D, "H": H, "W": W, "C": C, "F": F}}
    ok = gate_single_block(report)
    ok &= gate_full_stack(report)
    report["ok"] = bool(ok)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "gate_convcomb_chip.json")
    json.dump(report, open(out, "w"), indent=1)
    print(f"gate {'PASSED' if ok else 'FAILED'} -> {out}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
