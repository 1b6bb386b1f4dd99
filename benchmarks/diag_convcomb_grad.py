"""Diagnose the full-stack convcomb gradient-parity failure.

Builds THREE versions of the same Base3D stack with IDENTICAL params:
  * oracle: XLA flat path with f32 activations (no bf16 rounding),
  * xla:    XLA flat path, bf16 (the production default path),
  * fused:  convcomb_pallas interpret path, bf16.

Reports, for every param leaf, the relative distance of each bf16 path
from the oracle. If fused >> xla on some leaf, the fused backward is
biased there; if both are comparably far, the test tolerance is the
problem (two bf16 roundings compared against each other).
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.models.base3d import Base3D

B, D, H, W = 2, 8, 8, 16


def mk(kind):
    if kind == "oracle":
        return Base3D(feature_dim=16, dres_count=2, bn_avg=False,
                      dtype=jnp.float32, flat=True, convcomb_pallas=False)
    if kind == "xla":
        return Base3D(feature_dim=16, dres_count=2, bn_avg=False,
                      dtype=jnp.bfloat16, flat=True, convcomb_pallas=False)
    return Base3D(feature_dim=16, dres_count=2, bn_avg=False,
                  dtype=jnp.bfloat16, flat=True, convcomb_pallas="interpret")


def main():
    rs = np.random.RandomState(3)
    vol = jnp.asarray(rs.randn(B, D, H, W, 5), jnp.float32)
    m_o, m_x, m_p = mk("oracle"), mk("xla"), mk("fused")
    params = m_o.init(jax.random.PRNGKey(0), vol, True, True)

    def loss(m):
        def f(p, v):
            return jnp.sum(m.apply(p, v, True, False) ** 2)
        return f

    g_o = jax.grad(loss(m_o), argnums=(0, 1))(params, vol)
    g_x = jax.grad(loss(m_x), argnums=(0, 1))(params, vol)
    g_p = jax.grad(loss(m_p), argnums=(0, 1))(params, vol)

    fo = jax.tree_util.tree_leaves_with_path(g_o)
    fx = jax.tree_util.tree_leaves_with_path(g_x)
    fp = jax.tree_util.tree_leaves_with_path(g_p)
    print(f"{'leaf':58s} {'|xla-o|/|o|':>12s} {'|fus-o|/|o|':>12s} "
          f"{'|fus-x|/|x|':>12s}")
    for (path, go), (_, gx), (_, gp) in zip(fo, fx, fp):
        go = np.asarray(go, np.float64)
        gx = np.asarray(gx, np.float64)
        gp = np.asarray(gp, np.float64)
        no = np.linalg.norm(go) + 1e-12
        dx = np.linalg.norm(gx - go) / no
        dp = np.linalg.norm(gp - go) / no
        dxp = np.linalg.norm(gp - gx) / (np.linalg.norm(gx) + 1e-12)
        flag = " <-- FUSED BIASED" if dp > 3 * max(dx, 1e-4) else ""
        print(f"{jax.tree_util.keystr(path):58s} {dx:12.5f} {dp:12.5f} "
              f"{dxp:12.5f}{flag}")


if __name__ == "__main__":
    main()
