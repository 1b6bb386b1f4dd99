"""Point re-projection with z-buffering (pylc.transformPoints equivalent).

Projects labeled 3D points (x, y, z, intensity) + per-point thickness into a
pinhole camera after a rigid transform; nearest-z wins per pixel. The
reference does this in C++ (call sites lc/light_curtain.py:751-753,
831-833, 1079-1083); here it is a JAX ``scatter-min`` so it can live inside
the jitted sense step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e9


def transform_points(pts, thickness, intr, T, w: int, h: int):
    """pts: [N, 4] (x, y, z, intensity); thickness: [N]; T: [4, 4] maps point
    coords into the target camera frame; intr: [3, 3].

    Returns (depth [h, w], intensity [h, w], thickness [h, w]); zeros where
    nothing projects.
    """
    pts = jnp.nan_to_num(jnp.asarray(pts, jnp.float32))
    xyz1 = jnp.concatenate([pts[:, :3],
                            jnp.ones((pts.shape[0], 1), jnp.float32)], axis=1)
    tp = jnp.matmul(xyz1, jnp.asarray(T, jnp.float32).T,
                    precision=jax.lax.Precision.HIGHEST)          # [N, 4]
    z = tp[:, 2]
    u = jnp.round(tp[:, 0] / z * intr[0, 0] + intr[0, 2]).astype(jnp.int32)
    v = jnp.round(tp[:, 1] / z * intr[1, 1] + intr[1, 2]).astype(jnp.int32)
    ok = (z > 0.1) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    flat = jnp.where(ok, v * w + u, 0)

    zbuf = jnp.full((h * w,), BIG, jnp.float32)
    zkey = jnp.where(ok, z, BIG)
    zbuf = zbuf.at[flat].min(zkey)

    won = ok & (zkey <= zbuf[flat] + 1e-6)
    depth = jnp.zeros((h * w,), jnp.float32).at[flat].max(
        jnp.where(won, z, 0.0))
    inten = jnp.zeros((h * w,), jnp.float32).at[flat].max(
        jnp.where(won, pts[:, 3], 0.0))
    thick = jnp.zeros((h * w,), jnp.float32).at[flat].max(
        jnp.where(won, jnp.nan_to_num(thickness), 0.0))
    shape = (h, w)
    return depth.reshape(shape), inten.reshape(shape), thick.reshape(shape)
