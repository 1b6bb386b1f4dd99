"""Pallas fused stage-2 sweep vs the XLA einsum path.

The production TPU training step runs the decomposed plane sweep's stage 2
through ops/sweep_pallas.py; these tests pin its forward and backward
against the per-item XLA formulation (ops/plane_sweep.py) via the Pallas
interpreter, which runs on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.ops.plane_sweep import (
    plane_sweep_and_warp_decomposed_batched,
)


def _setup(b=2, t=3, c1=7, h=8, w=12, d=16, seed=0):
    rng = np.random.RandomState(seed)
    fa = jnp.asarray(rng.randn(b, t, c1, h, w).astype(np.float32))
    fr = jnp.asarray(rng.randn(b, t, d, h, w).astype(np.float32))
    d_candi = jnp.asarray(np.linspace(2.0, 10.0, d).astype(np.float32))

    poses = np.tile(np.eye(4, dtype=np.float32), (b, t, 1, 1))
    for bi in range(b):
        for ti in range(t - 1):        # last view = reference (identity)
            ang = 0.02 * rng.randn(3)
            cx, cy, cz = np.cos(ang)
            sx, sy, sz = np.sin(ang)
            rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
            ry_ = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
            rx_ = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
            poses[bi, ti, :3, :3] = (rz @ ry_ @ rx_).astype(np.float32)
            poses[bi, ti, :3, 3] = 0.3 * rng.randn(3)
    poses = jnp.asarray(poses)

    intr = np.tile(np.array([[10.0, 0.0, w / 2], [0.0, 10.0, h / 2],
                             [0.0, 0.0, 1.0]], np.float32), (b, 1, 1))
    return fa, fr, d_candi, poses, jnp.asarray(intr)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.slow
def test_forward_matches_xla(dtype):
    fa, fr, d_candi, poses, intr = _setup()
    cost_x, warp_x = plane_sweep_and_warp_decomposed_batched(
        fa, fr, d_candi, poses, intr, 10.0, dtype=dtype, use_pallas=False)
    cost_p, warp_p = plane_sweep_and_warp_decomposed_batched(
        fa, fr, d_candi, poses, intr, 10.0, dtype=dtype, use_pallas=False,
        interpret=True)
    tol = 1e-5 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(np.asarray(cost_p), np.asarray(cost_x),
                               rtol=tol, atol=tol * 10)
    np.testing.assert_allclose(np.asarray(warp_p), np.asarray(warp_x),
                               rtol=tol, atol=tol)


def test_gradients_match_xla():
    fa, fr, d_candi, poses, intr = _setup()
    kc = jnp.asarray(np.random.RandomState(1).randn(
        *(fa.shape[0], fr.shape[2], fa.shape[3], fa.shape[4])).astype(
            np.float32))

    def loss(fa_, fr_, use_pallas):
        cost, warp = plane_sweep_and_warp_decomposed_batched(
            fa_, fr_, d_candi, poses, intr, 10.0, use_pallas=False,
            interpret=use_pallas)
        return jnp.sum(cost * kc) + jnp.sum(jnp.sin(warp))

    gx = jax.grad(loss, argnums=(0, 1))(fa, fr, False)
    gp = jax.grad(loss, argnums=(0, 1))(fa, fr, True)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_shard_map_matches_single_device():
    """The shard_map'd multi-device path (mesh=8 CPU devices, interpret
    kernel) must reproduce the unsharded path bit-for-math: the sweep is
    per-item work, so sharding the batch changes nothing but placement."""
    from depthestimation_tpu.parallel import mesh as mesh_lib

    fa, fr, d_candi, poses, intr = _setup(b=8)
    mesh = mesh_lib.make_mesh(8)

    cost_1, warp_1 = plane_sweep_and_warp_decomposed_batched(
        fa, fr, d_candi, poses, intr, 10.0, use_pallas=False, interpret=True)

    batch = {"fa": fa, "fr": fr, "poses": poses, "intr": intr}
    batch = mesh_lib.shard_batch(batch, mesh)

    @jax.jit
    def run(b_):
        return plane_sweep_and_warp_decomposed_batched(
            b_["fa"], b_["fr"], d_candi, b_["poses"], b_["intr"], 10.0,
            use_pallas=False, interpret=True, mesh=mesh)

    cost_8, warp_8 = run(batch)
    np.testing.assert_allclose(np.asarray(cost_8), np.asarray(cost_1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(warp_8), np.asarray(warp_1),
                               rtol=1e-5, atol=1e-5)


def test_shard_map_gradients_match():
    from depthestimation_tpu.parallel import mesh as mesh_lib

    fa, fr, d_candi, poses, intr = _setup(b=8)
    mesh = mesh_lib.make_mesh(8)
    kc = jnp.asarray(np.random.RandomState(1).randn(
        *(fa.shape[0], fr.shape[2], fa.shape[3], fa.shape[4])).astype(
            np.float32))

    def loss(fa_, fr_, m):
        cost, warp = plane_sweep_and_warp_decomposed_batched(
            fa_, fr_, d_candi, poses, intr, 10.0, use_pallas=False,
            interpret=True, mesh=m)
        return jnp.sum(cost * kc) + jnp.sum(jnp.sin(warp))

    g1 = jax.grad(loss, argnums=(0, 1))(fa, fr, None)
    g8 = jax.jit(jax.grad(lambda a, b: loss(a, b, mesh),
                          argnums=(0, 1)))(fa, fr)
    np.testing.assert_allclose(np.asarray(g8[0]), np.asarray(g1[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g8[1]), np.asarray(g1[1]),
                               rtol=1e-4, atol=1e-4)


def test_identity_pose_warp_is_input():
    """At identity poses the sweep must reproduce the raw features exactly
    (the decomposed-path contract, ops/plane_sweep.py)."""
    b, t, c1, h, w, d = 1, 2, 5, 8, 12, 8
    rng = np.random.RandomState(3)
    fa = jnp.asarray(rng.randn(b, t, c1, h, w).astype(np.float32))
    fr = jnp.asarray(rng.randn(b, t, d, h, w).astype(np.float32))
    d_candi = jnp.asarray(np.linspace(2.0, 10.0, d).astype(np.float32))
    poses = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, t, 1, 1)))
    intr = jnp.asarray(np.tile(np.array(
        [[10.0, 0, w / 2], [0, 10.0, h / 2], [0, 0, 1]], np.float32),
        (b, 1, 1)))
    cost, warp = plane_sweep_and_warp_decomposed_batched(
        fa, fr, d_candi, poses, intr, 10.0, use_pallas=False, interpret=True)
    np.testing.assert_allclose(np.asarray(warp[:, 0]), np.asarray(fr[:, 0]),
                               rtol=1e-5, atol=1e-5)
    # identity warp -> cost is the plain feature L2 distance
    ref_cost = jnp.sum((fa[:, 0] - fa[:, 1]) ** 2, axis=1) / 10.0
    np.testing.assert_allclose(
        np.asarray(cost), np.broadcast_to(
            np.asarray(ref_cost)[:, None], cost.shape), rtol=1e-4, atol=1e-4)
