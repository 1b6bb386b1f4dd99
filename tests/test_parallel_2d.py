"""2-D mesh (data x model) sharding of the plane-sweep hot path.

The reference has no tensor parallelism (SURVEY §2.10: DP only); on TPU the
depth-plane axis D is the natural model axis if the volume ever outgrows one
chip (SURVEY: "optional: shard D axis of cost volume/3D conv"). This pins
that the decomposed sweep partitions over D under GSPMD — the per-depth
banded matmuls are embarrassingly parallel along D, so XLA shards them with
no resharding collectives inside the sweep — and that the result matches the
unsharded computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from depthestimation_tpu.ops import dpv as dpv_ops, geometry
from depthestimation_tpu.ops.plane_sweep import plane_sweep_and_warp_decomposed


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_plane_sweep_dp_x_depth_tp():
    h, w, d = 16, 24, 8
    c1 = 6
    b = 2
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2)
    fa = jax.random.normal(ks[0], (b, 2, c1, h, w), jnp.float32)
    fr = jax.random.normal(ks[1], (b, 2, d, h, w), jnp.float32)
    d_candi = jnp.asarray(dpv_ops.powerf(3.0, 12.0, d, 1.0), jnp.float32)
    intr = np.array([[18.0, 0, w / 2], [0, 18.0, h / 2], [0, 0, 1]],
                    np.float32)
    hfov, vfov = geometry.fov_from_intrinsics(intr, w, h)
    rays = jnp.asarray(geometry.unit_ray_array_2d(w, h, hfov, vfov))
    intrj = jnp.asarray(intr)
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    poses[0, 0, 3] = -0.3
    rots = jnp.asarray(poses[:, :3, :3])
    tras = jnp.asarray(poses[:, :3, 3])

    def batched(fa_, fr_):
        cost, warped = jax.vmap(
            lambda a, r: plane_sweep_and_warp_decomposed(
                a, r, d_candi, rots, tras, intrj, rays, 10.0))(fa_, fr_)
        # constrain the depth axis onto the model axis: [B, D, H, W]
        cost = jax.lax.with_sharding_constraint(
            cost, NamedSharding(mesh, P("data", "model", None, None)))
        warped = jax.lax.with_sharding_constraint(
            warped, NamedSharding(mesh, P("data", None, "model", None, None)))
        return cost, warped

    # unsharded reference
    ref_cost, ref_warped = jax.vmap(
        lambda a, r: plane_sweep_and_warp_decomposed(
            a, r, d_candi, rots, tras, intrj, rays, 10.0))(fa, fr)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    with mesh:
        in_s = NamedSharding(mesh, P("data", None, None, None, None))
        fa_s = jax.device_put(fa, in_s)
        fr_s = jax.device_put(fr, in_s)
        out_cost, out_warped = jax.jit(batched)(fa_s, fr_s)

    # sharded result matches, and the output really is depth-sharded
    np.testing.assert_allclose(np.asarray(out_cost), np.asarray(ref_cost),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_warped), np.asarray(ref_warped),
                               atol=1e-4)
    spec = out_cost.sharding.spec
    assert spec[0] == "data" and spec[1] == "model"
