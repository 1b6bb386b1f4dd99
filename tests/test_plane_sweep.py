import jax.numpy as jnp
import numpy as np

from depthestimation_tpu import ops
from depthestimation_tpu.ops import geometry


def _setup(h=16, w=24, c=5, d=8):
    intr = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]], np.float32)
    hfov, vfov = geometry.fov_from_intrinsics(intr, w, h)
    rays = geometry.unit_ray_array_2d(w, h, hfov, vfov)
    d_candi = ops.powerf(2.0, 10.0, d, 1.0)
    return jnp.asarray(intr), jnp.asarray(rays), d_candi


def test_identity_pose_zero_cost():
    intr, rays, d_candi = _setup()
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((5, 16, 24)).astype(np.float32))
    srcs = feat[None]                      # same view
    rots = jnp.eye(3)[None]
    tras = jnp.zeros((1, 3))
    cost = ops.plane_sweep_volume(feat, srcs, d_candi, rots, tras, intr,
                                  rays, sigma=1.0)
    assert cost.shape == (8, 16, 24)
    # warp is identity for every depth when R=I, t=0 (interior pixels)
    assert float(jnp.mean(jnp.abs(cost[:, 2:-2, 2:-2]))) < 1e-5


def test_translation_min_cost_at_true_depth():
    """A laterally shifted source view should produce minimum cost at the
    depth whose disparity equals the shift: disparity = fx * tx / z."""
    intr, rays, d_candi = _setup(h=32, w=48)
    rng = np.random.default_rng(1)
    base = rng.standard_normal((3, 32, 48 + 8)).astype(np.float32)
    true_z = float(d_candi[4])
    fx, tx = 20.0, 1.0
    disp = fx * tx / true_z  # pixels
    assert abs(disp - round(disp)) < 0.35  # approx integer for clean gather
    disp = int(round(disp))

    ref = jnp.asarray(base[:, :, 4:4 + 48])
    # camera moved +tx along x -> scene shifts LEFT in the source image by
    # disp pixels: src pixel u sees what ref sees at u + disp
    src = jnp.asarray(base[:, :, 4 + disp:4 + disp + 48])

    rots = jnp.eye(3)[None]
    # The homography uses p_src ~ K (R r d + t) with r the ref-pixel ray.
    # For a pure x translation of the CAMERA by +tx, a world point X maps to
    # src coords X - tx, so t = (-tx, 0, 0).
    tras = jnp.array([[-tx, 0.0, 0.0]])
    cost = ops.plane_sweep_volume(ref, src[None], d_candi, rots, tras, intr,
                                  rays, sigma=1.0)
    interior = cost[:, 4:-4, 8:-8]
    per_depth = np.asarray(jnp.mean(interior, axis=(1, 2)))
    assert int(np.argmin(per_depth)) == 4


def test_warp_feature_diagonal():
    intr, rays, d_candi = _setup(c=8, d=8)
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((2, 8, 16, 24)).astype(np.float32))
    rots = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    tras = jnp.zeros((2, 3))
    out = ops.warp_feature_volume(feats, d_candi, rots, tras, intr, rays)
    assert out.shape == (2, 8, 16, 24)
    # identity warp: plane d == channel d of the source features (interior)
    np.testing.assert_allclose(np.asarray(out[:, :, 2:-2, 2:-2]),
                               np.asarray(feats[:, :, 2:-2, 2:-2]), atol=1e-5)
