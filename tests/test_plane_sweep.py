import jax.numpy as jnp
import numpy as np

from depthestimation_tpu import ops
from depthestimation_tpu.ops import geometry
import pytest


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


# ---- decomposed (MXU) plane sweep ------------------------------------------


def _pose_pair(rot_deg=0.0, t=(0.3, 0.0, 0.0)):
    th = np.radians(rot_deg)
    rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    poses[0, :3, :3] = rot
    poses[0, :3, 3] = t
    return jnp.asarray(poses[:, :3, :3]), jnp.asarray(poses[:, :3, 3])


def test_decomposed_matches_gather_identity_rotation():
    """For pure translations (R == I) the decomposed path reproduces the
    direct gather warp near-exactly (single bilinear interpolation in both),
    for any translation direction including forward (tz)."""
    intr, rays, d_candi = _setup(h=24, w=32, c=6, d=8)
    rng = np.random.default_rng(3)
    fa = jnp.asarray(rng.standard_normal((2, 6, 24, 32)).astype(np.float32))
    fr = jnp.asarray(rng.standard_normal((2, 8, 24, 32)).astype(np.float32))
    for t in [(0.3, 0.0, 0.0), (0.1, 0.07, 0.0), (0.05, -0.02, -0.4)]:
        rots, tras = _pose_pair(0.0, t)
        c_g, w_g = ops.plane_sweep_and_warp(fa, fr, d_candi, rots, tras,
                                            intr, rays, 10.0)
        c_d, w_d = ops.plane_sweep_and_warp_decomposed(
            fa, fr, d_candi, rots, tras, intr, rays, 10.0)
        np.testing.assert_allclose(np.asarray(c_g), np.asarray(c_d),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(w_g), np.asarray(w_d),
                                   atol=1e-3)
        cost_v = ops.plane_sweep_volume(fa[-1], fa[:1], d_candi, rots[:1],
                                        tras[:1], intr, rays, 10.0)
        cost_vd = ops.plane_sweep_volume_decomposed(
            fa[-1], fa[:1], d_candi, rots[:1], tras[:1], intr, rays, 10.0)
        np.testing.assert_allclose(np.asarray(cost_v), np.asarray(cost_vd),
                                   atol=2e-3)


def test_decomposed_rotation_interior_bounded():
    """With a real rotation the decomposed path composes two bilinear
    interpolations (stage-1 homography resample + stage-2 affine), so it is
    a smoothed version of the direct warp: pinned here as a bounded interior
    deviation on smooth (encoder-like) features, and a zero border ring no
    wider than the rotation's pixel displacement."""
    h, w, d = 24, 32, 8
    intr, rays, d_candi = _setup(h=h, w=w, c=6, d=d)
    yy, xx = np.meshgrid(np.arange(h) / h, np.arange(w) / w, indexing="ij")
    rng = np.random.default_rng(4)

    def smooth(c):
        ph = rng.uniform(0, 6.28, (c, 3, 1, 1))
        fr_ = rng.uniform(1.0, 4.0, (c, 3, 1, 1))
        g = (xx + yy)[None, None]
        return jnp.asarray(np.sum(np.sin(fr_ * 6.28 * g + ph), axis=1)
                           .astype(np.float32))

    fa = jnp.stack([smooth(6), smooth(6)])
    fr = jnp.stack([smooth(d), smooth(d)])
    rots, tras = _pose_pair(1.5, (0.3, 0.0, 0.0))
    c_g, w_g = ops.plane_sweep_and_warp(fa, fr, d_candi, rots, tras, intr,
                                        rays, 10.0)
    c_d, w_d = ops.plane_sweep_and_warp_decomposed(fa, fr, d_candi, rots,
                                                   tras, intr, rays, 10.0)
    m = 3
    interior = np.abs(np.asarray(c_g - c_d))[:, m:-m, m:-m]
    scale = float(np.max(np.abs(np.asarray(c_g))))
    assert interior.max() / scale < 0.12
    assert interior.mean() / (np.abs(np.asarray(c_g)).mean() + 1e-9) < 0.08


@pytest.mark.slow
def test_decomposed_gradients_match_gather_identity_rotation():
    """The decomposed path's BACKWARD (matmul transposes) produces the same
    input gradients as the gather path's (scatter-add transpose) for pure
    translations — the regime where the forwards agree exactly."""
    import jax

    intr, rays, d_candi = _setup(h=16, w=24, c=4, d=6)
    rng = np.random.default_rng(5)
    fa = jnp.asarray(rng.standard_normal((2, 4, 16, 24)).astype(np.float32))
    fr = jnp.asarray(rng.standard_normal((2, 6, 16, 24)).astype(np.float32))
    rots, tras = _pose_pair(0.0, (0.25, 0.05, -0.2))

    def loss(op):
        def f(fa_, fr_):
            c, w_ = op(fa_, fr_, d_candi, rots, tras, intr, rays, 10.0)
            return jnp.sum(c * jnp.cos(c)) + jnp.sum(w_ * jnp.sin(w_))
        return f

    g_g = jax.grad(loss(ops.plane_sweep_and_warp), argnums=(0, 1))(fa, fr)
    g_d = jax.grad(loss(ops.plane_sweep_and_warp_decomposed),
                   argnums=(0, 1))(fa, fr)
    np.testing.assert_allclose(np.asarray(g_g[0]), np.asarray(g_d[0]),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(g_g[1]), np.asarray(g_d[1]),
                               atol=5e-3)
