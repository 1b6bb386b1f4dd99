"""Flat-4D Base3D (layers.Conv3d depth path) vs the 5D per-tap-slice form.

Same parameter tree, same math — outputs and gradients must agree to
rounding. Guards the depth-shift roll+mask combine (cross-batch rows must
see zeros exactly like the 5D depth padding)."""

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.models.base3d import Base3D


def _mk(flat):
    return Base3D(feature_dim=8, dres_count=2, bn_avg=False, dtype=None,
                  flat=flat)


def test_flat_matches_5d_forward_and_grad():
    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.randn(2, 6, 8, 10, 5), jnp.float32)

    m5, m4 = _mk(False), _mk(True)
    params = m5.init(jax.random.PRNGKey(0), vol, True, True)
    # identical param tree: the flat form must load 5D-form checkpoints
    chex_tree = jax.tree_util.tree_structure(params)
    assert chex_tree == jax.tree_util.tree_structure(
        m4.init(jax.random.PRNGKey(0), vol, True, True))

    o5 = m5.apply(params, vol, True, True)
    o4 = m4.apply(params, vol, True, True)
    np.testing.assert_allclose(np.asarray(o4), np.asarray(o5),
                               atol=1e-5, rtol=1e-5)

    def loss(m):
        def f(p, v):
            return jnp.sum(m.apply(p, v, True, False) ** 2)
        return f

    g5 = jax.grad(loss(m5), argnums=(0, 1))(params, vol)
    g4 = jax.grad(loss(m4), argnums=(0, 1))(params, vol)
    for a, b in zip(jax.tree_util.tree_leaves(g4),
                    jax.tree_util.tree_leaves(g5)):
        # the flat path's tap-stacked conv contracts the taps in one
        # concatenated pass; f32 reassociation vs the 5D form's separate
        # convs moves isolated gradient elements by O(1e-3) relative
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=2e-3)


def test_flat_depth_edges_zero_padded():
    """A volume that is nonzero ONLY in the last depth slice of item 0 must
    not leak into item 1's first depth slice through the flattened rows."""
    vol = np.zeros((2, 4, 6, 6, 3), np.float32)
    vol[0, -1] = 1.0
    vol = jnp.asarray(vol)
    m5, m4 = _mk(False), _mk(True)
    params = m5.init(jax.random.PRNGKey(1), vol, True, True)
    o5 = m5.apply(params, vol, True, False)
    o4 = m4.apply(params, vol, True, False)
    np.testing.assert_allclose(np.asarray(o4), np.asarray(o5),
                               atol=1e-5, rtol=1e-5)


def test_flat_combine_pallas_matches_xla():
    """combine_pallas="interpret" (the fused tap-combine kernel) must match
    the XLA roll+mask form through a full Base3D forward + grad at a shape
    that reaches the stacked-conv branch (rows >= 192)."""
    rs = np.random.RandomState(2)
    vol = jnp.asarray(rs.randn(2, 96, 4, 8, 5), jnp.float32)

    m_x = Base3D(feature_dim=8, dres_count=1, bn_avg=False, flat=True)
    m_p = Base3D(feature_dim=8, dres_count=1, bn_avg=False, flat=True,
                 combine_pallas="interpret")
    params = m_x.init(jax.random.PRNGKey(3), vol, True, True)

    o_x = m_x.apply(params, vol, True, True)
    o_p = m_p.apply(params, vol, True, True)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               atol=1e-5, rtol=1e-5)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, vol, True, False) ** 2)

    g_x = jax.grad(loss(m_x))(params)
    g_p = jax.grad(loss(m_p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
