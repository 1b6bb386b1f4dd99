"""Fused Pallas strip-kernel encoder chain (models/encoder.py convbn2d)
vs the XLA path, interpret mode on CPU: identical parameter trees AND
init values, forward parity, grads against the f32 oracle
(tests/TOLERANCES.md rule 4 — chained bf16 stacks are bounded via the
oracle, not impl-vs-impl), and running-stat updates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.models.encoder import BaseEncoder

B, H, W = 2, 32, 48
FDIM = 32


def _mk(kind, bn_avg=False):
    if kind == "oracle":
        return BaseEncoder(FDIM, bn_avg, dtype=jnp.float32, convbn2d=False)
    if kind == "xla":
        return BaseEncoder(FDIM, bn_avg, dtype=jnp.bfloat16, convbn2d=False)
    return BaseEncoder(FDIM, bn_avg, dtype=jnp.bfloat16,
                       convbn2d="interpret")


def _x(seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.randn(B, H, W, 3) * 0.5, jnp.float32)


def test_param_tree_and_init_match():
    x = _x()
    m_x, m_p = _mk("xla"), _mk("fused")
    p_x = m_x.init(jax.random.PRNGKey(0), x, True)
    p_p = m_p.init(jax.random.PRNGKey(0), x, True)
    assert (jax.tree_util.tree_structure(p_x)
            == jax.tree_util.tree_structure(p_p))
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_x),
            jax.tree_util.tree_leaves_with_path(p_p)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(path))


def test_forward_parity():
    """Forward through ~20 chained bf16 convs with ReLU-boundary
    sensitivity: oracle-calibrated bound (TOLERANCES.md rule 4) — the
    bf16 XLA path itself drifts from the f32 oracle, and which way each
    impl rounds a near-zero pre-activation is impl-dependent."""
    x = _x(1)
    m_o, m_x, m_p = _mk("oracle"), _mk("xla"), _mk("fused")
    params = m_x.init(jax.random.PRNGKey(0), x, True)
    outs_o = m_o.apply(params, x, True)
    outs_x = m_x.apply(params, x, True)
    outs_p = m_p.apply(params, x, True)
    for o_o, o_x, o_p, name in zip(outs_o, outs_x, outs_p,
                                   ("out1", "raw", "feat")):
        oo = np.asarray(o_o, np.float64)
        d_xla = np.linalg.norm(np.asarray(o_x, np.float64) - oo)
        d_fus = np.linalg.norm(np.asarray(o_p, np.float64) - oo)
        bound = max(3.0 * d_xla, 4e-3 * np.linalg.norm(oo))
        assert d_fus <= bound, (
            f"{name}: fused-vs-oracle {d_fus:.4g} > bound {bound:.4g} "
            f"(xla {d_xla:.4g})")


def test_grads_vs_oracle():
    x = _x(2)
    m_o, m_x, m_p = _mk("oracle"), _mk("xla"), _mk("fused")
    params = m_o.init(jax.random.PRNGKey(0), x, True)

    def loss(m):
        def f(p, v):
            o1, raw, feat = m.apply(p, v, True)
            return (jnp.sum(feat.astype(jnp.float32) ** 2)
                    + jnp.sum(o1.astype(jnp.float32) ** 2) * 0.1)
        return f

    g_o = jax.grad(loss(m_o), argnums=(0, 1))(params, x)
    g_x = jax.grad(loss(m_x), argnums=(0, 1))(params, x)
    g_p = jax.grad(loss(m_p), argnums=(0, 1))(params, x)
    for (path, go), (_, gx), (_, gp) in zip(
            jax.tree_util.tree_leaves_with_path(g_o),
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_p)):
        go = np.asarray(go, np.float64)
        norm_o = np.linalg.norm(go)
        d_xla = np.linalg.norm(np.asarray(gx, np.float64) - go)
        d_fus = np.linalg.norm(np.asarray(gp, np.float64) - go)
        bound = max(3.0 * d_xla, 4e-3 * norm_o)
        assert d_fus <= bound, (
            f"{jax.tree_util.keystr(path)}: fused-vs-oracle {d_fus:.4g} > "
            f"bound {bound:.4g} (xla {d_xla:.4g}, |o| {norm_o:.4g})")


def test_running_stats():
    """Fused layers' running stats must match the XLA path tightly (they
    come straight from the kernel's sum/sumsq). Stats of the DOWNSTREAM
    XLA layers (SPP head, stages 3-4) see slightly different inputs
    (bf16 drift through the fused chain, bounded by test_forward_parity)
    — loose tolerance there."""
    x = _x(3)
    m_x, m_p = _mk("xla", bn_avg=True), _mk("fused", bn_avg=True)
    variables = m_x.init(jax.random.PRNGKey(1), x, True)
    _, upd_x = m_x.apply(variables, x, True, mutable=["batch_stats"])
    _, upd_p = m_p.apply(variables, x, True, mutable=["batch_stats"])
    fused_scopes = ("['ConvBN_0']", "['ConvBN_1']", "['ConvBN_2']",
                    "['_Stage_0']", "['_Stage_1']")
    for (path, want), (_, got) in zip(
            jax.tree_util.tree_leaves_with_path(upd_x),
            jax.tree_util.tree_leaves_with_path(upd_p)):
        name = jax.tree_util.keystr(path)
        tight = any(s in name for s in fused_scopes)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want),
            rtol=3e-2 if tight else 1e-1,
            atol=5e-3 if tight else 5e-2, err_msg=name)


def test_decoder_fused():
    """Fused full-res refine tail of BaseDecoder (bias + leaky chained
    through the kernels) vs the XLA path: tree+init equality, forward and
    grads vs the f32 oracle."""
    from depthestimation_tpu.models.decoder import BaseDecoder

    rs = np.random.RandomState(7)
    d = 16
    dpv = jax.nn.softmax(
        jnp.asarray(rs.randn(2, 8, 12, d), jnp.float32), axis=-1)
    feats = [jnp.asarray(rs.randn(2, 8, 12, 8) * 0.3, jnp.float32),
             jnp.asarray(rs.randn(2, 16, 24, 4) * 0.3, jnp.float32),
             jnp.asarray(rs.randn(2, 32, 48, 3) * 0.3, jnp.float32)]

    def mk(kind):
        if kind == "oracle":
            return BaseDecoder(d, dtype=jnp.float32, convbn2d=False)
        if kind == "xla":
            return BaseDecoder(d, dtype=jnp.bfloat16, convbn2d=False)
        return BaseDecoder(d, dtype=jnp.bfloat16, convbn2d="interpret")

    m_o, m_x, m_p = mk("oracle"), mk("xla"), mk("fused")
    params = m_x.init(jax.random.PRNGKey(0), dpv, feats)
    p_p = m_p.init(jax.random.PRNGKey(0), dpv, feats)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p_p))
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(p_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(path))

    o_o = m_o.apply(params, dpv, feats)
    o_x = m_x.apply(params, dpv, feats)
    o_p = m_p.apply(params, dpv, feats)
    oo = np.asarray(o_o, np.float64)
    d_xla = np.linalg.norm(np.asarray(o_x, np.float64) - oo)
    d_fus = np.linalg.norm(np.asarray(o_p, np.float64) - oo)
    assert d_fus <= max(3.0 * d_xla, 4e-3 * np.linalg.norm(oo)), (
        d_fus, d_xla)

    def loss(m):
        def f(p, v):
            return jnp.sum(m.apply(p, v, feats) ** 2) / v.size
        return f

    g_o = jax.grad(loss(m_o), argnums=(0, 1))(params, dpv)
    g_x = jax.grad(loss(m_x), argnums=(0, 1))(params, dpv)
    g_p = jax.grad(loss(m_p), argnums=(0, 1))(params, dpv)
    for (path, go), (_, gx), (_, gp) in zip(
            jax.tree_util.tree_leaves_with_path(g_o),
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_p)):
        go = np.asarray(go, np.float64)
        d_xla = np.linalg.norm(np.asarray(gx, np.float64) - go)
        d_fus = np.linalg.norm(np.asarray(gp, np.float64) - go)
        bound = max(3.0 * d_xla, 4e-3 * np.linalg.norm(go))
        assert d_fus <= bound, (
            f"{jax.tree_util.keystr(path)}: {d_fus:.4g} > {bound:.4g} "
            f"(xla {d_xla:.4g})")
