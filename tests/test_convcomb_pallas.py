"""Fused conv+combine+stats block kernel (ops/convcomb_pallas.py) vs the
production XLA paths, in interpret mode on CPU.

Pins (1) the raw convbn_block numerics + custom VJP against a pure-XLA
reference of the same math, (2) the full fused Base3D stack (padded C=5
entry, F=1 classifier, residuals, BN chaining) against the default flat
path with the SAME parameters, (3) running-stat updates, and (4) the
shard_map dispatch over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.models.base3d import Base3D
from depthestimation_tpu.ops.convcomb_pallas import (
    convbn_block, from_transposed, pack_wm, to_transposed)

B, D, H, W = 2, 8, 8, 16
C, F = 8, 8
N, HW = B * D, H * W


def _xla_block(x4, k3, a, b, relu_in, depth):
    """Reference math in NHWC: affine(+ReLU) -> tap-stacked conv ->
    roll/mask combine -> f32 stat sums. Mirrors the production flat
    Conv3d (models/layers.py) exactly."""
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


def _data(seed=0):
    rs = np.random.RandomState(seed)
    x4 = jnp.asarray(rs.randn(N, H, W, C), jnp.bfloat16)
    k3 = jnp.asarray(rs.randn(3, 3, 3, C, F) * 0.2, jnp.bfloat16)
    a = jnp.asarray(rs.rand(C) * 0.5 + 0.75, jnp.float32)
    b = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    return x4, k3, a, b


@pytest.mark.parametrize("relu_in", [False, True])
def test_convbn_block_forward_parity(relu_in):
    x4, k3, a, b = _data()
    y_ref, s_ref = _xla_block(x4, k3, a, b, relu_in, D)
    y_p, s_p = convbn_block(to_transposed(x4), pack_wm(k3), a, b,
                            D, H, W, relu_in, True)
    y_p4 = from_transposed(y_p, H, W)
    scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(y_p4, np.float32), np.asarray(y_ref, np.float32),
        atol=0.03 * scale)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_ref),
                               rtol=3e-2, atol=1e-2 * float(N * HW))


def test_convbn_block_vjp_parity():
    """dx / dW / d(a,b) from the fused backward kernel vs autodiff of the
    XLA reference, INCLUDING the stats cotangent fold and the ReLU mask."""
    x4, k3, a, b = _data(1)
    rs = np.random.RandomState(2)
    gy4 = jnp.asarray(rs.randn(N, H, W, F) * 0.1, jnp.bfloat16)
    gs = jnp.asarray(rs.randn(F, 2) * 1e-3, jnp.float32)

    def ref_loss(x4_, k3_, a_, b_):
        y, s = _xla_block(x4_, k3_, a_, b_, True, D)
        return (jnp.sum(y.astype(jnp.float32) * gy4.astype(jnp.float32))
                + jnp.sum(s * gs))

    dref = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(x4, k3, a, b)

    def pal_loss(xt_, wm_, a_, b_):
        y, s = convbn_block(xt_, wm_, a_, b_, D, H, W, True, True)
        return (jnp.sum(y.astype(jnp.float32)
                        * to_transposed(gy4).astype(jnp.float32))
                + jnp.sum(s * gs))

    dpal = jax.grad(pal_loss, argnums=(0, 1, 2, 3))(
        to_transposed(x4), pack_wm(k3), a, b)

    # ReLU-boundary elements legitimately differ: the kernel masks on the
    # f32 pre-activation, the XLA path on the bf16 one — near-zero v can
    # flip sign between the two. Exclude |v| < 0.02 from the dx check
    # (a handful of elements); everything else must match.
    v = np.asarray(x4, np.float32) * np.asarray(a) + np.asarray(b)
    interior = np.abs(v) > 0.02
    dx_got = np.asarray(from_transposed(dpal[0], H, W), np.float32)
    dx_want = np.asarray(dref[0], np.float32)
    scale = float(np.max(np.abs(dx_want))) + 1e-6
    np.testing.assert_allclose(dx_got[interior], dx_want[interior],
                               atol=0.03 * scale, err_msg="dx")
    assert interior.mean() > 0.97

    # da/db are sums over all pixels — each boundary-flipped element
    # contributes its full |du*x| to the difference, so their budget is
    # looser than dW's (which the taps' larger magnitudes dominate).
    pairs = [(dpal[1], pack_wm(dref[1]), "dW", 0.03),
             (dpal[2], dref[2], "da", 0.10),
             (dpal[3], dref[3], "db", 0.10)]
    for got, want, name, tol in pairs:
        w_ = np.asarray(want, np.float32)
        scale = float(np.max(np.abs(w_))) + 1e-6
        np.testing.assert_allclose(np.asarray(got, np.float32), w_,
                                   atol=tol * scale, err_msg=name)


def _mk(fused, bn_avg=False):
    return Base3D(feature_dim=16, dres_count=2, bn_avg=bn_avg,
                  dtype=jnp.bfloat16, flat=True,
                  convcomb_pallas="interpret" if fused else False)


def _mk_oracle(bn_avg=False):
    """Same stack, f32 activations: the rounding-free reference both bf16
    paths are measured against."""
    return Base3D(feature_dim=16, dres_count=2, bn_avg=bn_avg,
                  dtype=jnp.float32, flat=True, convcomb_pallas=False)


def _vol(seed=3, c_in=5):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.randn(B, D, H, W, c_in), jnp.float32)


def test_base3d_fused_matches_flat():
    """Full stack: C_in=5 entry pad, F=1 classifier pad, residual blocks,
    BN chained through the kernels. Same params, fwd + grads.

    Gradient pin (tolerance policy, tests/TOLERANCES.md): through 7
    chained bf16 BN layers, grads are chaotically rounding-sensitive —
    the production XLA path ITSELF sits ~17% (rel L2) from an f32 oracle
    of the same math on the worst leaves (benchmarks/diag_convcomb_grad.py),
    so two bf16 implementations cannot be pinned against each other with
    a per-element atol (that pin failed on host migration, VERDICT r4
    Weak #1). Instead both paths are measured against the f32-activation
    oracle on the SAME host: the fused path must be no further from the
    oracle than 3x the XLA path's own distance. The kernel's per-block
    numerics stay tightly pinned by test_convbn_block_vjp_parity."""
    vol = _vol()
    m_x, m_p, m_o = _mk(False), _mk(True), _mk_oracle()
    params = m_x.init(jax.random.PRNGKey(0), vol, True, True)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                m_p.init(jax.random.PRNGKey(0), vol, True, True)))

    o_x = m_x.apply(params, vol, True, False)       # [B, D, H, W] logits
    o_p = m_p.apply(params, vol, True, False)
    scale = float(jnp.max(jnp.abs(o_x))) + 1e-6
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               atol=0.05 * scale)

    def loss(m):
        def f(p, v):
            return jnp.sum(m.apply(p, v, True, False) ** 2)
        return f

    g_o = jax.grad(loss(m_o), argnums=(0, 1))(params, vol)
    g_x = jax.grad(loss(m_x), argnums=(0, 1))(params, vol)
    g_p = jax.grad(loss(m_p), argnums=(0, 1))(params, vol)
    flat_o = jax.tree_util.tree_leaves_with_path(g_o)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    for (path, go), (_, gx), (_, gp) in zip(flat_o, flat_x, flat_p):
        go = np.asarray(go, np.float64)
        norm_o = np.linalg.norm(go)
        d_xla = np.linalg.norm(np.asarray(gx, np.float64) - go)
        d_fus = np.linalg.norm(np.asarray(gp, np.float64) - go)
        # floor: leaves where the XLA path happens to round luckily must
        # not force the fused path below bf16 resolution (~0.4% of norm)
        bound = max(3.0 * d_xla, 4e-3 * norm_o)
        assert d_fus <= bound, (
            f"{jax.tree_util.keystr(path)}: fused-vs-oracle {d_fus:.4g} > "
            f"bound {bound:.4g} (xla-vs-oracle {d_xla:.4g}, |oracle| "
            f"{norm_o:.4g})")


def test_base3d_fused_depth_edges():
    """Nonzero only in item 0's LAST depth slice must not leak into item
    1's first slice through the flattened rows (ring/combine masking)."""
    vol = np.zeros((B, D, H, W, 5), np.float32)
    vol[0, -1] = 1.0
    vol = jnp.asarray(vol)
    m_x, m_p = _mk(False), _mk(True)
    params = m_x.init(jax.random.PRNGKey(1), vol, True, True)
    o_x = m_x.apply(params, vol, True, False)
    o_p = m_p.apply(params, vol, True, False)
    scale = float(jnp.max(jnp.abs(o_x))) + 1e-6
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               atol=0.05 * scale)


def test_base3d_fused_running_stats():
    """bn_avg=True: the fused BN path must update batch_stats exactly like
    the XLA path (torch momentum 0.1, unbiased var) and use them in eval."""
    vol = _vol(4)
    m_x, m_p = _mk(False, bn_avg=True), _mk(True, bn_avg=True)
    variables = m_x.init(jax.random.PRNGKey(2), vol, True, True)

    _, upd_x = m_x.apply(variables, vol, True, False,
                         mutable=["batch_stats"])
    _, upd_p = m_p.apply(variables, vol, True, False,
                         mutable=["batch_stats"])
    for (path, want), (_, got) in zip(
            jax.tree_util.tree_leaves_with_path(upd_x),
            jax.tree_util.tree_leaves_with_path(upd_p)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-2, atol=5e-3,
            err_msg=jax.tree_util.keystr(path))

    o_x = m_x.apply(variables, vol, False, False)
    o_p = m_p.apply(variables, vol, False, False)
    scale = float(jnp.max(jnp.abs(o_x))) + 1e-6
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               atol=0.05 * scale)


def test_convbn_block_shard_map():
    """The data-mesh dispatch (shard_map over batch items + psum'd stats /
    dW / d(a,b)) must match the single-shard call on the 8-device CPU
    mesh, fwd and grads."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    if devs.size < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(devs, ("data",))

    b8 = 8
    rs = np.random.RandomState(5)
    x4 = jnp.asarray(rs.randn(b8 * D, H, W, C), jnp.bfloat16)
    k3 = jnp.asarray(rs.randn(3, 3, 3, C, F) * 0.2, jnp.bfloat16)
    a = jnp.asarray(rs.rand(C) * 0.5 + 0.75, jnp.float32)
    b = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    xt, wm = to_transposed(x4), pack_wm(k3)

    # custom_vjp functions reject keyword args — pass positionally
    def run1(xt_, wm_, a_, b_):
        return convbn_block(xt_, wm_, a_, b_, D, H, W, True, True)

    def run8(xt_, wm_, a_, b_):
        return convbn_block(xt_, wm_, a_, b_, D, H, W, True, True,
                            mesh, "data")

    y1, s1 = run1(xt, wm, a, b)
    y8, s8 = jax.jit(run8)(xt, wm, a, b)
    np.testing.assert_allclose(np.asarray(y8, np.float32),
                               np.asarray(y1, np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1),
                               rtol=1e-5, atol=1e-4)

    def loss(fn):
        def f(xt_, wm_, a_, b_):
            y, s = fn(xt_, wm_, a_, b_)
            return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s ** 2) * 1e-6
        return f

    g1 = jax.grad(loss(run1), argnums=(0, 1, 2, 3))(xt, wm, a, b)
    g8 = jax.jit(jax.grad(loss(run8), argnums=(0, 1, 2, 3)))(xt, wm, a, b)
    for got, want in zip(g8, g1):
        w_ = np.asarray(want, np.float32)
        scale = float(np.max(np.abs(w_))) + 1e-6
        np.testing.assert_allclose(np.asarray(got, np.float32), w_,
                                   atol=0.02 * scale)
