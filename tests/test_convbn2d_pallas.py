"""Fused 2D ConvBN strip kernel (ops/convbn2d_pallas.py) vs XLA, in
interpret mode on CPU: forward + full VJP (dx, dW, da, db with the stats
cotangent folded), across strip counts (spi=1 whole-image, spi>1 seam
ring) and activation modes. Tolerances per tests/TOLERANCES.md rule 3
(single block = one rounding step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.ops.convbn2d_pallas import (
    convbn2d_block, from_strips, pack_wm2d, to_strips)

N, H, W = 2, 8, 16
C, F = 8, 8


def _xla_ref(x4, k, a, b, act):
    u = x4.astype(jnp.float32) * a + b
    if act == "relu":
        u = jnp.maximum(u, 0)
    elif act == "leaky":
        u = jnp.where(u >= 0, u, 0.01 * u)
    u = u.astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        u, k.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yf = y.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(yf, axis=(0, 1, 2)),
                       jnp.sum(yf * yf, axis=(0, 1, 2))], axis=-1)
    return y, stats


def _data(seed=0):
    rs = np.random.RandomState(seed)
    x4 = jnp.asarray(rs.randn(N, H, W, C), jnp.bfloat16)
    k = jnp.asarray(rs.randn(3, 3, C, F) * 0.2, jnp.bfloat16)
    a = jnp.asarray(rs.rand(C) * 0.5 + 0.75, jnp.float32)
    b = jnp.asarray(rs.randn(C) * 0.1, jnp.float32)
    return x4, k, a, b


@pytest.mark.parametrize("rows,act", [(8, "none"), (4, "relu"),
                                      (2, "leaky"), (4, "none")])
def test_forward_parity(rows, act):
    x4, k, a, b = _data()
    y_ref, s_ref = _xla_ref(x4, k, a, b, act)
    spi = H // rows
    y_p, s_p = convbn2d_block(to_strips(x4, rows), pack_wm2d(k), a, b,
                              spi, rows, W, act, True)
    y_p4 = from_strips(y_p, rows, H)
    scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))) + 1e-6
    np.testing.assert_allclose(
        np.asarray(y_p4, np.float32), np.asarray(y_ref, np.float32),
        atol=0.03 * scale)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_ref),
                               rtol=3e-2, atol=1e-2 * float(N * H * W))


@pytest.mark.parametrize("rows,seam", [(8, "xla"), (4, "xla"), (2, "xla"),
                                       (4, "kernel"), (2, "kernel")])
def test_vjp_parity(rows, seam):
    x4, k, a, b = _data(1)
    rs = np.random.RandomState(2)
    gy4 = jnp.asarray(rs.randn(N, H, W, F) * 0.1, jnp.bfloat16)
    gs = jnp.asarray(rs.randn(F, 2) * 1e-3, jnp.float32)
    spi = H // rows

    def ref_loss(x4_, k_, a_, b_):
        y, s = _xla_ref(x4_, k_, a_, b_, "relu")
        return (jnp.sum(y.astype(jnp.float32) * gy4.astype(jnp.float32))
                + jnp.sum(s * gs))

    dref = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(x4, k, a, b)

    def pal_loss(xt_, wm_, a_, b_):
        y, s = convbn2d_block(xt_, wm_, a_, b_, spi, rows, W, "relu", True,
                              seam)
        return (jnp.sum(y.astype(jnp.float32)
                        * to_strips(gy4, rows).astype(jnp.float32))
                + jnp.sum(s * gs))

    dpal = jax.grad(pal_loss, argnums=(0, 1, 2, 3))(
        to_strips(x4, rows), pack_wm2d(k), a, b)

    # ReLU-boundary exclusion as in convcomb (kernel masks the f32
    # pre-activation, XLA the bf16 one)
    v = np.asarray(x4, np.float32) * np.asarray(a) + np.asarray(b)
    interior = np.abs(v) > 0.02
    dx_got = np.asarray(from_strips(dpal[0], rows, H), np.float32)
    dx_want = np.asarray(dref[0], np.float32)
    scale = float(np.max(np.abs(dx_want))) + 1e-6
    np.testing.assert_allclose(dx_got[interior], dx_want[interior],
                               atol=0.03 * scale, err_msg="dx")
    assert interior.mean() > 0.97

    pairs = [(dpal[1], pack_wm2d(dref[1]), "dW", 0.03),
             (dpal[2], dref[2], "da", 0.10),
             (dpal[3], dref[3], "db", 0.10)]
    for got, want, name, tol in pairs:
        w_ = np.asarray(want, np.float32)
        scale = float(np.max(np.abs(w_))) + 1e-6
        np.testing.assert_allclose(np.asarray(got, np.float32), w_,
                                   atol=tol * scale, err_msg=name)


def test_strip_roundtrip():
    x4, _, _, _ = _data(3)
    xt = to_strips(x4, 4)
    assert xt.shape == (N * 2, C, 4 * W)
    np.testing.assert_array_equal(np.asarray(from_strips(xt, 4, H)),
                                  np.asarray(x4))
