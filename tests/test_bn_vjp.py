"""Custom BatchNorm VJP (models/layers.py:bn_train_apply) vs autodiff.

The production BN backward is hand-written (saves only the compute-dtype
input + per-channel f32 vectors instead of an f32 normalized-activation
copy). These tests pin it against jax.grad of the naive batch-norm
formulation — any algebra slip in the closed-form dx/dscale/dbias shows up
here, independent of the full-model parity suites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.models.layers import bn_train_apply

EPS = 1e-5


def _naive(x, scale, bias):
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.mean(jnp.square(x - mean), axis=axes)
    return (x - mean) * jax.lax.rsqrt(var + EPS) * scale + bias


@pytest.mark.parametrize("shape", [(4, 6, 5, 3), (2, 5, 4, 6, 8)])
def test_bn_vjp_matches_autodiff_f32(shape):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape) * 2.0 + 0.7, jnp.float32)
    scale = jnp.asarray(rs.rand(shape[-1]) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(shape[-1]), jnp.float32)
    g = jnp.asarray(rs.randn(*shape), jnp.float32)

    y = bn_train_apply(x, scale, bias, EPS)
    y_ref = _naive(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)

    def loss_custom(x, s, b):
        return jnp.vdot(bn_train_apply(x, s, b, EPS), g)

    def loss_naive(x, s, b):
        return jnp.vdot(_naive(x, s, b), g)

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, scale, bias)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(x, scale, bias)
    for a, b, name in zip(gc, gn, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4, err_msg=name)


def test_bn_vjp_bf16_saves_bf16_residual():
    """bf16 input: output and dx stay bf16 and track the f32 math within
    bf16 resolution."""
    rs = np.random.RandomState(1)
    xf = rs.randn(3, 8, 8, 16).astype(np.float32)
    scale = jnp.asarray(rs.rand(16) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(16), jnp.float32)
    g = rs.randn(3, 8, 8, 16).astype(np.float32)

    x16 = jnp.asarray(xf, jnp.bfloat16)
    y16 = bn_train_apply(x16, scale, bias, EPS)
    assert y16.dtype == jnp.bfloat16

    def loss16(x):
        return jnp.vdot(bn_train_apply(x, scale, bias, EPS).astype(
            jnp.float32), g)

    dx16 = jax.grad(loss16)(x16)
    assert dx16.dtype == jnp.bfloat16

    x32 = jnp.asarray(xf, jnp.float32)

    def loss32(x):
        return jnp.vdot(_naive(x, scale, bias), g)

    dx32 = jax.grad(loss32)(x32)
    # bf16 has ~3 decimal digits; grads are O(1)
    np.testing.assert_allclose(np.asarray(dx16, np.float32),
                               np.asarray(dx32), atol=0.05, rtol=0.05)
