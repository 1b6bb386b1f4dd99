"""Equivalence of the experimental Pallas flat Conv3d with the XLA path.

Interpret mode on CPU (compiled equivalence at production shape was
verified on TPU: fwd/dx/dk max rel diff ~4e-3 in bf16)."""

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.ops.conv3d_pallas import conv3d_flat_pallas

B, D, H, W, C, F = 2, 8, 16, 24, 32, 32


def _xla_ref(x, k, depth):
    n, h, w, c = x.shape
    p = 1
    taps = [jax.lax.conv_general_dilated(
        x, k[i], (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) for i in range(3)]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1, 1), 0) % depth
    y = taps[p]
    for i in range(3):
        shift = i - p
        if shift == 0:
            continue
        ti = jnp.roll(taps[i], -shift, axis=0)
        valid = (row + shift >= 0) & (row + shift < depth)
        y = y + jnp.where(valid, ti, jnp.zeros((), ti.dtype))
    return y


def _data():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B * D, H, W, C), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, C, F) * 0.05, jnp.float32)
    return x, k


def test_forward_matches_xla():
    x, k = _data()
    y_ref = jax.jit(lambda x, k: _xla_ref(x, k, D))(x, k)
    y_pal = jax.jit(lambda x, k: conv3d_flat_pallas(x, k, D, True))(x, k)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_xla():
    x, k = _data()

    def loss_ref(x, k):
        return jnp.sum(_xla_ref(x, k, D) ** 2) * 1e-4

    def loss_pal(x, k):
        return jnp.sum(conv3d_flat_pallas(x, k, D, True) ** 2) * 1e-4

    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, k)
    gp = jax.jit(jax.grad(loss_pal, argnums=(0, 1)))(x, k)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
