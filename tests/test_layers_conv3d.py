"""Conv3d's merged-tap 2D lowering vs the native lax 3D convolution.

The production Conv3d (models/layers.py) lowers a stride-1 'same' 3D conv
to ONE depth-folded 2D conv with the kd depth-taps concatenated along the
output-feature axis, then a shift-and-sum over output slices (reference op:
torch nn.Conv3d inside Base3D, models/models.py:377-439). These tests pin
that lowering bit-for-bit against jax.lax's native NDHWC Conv3D.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.models.layers import BatchNorm, Conv3d


@pytest.mark.parametrize("k", [1, 3])
def test_conv3d_matches_native(k):
    b, d, h, w, c, f = 2, 5, 6, 7, 3, 4
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, d, h, w, c), jnp.float32)

    mod = Conv3d(features=f, kernel_size=k, padding=k // 2, stride=1)
    variables = mod.init(jax.random.PRNGKey(1), x)
    y = mod.apply(variables, x)

    kernel = variables["params"]["kernel"]
    bias = variables["params"]["bias"]
    y_ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), ((k // 2, k // 2),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias

    assert y.shape == y_ref.shape == (b, d, h, w, f)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_strided_fallback_matches_native():
    b, d, h, w, c, f = 1, 6, 8, 8, 2, 3
    x = jax.random.normal(jax.random.PRNGKey(2), (b, d, h, w, c), jnp.float32)
    mod = Conv3d(features=f, kernel_size=3, padding=1, stride=2)
    variables = mod.init(jax.random.PRNGKey(3), x)
    y = mod.apply(variables, x)
    kernel = variables["params"]["kernel"]
    bias = variables["params"]["bias"]
    y_ref = jax.lax.conv_general_dilated(
        x, kernel, (2, 2, 2), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3d_grad_matches_native():
    b, d, h, w, c, f = 1, 4, 5, 5, 2, 2
    x = jax.random.normal(jax.random.PRNGKey(4), (b, d, h, w, c), jnp.float32)
    mod = Conv3d(features=f, kernel_size=3, padding=1, stride=1)
    variables = mod.init(jax.random.PRNGKey(5), x)
    kernel = variables["params"]["kernel"]
    bias = variables["params"]["bias"]

    g_fast = jax.grad(lambda z: jnp.sum(jnp.square(mod.apply(variables, z))))(x)
    g_ref = jax.grad(lambda z: jnp.sum(jnp.square(
        jax.lax.conv_general_dilated(
            z, kernel, (1, 1, 1), ((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias)))(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_batchnorm_one_pass_stats_match_torch_semantics():
    """One-pass (mean, E[x^2]) stats == torch's centered batch stats."""
    torch = pytest.importorskip("torch")
    x = np.random.RandomState(0).randn(4, 6, 5, 3).astype(np.float32) * 3 + 2

    mod = BatchNorm(track_running_stats=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y = mod.apply(variables, jnp.asarray(x), train=True)

    bn = torch.nn.BatchNorm2d(3, affine=True, track_running_stats=False)
    with torch.no_grad():
        y_ref = bn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_bf16_returns_bf16():
    x = jnp.ones((2, 4, 4, 3), jnp.bfloat16)
    mod = BatchNorm(track_running_stats=False)
    variables = mod.init(jax.random.PRNGKey(0), x, train=True)
    y = mod.apply(variables, x, train=True)
    assert y.dtype == jnp.bfloat16
