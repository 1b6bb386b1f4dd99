"""Pin the fused depth-tap combine kernel (ops/combine_pallas.py) against
the pure-XLA roll+iota-mask form — interpret mode on the CPU suite, the
same pattern as tests/test_sweep_pallas.py.

Covers the depth-edge semantics (tap contributions must NOT leak across
batch-item boundaries inside the flattened [B*D] row axis) and
non-multiple-of-8 block shapes (interpret mode has no tiling constraint;
compiled TPU callers keep lane-friendly shapes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.ops.combine_pallas import tap_combine, tap_combine_xla


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.mark.parametrize("b,d,h,w,f", [
    (2, 4, 3, 8, 8),      # multi-item: exercises inter-item depth edges
    (1, 6, 2, 16, 4),     # non-multiple-of-8 H and F
    (3, 2, 1, 8, 8),      # D=2: every row is a depth edge
])
def test_tap_combine_fwd_matches_xla(b, d, h, w, f):
    x = _rand((b * d, h, w, 3 * f))
    y_pl = tap_combine(x, d, f, True)
    y_xla = tap_combine_xla(x, d, f)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               rtol=1e-5, atol=1e-5)


def test_tap_combine_depth_edges_zeroed():
    """Row 0 of each item must take no tap-0 contribution from the previous
    item's last row, and the last row no tap-2 contribution from the next
    item's row 0."""
    b, d, h, w, f = 2, 3, 2, 8, 8
    n = b * d
    x = jnp.zeros((n, h, w, 3 * f), jnp.float32)
    # distinctive tap-0 payload on the LAST row of item 0: it may only reach
    # item 0's rows (as t0[n-1] at row... none: last-row tap0 feeds row d,
    # which is item 1's row 0 positionally but must be masked out)
    x = x.at[d - 1, :, :, :f].set(7.0)
    # distinctive tap-2 payload on item 1's FIRST row: feeds row d-1
    # positionally (item 0's last row) — must also be masked out
    x = x.at[d, :, :, 2 * f:].set(5.0)
    y = np.asarray(tap_combine(x, d, f, True))
    assert np.all(y == 0.0), "tap contributions leaked across item boundary"

    # same payloads INSIDE one item must flow
    x2 = jnp.zeros((n, h, w, 3 * f), jnp.float32)
    x2 = x2.at[0, :, :, :f].set(7.0)            # t0[0] -> y[1]
    y2 = np.asarray(tap_combine(x2, d, f, True))
    assert np.allclose(y2[1], 7.0) and np.all(y2[[0, 2, 3, 4, 5]] == 0.0)


@pytest.mark.parametrize("b,d,h,w,f", [(2, 4, 3, 8, 8), (1, 6, 2, 16, 4)])
def test_tap_combine_vjp_matches_xla(b, d, h, w, f):
    x = _rand((b * d, h, w, 3 * f), seed=1)
    g = _rand((b * d, h, w, f), seed=2)

    _, pull_pl = jax.vjp(lambda t: tap_combine(t, d, f, True), x)
    _, pull_xla = jax.vjp(lambda t: tap_combine_xla(t, d, f), x)
    np.testing.assert_allclose(np.asarray(pull_pl(g)[0]),
                               np.asarray(pull_xla(g)[0]),
                               rtol=1e-5, atol=1e-5)


def test_tap_combine_shard_map_matches():
    """mesh-sharded kernel (8 CPU devices, interpret) == unsharded: the
    D-major flattening keeps each item's depth column inside one shard, so
    sharding the items changes placement only."""
    from depthestimation_tpu.parallel import mesh as mesh_lib

    b, d, h, w, f = 8, 4, 3, 8, 8
    mesh = mesh_lib.make_mesh(8)
    x = _rand((b * d, h, w, 3 * f))
    y_1 = tap_combine(x, d, f, True)
    y_8 = jax.jit(lambda t: tap_combine(t, d, f, True, mesh))(x)
    np.testing.assert_allclose(np.asarray(y_8), np.asarray(y_1),
                               rtol=1e-6, atol=1e-6)

    g = _rand((b * d, h, w, f), seed=3)
    _, pull_1 = jax.vjp(lambda t: tap_combine(t, d, f, True), x)
    _, pull_8 = jax.vjp(
        lambda t: tap_combine(t, d, f, True, mesh), x)
    np.testing.assert_allclose(np.asarray(pull_8(g)[0]),
                               np.asarray(pull_1(g)[0]),
                               rtol=1e-6, atol=1e-6)
