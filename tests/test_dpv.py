import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu import ops


def test_powerf_linear():
    d = ops.powerf(5.0, 40.0, 64, 1.0)
    assert d[0] == 5.0 and d[-1] == 40.0
    np.testing.assert_allclose(np.diff(d), np.diff(d)[0], rtol=1e-9)


def test_powerf_power():
    d = ops.powerf(2.0, 10.0, 16, 2.0)
    x = np.linspace(0, 1, 16) ** 2
    np.testing.assert_allclose(d, 2.0 + 8.0 * x, rtol=1e-12)


def test_gen_soft_label_normalized_and_peaked():
    d_candi = ops.powerf(5.0, 40.0, 64, 1.0)
    depth = jnp.full((8, 12), 20.0)
    sl = ops.gen_soft_label(d_candi, depth, 0.3)
    assert sl.shape == (64, 8, 12)
    np.testing.assert_allclose(np.asarray(jnp.sum(sl, axis=0)), 1.0, atol=1e-5)
    peak = int(jnp.argmax(sl[:, 0, 0]))
    assert peak == int(np.argmin(np.abs(d_candi - 20.0)))


def test_gen_soft_label_zero_invalid():
    d_candi = ops.powerf(5.0, 40.0, 8, 1.0)
    depth = jnp.array([[100000.0]])  # way out of range -> all-zero gaussian
    sl = ops.gen_soft_label(d_candi, depth, 0.1, zero_invalid=True)
    assert np.all(np.asarray(sl) == -1.0)


def test_dpv_to_depthmap_delta():
    d_candi = ops.powerf(5.0, 40.0, 16, 1.0)
    dpv = jnp.zeros((1, 16, 4, 4)).at[:, 7].set(1.0)
    dm = ops.dpv_to_depthmap(dpv, d_candi)
    np.testing.assert_allclose(np.asarray(dm), d_candi[7], rtol=1e-6)
    dm_log = ops.dpv_to_depthmap(jnp.log(dpv + 1e-30), d_candi, log=True)
    np.testing.assert_allclose(np.asarray(dm_log), d_candi[7], rtol=1e-4)


def test_upsample_dpv():
    rng = np.random.default_rng(0)
    p = rng.random((2, 16, 6, 8)).astype(np.float32)
    p /= p.sum(1, keepdims=True)
    up = ops.upsample_dpv(jnp.asarray(p), 32)
    assert up.shape == (2, 32, 6, 8)
    np.testing.assert_allclose(np.asarray(up.sum(1)), 1.0, atol=1e-5)
    same = ops.upsample_dpv(jnp.asarray(p), 16)
    assert same.shape == p.shape

    lg = ops.upsample_dpv(jnp.log(jnp.asarray(p)), 32, log=True)
    np.testing.assert_allclose(np.asarray(jnp.exp(lg).sum(1)), 1.0, atol=1e-4)


def test_spread_dpv_box_filter():
    rng = np.random.default_rng(1)
    p = rng.random((1, 9, 3, 4)).astype(np.float32)
    p /= p.sum(1, keepdims=True)
    out = ops.spread_dpv(jnp.asarray(p), 5)
    # manual zero-padded box filter along D
    pad = np.pad(p, [(0, 0), (2, 2), (0, 0), (0, 0)])
    man = sum(pad[:, k:k + 9] for k in range(5))
    man /= man.sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), man, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.sum(1)), 1.0, atol=1e-5)


def test_gen_dpv_withmask():
    d_candi = ops.powerf(5.0, 40.0, 16, 1.0)
    dmaps = jnp.full((1, 4, 4), 20.0)
    masks = jnp.zeros((1, 1, 4, 4)).at[0, 0, :2].set(1.0)
    dpv = ops.gen_dpv_withmask(dmaps, masks, d_candi, 0.3)
    # masked-off rows are uniform
    np.testing.assert_allclose(np.asarray(dpv[0, :, 3, 0]), 1.0 / 16, atol=1e-6)
    # valid rows peak at 20m
    assert int(jnp.argmax(dpv[0, :, 0, 0])) == int(np.argmin(np.abs(d_candi - 20)))


def test_lc_intensities_to_dist():
    d_candi = jnp.linspace(1.0, 10.0, 32)
    placement = jnp.full((4, 4, 1), 5.0)
    # measured intensity equals the model's peak response -> peak at placement
    mean_int, lik = ops.lc_intensities_to_dist(
        d_candi, placement, jnp.full((4, 4, 1), 0.5), jnp.full((4, 4, 1), 1.0),
        0.1, 0.5)
    assert lik.shape == (4, 4, 32)
    np.testing.assert_allclose(np.asarray(lik.sum(-1)), 1.0, atol=1e-4)
    peaks = np.asarray(jnp.argmax(lik, -1))
    expect = int(np.argmin(np.abs(np.asarray(d_candi) - 5.0)))
    assert np.all(peaks == expect)


def test_mixed_model_normalized():
    d_candi = ops.powerf(5.0, 40.0, 16, 1.0)
    z = jnp.full((4, 4), 12.0)
    unc = jnp.full((4, 4), 0.5)
    a = jnp.full((4, 4), 0.7)
    dpv = ops.mixed_model(d_candi, z, unc, a, 1.0 - a)
    np.testing.assert_allclose(np.asarray(dpv.sum(0)), 1.0, atol=1e-5)


def test_invert_curve():
    for p in (0.25, 0.5, 0.75):
        assert float(ops.invert_curve(jnp.float32(p), p)) == pytest.approx(1.0, abs=1e-5)
    assert float(ops.invert_curve(jnp.float32(0.0), 0.5)) == pytest.approx(0.0, abs=1e-6)
