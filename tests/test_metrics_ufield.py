import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu import ops
from depthestimation_tpu.ops.ufield import UFieldParams


def test_depth_error_manual():
    gt = np.array([[10.0, 0.0], [20.0, 5.0]], np.float32)
    pred = np.array([[12.0, 3.0], [18.0, 5.0]], np.float32)
    e = np.asarray(ops.depth_error(jnp.asarray(pred), jnp.asarray(gt)))
    valid_gt = np.array([10.0, 20.0, 5.0])
    valid_pr = np.array([12.0, 18.0, 5.0])
    np.testing.assert_allclose(e[0], np.mean(np.abs(valid_gt - valid_pr)), rtol=1e-4)
    np.testing.assert_allclose(e[1], np.sqrt(np.mean((valid_gt - valid_pr) ** 2)),
                               rtol=1e-4)
    dl = np.log(valid_gt) - np.log(valid_pr)
    np.testing.assert_allclose(e[6], np.sqrt(np.mean(dl**2) - np.mean(dl) ** 2),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(e[7], np.mean(np.abs(valid_gt - valid_pr) / valid_gt),
                               rtol=1e-4)


def test_eval_errors_aggregation():
    errs = [np.arange(9.0), np.arange(9.0) * 3]
    out = ops.eval_errors(errs)
    assert out["rmse"] == [2.0, 1.0, 3.0]
    assert set(out) == set(ops.metrics.METRIC_NAMES) if hasattr(ops, "metrics") else True


def test_gen_ufield_normalized_no_shift():
    """With pshift=0 and an all-pass band, each UF column is a normalized
    distribution over depth."""
    d_candi = ops.powerf(5.0, 40.0, 16, 1.0)
    rng = np.random.default_rng(0)
    p = rng.random((16, 24, 32)).astype(np.float32)
    p /= p.sum(0, keepdims=True)
    intr = jnp.array([[20.0, 0, 16.0], [0, 20.0, 12.0], [0, 0, 1]])
    params = UFieldParams(pshift=0, zstart=-100.0, zend=100.0, maxd=1000.0,
                          mind=0.0, quash=False)
    uf, dm = ops.gen_ufield(jnp.log(jnp.asarray(p)), d_candi, intr, params,
                            log=True)
    assert uf.shape == (16, 32)
    assert dm.shape == (24, 32)
    np.testing.assert_allclose(np.asarray(uf.sum(0)), 1.0, atol=1e-4)


def test_gen_ufield_band_masking():
    """Rows whose back-projected y falls outside [zstart, zend] contribute 0."""
    d_candi = ops.powerf(5.0, 40.0, 8, 1.0)
    dpv = jnp.full((8, 24, 32), 1.0 / 8)
    intr = jnp.array([[20.0, 0, 16.0], [0, 20.0, 0.0], [0, 0, 1]])
    # with cy=0, y = (row/fy)*z >= 0; pick a band excluding everything
    params = UFieldParams(pshift=0, zstart=1e6, zend=2e6, maxd=1e9, mind=0.0,
                          quash=False)
    uf, _ = ops.gen_ufield(dpv, d_candi, intr, params, log=False)
    assert np.all(np.isnan(np.asarray(uf)))  # 0/0 columns — callers mask


def test_compute_unc_rmse_identical_fields():
    """Identical fields differ only at the first/last predicted columns,
    which the reference zeroes (img_utils.py:375-376) — replicate exactly."""
    d_candi = ops.powerf(5.0, 40.0, 16, 1.0)
    rng = np.random.default_rng(1)
    uf = rng.random((16, 32)).astype(np.float32)
    uf /= uf.sum(0, keepdims=True)
    err = float(ops.compute_unc_rmse(jnp.asarray(uf), jnp.asarray(uf), d_candi))
    td = (d_candi[:, None] * uf).sum(0)
    expected = (abs(td[0]) + abs(td[-1])) / 32.0
    assert err == pytest.approx(expected, rel=1e-3)
