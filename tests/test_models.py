"""Forward smoke + shape tests for the model families and BaseLoss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthestimation_tpu.config import config_from_dict
from depthestimation_tpu.data import synthetic
from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model

BASE_CFG = {
    "data": {"exp_name": "t", "model_name": "base", "loss_name": "base",
             "trainer_name": "default", "dataset_path": "kitti",
             "dataset_split": "k1"},
    "var": {"sigma_soft_max": 10.0, "t_win": 1, "d_min": 5.0, "d_max": 40.0,
            "feature_dim": 32, "ndepth": 32, "softce": 0.3, "qpower": 1.0,
            "img_size": [96, 64], "crop_w": 96, "nmode": "exp7",
            "bn_avg": False},
    "loss": {"ce_mul": 1.0, "dsc_mul": 1.0, "rsc_mul": 1.0, "smooth_mul": 0.5,
             "dc_mul": 0.25, "rsc_low_mul": 0.0},
    "train": {"batch_size": 2, "lr": 1e-4, "epoch_num": 1, "n_gpu": 1,
              "optim": "adam"},
}


def _inputs(nd=32, b=2):
    mi, gt = synthetic.make_batch(batch=b, h=64, w=96, ndepth=nd, seed=0)
    mi = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
          for k, v in mi.items()}
    gt = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
          for k, v in gt.items()}
    return mi, gt


def _make(nmode):
    cfg = config_from_dict(BASE_CFG)
    cfg.var.nmode = nmode
    return cfg, get_model(cfg)


@pytest.mark.parametrize("nmode", ["default", "exp7", "exp7_lc"])
def test_base_model_forward_shapes(nmode):
    cfg, model = _make(nmode)
    mi, _ = _inputs()
    rngs = {"params": jax.random.PRNGKey(0), "lc_drop": jax.random.PRNGKey(1)}
    variables = model.init(rngs, mi, train=False)
    out = model.apply(variables, mi, train=False,
                      rngs={"lc_drop": jax.random.PRNGKey(2)})
    assert out["output"][-1].shape == (2, 32, 16, 24)
    assert out["output_refined"][-1].shape == (2, 32, 64, 96)
    # log-softmax: probabilities sum to 1 along D
    p = np.asarray(jnp.exp(out["output_refined"][-1]).sum(1))
    np.testing.assert_allclose(p, 1.0, atol=1e-4)


def test_exp7_uses_prev_output():
    cfg, model = _make("exp7")
    mi, _ = _inputs()
    rngs = {"params": jax.random.PRNGKey(0), "lc_drop": jax.random.PRNGKey(1)}
    variables = model.init(rngs, mi, train=False)
    out0 = model.apply(variables, mi, train=False)
    mi2 = dict(mi)
    mi2["prev_output"] = out0["output"][-1]
    out1 = model.apply(variables, mi2, train=False)
    # feeding a different prior must change the fused volume
    d = float(jnp.mean(jnp.abs(out1["output"][-1] - out0["output"][-1])))
    assert d > 1e-6


def test_default_model():
    cfg = config_from_dict(BASE_CFG)
    cfg.data.model_name = "default"
    model = get_model(cfg)
    mi, _ = _inputs()
    variables = model.init(jax.random.PRNGKey(0), mi)
    out = model.apply(variables, mi)
    assert out["output"][-1].shape == (2, 32, 16, 24)
    assert out["output_refined"][-1].shape == (2, 32, 64, 96)


@pytest.mark.slow
def test_base_loss_finite_and_positive():
    cfg, model = _make("exp7")
    mi, gt = _inputs()
    rngs = {"params": jax.random.PRNGKey(0), "lc_drop": jax.random.PRNGKey(1)}
    variables = model.init(rngs, mi, train=False)
    out = model.apply(variables, mi, train=False)
    loss_fn = get_loss(cfg)
    loss = loss_fn([out, out], [gt, gt])
    assert np.isfinite(float(loss))
    assert float(loss) > 0


@pytest.mark.slow
def test_loss_differentiable():
    cfg, model = _make("exp7")
    mi, gt = _inputs()
    rngs = {"params": jax.random.PRNGKey(0), "lc_drop": jax.random.PRNGKey(1)}
    variables = model.init(rngs, mi, train=True)
    loss_fn = get_loss(cfg)

    def f(params):
        out = model.apply({"params": params}, mi, train=True,
                          rngs={"lc_drop": jax.random.PRNGKey(2)})
        return loss_fn([out, out], [gt, gt])

    g = jax.grad(f)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(total) and total > 0
