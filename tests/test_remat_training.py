"""Rematerialized train step == plain train step (bitwise same math, only
the backward's activation storage changes). Remat is what lets batch >= 4
fit one chip's HBM at full size (train_step.py:make_train_step)."""

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model
from depthestimation_tpu.ops.dpv import powerf
from depthestimation_tpu.parallel.train_step import init_state, make_train_step
from depthestimation_tpu.trainer.default import _soft_labels
import pytest


@pytest.mark.slow
def test_remat_matches_plain_step():
    from __graft_entry__ import _cfg, _sample_input

    cfg = _cfg(feature_dim=16, ndepth=16, w=48, h=32, batch=2, nmode="exp7")
    model = get_model(cfg)
    loss_mod = get_loss(cfg)
    mi, gt = _sample_input(cfg, batch=2)
    mi = dict(mi)
    mi["prev_output"] = None
    mi["prev_lc"] = None
    gt = dict(gt)
    d_candi = jnp.asarray(powerf(cfg.var.d_min, cfg.var.d_max,
                                 cfg.var.ndepth, cfg.var.qpower), jnp.float32)
    gt["soft_labels"] = _soft_labels(gt["dmaps"], gt["masks"], d_candi,
                                     jnp.float32(0.3), cfg.var.ndepth)
    gt["soft_labels_imgsize"] = _soft_labels(
        gt["dmap_imgsizes"], gt["masks_imgsizes"], d_candi, jnp.float32(0.3),
        cfg.var.ndepth)

    state0, tx = init_state(model, cfg, mi, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    results = {}
    for remat in (False, True):
        step = make_train_step(model, loss_mod, tx, donate=False,
                               remat=remat)
        state, l, _ = step(state0, mi, mi, gt, gt, key)
        results[remat] = (float(l),
                          jax.tree_util.tree_leaves(state.params)[0])

    assert np.isclose(results[False][0], results[True][0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(results[False][1]),
                               np.asarray(results[True][1]), atol=1e-6)

    # block-level remat granularities (encoder/sweep/base3d/decoder
    # checkpointed inside the model — tpu.remat / auto at batch >= 4);
    # every granularity must compute the SAME loss as the plain step
    for mode in (True, "hot", "save3d"):
        cfg["tpu"] = {"mesh": "auto", "dtype": "float32", "donate": False,
                      "remat": mode}
        model_r = get_model(cfg)
        assert model_r.remat == mode
        state_r, tx_r = init_state(model_r, cfg, mi, jax.random.PRNGKey(0))
        step_r = make_train_step(model_r, loss_mod, tx_r, donate=False)
        _, l_r, _ = step_r(state_r, mi, mi, gt, gt, key)
        assert np.isclose(float(l_r), results[False][0], rtol=1e-6), mode
