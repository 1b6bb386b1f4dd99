"""bn_avg=True path (the flagship config's BatchNorm mode): running stats
update during training and are used at eval."""

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.config import config_from_dict
from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model
from depthestimation_tpu.parallel.train_step import (
    init_state,
    make_eval_step,
    make_train_step,
)
from depthestimation_tpu.trainer.default import _soft_labels
from tests.test_models import BASE_CFG, _inputs
import pytest


@pytest.mark.slow
def test_batch_stats_update_and_eval_use():
    cfg = config_from_dict(BASE_CFG)
    cfg.var.bn_avg = True
    cfg.var.nmode = "exp7"
    model = get_model(cfg)
    loss = get_loss(cfg)
    mi, gt = _inputs()

    state, tx = init_state(model, cfg, mi, jax.random.PRNGKey(0))
    assert state.batch_stats, "bn_avg=True must create batch_stats"
    means0 = jax.tree_util.tree_leaves(state.batch_stats)
    assert all(np.allclose(np.asarray(m), 0) or np.allclose(np.asarray(m), 1)
               for m in means0)

    step = make_train_step(model, loss, tx, donate=False)
    d_candi = jnp.asarray(mi["d_candi"], jnp.float32)
    gt = dict(gt)
    gt["soft_labels"] = _soft_labels(gt["dmaps"], gt["masks"], d_candi,
                                     jnp.float32(0.3), 32)
    gt["soft_labels_imgsize"] = _soft_labels(
        gt["dmap_imgsizes"], gt["masks_imgsizes"], d_candi, jnp.float32(0.3),
        32)
    mi = dict(mi)
    mi["prev_output"] = None
    mi["prev_lc"] = None
    new_state, lv, _ = step(state, mi, mi, gt, gt, jax.random.PRNGKey(1))
    assert np.isfinite(float(lv))

    # running stats moved away from init
    moved = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(new_state.batch_stats),
        jax.tree_util.tree_leaves(state.batch_stats))]
    assert max(moved) > 1e-6

    # eval consumes running stats: different stats -> different outputs
    eval_step = make_eval_step(model)
    o1 = eval_step(new_state.params, new_state.batch_stats, mi)
    perturbed = jax.tree_util.tree_map(lambda x: x + 0.5,
                                       new_state.batch_stats)
    o2 = eval_step(new_state.params, perturbed, mi)
    d = float(jnp.max(jnp.abs(o1["output_refined"][-1]
                              - o2["output_refined"][-1])))
    assert d > 1e-4
