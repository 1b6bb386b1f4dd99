"""Mixed-precision (bf16 conv compute, f32 params/optimizer) training:
the TPU production configuration. Pins that the full train step runs and
the loss decreases — i.e. bf16 gradients are good enough to optimize."""

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model
from depthestimation_tpu.parallel.train_step import init_state, make_train_step
from depthestimation_tpu.trainer.default import _soft_labels
from depthestimation_tpu.ops.dpv import powerf
import pytest


@pytest.mark.slow
def test_bf16_train_step_decreases_loss():
    from __graft_entry__ import _cfg, _sample_input

    cfg = _cfg(feature_dim=16, ndepth=16, w=48, h=32, batch=2, nmode="exp7")
    cfg["tpu"] = {"mesh": "auto", "dtype": "bfloat16", "donate": False}
    model = get_model(cfg)
    assert model.dtype == jnp.bfloat16
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

    state, tx = init_state(model, cfg, mi, jax.random.PRNGKey(0))
    # params stay f32 even though conv compute is bf16
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state.params))
    step = make_train_step(model, loss_mod, tx, donate=False)

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, l, _ = step(state, mi, mi, gt, gt, jax.random.fold_in(key, i))
        losses.append(float(l))
    assert np.all(np.isfinite(losses))
    # monotone optimization at lr=1e-5: ~1.3%/step on this toy batch
    assert losses[-1] < losses[0] * 0.95, losses
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
