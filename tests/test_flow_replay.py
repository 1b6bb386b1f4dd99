"""Flow-loss training signal and the headless replay driver."""

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.config import config_from_dict
from depthestimation_tpu.losses.flow_loss import UnFlowLoss
from depthestimation_tpu.models.pwclite import PWCLite
import pytest


@pytest.mark.slow
def test_unflow_loss_differentiable():
    cfg = config_from_dict({
        "data": {"exp_name": "f", "model_name": "pwclite", "loss_name": "flow",
                 "trainer_name": "default", "dataset_path": "x",
                 "dataset_split": "x"},
        "var": {"img_size": [128, 64], "crop_w": 128, "t_win": 1,
                "d_min": 1.0, "d_max": 10.0, "ndepth": 8, "qpower": 1.0,
                "sigma_soft_max": 10.0, "feature_dim": 8, "softce": 0.3,
                "nmode": "default", "bn_avg": False},
        "loss": {"w_ssim": 0.85, "w_smooth": 10.0},
        "train": {"batch_size": 1, "lr": 1e-4, "epoch_num": 1, "n_gpu": 1,
                  "optim": "adam"},
    })
    # output_level=2 keeps the grad graph small (full-depth forward is
    # covered by test_models_extra.test_pwclite_forward)
    model = PWCLite(n_frames=2, output_level=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 6, 64, 128)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    loss_fn = UnFlowLoss(cfg)

    def f(params):
        out = model.apply({"params": params}, x, with_bk=True)
        return loss_fn(out, x)

    val, grads = jax.value_and_grad(f)(variables["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    total = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_replay_driver_scores_decrease():
    from depthestimation_tpu.runtime.planner_runtime import ReplayDriver
    from tests.test_runtime import _runtime, W, H

    rt = _runtime()
    depth = np.full((H, W), 18.0, np.float32)
    frames = [{"depth": depth} for _ in range(4)]
    scores = ReplayDriver(rt).play(frames)
    assert len(scores) == 4
    assert scores[-1] < scores[0], scores
