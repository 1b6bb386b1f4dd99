"""The simulated LC loop runs INSIDE the jitted train step.

The reference runs lc_process inside the DDP-wrapped model forward
(models.py:783-784); round 3 dispatched it as two extra jitted programs per
step (left + right, ~2 x 78 ms at B=8). This pins the fused path: with the
simulator (no real_lc), the train step itself must produce the prev_lc
feedback (aux["prev_lc_left"/"prev_lc_right"]) from ONE stacked 2B-batch
lc_process call, and the host-dispatch fallback must never run.
"""

import numpy as np
import pytest

from depthestimation_tpu.config import config_from_dict
from depthestimation_tpu.data.scheduler import BatchScheduler
from depthestimation_tpu.data.video_synthetic import SyntheticStereoVideoDataset
from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model
from depthestimation_tpu.trainer import get_trainer
from depthestimation_tpu.utils.logger import init_logger

W, H, D = 96, 64, 16


@pytest.mark.slow
def test_sim_lc_runs_inside_train_step(tmp_path):
    cfg = config_from_dict({
        "data": {"exp_name": "lc_fused", "model_name": "base",
                 "loss_name": "base", "trainer_name": "default",
                 "dataset_path": "kitti", "dataset_split": "k1"},
        "var": {"sigma_soft_max": 10.0, "t_win": 1, "d_min": 3.0,
                "d_max": 18.0, "feature_dim": 16, "ndepth": D,
                "softce": 0.3, "qpower": 1.0, "img_size": [W, H],
                "crop_w": W, "nmode": "exp7_lc", "bn_avg": False},
        "lc": {"enabled": True, "iterations": 1, "planner": "default",
               "params": {"step": [0.5], "spread_iter": 1, "spread_n": 3},
               "use_lc_prob": 1.0},
        "loss": {"ce_mul": 1.0, "dsc_mul": 0.0, "rsc_mul": 0.0,
                 "smooth_mul": 0.5, "dc_mul": 0.0, "rsc_low_mul": 0.0},
        "train": {"batch_size": 2, "lr": 1e-5, "epoch_num": 1, "n_gpu": 1,
                  "optim": "adam", "print_freq": 1},
    })
    ds = SyntheticStereoVideoDataset(n_traj=2, traj_len=2, h=H, w=W,
                                     ndepth=D, d_min=3.0, d_max=18.0)
    train = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    val = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    model = get_model(cfg)
    loss = get_loss(cfg)
    logger = init_logger("lc_fused", str(tmp_path))
    trainer = get_trainer(cfg)(0, model, loss, logger, str(tmp_path), cfg,
                               train, val)

    def fail_run_lc(*a, **k):
        raise AssertionError("host-dispatch _run_lc must not run for the "
                             "simulated LC path (fused into the train step)")

    trainer._run_lc = fail_run_lc
    mean_loss = trainer._run_one_epoch()
    assert np.isfinite(mean_loss)
    assert trainer.real_lc is None
    # prev_lc feedback produced by the STEP (quarter-res log DPV, both sides)
    for side in ("left", "right"):
        pl = trainer.prev_lc[side]
        assert pl is not None and pl.shape == (2, D, H // 4, W // 4)
        arr = np.asarray(pl)
        assert np.isfinite(arr).all()
        # a log DPV: per-pixel probabilities sum to 1
        np.testing.assert_allclose(np.exp(arr).sum(axis=1), 1.0, atol=1e-3)
