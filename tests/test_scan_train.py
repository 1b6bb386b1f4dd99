"""Train-through-time: the lax.scan train rollout matches the per-frame loop.

SURVEY §7 stage 6 names in-graph frame recursion as the TPU-native design;
round 3 wired it into eval only (models/rollout.py). This pins the training
version (parallel.train_step.make_train_rollout + DefaultTrainer
_run_one_epoch_scan): per-frame optimizer updates and the quarter-res
prev_output/prev_lc feedback run inside ONE jitted scan per frame chunk,
and the per-frame loss sequence must match the Python-loop path (relative
tolerance — scan vs loop changes XLA:CPU float reassociation, CLAUDE.md).
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

W, H, D = 48, 32, 16


def _cfg(nmode: str, scan: bool, exp: str):
    lc_enabled = nmode == "exp7_lc"
    return config_from_dict({
        "data": {"exp_name": exp, "model_name": "base",
                 "loss_name": "base", "trainer_name": "default",
                 "dataset_path": "kitti", "dataset_split": "k1"},
        "var": {"sigma_soft_max": 10.0, "t_win": 1, "d_min": 3.0,
                "d_max": 18.0, "feature_dim": 16, "ndepth": D,
                "softce": 0.3, "qpower": 1.0, "img_size": [W, H],
                "crop_w": W, "nmode": nmode, "bn_avg": False},
        "lc": ({"enabled": True, "iterations": 1, "planner": "default",
                "params": {"step": [0.5], "spread_iter": 1, "spread_n": 3},
                "use_lc_prob": 1.0} if lc_enabled else {"enabled": False}),
        "loss": {"ce_mul": 1.0, "dsc_mul": 0.0, "rsc_mul": 0.0,
                 "smooth_mul": 0.5, "dc_mul": 0.0, "rsc_low_mul": 0.0},
        "train": {"batch_size": 2, "lr": 1e-4, "epoch_num": 1, "n_gpu": 1,
                  "optim": "adam", "print_freq": 1},
        "tpu": {"scan_train": scan, "scan_chunk": 2},
        "seed": 7,
    })


def _epoch_losses(nmode: str, scan: bool, tmp_path, traj_len=4):
    cfg = _cfg(nmode, scan, f"scan_train_{nmode}_{int(scan)}")
    ds = SyntheticStereoVideoDataset(n_traj=2, traj_len=traj_len, h=H, w=W,
                                     ndepth=D, d_min=3.0, d_max=18.0)
    train = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    val = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    model = get_model(cfg)
    loss = get_loss(cfg)
    logger = init_logger(cfg.data.exp_name, str(tmp_path))
    trainer = get_trainer(cfg)(0, model, loss, logger, str(tmp_path), cfg,
                               train, val)
    if scan:
        assert trainer._use_scan_train()

        def fail_loop(*a, **k):
            raise AssertionError("scan_train config must use the scan path")

        trainer._run_one_epoch_loop = fail_loop
    trainer._run_one_epoch()
    return trainer._last_epoch_losses


@pytest.mark.slow
@pytest.mark.parametrize("nmode", ["exp7", "exp7_lc"])
def test_scan_train_matches_per_frame_loop(nmode, tmp_path):
    loop = _epoch_losses(nmode, False, tmp_path / "loop")
    scan = _epoch_losses(nmode, True, tmp_path / "scan")
    # one video batch holds both trajectories (batch_size=2) x 4 frames
    assert len(loop) == len(scan) == 4
    np.testing.assert_allclose(scan, loop, rtol=5e-4, atol=1e-5)
