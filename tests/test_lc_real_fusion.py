"""E2E recorded-sweep fusion: the ``lc`` nmode trained with a real LC device
configured routes the prev_lc feedback through ``lc_process_real`` (recorded
128-plane sweep sampling) instead of the simulator — the reference's
models.py:822-827 dispatch wired through the trainer."""

import json

import numpy as np
import pytest

from depthestimation_tpu.config import config_from_dict
from depthestimation_tpu.data.scheduler import BatchScheduler
from depthestimation_tpu.data.video_synthetic import SyntheticSweepVideoDataset
from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model
from depthestimation_tpu.trainer import get_trainer
from depthestimation_tpu.utils.logger import init_logger

W, H, D = 96, 64, 16


def _toy_sensor(w, h, d_min, d_max, n):
    f = 0.8 * w
    intr = [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]]
    return {
        "name": "toy_fusion", "N": n, "q_power": 1.0,
        "s_range": d_min, "e_range": d_max,
        "intr_rgb": intr, "intr_lc": intr,
        "dist_rgb": [0] * 5, "dist_lc": [0] * 5,
        "size_rgb": [w, h], "size_lc": [w, h],
        "rTc": np.eye(4).tolist(),
        "lTc": [[1, 0, 0, 0.2], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        "laser_fov": 80.0, "laser_timestep": 1.5e-4,
        "expand_A": n, "expand_B": n,
        "unc_shift": 1.0, "unc_span": 0.3, "unc_ang": 0,
    }


@pytest.fixture(scope="module")
def sensor_json(tmp_path_factory):
    p = tmp_path_factory.mktemp("sensor") / "toy_fusion.json"
    json.dump(_toy_sensor(W, H, 3.0, 18.0, D), open(p, "w"))
    return str(p)


@pytest.mark.slow
def test_lc_nmode_trains_with_recorded_sweep(tmp_path, sensor_json):
    cfg = config_from_dict({
        "data": {"exp_name": "lc_fusion", "model_name": "base",
                 "loss_name": "base", "trainer_name": "default",
                 "dataset_path": "sweep", "dataset_split": "sweep"},
        "var": {"sigma_soft_max": 10.0, "t_win": 1, "d_min": 3.0,
                "d_max": 18.0, "feature_dim": 16, "ndepth": D,
                "softce": 0.3, "qpower": 1.0, "img_size": [W, H],
                "crop_w": W, "nmode": "lc", "bn_avg": False},
        "lc": {"enabled": True, "iterations": 1, "planner": "default",
               "params": {"step": [0.5], "spread_iter": 1, "spread_n": 3},
               "use_lc_prob": 1.0,
               "algo_lc_config": sensor_json,
               "real_lc_config": sensor_json},
        "loss": {"ce_mul": 1.0, "dsc_mul": 0.0, "rsc_mul": 0.0,
                 "smooth_mul": 0.5, "dc_mul": 0.0, "rsc_low_mul": 0.0},
        "train": {"batch_size": 2, "lr": 1e-5, "epoch_num": 1, "n_gpu": 1,
                  "optim": "adam", "print_freq": 1},
    })
    ds = SyntheticSweepVideoDataset(n_traj=2, traj_len=2, h=H, w=W,
                                    ndepth=D, d_min=3.0, d_max=18.0,
                                    planes=16)
    train = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    val = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    model = get_model(cfg)
    loss = get_loss(cfg)
    logger = init_logger("lc_fusion", str(tmp_path))
    trainer = get_trainer(cfg)(0, model, loss, logger, str(tmp_path), cfg,
                               train, val)

    calls = []
    orig = trainer._run_lc

    def spy(refined, mi, key):
        calls.append("sweep_arr_tensor" in mi)
        return orig(refined, mi, key)

    trainer._run_lc = spy
    mean_loss = trainer._run_one_epoch()
    assert np.isfinite(mean_loss)
    # the real device was built and every LC call saw recorded sweep tensors
    assert trainer.real_lc is not None and trainer.real_lc.initialized
    assert calls and all(calls)
    # prev_lc feedback produced (quarter-res log DPV, finite)
    pl = trainer.prev_lc["left"]
    assert pl is not None and pl.shape[1] == D
    assert np.isfinite(np.asarray(pl)).all()
