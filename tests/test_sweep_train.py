"""End-to-end SweepModel training smoke: model + SweepLoss + SweepTrainer on
the synthetic sweep dataset (the reference's sweep_trainer.py flow)."""

import numpy as np

from depthestimation_tpu.config import config_from_dict
from depthestimation_tpu.data.scheduler import BatchScheduler
from depthestimation_tpu.data.video_synthetic import SyntheticSweepVideoDataset
from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model
from depthestimation_tpu.trainer import get_trainer
from depthestimation_tpu.utils.logger import init_logger


def test_sweep_training_step(tmp_path):
    cfg = config_from_dict({
        "data": {"exp_name": "sweep_t", "model_name": "sweep",
                 "loss_name": "sweep", "trainer_name": "sweep",
                 "dataset_path": "sweep", "dataset_split": "sweep"},
        "var": {"sigma_soft_max": 10.0, "t_win": 1, "d_min": 3.0,
                "d_max": 30.0, "feature_dim": 32, "ndepth": 16,
                "softce": 0.3, "qpower": 1.0, "img_size": [96, 64],
                "crop_w": 96, "nmode": "default", "bn_avg": False},
        "loss": {"img_mult": 1.0, "model_mult": 0.0, "c_mult": 0.0},
        "train": {"batch_size": 2, "lr": 1e-4, "epoch_num": 1, "n_gpu": 1,
                  "optim": "adam", "print_freq": 1},
    })
    ds = SyntheticSweepVideoDataset(n_traj=2, traj_len=2, h=64, w=96,
                                    ndepth=16, d_min=3.0, d_max=30.0,
                                    planes=16)
    train = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    val = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    model = get_model(cfg)
    loss = get_loss(cfg)
    logger = init_logger("sweep_t", str(tmp_path))
    trainer = get_trainer(cfg)(0, model, loss, logger, str(tmp_path), cfg,
                               train, val)
    mean_loss = trainer._run_one_epoch()
    assert np.isfinite(mean_loss) and mean_loss > 0
    errs, keys = trainer._validate_with_gt()
    assert keys == ["peak_int_err"]
    assert np.isfinite(errs[0])
