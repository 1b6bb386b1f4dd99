"""cfg.var.pnoise: train-time pose-noise augmentation is applied to
src_cam_poses (reference kittiloader/batch_scheduler.py:208)."""

import numpy as np
import jax
import jax.numpy as jnp

from depthestimation_tpu.config import config_from_dict
from depthestimation_tpu.data.scheduler import BatchScheduler
from depthestimation_tpu.data.video_synthetic import SyntheticStereoVideoDataset
from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model
from depthestimation_tpu.ops.geometry import add_noise_to_pose
from depthestimation_tpu.trainer import get_trainer
from depthestimation_tpu.utils.logger import init_logger
import pytest


def test_add_noise_to_pose_properties():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 3, 1, 1))
    poses[..., :3, 3] = rng.normal(0, 1, (2, 3, 3))
    noisy = np.asarray(add_noise_to_pose(jax.random.PRNGKey(0),
                                         jnp.asarray(poses), 0.2))
    assert noisy.shape == poses.shape
    assert not np.allclose(noisy, poses)
    # rotations stay orthonormal
    r = noisy[..., :3, :3].reshape(-1, 3, 3)
    np.testing.assert_allclose(r @ r.transpose(0, 2, 1),
                               np.tile(np.eye(3), (r.shape[0], 1, 1)),
                               atol=1e-5)
    assert np.allclose(noisy[..., 3, :], poses[..., 3, :])


def _cfg(pnoise):
    return config_from_dict({
        "data": {"exp_name": "pn", "model_name": "base", "loss_name": "base",
                 "trainer_name": "default", "dataset_path": "kitti",
                 "dataset_split": "k1"},
        "var": {"sigma_soft_max": 10.0, "t_win": 1, "d_min": 5.0,
                "d_max": 40.0, "feature_dim": 8, "ndepth": 8, "softce": 0.3,
                "qpower": 1.0, "img_size": [48, 32], "crop_w": 48,
                "nmode": "default", "bn_avg": False, "pnoise": pnoise},
        "loss": {"ce_mul": 1.0, "dsc_mul": 0.0, "rsc_mul": 0.0,
                 "smooth_mul": 0.0, "dc_mul": 0.0, "rsc_low_mul": 0.0},
        "train": {"batch_size": 2, "lr": 1e-4, "epoch_num": 1, "n_gpu": 1,
                  "optim": "adam", "print_freq": 1},
    })


@pytest.mark.slow
def test_pnoise_wired_into_training(tmp_path, monkeypatch):
    cfg = _cfg(0.3)
    ds = SyntheticStereoVideoDataset(n_traj=2, traj_len=2, h=32, w=48,
                                     ndepth=8)
    train = BatchScheduler(ds, 2, shuffle=False, prefetch=False)
    model, loss = get_model(cfg), get_loss(cfg)
    logger = init_logger("pn", str(tmp_path))
    trainer = get_trainer(cfg)(0, model, loss, logger, str(tmp_path), cfg,
                               train, train)

    calls = []
    import depthestimation_tpu.ops.geometry as geo
    orig = geo.add_noise_to_pose

    def spy(key, poses, level):
        calls.append(float(level))
        return orig(key, poses, level)

    monkeypatch.setattr(geo, "add_noise_to_pose", spy)
    mean_loss = trainer._run_one_epoch()
    assert np.isfinite(mean_loss)
    assert calls and all(abs(c - 0.3) < 1e-9 for c in calls)
