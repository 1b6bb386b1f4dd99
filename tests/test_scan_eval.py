"""Scan-rollout eval path: the lax.scan validation (DefaultTrainer
``_validate_scan``) must produce the same metrics as the per-frame loop
(``_validate_with_gt``), including across chunk boundaries and trajectory
resets."""

import numpy as np

from depthestimation_tpu.config import config_from_dict
from depthestimation_tpu.data.scheduler import BatchScheduler
from depthestimation_tpu.data.video_synthetic import SyntheticStereoVideoDataset
from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model
from depthestimation_tpu.trainer import get_trainer
from depthestimation_tpu.utils.logger import init_logger
import pytest


def _cfg(scan_eval):
    return config_from_dict({
        "data": {"exp_name": "scaneval", "model_name": "base",
                 "loss_name": "base", "trainer_name": "default",
                 "dataset_path": "synthetic", "dataset_split": "synthetic"},
        "var": {"sigma_soft_max": 1000.0, "t_win": 1, "d_min": 5.0,
                "d_max": 40.0, "feature_dim": 16, "ndepth": 16,
                "softce": 0.3, "qpower": 1.0, "img_size": [48, 32],
                "crop_w": 48, "nmode": "exp7", "bn_avg": False},
        "loss": {"ce_mul": 1.0, "dsc_mul": 0.0, "rsc_mul": 0.0,
                 "smooth_mul": 0.0, "dc_mul": 0.0, "rsc_low_mul": 0.0},
        "train": {"batch_size": 1, "lr": 1e-4, "epoch_num": 1, "n_gpu": 1,
                  "optim": "adam", "print_freq": 1},
        "tpu": {"scan_eval": scan_eval, "donate": False},
    })


def _eval_once(cfg, tmp_path, chunk_len=None):
    ds = SyntheticStereoVideoDataset(n_traj=2, traj_len=3, h=32, w=48,
                                     ndepth=16, seed=5)
    loader = BatchScheduler(ds, 1, shuffle=False, prefetch=False)
    model, loss = get_model(cfg), get_loss(cfg)
    logger = init_logger("scaneval", str(tmp_path))
    trainer = get_trainer(cfg)(0, model, loss, logger, str(tmp_path), cfg,
                               loader, loader)
    first = next(iter(loader.enumerate()))
    from depthestimation_tpu.data.video_synthetic import assemble_inputs
    mi, _ = assemble_inputs(first, "left", False)
    trainer.ensure_state({**mi, "prev_output": None, "prev_lc": None})
    if chunk_len is not None:
        values, keys = trainer._validate_scan(chunk_len=chunk_len)
    else:
        values, keys = trainer.eval()
    return dict(zip(keys, values))


@pytest.mark.slow
def test_scan_eval_matches_per_frame(tmp_path):
    m_scan = _eval_once(_cfg(True), tmp_path / "scan")
    m_loop = _eval_once(_cfg(False), tmp_path / "loop")
    for k in ("rmse", "rmse_refined", "sil", "sil_refined", "rmse_unc"):
        np.testing.assert_allclose(m_scan[k], m_loop[k], rtol=1e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_scan_eval_chunking_invariant(tmp_path):
    """A chunk boundary mid-trajectory must not change the metrics (the
    carry crosses flushes on device)."""
    m2 = _eval_once(_cfg(True), tmp_path / "c2", chunk_len=2)
    m8 = _eval_once(_cfg(True), tmp_path / "c8", chunk_len=8)
    for k in ("rmse", "rmse_refined", "sil", "sil_refined", "rmse_unc"):
        np.testing.assert_allclose(m2[k], m8[k], rtol=1e-5, err_msg=k)
