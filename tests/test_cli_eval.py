"""End-to-end CLI round trip: train 1 epoch -> best checkpoint on disk ->
``train.py --eval`` restores it and reports metrics (reference
train.py:68-77 eval overrides + best-checkpoint load)."""

import json
import os

import numpy as np
import pytest

CONFIG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "test_tiny.json")


@pytest.mark.slow
def test_train_then_eval_cli_roundtrip(tmp_path, monkeypatch):
    import train as train_cli

    monkeypatch.chdir(tmp_path)
    train_cli.main(["--config", CONFIG, "--synthetic"])

    save_root = tmp_path / "outputs" / "checkpoints" / "test_tiny"
    results = save_root / "test_tiny.json"
    assert results.is_file(), "training must write the results JSON"
    n_train_epochs = len(json.load(open(results))["rmse_refined"])
    assert n_train_epochs >= 1

    from depthestimation_tpu.trainer import checkpoint as ckpt
    assert ckpt.checkpoint_exists(str(save_root), "test_tiny", best=True)

    # --eval: forces batch 1, loads the best checkpoint, runs validation
    train_cli.main(["--config", CONFIG, "--synthetic", "--eval"])
    metrics = json.load(open(results))
    assert len(metrics["rmse_refined"]) == n_train_epochs + 1
    assert np.isfinite(metrics["rmse_refined"][-1])
    assert np.isfinite(metrics["rmse"][-1])
