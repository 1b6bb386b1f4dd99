"""Trainer factory (reference trainer/get_trainer.py:4-12)."""

from __future__ import annotations

from depthestimation_tpu.trainer.default import DefaultTrainer


def get_trainer(cfg):
    name = cfg.data.trainer_name
    if name == "default":
        return DefaultTrainer
    if name == "sweep":
        from depthestimation_tpu.trainer.sweep import SweepTrainer
        return SweepTrainer
    raise ValueError(f"unknown trainer {name!r}")
