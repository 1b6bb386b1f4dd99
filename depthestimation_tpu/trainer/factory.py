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
    if name == "sintel":
        # the reference keeps these OUT of get_trainer (dead code,
        # trainer/sintel_trainer.py); wired here so flow training is
        # reachable from the CLI
        from depthestimation_tpu.trainer.sintel import SintelTrainer
        return SintelTrainer
    if name == "sintel_ar":
        from depthestimation_tpu.trainer.sintel import SintelARTrainer
        return SintelARTrainer
    raise ValueError(f"unknown trainer {name!r}")
