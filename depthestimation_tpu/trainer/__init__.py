"""Trainers: epoch loops, validation, checkpointing."""

from depthestimation_tpu.trainer.factory import get_trainer  # noqa: F401
