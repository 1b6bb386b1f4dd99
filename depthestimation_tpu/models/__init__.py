"""Flax model families: BaseModel (DPV), SweepModel, PackNet, PWCLite."""

from depthestimation_tpu.models.factory import get_model  # noqa: F401
