"""Loss factory (reference losses/get_loss.py:3-12)."""

from __future__ import annotations

from depthestimation_tpu.losses.base_loss import BaseLoss, DefaultLoss


def get_loss(cfg, id: int = 0):
    name = cfg.data.loss_name
    if name == "base":
        return BaseLoss(cfg, id)
    if name == "default":
        return DefaultLoss(cfg, id)
    if name == "sweep":
        from depthestimation_tpu.losses.sweep_loss import SweepLoss
        return SweepLoss(cfg, id)
    if name == "unflow":
        from depthestimation_tpu.losses.flow_loss import UnFlowLoss
        return UnFlowLoss(cfg, id)
    raise ValueError(f"unknown loss {name!r}")
