"""Loss families: BaseLoss (depth), SweepLoss, DefaultLoss, flow loss."""

from depthestimation_tpu.losses.factory import get_loss  # noqa: F401
