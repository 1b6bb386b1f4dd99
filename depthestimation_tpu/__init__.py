"""depthestimation_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
recursive light-curtain depth estimation.

A from-scratch rebuild, with the same capabilities as the reference
CMU-Light-Curtains/DepthEstimation stack (see SURVEY.md):

- Depth Probability Volume (DPV) estimation from monocular / temporal /
  stereo RGB (``models``: BaseModel/Sweep/PackNet/PWCLite families).
- Uncertainty-field generation and light-curtain planning/sensing
  (``lc``: fully on-device simulator + DP planner, no host round-trips).
- Recursive Bayesian DPV fusion expressed as jitted ``lax`` loops.
- Data pipeline for KITTI / ILIM / sweep datasets (``data``).
- pjit/shard_map data-parallel training over a ``jax.sharding.Mesh``
  (``parallel``, ``trainer``).

Design: the DPV (log-probability over depth candidates, ``[B, D, H, W]``)
is the universal currency; all core math lives in ``ops`` as pure,
jit-compatible functions; modules are Flax linen with torch-compatible
convolution geometry so reference hyper-parameters transfer unchanged.
"""

__version__ = "0.1.0"
