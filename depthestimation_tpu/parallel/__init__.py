"""Parallelism: device mesh, shardings, pjit train/eval steps.

Replaces the reference's entire distributed surface (NCCL DDP process
groups, mp.spawn, shared-memory metric tensors, SyncBatchNorm — SURVEY §2.10)
with a single jitted train step over a ``jax.sharding.Mesh``: batch sharded
on the ``data`` axis, params replicated, gradient psum inserted by GSPMD
over ICI, metric averaging via global reductions.
"""

from depthestimation_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
from depthestimation_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    make_optimizer,
    make_train_step,
    make_eval_step,
    init_state,
)
