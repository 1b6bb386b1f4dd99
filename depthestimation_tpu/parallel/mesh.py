"""Device mesh + sharding helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a batch pytree with dim 0 sharded over the mesh axis. Arrays
    without a leading batch dim (e.g. d_candi, poses shared across batch)
    are replicated."""
    n = mesh.devices.size

    def place(x):
        import jax.numpy as jnp
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def shard_frames(tree, mesh: Mesh, axis: str = "data"):
    """Place a stacked-trajectory pytree with dim 0 = FRAMES (scan axis,
    replicated) and dim 1 = batch sharded over the mesh axis."""
    n = mesh.devices.size

    def place(x):
        import jax.numpy as jnp
        x = jnp.asarray(x)
        if x.ndim >= 2 and x.shape[1] % n == 0 and x.shape[1] >= n:
            spec = P(None, axis, *([None] * (x.ndim - 2)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def global_min_steps(local_steps: int, allgather=None) -> int:
    """Minimum of ``local_steps`` across hosts.

    With per-host scene sharding, hosts see different numbers of batches per
    epoch; every host must run the same number of jitted steps or the
    gradient collectives deadlock (the failure the reference's per-iteration
    all_reduce vote guards against, default_trainer.py:122-130). Equalizing
    up-front is the pjit-native equivalent: one host-count collective per
    epoch instead of one per iteration.

    ``allgather`` is injectable for single-process tests; the default uses
    jax.experimental.multihost_utils.process_allgather.
    """
    if allgather is None:
        if jax.process_count() <= 1:
            return int(local_steps)
        from jax.experimental.multihost_utils import process_allgather
        allgather = process_allgather
    counts = np.asarray(allgather(np.int64(local_steps)))
    return int(counts.min())


def global_any(flag: bool, allgather=None) -> bool:
    """True if ``flag`` is set on ANY host.

    Used as a per-iteration skip vote: when one host draws a corrupted
    batch, every host must skip in lockstep — a lone ``continue`` would
    leave that host one jitted step (and its gradient psum) behind its
    peers, deadlocking the collective. The vote itself is a collective, so
    callers must invoke it every iteration on every host, valid or not.

    ``allgather`` is injectable for single-process tests.
    """
    if allgather is None:
        if jax.process_count() <= 1:
            return bool(flag)
        from jax.experimental.multihost_utils import process_allgather
        allgather = process_allgather
    flags = np.asarray(allgather(np.int64(bool(flag))))
    return bool(flags.max())
