"""Checkpointing with the reference's layout semantics.

``{exp}_ckpt`` every validation + ``{exp}_model_best`` by rmse_refined
(reference utils/torch_utils.py:27-79, trainer/base_trainer.py:180-194), as
orbax-format directories. Optimizer state IS checkpointed (the reference
dropped it — a known wart we fix). Warm-start (``--init_model``) loads
params-only with shape-checked partial restore replacing the reference's
fragile positional key remapping (base_trainer.py:83-108).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(save_root: str, name: str) -> str:
    return os.path.abspath(os.path.join(save_root, name))


def save_checkpoint(save_root: str, exp_name: str, state: Any, epoch: int,
                    is_best: bool = False):
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": jax.device_get(state),
               "epoch": np.asarray(epoch, np.int32)}
    path = _path(save_root, f"{exp_name}_ckpt")
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if is_best:
        best = _path(save_root, f"{exp_name}_model_best")
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)


def load_checkpoint(save_root: str, exp_name: str, target_state: Any,
                    best: bool = False) -> tuple:
    """Returns (state, epoch)."""
    name = f"{exp_name}_model_best" if best else f"{exp_name}_ckpt"
    path = _path(save_root, name)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(
        path, {"state": jax.device_get(target_state),
               "epoch": np.asarray(0, np.int32)})
    return payload["state"], int(payload["epoch"])


def restore_params_partial(params: Any, loaded_params: Any):
    """Warm start: copy every leaf whose path and shape match; keep the rest
    (the functional equivalent of strict=False)."""
    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    loaded = dict(jax.tree_util.tree_flatten_with_path(loaded_params)[0])

    def merge(path, x):
        y = loaded.get(path)
        if y is not None and getattr(y, "shape", None) == x.shape:
            return y
        return x

    leaves = [(p, merge(p, x)) for p, x in flat.items()]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [v for _, v in leaves])


def checkpoint_exists(save_root: str, exp_name: str, best: bool = False) -> bool:
    name = f"{exp_name}_model_best" if best else f"{exp_name}_ckpt"
    return os.path.isdir(_path(save_root, name))
