"""Model factory (reference models/get_model.py:5-16)."""

from __future__ import annotations

import jax.numpy as jnp

from depthestimation_tpu.models.base_model import BaseModelNet, DefaultModel

_DTYPES = {"float32": None, "bfloat16": jnp.bfloat16}


def _resolve_remat(cfg):
    """tpu.remat: true/false, a granularity string
    ("none"/"hot"/"full"/"save3d"), or "auto" (default) = remat when the
    per-device batch is >= 4 — the point where full-size activations
    overrun one chip's HBM (base_model.BaseModelNet.remat).

    Auto granularity: "save3d" under bf16 (Base3D's stored interior halves,
    so skipping its recompute — 2/3 of the forward FLOPs — fits: measured
    1123 -> 715 ms for the batch-8 step), "full" under f32 (save3d needs
    18.7 GB there)."""
    remat = cfg.get("tpu", {}).get("remat", "auto")
    if isinstance(remat, str) and remat != "auto":
        if remat not in ("none", "hot", "full", "save3d"):
            raise ValueError(f"tpu.remat must be true/false/auto/none/hot/"
                             f"full/save3d, got {remat!r}")
        return remat
    if remat != "auto":
        return bool(remat)
    import jax
    try:
        n_dev = max(1, len(jax.devices()))
    except Exception:
        n_dev = 1
    if (int(cfg.train.get("batch_size", 1)) // n_dev) < 4:
        return False
    bf16 = cfg.get("tpu", {}).get("dtype", "float32") == "bfloat16"
    return "save3d" if bf16 else "full"


def get_model(cfg):
    name = cfg.data.model_name
    dtype = _DTYPES.get(cfg.get("tpu", {}).get("dtype", "float32"))
    if name == "base":
        return BaseModelNet(
            feature_dim=cfg.var.feature_dim,
            d=cfg.var.ndepth,
            nmode=cfg.var.nmode,
            bn_avg=cfg.var.bn_avg,
            sigma_soft_max=cfg.var.sigma_soft_max,
            diffhomo=cfg.var.get("diffhomo", True),
            use_lc_prob=cfg.lc.get("use_lc_prob", 0.7),
            dtype=dtype,
            sweep_impl=cfg.var.get("sweep_impl", "decomposed"),
            sweep_dtype=_DTYPES.get(
                cfg.get("tpu", {}).get("sweep_dtype", "auto"), "auto"),
            sweep_pallas=cfg.get("tpu", {}).get("sweep_pallas", "auto"),
            remat=_resolve_remat(cfg),
            conv3d_flat=bool(cfg.get("tpu", {}).get("conv3d_flat", True)),
        )
    if name == "default":
        return DefaultModel(d=cfg.var.ndepth)
    if name == "sweep":
        from depthestimation_tpu.models.sweep import SweepModel
        return SweepModel()
    if name == "packnet":
        from depthestimation_tpu.models.packnet import PackNetModel
        return PackNetModel(d=cfg.var.ndepth)
    if name == "pwclite":
        from depthestimation_tpu.models.pwclite import PWCLite
        return PWCLite()
    raise ValueError(f"unknown model {name!r}")
