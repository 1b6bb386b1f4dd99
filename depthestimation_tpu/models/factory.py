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
    18.7 GB there).

    When the fused Pallas sweep is active (single TPU device + bf16 —
    base_model._use_sweep_pallas) the sweep's [C, D, H, W] intermediates
    never reach HBM, and no remat at all fits the reference batch-8
    workload: AOT temp = 14.76 GB of 15.75 (mem_probe), measured 412 ->
    372 ms. Auto therefore returns "none" there, gated on the activation
    envelope batch/dev * D * H * W staying within the measured fit."""
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
        backend = jax.default_backend()
    except Exception:
        n_dev, backend = 1, "cpu"
    per_dev_batch = int(cfg.train.get("batch_size", 1)) // n_dev
    if per_dev_batch < 4:
        return False
    bf16 = cfg.get("tpu", {}).get("dtype", "float32") == "bfloat16"
    tpu_cfg = cfg.get("tpu", {})
    # multi-device TPU runs the Pallas sweep through shard_map over the
    # data mesh (base_model._sweep_mesh; the trainer always passes its mesh
    # to get_model), so the per-DEVICE activation envelope is what matters
    pallas_sweep = (bf16 and backend == "tpu"
                    and cfg.var.get("sweep_impl", "decomposed") == "decomposed"
                    and tpu_cfg.get("sweep_dtype", "auto") in ("auto",
                                                               "bfloat16")
                    and tpu_cfg.get("sweep_pallas", "auto") in ("auto", True))
    if pallas_sweep:
        w = int(cfg.var.get("crop_w") or cfg.var.img_size[0])
        h = int(cfg.var.img_size[1])
        envelope = per_dev_batch * int(cfg.var.ndepth) * h * w
        if envelope <= 8 * 64 * 256 * 384:   # measured-fit envelope (B=8)
            return "none"
    return "save3d" if bf16 else "full"


def get_model(cfg, mesh=None):
    """``mesh``: the data-parallel jax.sharding.Mesh, needed on multi-device
    backends for the shard_map'd Pallas sweep (base_model.BaseModelNet.mesh);
    the XLA paths ignore it (GSPMD shards them from the input shardings)."""
    name = cfg.data.model_name
    dtype = _DTYPES.get(cfg.get("tpu", {}).get("dtype", "float32"))
    if name == "base":
        return BaseModelNet(
            mesh=mesh,
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
            combine_pallas=cfg.get("tpu", {}).get("combine_pallas", "auto"),
            convcomb_pallas=cfg.get("tpu", {}).get("convcomb_pallas",
                                                   "auto"),
            convbn2d=cfg.get("tpu", {}).get("convbn2d", "auto"),
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
