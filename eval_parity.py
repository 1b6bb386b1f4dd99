#!/usr/bin/env python3
"""KITTI eval-parity harness.

Reproduces the reference's evaluation table (trainer/default_trainer.py:
306-351: rmse / rmse_refined / sil / sil_refined / rmse_unc over the k1
test split, d in [5, 40] m, 64 bins, 384x256 crop) with this framework, so
the two stacks can be compared metric-for-metric on the same data:

    python eval_parity.py --config configs/default_exp7.json \
        [--ckpt outputs/checkpoints/<exp>] [--limit N]

Prints a JSON metric table (all nine KITTI devkit metrics for both scales,
plus the UF error). Requires the KITTI raw dataset on disk at
cfg.data.dataset_path; use --synthetic to sanity-run without data.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (defaults to the experiment's)")
    ap.add_argument("--limit", type=int, default=0,
                    help="evaluate at most N frames (0 = all)")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from depthestimation_tpu.config import load_config
    from depthestimation_tpu.losses import get_loss
    from depthestimation_tpu.models import get_model
    from depthestimation_tpu.ops import dpv as dpv_ops
    from depthestimation_tpu.ops import metrics as metrics_ops
    from depthestimation_tpu.ops import ufield as ufield_ops
    from depthestimation_tpu.trainer import checkpoint as ckpt_lib
    from depthestimation_tpu.trainer.default import DefaultTrainer
    from depthestimation_tpu.utils.logger import init_logger
    from depthestimation_tpu.data.video_synthetic import assemble_inputs
    import train as train_mod

    cfg = load_config(args.config)
    cfg["eval"] = True
    cfg.train.batch_size = 1

    model = get_model(cfg)
    loss = get_loss(cfg)
    _, val_loader = train_mod.build_loaders(cfg, args.synthetic)
    logger = init_logger("eval_parity")
    save_root = args.ckpt or f"outputs/checkpoints/{cfg.data.exp_name}"
    trainer = DefaultTrainer(0, model, loss, logger, save_root, cfg,
                             val_loader=val_loader)

    first = next(iter(val_loader.enumerate()))
    mi0, _ = assemble_inputs(first, "left", bool(cfg.var.get("stereo", False)))
    trainer.ensure_state({**mi0, "prev_output": None, "prev_lc": None})
    if ckpt_lib.checkpoint_exists(save_root, cfg.data.exp_name, best=True):
        try:
            trainer.resume(best=True)
            logger.info(0, "Loaded best checkpoint")
        except Exception as e:  # structure mismatch (stale/incompatible ckpt)
            logger.warning(0, f"checkpoint restore failed ({e!r:.120}); "
                              "evaluating random init")
    else:
        logger.info(0, "WARNING: no checkpoint found — evaluating random init")

    d_candi = jnp.asarray(trainer.d_candi, jnp.float32)
    errors, errors_refined, errors_unc = [], [], []
    n = 0
    for batch in val_loader.enumerate():
        if not batch.get("is_valid", True):
            continue
        if batch["frame_count"] == 0:
            trainer.prev_output = {"left": None, "right": None}
            trainer.prev_lc = {"left": None, "right": None}
        mi, gt = assemble_inputs(batch, "left",
                                 bool(cfg.var.get("stereo", False)))
        dmi, dgt = trainer._device_inputs(mi, gt, "left")
        out = trainer._eval_step(trainer.state.params,
                                 trainer.state.batch_stats, dmi)
        trainer.prev_output = {
            "left": out["output_refined"][-1][:, :, ::4, ::4], "right": None}

        depth = dpv_ops.dpv_to_depthmap(out["output"][-1], d_candi, log=True)
        depth_ref = dpv_ops.dpv_to_depthmap(out["output_refined"][-1],
                                            d_candi, log=True)
        b = 0
        mask = dgt["masks"][b, 0]
        mask_ref = dgt["masks_imgsizes"][b, 0]
        gt_small = jnp.clip(dgt["dmaps"][b], None, trainer.d_candi[-1])
        gt_large = jnp.clip(dgt["dmap_imgsizes"][b], None, trainer.d_candi[-1])
        errors.append(np.asarray(metrics_ops.depth_error(depth[b] * mask,
                                                         gt_small)))
        errors_refined.append(np.asarray(metrics_ops.depth_error(
            depth_ref[b] * mask_ref, gt_large)))
        uf_t, uf_p, _ = ufield_ops.compute_unc_field(
            out["output_refined"][-1][b], dgt["soft_labels_imgsize"][b],
            d_candi, dgt["intrinsics_up"][b], dgt["masks_imgsizes"][b, 0],
            trainer.uf_params)
        errors_unc.append(float(ufield_ops.compute_unc_rmse(uf_t, uf_p,
                                                            d_candi)))
        n += 1
        if args.limit and n >= args.limit:
            val_loader.stop()
            break

    table = {
        "frames": n,
        "low_res": metrics_ops.eval_errors(errors),
        "refined": metrics_ops.eval_errors(errors_refined),
        "rmse_unc": float(np.nanmean(errors_unc)),
    }
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
