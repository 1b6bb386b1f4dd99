"""SweepTrainer: trains the curtain-response predictor (reference
trainer/sweep_trainer.py:18-310). Same scaffolding as DefaultTrainer; the
validation metric is the masked peak-intensity error between the predicted
peak image and the max-over-planes GT sweep intensity."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from depthestimation_tpu.trainer.default import DefaultTrainer
from depthestimation_tpu.trainer import checkpoint as ckpt


class SweepTrainer(DefaultTrainer):
    def _validate_with_gt(self):
        errors = []
        for batch in self.val_loader.enumerate():
            from depthestimation_tpu.data.video_synthetic import assemble_inputs
            mi_l, gt_l = assemble_inputs(batch, "left",
                                         bool(self.cfg.var.get("stereo",
                                                               False)))
            self.ensure_state({**mi_l, "prev_output": None, "prev_lc": None})
            dmi_l, dgt_l = self._device_inputs(mi_l, gt_l, "left")
            out = self._eval_step(self.state.params, self.state.batch_stats,
                                  dmi_l)
            pred_peak = out["output_refined"][0][:, 0]       # [B, H, W]
            if "feat_int_tensor" in dgt_l and np.size(
                    np.asarray(dgt_l["feat_int_tensor"])) > 0:
                gt_peak = jnp.max(dgt_l["feat_int_tensor"], axis=1) / 255.0
                mask = dgt_l["mask_tensor"][:, 0]
            else:
                # synthetic fallback: response peak should be high where
                # depth is valid
                gt_peak = dgt_l["masks_imgsizes"][:, 0]
                mask = jnp.ones_like(gt_peak)
            err = jnp.sum(jnp.abs(pred_peak - gt_peak) * mask) / jnp.maximum(
                jnp.sum(mask), 1.0)
            errors.append(float(err))

        mean_err = float(np.mean(errors)) if errors else float("nan")
        error_keys = ["peak_int_err"]
        error_list = [mean_err]
        self.save_model(mean_err)
        if self.id == 0:
            json_loc = os.path.join(self.save_root,
                                    self.cfg.data.exp_name + ".json")
            self.foutput.setdefault("peak_int_err", []).append(mean_err)
            with open(json_loc, "w") as f:
                json.dump(self.foutput, f)
        self._log.info(self.id, f"Val: peak_int_err={mean_err:.4f}")
        return error_list, error_keys
