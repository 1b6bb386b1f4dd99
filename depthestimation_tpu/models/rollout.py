"""In-graph video rollout: the frame recursion as ``lax.scan``.

The reference carries ``prev_output``/``prev_lc`` across frames in Python
(trainer/default_trainer.py:156-188), paying a host round-trip per frame.
On TPU the recursion is a scan: one jitted program consumes a whole
trajectory ``[F, B, ...]`` and carries the quarter-res DPV feedback on
device — the SURVEY §5 "express the temporal recursion as carried state"
design note made concrete. Used by the eval loop (DefaultTrainer
``_validate_scan``), the replay paths and the bench.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_rollout(model, with_lc_fn=None):
    """Returns rollout(variables, frames_mi, static_mi, prev_output=None,
    prev_lc=None) -> dict with stacked per-frame outputs + the final carry.

    frames_mi: dict of arrays with a leading frame axis [F, ...] for the
    per-frame fields (rgb, src_cam_poses, dmaps, masks, dmaps_up);
    static_mi: frame-invariant fields (intrinsics, unit_ray, d_candi, ...).

    ``prev_output``/``prev_lc`` seed the carry (for chunked trajectories);
    when None, frame 0 uses the model's own t=0 default — PROBABILITY-
    uniform for exp7, LOG-uniform for exp7_lc/lc (models.py:736, 757, 796
    via base_model._prev_or_uniform).

    with_lc_fn: optional (refined_dpv, frame_mi) -> prev_lc feedback (the
    fused lc_process); when None prev_lc stays at its carry value.
    """
    log_prior = model.nmode in ("exp7_lc", "lc")

    def rollout(variables, frames_mi, static_mi, prev_output=None,
                prev_lc=None):
        sample = {k: v[0] for k, v in frames_mi.items()}
        b = sample["rgb"].shape[0]
        d = model.d
        h4 = sample["rgb"].shape[-2] // 4
        w4 = sample["rgb"].shape[-1] // 4
        fill = jnp.log(1.0 / d) if log_prior else 1.0 / d
        if prev_output is None:
            prev_output = jnp.full((b, d, h4, w4), fill, jnp.float32)
        if prev_lc is None:
            prev_lc = jnp.full((b, d, h4, w4), jnp.log(1.0 / d), jnp.float32)

        def step(carry, frame):
            prev_out, prev_lc_c = carry
            mi = dict(static_mi)
            mi.update(frame)
            mi["prev_output"] = prev_out
            mi["prev_lc"] = prev_lc_c
            out = model.apply(variables, mi, train=False)
            refined = out["output_refined"][-1]
            new_prev = jax.lax.stop_gradient(refined[:, :, ::4, ::4])
            if with_lc_fn is not None:
                new_lc = with_lc_fn(refined, mi)
            else:
                new_lc = prev_lc_c
            return (new_prev, new_lc), (out["output"][-1], refined)

        (last_prev, last_lc), (bvs, refineds) = jax.lax.scan(
            step, (prev_output, prev_lc), frames_mi)
        return {"output": bvs, "output_refined": refineds,
                "prev_output": last_prev, "prev_lc": last_lc}

    return rollout
