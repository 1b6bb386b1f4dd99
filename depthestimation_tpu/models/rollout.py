"""In-graph video rollout: the frame recursion as ``lax.scan``.

The reference carries ``prev_output``/``prev_lc`` across frames in Python
(trainer/default_trainer.py:156-188), paying a host round-trip per frame.
On TPU the recursion is a scan: one jitted program consumes a whole
trajectory ``[F, B, ...]`` and carries the quarter-res DPV feedback on
device — the SURVEY §5 "express the temporal recursion as carried state"
design note made concrete. Used by the replay/eval paths and the bench.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_rollout(model, with_lc_fn=None):
    """Returns rollout(variables, frames_mi, static_mi) -> stacked outputs.

    frames_mi: dict of arrays with a leading frame axis [F, ...] for the
    per-frame fields (rgb, src_cam_poses, dmaps, masks, dmaps_up);
    static_mi: frame-invariant fields (intrinsics, unit_ray, d_candi, ...).

    with_lc_fn: optional (refined_dpv, frame_mi) -> prev_lc feedback (the
    fused lc_process); when None prev_lc stays uniform.
    """

    def rollout(variables, frames_mi, static_mi):
        sample = {k: v[0] for k, v in frames_mi.items()}
        b = sample["rgb"].shape[0]
        d = model.d
        h4 = sample["rgb"].shape[-2] // 4
        w4 = sample["rgb"].shape[-1] // 4
        uniform = jnp.full((b, d, h4, w4), jnp.log(1.0 / d), jnp.float32)

        def step(carry, frame):
            prev_output, prev_lc = carry
            mi = dict(static_mi)
            mi.update(frame)
            mi["prev_output"] = prev_output
            mi["prev_lc"] = prev_lc
            out = model.apply(variables, mi, train=False)
            refined = out["output_refined"][-1]
            new_prev = jax.lax.stop_gradient(refined[:, :, ::4, ::4])
            if with_lc_fn is not None:
                new_lc = with_lc_fn(refined, mi)
            else:
                new_lc = prev_lc
            return (new_prev, new_lc), (out["output"][-1], refined)

        (_, _), (bvs, refineds) = jax.lax.scan(step, (uniform, uniform),
                                               frames_mi)
        return {"output": bvs, "output_refined": refineds}

    return rollout
