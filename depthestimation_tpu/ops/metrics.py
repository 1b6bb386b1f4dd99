"""KITTI depth-devkit error metrics, vectorized.

Replaces the reference's C++ ``deval_lib`` (external/deval_lib/src/
evaluate_depth.h:20-142) with a single fused JAX computation: all 9 metrics
in one pass over the masked pixels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

METRIC_NAMES = (
    "mae",
    "rmse",
    "inverse mae",
    "inverse rmse",
    "log mae",
    "log rmse",
    "scale invariant log",
    "abs relative",
    "squared relative",
)

# Reference's zero handling (img_utils.py:162-167): zeros become -1, then
# epsilon is added; isValid == depth > 0 so those pixels drop out.
_EPS = float(np.finfo(np.float64).eps)


def depth_error(predicted, truth):
    """9 KITTI metrics over pixels with valid (>0) ground truth.

    predicted/truth: [H, W] depth maps in meters (zeros = missing).
    Returns [9] float array ordered as ``METRIC_NAMES``.
    """
    pred = jnp.where(predicted == 0, -1.0, predicted) + _EPS
    gt = jnp.where(truth == 0, -1.0, truth) + _EPS
    valid = gt > 0
    n = jnp.sum(valid)

    def msum(x):
        return jnp.sum(jnp.where(valid, x, 0.0))

    d_err = jnp.abs(gt - pred)
    d_err2 = d_err * d_err
    d_inv = jnp.abs(1.0 / gt - 1.0 / pred)
    safe_pred = jnp.where(valid, jnp.clip(pred, _EPS, None), 1.0)
    safe_gt = jnp.where(valid, gt, 1.0)
    d_log = jnp.log(safe_gt) - jnp.log(safe_pred)

    mae = msum(d_err) / n
    rmse = jnp.sqrt(msum(d_err2) / n)
    inv_mae = msum(d_inv) / n
    inv_rmse = jnp.sqrt(msum(d_inv * d_inv) / n)
    log_mae = msum(jnp.abs(d_log)) / n
    nsl = msum(d_log * d_log) / n
    log_rmse = jnp.sqrt(nsl)
    # scale-invariant log error = std of d_log over valid pixels. The
    # reference's E[x^2]-E[x]^2 form (evaluate_depth.h:41) catastrophically
    # cancels in f32 (NaN from sqrt of a tiny negative when the log error is
    # near-constant); the centered two-pass form is stable and clamped.
    log_mean = msum(d_log) / n
    sil = jnp.sqrt(jnp.maximum(msum((d_log - log_mean) ** 2) / n, 0.0))
    abs_rel = msum(d_err / safe_gt) / n
    sq_rel = msum(d_err2 / (safe_gt * safe_gt)) / n

    return jnp.stack([mae, rmse, inv_mae, inv_rmse, log_mae, log_rmse,
                      sil, abs_rel, sq_rel])


def eval_errors(errors):
    """Aggregate a list/array of per-frame [9] metric vectors.

    Returns {name: [mean, min, max]} matching evaluate_depth.h:123-142.
    """
    arr = np.asarray(errors, np.float64).reshape((-1, len(METRIC_NAMES)))
    if arr.shape[0] == 0:
        # no valid frames (e.g. empty split): NaN stats instead of a crash
        return {name: [float("nan")] * 3 for name in METRIC_NAMES}
    out = {}
    for i, name in enumerate(METRIC_NAMES):
        col = arr[:, i]
        out[name] = [float(col.mean()), float(col.min()), float(col.max())]
    return out
