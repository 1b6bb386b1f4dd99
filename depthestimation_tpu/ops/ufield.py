"""Uncertainty field (UF): top-down collapse of a DPV.

The UF is what the light-curtain planner consumes: for every image column,
the DPV rows inside a metric y/z band are summed into a ``[D, W]`` top-down
probability field. Mirrors ``gen_ufield`` (reference utils/img_utils.py:
475-565) including the vertical pixel shift, band masking, and the optional
"quash" that keeps only the nearest depth mode per column.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from depthestimation_tpu.ops.dpv import dpv_to_depthmap
from depthestimation_tpu.ops.geometry import depth_to_pts
from depthestimation_tpu.ops.resample import shift_rows


@dataclasses.dataclass(frozen=True)
class UFieldParams:
    """Dataset-dependent banding parameters (img_utils.py:476-497)."""
    pshift: int = 5
    zstart: float = 0.6
    zend: float = 0.9
    maxd: float = 100.0
    mind: float = 0.0
    quash: bool = False

    @staticmethod
    def for_dataset(dataset_path: str) -> "UFieldParams":
        if "ilim" in dataset_path or "sweep" in dataset_path:
            return UFieldParams(pshift=0, zstart=1.0, zend=1.3, maxd=100.0,
                                mind=3.0, quash=True)
        return UFieldParams()  # kitti defaults

    @staticmethod
    def from_sensor(unc_shift: float, unc_span: float, unc_ang: int) -> "UFieldParams":
        return UFieldParams(pshift=int(unc_ang), zstart=unc_shift,
                            zend=unc_shift + unc_span, maxd=100.0, mind=3.0,
                            quash=True)


def gen_ufield(dpv, d_candi, intr_up, params: UFieldParams, log: bool = True,
               mask=None, normalize: bool = False):
    """Collapse a DPV into a top-down uncertainty field.

    Args:
      dpv:     [D, H, W] (log-)probability volume for ONE item (vmap for batch).
      d_candi: [D] depth candidates.
      intr_up: [3, 3] intrinsics at the DPV's resolution.
      mask:    optional [H, W] validity mask.

    Returns (uf [D, W], masked_depthmap [H, W]).
    """
    p = params
    dpv_shifted = shift_rows(dpv, p.pshift)

    dm_shifted = dpv_to_depthmap(dpv_shifted[None], d_candi, log=log)[0]   # [H,W]
    dm_pred = dpv_to_depthmap(dpv[None], d_candi, log=log)[0]

    pts = depth_to_pts(dm_shifted, intr_up)             # [3, H, W]
    zero_mask = jnp.logical_not((pts[1] > p.zend) | (pts[1] < p.zstart)
                                | (pts[2] > p.maxd - 1) | (pts[2] < p.mind))
    zero_mask = zero_mask.astype(dpv.dtype)

    if mask is not None:
        zero_mask = zero_mask * shift_rows(mask.astype(dpv.dtype), p.pshift)

    if p.quash:
        quash_range = 1.0
        cleaned = dm_shifted * zero_mask
        cleaned = jnp.where(cleaned == 0, 1000.0, cleaned)
        col_min = jnp.min(cleaned, axis=0)              # [W]
        quash_mask = ((cleaned > col_min - quash_range)
                      & (cleaned < col_min + quash_range)).astype(dpv.dtype)
        zero_mask = zero_mask * quash_mask

    zero_mask_pred = shift_rows(zero_mask, -p.pshift)
    dm_pred_zero = dm_pred * zero_mask_pred

    prob = jnp.exp(dpv) if log else dpv
    uf = jnp.sum(prob * zero_mask_pred[None], axis=1)   # [D, W]
    # Reference normalizes by the SHIFTED mask's column count (img_utils:556).
    uf = uf / jnp.sum(zero_mask, axis=0)[None]

    if normalize:
        mn = jnp.min(uf, axis=0, keepdims=True)
        mx = jnp.max(uf, axis=0, keepdims=True)
        uf = (uf - mn) / (mx - mn)

    return uf, dm_pred_zero


def compute_unc_field(dpv_pred, dpv_truth, d_candi, intr_up,
                      mask, params: UFieldParams):
    """(uf_truth, uf_predicted, debugmap) — img_utils.py:366-369."""
    uf_truth, _ = gen_ufield(dpv_truth, d_candi, intr_up, params, log=False,
                             mask=mask)
    uf_pred, debugmap = gen_ufield(dpv_pred, d_candi, intr_up, params, log=True)
    return uf_truth, uf_pred, debugmap


def compute_unc_rmse(uf_truth, uf_pred, d_candi):
    """UF depth error. NOTE: despite the name this is the mean ABSOLUTE error
    of the per-column expected depths — the reference overwrites its rmse with
    the L1 mean (img_utils.py:380-381) and we preserve that behaviour.

    uf_*: [D, W].
    """
    d = jnp.asarray(d_candi, uf_pred.dtype)[:, None]
    td = jnp.sum(d * uf_truth, axis=0)                 # [W]
    pd = jnp.sum(d * uf_pred, axis=0)
    pd = pd.at[0].set(0.0).at[-1].set(0.0)
    valid = ~(jnp.isnan(td) | jnp.isnan(pd))
    td = jnp.where(valid, td, 0.0)
    pd = jnp.where(valid, pd, 0.0)
    return jnp.sum(jnp.abs(td - pd)) / jnp.sum(valid)
