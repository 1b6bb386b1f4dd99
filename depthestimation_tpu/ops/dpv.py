"""Depth Probability Volume (DPV) math.

The DPV is the framework's universal currency: a (log-)probability
distribution over a fixed set of depth candidates ``d_candi`` attached to
every pixel. Layout convention: ``[..., D, H, W]`` with ``D`` the depth axis
(matches the reference contract, utils/img_utils.py in the reference repo).

All functions are pure and jit-compatible; depth candidate vectors are
ordinary arrays (host numpy for setup paths, jnp inside jit).

Reference parity notes (file:line cite the reference repo):
- ``powerf``                  <- utils/img_utils.py:238-243
- ``gen_soft_label``          <- utils/img_utils.py:176-192
- ``dpv_to_depthmap``         <- utils/img_utils.py:197-215
- ``upsample_dpv``            <- utils/img_utils.py:438-449
- ``spread_dpv``              <- utils/img_utils.py:406-436 (the NxN grouped
  conv there reduces to a width-N box filter along the depth axis)
- ``gen_dpv_withmask``        <- utils/img_utils.py:567-582
- ``lc_intensities_to_dist``  <- utils/img_utils.py:144-157
- ``mixed_model`` / ``intensity_to_confidence`` / ``invert_curve``
                              <- lc/light_curtain.py:221-252
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# torch.finfo(float).eps used throughout the reference (img_utils.py:13).
EPS = float(np.finfo(np.float64).eps)


def powerf(d_min: float, d_max: float, n_depth: int, power: float) -> np.ndarray:
    """Power-spaced depth candidates in [d_min, d_max] (host numpy)."""
    x = np.linspace(0.0, 1.0, n_depth) ** power
    return (d_min + (d_max - d_min) * x).astype(np.float64)


def gaussian(x, mu, sig, pow: float = 2.0):
    """Unnormalized generalized Gaussian bump exp(-|x-mu|^p / (2 sig^p))."""
    return jnp.exp(-(jnp.abs(x - mu) ** pow) / (2.0 * sig**pow))


def gen_soft_label(d_candi, depthmap, variance, zero_invalid: bool = False,
                   pow: float = 2.0):
    """Per-pixel Gaussian soft label over depth candidates.

    Args:
      d_candi: [D] depth candidates.
      depthmap: [..., H, W] target depths.
      variance: scalar variance (sigma = sqrt(variance)).
      zero_invalid: replace NaN columns (depth outside candidate range causes
        0/0) with -1, mirroring the reference convention.

    Returns: [..., D, H, W] distribution normalized along D (axis=-3).
    """
    d_candi = jnp.asarray(d_candi, jnp.float32)
    depthmap = jnp.asarray(depthmap, jnp.float32)
    sigma = jnp.sqrt(jnp.asarray(variance, jnp.float32))
    d_exp = d_candi.reshape((-1, 1, 1))
    dists = gaussian(d_exp, depthmap[..., None, :, :], sigma, pow)
    dists = dists / jnp.sum(dists, axis=-3, keepdims=True)
    if zero_invalid:
        dists = jnp.where(jnp.isnan(dists), -1.0, dists)
    return dists


def gen_uniform(d_candi, depthmap):
    """Uniform DPV with the same spatial shape as ``depthmap``."""
    d = len(d_candi)
    shape = depthmap.shape[:-2] + (d,) + depthmap.shape[-2:]
    return jnp.full(shape, 1.0 / d, jnp.float32)


def dpv_to_depthmap(dpv, d_candi, log: bool = False):
    """Soft-argmax expectation E[d] along the depth axis.

    dpv: [..., D, H, W]; returns [..., H, W].
    """
    z = jnp.exp(dpv) if log else dpv
    d = jnp.asarray(d_candi, z.dtype).reshape((-1, 1, 1))
    return jnp.sum(d * z, axis=-3)


def upsample_dpv(dpv, n: int, log: bool = False):
    """Resample the depth axis to ``n`` bins (bilinear, half-pixel centers)
    and renormalize. dpv: [B, D, H, W] -> [B, n, H, W]."""
    if dpv.shape[-3] == n:
        return dpv
    p = jnp.exp(dpv) if log else dpv
    b, _, h, w = p.shape
    p = jax.image.resize(p, (b, n, h, w), method="linear")
    p = p / jnp.sum(p, axis=-3, keepdims=True)
    return jnp.log(p) if log else p


def spread_dpv(dpv, n: int = 5, iters: int = 1):
    """Motion-model spread: box filter of width ``n`` along the depth axis
    (zero padding), renormalized along D. dpv: [B, D, H, W] probabilities.

    ``iters`` applies the spread that many times in ONE pass: the box sum
    is linear within each depth column and the renormalizer is a per-pixel
    scalar, so normalize(B(normalize(B(c)))) == normalize(B²(c)) exactly —
    the iterated kernel (box convolved with itself) replaces ``iters``
    full [B, D, H, W] read/write passes with one."""
    kernel = np.ones(n, np.float32)
    for _ in range(int(iters) - 1):
        kernel = np.convolve(kernel, np.ones(n, np.float32))
    pad = len(kernel) // 2
    x = jnp.moveaxis(dpv, -3, -1)                       # [B, H, W, D]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    out = jnp.zeros_like(x)
    for k, w in enumerate(kernel):
        tap = jax.lax.dynamic_slice_in_dim(xp, k, x.shape[-1], axis=-1)
        out = out + (tap if w == 1.0 else w * tap)
    out = jnp.moveaxis(out, -1, -3)
    return out / jnp.sum(out, axis=-3, keepdims=True)


def gen_dpv_withmask(dmaps, masks, d_candi, var: float = 0.3):
    """GT depth -> DPV; invalid pixels get the uniform distribution.

    dmaps: [B, H, W], masks: [B, 1, H, W] (1 = valid). Returns [B, D, H, W]
    clamped to [EPS, 1].
    """
    truth = gen_soft_label(d_candi, dmaps, jnp.float32(var), zero_invalid=True)
    uni = gen_uniform(d_candi, dmaps)
    mask = jnp.asarray(masks, jnp.float32)              # [B,1,H,W] broadcasts over D
    out = truth * mask + uni * (1.0 - mask)
    return jnp.clip(out, EPS, 1.0)


def lc_intensities_to_dist(d_candi, placement, intensity, inten_sigma,
                           noise_sigma, mean_scaling):
    """Probabilistic curtain observation model.

    Given a curtain placed at ``placement`` with measured ``intensity``,
    produce a normalized likelihood over depth candidates: the expected
    intensity is a Gaussian falloff in |d - placement| with width
    ``inten_sigma`` scaled by ``mean_scaling``; the measurement noise is
    Gaussian with ``noise_sigma``. All args broadcast; the depth-candidate
    axis is the LAST axis (reference convention, img_utils.py:144-157).

    Returns (mean_intensities, normalized_likelihoods).
    """
    d_candi = jnp.asarray(d_candi, jnp.float32)
    error = jnp.abs(d_candi - placement)
    mean_int = jnp.exp(-((error / inten_sigma) ** 2)) * mean_scaling

    var = noise_sigma**2
    denom = jnp.sqrt(2.0 * math.pi * var)
    ll = -((intensity - mean_int) ** 2) / (2.0 * var) - jnp.log(denom)
    lse = jax.scipy.special.logsumexp(ll, axis=-1, keepdims=True)
    return mean_int, jnp.exp(ll - lse)


def intensity_to_confidence(x):
    """Map normalized curtain intensity [0,1] to a mixing confidence.

    Piecewise rational/linear curve from the reference
    (lc/light_curtain.py:228-244, m=20, f=0.5).
    """
    m, f = 20.0, 0.5
    a = -1.0 / (m * (0.5 / m + x)) + 1.0
    c = m / ((m * f + 0.5) ** 2)
    b = c * x + (1.0 - c)
    return jnp.where(x > f, b, a)


def mixed_model(d_candi, z_img, unc_img, a, b):
    """Measurement DPV: Gaussian-at-z mixed with uniform.

    out = A * N(d; z, unc) + B * U(d), normalized along D (leading axis).
    z_img/unc_img/a/b: [H, W]; returns [D, H, W]. Invalid (NaN) soft-label
    columns come back as -1 and are clamped to 0 by the mix, matching the
    reference behaviour (lc/light_curtain.py:247-252).
    """
    soft = gen_soft_label(d_candi, z_img, unc_img, zero_invalid=True)
    uni = gen_uniform(d_candi, z_img)
    mixed = soft * a + uni * b
    mixed = jnp.clip(mixed, 0.0, jnp.inf)
    return mixed / jnp.sum(mixed, axis=-3, keepdims=True)


def invert_curve(x, p: float = 0.5):
    """Beta-like inversion curve used by the default planner to turn a
    normalized field into a curtain-attraction field
    (lc/light_curtain.py:221-225)."""
    return (x**p) * ((1.0 - x) ** (1.0 - p)) / ((p**p) * ((1.0 - p) ** (1.0 - p)))
