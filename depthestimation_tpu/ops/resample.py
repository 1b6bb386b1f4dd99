"""Image resampling primitives (grid_sample equivalents) in pure XLA.

These back every warp in the framework (plane-sweep, inverse warp, field
warps). They are written as static-shape gathers so XLA can vectorize them
onto the VPU; for the plane-sweep hot path see ``ops/plane_sweep.py`` which
additionally offers a fused Pallas kernel.

Geometry matches ``torch.nn.functional.grid_sample`` (the reference's warp
primitive) for both ``align_corners`` conventions with zero padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fast_take(flat, idx):
    """``jnp.take(flat, idx, axis=1)`` — the fast gather form on TPU.

    NOTE on backward cost: XLA's gather transpose (scatter-add) and
    jax.ops.segment_sum (sorted reduce) were both measured for the training
    backward at these shapes; end-to-end train-step time was identical
    (~400 ms at B=2), so the default VJP is kept. A pre-sorted segment
    reduction (12 ms vs 250 ms unsorted) is the round-2 lever if the warp
    backward ever dominates — it requires caching the per-pose tap-index
    sort order across steps.
    """
    return jnp.take(flat, idx, axis=1)


def _unnormalize(coord, size: int, align_corners: bool):
    """[-1, 1] grid coordinate -> pixel coordinate."""
    size = jnp.float32(size)
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1.0)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(img, grid, mode: str = "bilinear", align_corners: bool = False):
    """Sample ``img`` at normalized ``grid`` locations with zero padding.

    Args:
      img:  [C, H, W] source image.
      grid: [..., 2] normalized (x, y) coordinates in [-1, 1].
      mode: 'bilinear' or 'nearest'.

    Returns [C, ...] sampled values (zeros outside the image).

    TPU notes: taps are gathers into a 1-px zero-padded ``[C, (H+2)(W+2)]``
    layout (the fast gather form, ~6 ns/index) and border masks are folded
    into per-sample SCALAR weights — [C, N]-shaped select chains are ~10x
    slower. Batched use: ``jax.vmap(grid_sample)`` over leading axes.
    """
    c, h, w = img.shape
    out_shape = grid.shape[:-1]
    g = grid.reshape((-1, 2))
    x = _unnormalize(g[:, 0], w, align_corners)
    y = _unnormalize(g[:, 1], h, align_corners)

    wp = w + 2
    flat = jnp.pad(img, ((0, 0), (1, 1), (1, 1))).reshape(c, (h + 2) * wp)

    def tap_idx_wt(ix, iy, weight):
        valid = (ix >= -1) & (ix <= w) & (iy >= -1) & (iy <= h)
        ixc = jnp.clip(ix + 1, 0, wp - 1).astype(jnp.int32)
        iyc = jnp.clip(iy + 1, 0, h + 1).astype(jnp.int32)
        wt = jnp.where(valid, weight, 0.0).astype(img.dtype)
        return iyc * wp + ixc, wt

    if mode == "nearest":
        ix = jnp.floor(x + 0.5)
        iy = jnp.floor(y + 0.5)
        # exact-pixel "weight" 1, but outside-image must still read as zero —
        # the padded ring only covers 1 px, so keep the validity fold
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx, wt = tap_idx_wt(ix, iy, valid.astype(img.dtype))
        out = fast_take(flat, idx) * wt[None]
    elif mode == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0).astype(img.dtype)
        fy = (y - y0).astype(img.dtype)
        # ONE gather over the 4 taps' concatenated indices, then a weighted
        # reduce: 4 separate per-tap gathers dispatch as 4 latency-bound
        # custom fusions and measure ~25x slower at full-res loss-warp
        # shapes (benchmarks/micro_gather.py — taps4 vs cat4)
        taps = [tap_idx_wt(x0, y0, (1 - fx) * (1 - fy)),
                tap_idx_wt(x0 + 1, y0, fx * (1 - fy)),
                tap_idx_wt(x0, y0 + 1, (1 - fx) * fy),
                tap_idx_wt(x0 + 1, y0 + 1, fx * fy)]
        n = taps[0][0].shape[0]
        t = fast_take(flat, jnp.concatenate([i for i, _ in taps]))
        wts = jnp.stack([wt for _, wt in taps])  # [4, N]
        out = jnp.sum(t.reshape(c, 4, n) * wts[None], axis=1)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    return out.reshape((c,) + out_shape)


def hwarp(img, xn, mode: str = "bilinear", band: int | None = None,
          align_corners: bool = False):
    """Horizontal-only warp as a block-banded one-hot MATMUL (MXU).

    For a rectified stereo rig the inverse-warp grid has y' == y (the
    synthetic rig's T_left2right is exactly pure-x translation; KITTI
    rectified is within calibration noise), so the warp is a per-row linear
    map. XLA's gather runs this at ~15 ns/index (latency-bound — the train
    step's #1 op at 62 ms/B=8); as a [BLK, BLK+2*band] block-banded matmul
    it runs in ~3.6 ms (benchmarks/micro_hwarp.py) and its transpose
    (the backward) is a matmul too.

    Args:
      img:  [C, H, W] source.
      xn:   [H, W] normalized source x in [-1, 1] (same convention as the
            ``grid_sample`` grid x-channel).
      mode: 'bilinear' or 'nearest'.
      band: max |x_src - x_out| in pixels (default W//6, ≥ the max stereo
            disparity at KITTI scale: fx*baseline/d_min ≈ W/9.6). Pixels
            displaced beyond the band read as zero — fold the returned
            ``in_band`` mask into validity.

    Returns (warped [C, H, W], in_band [H, W] bool). Bit-matches
    ``grid_sample(img, grid)`` where grid y is the identity row coordinate
    (pinned in tests/test_hwarp.py).
    """
    c, h, w = img.shape
    if band is None:
        band = max(16, w // 6)
    blk = min(128, w)
    if w % blk:  # fall back: any W — pad the row axis up to a block multiple
        wpad = (w + blk - 1) // blk * blk
        img2 = jnp.pad(img, ((0, 0), (0, 0), (0, wpad - w)))
        xn2 = jnp.pad(xn, ((0, 0), (0, wpad - w)), constant_values=-2.0)
        out, inb = hwarp(img2, xn2, mode=mode, band=band,
                         align_corners=align_corners)
        return out[..., :w], inb[..., :w]
    nb = w // blk

    x = _unnormalize(xn, w, align_corners)                   # pixel coords
    xg = jnp.arange(w, dtype=x.dtype)[None, :]
    in_band = jnp.abs(x - xg) <= (band - 1)

    # overlapping input blocks: output block j reads [j*blk-band, j*blk+blk+band)
    pad = jnp.pad(img, ((0, 0), (0, 0), (band, band)))
    blocks = jnp.stack([pad[..., j * blk:j * blk + blk + 2 * band]
                        for j in range(nb)], axis=2)         # [C,H,NB,BLK+2K]
    src = jnp.arange(blk + 2 * band, dtype=jnp.int32)
    base = (jnp.arange(nb, dtype=jnp.int32) * blk)[None, :, None]

    xb = x.reshape(h, nb, blk)
    if mode == "nearest":
        # grid_sample nearest: floor(x + 0.5); outside-image reads zero via
        # the zero padding (any tap further than `band` outside is masked by
        # in_band, and grid_sample's valid fold zeroes it anyway)
        loc = jnp.floor(xb + 0.5).astype(jnp.int32) - base + band
        loc = jnp.clip(loc, -1, blk + 2 * band)              # keep one-hot sane
        m = (src == loc[..., None]).astype(img.dtype)
    elif mode == "bilinear":
        x0 = jnp.floor(xb)
        fx = (xb - x0).astype(img.dtype)
        loc = jnp.clip(x0.astype(jnp.int32) - base + band, -2, blk + 2 * band)
        m = ((src == loc[..., None]) * (1.0 - fx)[..., None]
             + (src == (loc + 1)[..., None]) * fx[..., None]).astype(img.dtype)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    # m: [H, NB, BLK, BLK+2K]; blocks: [C, H, NB, BLK+2K] -> [C, H, NB, BLK]
    out = jnp.einsum("hjxs,chjs->chjx", m, blocks,
                     precision=jax.lax.Precision.HIGHEST)
    # out-of-band pixels can still alias into a neighbouring block's window;
    # zero them so the contract is "beyond the band reads zero"
    out = out.reshape(c, h, w) * in_band[None].astype(img.dtype)
    return out, in_band


def static_row_resample(img, mode: str = "bilinear",
                        align_corners: bool = False):
    """Resample rows at y_eff = _unnormalize(yn_identity, H, align_corners).

    ``inverse_warp`` builds its grid in the align_corners=True convention
    but samples with align_corners=False (reference quirk,
    utils/inverse_warp.py:65-66 + torch grid_sample default) — so even a
    pure-x stereo pose blends adjacent rows with FIXED per-row weights
    (y_eff = y*H/(H-1) - 0.5). Bilinear/nearest sampling is separable, so
    the hwarp fast path applies this static vertical blend first; row
    indices are static, making this a cheap contiguous take along H.
    img: [C, H, W]."""
    h = img.shape[-2]
    yn = 2.0 * jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1) - 1.0
    y = _unnormalize(yn, h, align_corners)
    pad = jnp.pad(img, ((0, 0), (1, 1), (0, 0)))       # zero ring, 1 row
    if mode == "nearest":
        y0 = jnp.clip(jnp.floor(y + 0.5).astype(jnp.int32) + 1, 0, h + 1)
        return jnp.take(pad, y0, axis=-2)
    y0 = jnp.floor(y)
    fy = (y - y0).astype(img.dtype)[:, None]
    i0 = jnp.clip(y0.astype(jnp.int32) + 1, 0, h + 1)
    return (jnp.take(pad, i0, axis=-2) * (1.0 - fy)
            + jnp.take(pad, jnp.clip(i0 + 1, 0, h + 1), axis=-2) * fy)


def grid_sample_pixel(img, pix, mode: str = "bilinear"):
    """Sample at raw PIXEL coordinates (x, y) with zero padding — no
    normalized-coordinate round trip. img: [C, H, W]; pix: [..., 2]."""
    h, w = img.shape[-2], img.shape[-1]
    x = pix[..., 0] * (2.0 / max(w - 1, 1)) - 1.0
    y = pix[..., 1] * (2.0 / max(h - 1, 1)) - 1.0
    return grid_sample(img, jnp.stack([x, y], axis=-1), mode=mode,
                       align_corners=True)


def resize_bilinear_align_corners(img, out_hw):
    """Bilinear resize with align_corners=True (torch ``F.upsample(...,
    align_corners=True)``); jax.image.resize only offers half-pixel centers.

    img: [..., H, W] -> [..., out_h, out_w].
    """
    h, w = img.shape[-2], img.shape[-1]
    oh, ow = out_hw

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            idx0 = jnp.zeros((n_out,), jnp.int32)
            return idx0, idx0, jnp.zeros((n_out,), jnp.float32)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        frac = pos - i0.astype(jnp.float32)
        return i0, i0 + 1, frac

    y0, y1, fy = axis_weights(h, oh)
    x0, x1, fx = axis_weights(w, ow)

    top = jnp.take(img, y0, axis=-2)
    bot = jnp.take(img, y1, axis=-2)
    rows = top * (1 - fy)[..., :, None] + bot * fy[..., :, None]
    left = jnp.take(rows, x0, axis=-1)
    right = jnp.take(rows, x1, axis=-1)
    return left * (1 - fx) + right * fx


def shift_rows(img, shift: int):
    """Shift an image down (positive) / up (negative) along H with zero fill.

    Equivalent to the reference's vertical-flowfield grid_sample shift
    (img_utils.py:499-511) expressed as an exact integer roll.
    img: [..., H, W].
    """
    if shift == 0:
        return img
    h = img.shape[-2]
    rolled = jnp.roll(img, shift, axis=-2)
    rows = jnp.arange(h)
    if shift > 0:
        valid = rows >= shift
    else:
        valid = rows < h + shift
    return rolled * valid[:, None].astype(img.dtype)
