"""Torch-geometry-compatible building blocks in Flax linen.

All modules operate channel-last (NHWC / NDHWC) — the TPU-native layout —
while reproducing the reference's PyTorch convolution geometry (explicit
symmetric padding, transposed-conv output sizes) and weight initialization
(fan-out normal for convs — models/models.py:505-524 in the reference;
bilinear kernels for transposed convs) so hyper-parameters transfer 1:1.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

from jax.ad_checkpoint import checkpoint_name

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def fanout_normal_init(kernel_hw_prod_axis: int = -2):
    """std = sqrt(2 / (kh * kw * out_channels)) — the reference's weight_init.

    Kernel layout: (*spatial, in, out).
    """

    def init(key, shape, dtype=jnp.float32):
        spatial = int(np.prod(shape[:-2]))
        n = spatial * shape[-1]
        return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / n)

    return init


def bilinear_kernel_init():
    """Bilinear upsampling kernel, broadcast over (in, out) channel pairs —
    matches the reference decoder's ConvTranspose init (models.py:364-374)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw = shape[0], shape[1]
        def axis(n):
            factor = (n + 1) // 2
            center = factor - 1 if n % 2 == 1 else factor - 0.5
            return 1 - np.abs(np.arange(n) - center) / factor
        w = np.outer(axis(kh), axis(kw)).astype(np.float32)
        return jnp.broadcast_to(jnp.asarray(w, dtype)[:, :, None, None], shape)

    return init


class _ConvParams(nn.Module):
    """Parameter-holder matching nn.Conv's tree exactly (child "Conv_0"
    with params "kernel"/"bias", same shape/init/RNG-path), for the
    fused path that bypasses nn.Conv's forward."""
    shape: tuple
    kernel_init: Callable
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, self.shape)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.shape[-1],)) if self.use_bias else None
        return kernel, bias


class Conv(nn.Module):
    """2D conv, torch geometry: explicit symmetric padding. ``dtype``
    selects the compute precision (bf16 halves HBM traffic and doubles MXU
    rate; params stay f32).

    With ``fused_in`` the conv runs as the fused Pallas 2D strip kernel
    (ops/convbn2d_pallas.py): ``x`` is the RAW previous output in the
    transposed [N_strips, C, rows*W] layout and ``fused_in`` =
    dict(a, b, act, spi, rows, w, interpret, seam) carries the pending
    per-channel normalize (None = identity) the kernel applies on load;
    returns (y_raw strips, stats [F, 2]). Same parameter tree as the
    nn.Conv path — checkpoints are interchangeable."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Callable = fanout_normal_init()
    dtype: Any = None

    @nn.compact
    def __call__(self, x, fused_in=None):
        if fused_in is not None:
            return self._fused(x, fused_in)
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)

    def _fused(self, x, fused_in):
        """Returns (y_raw strips, stats, bias-or-None). A biased conv's
        own bias is NOT applied to y — chain it as the next fused
        layer's ``b`` (the decoder's leaky chains do), or add it after
        ``from_strips``."""
        from depthestimation_tpu.ops.convbn2d_pallas import (
            convbn2d_block, pack_wm2d)

        k = self.kernel_size
        if (k != 3 or self.stride != 1 or self.padding != 1
                or self.dilation != 1):
            raise ValueError("fused Conv needs the 3x3 stride-1 'same' "
                             "no-dilation geometry")
        n, c, L = x.shape
        f = self.features
        kernel, bias = _ConvParams((k, k, c, f), self.kernel_init,
                                   use_bias=self.use_bias,
                                   name="Conv_0")()
        cp = (-c) % 8
        fp = (-f) % 8
        if cp or fp:
            kernel_p = jnp.pad(kernel, ((0, 0), (0, 0), (0, cp), (0, fp)))
            x = jnp.pad(x, ((0, 0), (0, cp), (0, 0)))
        else:
            kernel_p = kernel
        wm = pack_wm2d(kernel_p).astype(jnp.bfloat16)
        a, b = fused_in["a"], fused_in["b"]
        a = jnp.ones((c + cp,), jnp.float32) if a is None else \
            (jnp.concatenate([a.astype(jnp.float32),
                              jnp.ones((cp,), jnp.float32)])
             if cp else a.astype(jnp.float32))
        b = jnp.zeros((c + cp,), jnp.float32) if b is None else \
            (jnp.concatenate([b.astype(jnp.float32),
                              jnp.zeros((cp,), jnp.float32)])
             if cp else b.astype(jnp.float32))
        y, stats = convbn2d_block(
            x.astype(jnp.bfloat16), wm, a, b, fused_in["spi"],
            fused_in["rows"], fused_in["w"], fused_in.get("act") or "none",
            fused_in.get("interpret", False),
            fused_in.get("seam", "xla"))
        if fp:
            y = y[:, :f]
            stats = stats[:f]
        return y, stats, bias


class Conv3d(nn.Module):
    """3D conv over [B, D, H, W, C], torch geometry.

    XLA's native Conv3D is ~14x slower than its mathematically identical
    2D unrolling on TPU v5e, so for the common stride-1 'same' case the op
    is lowered to a SUM of kd depth-shifted 2D convs:
        out[d] = sum_i conv2d(x[d + i - p], kernel[i]).
    Each conv consumes a strided slice of the depth-padded input directly —
    no [B, D, H, W, kd*C] concat buffer is ever materialized (that stack
    was the dominant HBM allocation of the batch-8 backward: 12 live
    576 MB buffers in the rematted Base3D). Parameters keep the
    torch-compatible [kd, kh, kw, C, F] shape.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Any = None
    #: when set, accepts the volume FLATTENED to [B*D, H, W, C] (D-major
    #: rows) and keeps the whole computation 4D: the k depth taps conv the
    #: SAME input (no per-tap pad/slice copies) and the depth shift happens
    #: on the conv outputs via roll + iota validity mask, which fuses into
    #: the accumulate. Staying 4D lets layout assignment propagate the
    #: conv-friendly layout through the surrounding BN/relu/residual ops
    #: instead of flipping 5D<->4D at every conv boundary.
    depth: int | None = None
    #: fuse the flat-path tap combine (split + depth shift + edge mask +
    #: accumulate) into the Pallas kernel ops/combine_pallas.tap_combine —
    #: XLA's roll+broadcast_select form moves the [N,H,W,3F] taps at
    #: ~80 GB/s (PROFILE_b8.md). False = XLA; True = compiled kernel;
    #: "interpret" = Pallas interpreter (CPU tests). Resolved by
    #: BaseModelNet (backend/dtype/mesh gates live there).
    combine_pallas: Any = False
    #: mesh/axis for the kernel's shard_map on multi-device backends
    combine_mesh: Any = None
    combine_axis: str = "data"

    @nn.compact
    def __call__(self, x, fused_in=None):
        k, p, s = self.kernel_size, self.padding, self.stride
        if fused_in is not None:
            return self._fused(x, fused_in)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", fanout_normal_init(),
                            (k, k, k, in_ch, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        if x.ndim == 4:
            if self.depth is None or s != 1 or p != k // 2:
                raise ValueError("flat Conv3d needs depth set and the "
                                 "stride-1 'same' geometry")
            n, h, w, c = x.shape
            d = self.depth
            if self.dtype is not None:
                x = x.astype(self.dtype)
                kernel = kernel.astype(self.dtype)
            # one conv with the depth taps stacked on the output channels:
            # the weight gradient becomes a single [kh,kw,C,k*F] conv
            # instead of k separate ones (B=8 train step 372 -> 348 ms,
            # readback-barrier measured); the tap slices fuse into the
            # roll/mask combine below. At small flattened batches the
            # stacked conv loses (B=1 step 98 -> 114 ms) — gate on rows.
            if n >= 192:
                kcat = jnp.concatenate([kernel[i] for i in range(k)],
                                       axis=-1)
                tcat = jax.lax.conv_general_dilated(
                    x, kcat, (1, 1), ((p, p), (p, p)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if self.combine_pallas and k == 3 and self.features >= 8:
                    from depthestimation_tpu.ops.combine_pallas import \
                        tap_combine
                    y = tap_combine(
                        tcat, d, self.features,
                        self.combine_pallas == "interpret",
                        self.combine_mesh, self.combine_axis)
                    if bias is not None:
                        y = y + bias
                    return y
                taps = [tcat[..., i * self.features:(i + 1) * self.features]
                        for i in range(k)]
            else:
                taps = [jax.lax.conv_general_dilated(
                    x, kernel[i], (1, 1), ((p, p), (p, p)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    for i in range(k)]
            row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1, 1), 0) % d
            y = taps[p]
            for i in range(k):
                shift = i - p
                if shift == 0:
                    continue
                ti = jnp.roll(taps[i], -shift, axis=0)
                valid = (row + shift >= 0) & (row + shift < d)
                y = y + jnp.where(valid, ti, jnp.zeros((), ti.dtype))
        elif s == 1 and p == k // 2:
            b, d, h, w, c = x.shape
            if self.dtype is not None:
                x = x.astype(self.dtype)
                kernel = kernel.astype(self.dtype)
            # Measured-best form at B=8 production shapes (TPU v5e). The
            # [B*D,...] reshape makes layout assignment flip each conv
            # boundary between the conv's N-minor and the volume's W-minor
            # layout (~80 ms/step of 100 MB copies), but every alternative
            # measured worse in context: native NDHWC conv 649 vs 549 ms
            # step (slower emitter at C=32), per-tap (1,kh,kw) NDHWC convs
            # OOM (+6.5 GB of D+2-sized tap buffers), output-stacked
            # [kh,kw,C,k*F] kernel +40% (combine pass + pad backward).
            xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0), (0, 0)))
            y = None
            for i in range(k):
                xi = jax.lax.dynamic_slice_in_dim(xp, i, d, axis=1)
                yi = jax.lax.conv_general_dilated(
                    xi.reshape(b * d, h, w, c), kernel[i], (1, 1),
                    ((p, p), (p, p)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = yi if y is None else y + yi
            y = y.reshape(b, d, h, w, self.features)
        else:  # rare general case: fall back to native Conv3D
            y = jax.lax.conv_general_dilated(
                x, kernel, (s, s, s), ((p, p),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if bias is not None:
            y = y + bias
        return y

    def _fused(self, x, fused_in):
        """Fused-kernel path (ops/convcomb_pallas.py): ``x`` is the RAW
        (pre-BN) previous-layer output in the transposed [N, C, H*W]
        layout; ``fused_in`` = dict(a, b, relu, h, w, interpret, mesh,
        axis) carries the pending per-channel normalize coefficients that
        the kernel applies on load. Returns (y_raw [N, F, H*W] bf16,
        stats [F, 2] f32 sums) — the BN that owns this conv consumes the
        stats (see BatchNorm ``fused_stats``). Channels are zero-padded
        to sublane multiples of 8 around the kernel call (Mosaic needs
        aligned sublane concat/split offsets); the parameter keeps its
        torch-compatible [3, 3, 3, C, F] shape either way."""
        from depthestimation_tpu.ops.convcomb_pallas import (
            convbn_block, pack_wm)

        k, p, s = self.kernel_size, self.padding, self.stride
        if k != 3 or s != 1 or p != 1 or self.depth is None or self.use_bias:
            raise ValueError("fused Conv3d needs the 3x3x3 stride-1 "
                             "'same' no-bias geometry and depth set")
        n, c, hw = x.shape
        f = self.features
        kernel = self.param("kernel", fanout_normal_init(),
                            (k, k, k, c, f))
        cp = (-c) % 8
        fp = (-f) % 8
        if cp or fp:
            kernel_p = jnp.pad(kernel, ((0, 0),) * 3 + ((0, cp), (0, fp)))
            x = jnp.pad(x, ((0, 0), (0, cp), (0, 0)))
        else:
            kernel_p = kernel
        wm = pack_wm(kernel_p).astype(jnp.bfloat16)
        a = jnp.concatenate([fused_in["a"].astype(jnp.float32),
                             jnp.ones((cp,), jnp.float32)]) if cp else \
            fused_in["a"].astype(jnp.float32)
        b = jnp.concatenate([fused_in["b"].astype(jnp.float32),
                             jnp.zeros((cp,), jnp.float32)]) if cp else \
            fused_in["b"].astype(jnp.float32)
        y, stats = convbn_block(
            x.astype(jnp.bfloat16), wm, a, b, self.depth,
            fused_in["h"], fused_in["w"], fused_in["relu"],
            fused_in.get("interpret", False), fused_in.get("mesh"),
            fused_in.get("axis", "data"))
        if fp:
            y = y[:, :f]
            stats = stats[:f]
        return y, stats


class ConvTranspose(nn.Module):
    """Transposed conv matching torch ``ConvTranspose2d(k, s, p)``:
    out = (in - 1) * s - 2p + k. Implemented as input-dilated conv with a
    flipped kernel so the geometry is exact."""
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = bilinear_kernel_init()
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (k, k, in_ch, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        # conv_transpose(x, w) == conv(dilate_s(x), flip(w)), pad = k - 1 - p
        flipped = kernel[::-1, ::-1]
        pad = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x, flipped,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


def _bn_stats(x):
    """Per-channel (mean, var) in f32 via ONE fused pass (mean + mean of
    squares). The f32 converts fuse into the reductions — no f32 copy of the
    activation is materialized. Safe here: post-conv activations are O(10),
    far from f32 cancellation; the max(., 0) guards residual rounding."""
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    mean2 = jnp.mean(jnp.square(xf), axis=axes)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    # Named so remat policies can pin them: the stats are C-sized f32
    # vectors, but recomputing them in the backward re-reads the full
    # activation (save_only_these_names("bn_stats") in factory/base_model).
    mean = checkpoint_name(mean, "bn_stats")
    var = checkpoint_name(var, "bn_stats")
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_apply(x, scale, bias, eps):
    """Batch-stat normalization with a hand-written VJP.

    Autodiff of the straightforward formulation makes XLA save an f32,
    layout-transposed copy of every normalized activation for the backward —
    at B=8 production shapes that was ~116 ms/step of pure convert+copy
    traffic (plus ~55 ms of stat re-reductions under remat). This VJP saves
    only the bf16 input and three per-channel f32 vectors, and computes
    dx/dscale/dbias from the standard closed form
        dx = rstd*scale * (g - mean(g) - xhat * mean(g*xhat))
    folded into ONE elementwise pass (dx = a*g + b*x + c with per-channel
    f32 a, b, c) plus one fused reduction pass over (g, g*xhat).
    """
    y, _ = _bn_train_fwd(x, scale, bias, eps)
    return y


def _bn_train_fwd(x, scale, bias, eps):
    mean, var = _bn_stats(x)
    rstd = jax.lax.rsqrt(var + eps)
    # y = x * a + b with per-channel f32 a, b: one fused multiply-add in the
    # compute dtype; converts of the per-channel constants are free.
    a = (rstd * scale).astype(jnp.float32)
    b = bias - mean * a
    y = x * a.astype(x.dtype) + b.astype(x.dtype)
    return y, (x, mean, rstd, scale)


def _bn_train_bwd(eps, res, g):
    x, mean, rstd, scale = res
    axes = tuple(range(x.ndim - 1))
    n = float(np.prod([x.shape[a] for a in axes]))
    gf = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rstd   # fuses into the reduces
    sum_g = jnp.sum(gf, axis=axes)
    sum_gx = jnp.sum(gf * xhat, axis=axes)
    dscale = sum_gx.astype(scale.dtype)
    dbias = sum_g.astype(scale.dtype)
    # dx = a*g + b2*x + c2, per-channel f32 coefficients
    a = scale * rstd
    b2 = -a * (sum_gx / n) * rstd
    c2 = -a * (sum_g / n) - b2 * mean
    dx = (g * a.astype(g.dtype) + x * b2.astype(x.dtype)
          + c2.astype(x.dtype)).astype(x.dtype)
    return dx, dscale, dbias


bn_train_apply.defvjp(_bn_train_fwd, _bn_train_bwd)


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics.

    track_running_stats=False (the reference's default, models.py:30): batch
    statistics are used in BOTH train and eval — the module is stateless.
    track_running_stats=True: running stats are updated in train (torch
    momentum 0.1) and used in eval.

    Under pjit with a batch-sharded mesh the reductions below are global, so
    cross-replica ("Sync") BatchNorm comes for free — no explicit collective
    is needed (replaces SyncBatchNorm.convert_sync_batchnorm in the
    reference trainer, base_trainer.py:112-113).
    """
    track_running_stats: bool = False
    momentum: float = 0.1
    eps: float = 1e-5
    use_scale_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True, fused_stats=None):
        if fused_stats is not None:
            return self._fused_coeffs(fused_stats, train)
        c = x.shape[-1]
        axes = tuple(range(x.ndim - 1))

        if self.track_running_stats:
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((c,), jnp.float32))

        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
        else:
            scale = jnp.ones((c,), jnp.float32)
            bias = jnp.zeros((c,), jnp.float32)

        if train or not self.track_running_stats:
            # Batch-stat path: custom-VJP core (see bn_train_apply) — saves
            # only the compute-dtype input + per-channel f32 vectors, so no
            # f32 activation copy is materialized for the backward. Output
            # stays in the caller's compute dtype (returning f32 under bf16
            # mixed precision reinflates every conv->BN boundary).
            y = bn_train_apply(x, scale, bias, self.eps)
            if self.track_running_stats and train and not self.is_initializing():
                mean, var = _bn_stats(jax.lax.stop_gradient(x))
                n = float(np.prod([x.shape[a] for a in axes]))
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
            a = jax.lax.rsqrt(var + self.eps) * scale
            b = bias - mean * a
            y = x * a.astype(x.dtype) + b.astype(x.dtype)
        return y.astype(x.dtype)

    def _fused_coeffs(self, fused_stats, train: bool):
        """Fused-kernel path: instead of normalizing an activation, turn
        the kernel-produced raw sums into the per-channel (a, b) that the
        NEXT fused layer applies on load (y_norm = y_raw*a + b).

        ``fused_stats`` = (stats [C, 2] f32 with sums of y and y*y, count).
        Gradients to scale/bias AND back into the stats (and from there
        through the producing kernel's custom VJP) flow through these
        [C]-sized ops via ordinary autodiff — the closed-form bn_train_apply
        VJP exists only to avoid materializing f32 activation copies, which
        the fused layout never creates."""
        stats, count = fused_stats
        c = stats.shape[0]
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
        else:
            scale = jnp.ones((c,), jnp.float32)
            bias = jnp.zeros((c,), jnp.float32)
        mean = stats[:, 0] / count
        var = jnp.maximum(stats[:, 1] / count - jnp.square(mean), 0.0)
        if self.track_running_stats:
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((c,), jnp.float32))
            if train and not self.is_initializing():
                m0 = jax.lax.stop_gradient(mean)
                v0 = jax.lax.stop_gradient(var)
                unbiased = v0 * (count / max(count - 1.0, 1.0))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * m0)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
            if not train:
                mean, var = ra_mean.value, ra_var.value
        a = jax.lax.rsqrt(var + self.eps) * scale
        b = bias - mean * a
        return a.astype(jnp.float32), b.astype(jnp.float32)


class ConvBN(nn.Module):
    """convbn (models.py:25-30): conv (no bias) + BN; padding follows the
    reference's quirk padding = dilation if dilation > 1 else pad.

    ``fused_in`` selects the fused Pallas strip-kernel chain (see
    Conv._fused / ops/convbn2d_pallas.py): x is the RAW previous output
    [N_strips, C, rows*W]; returns (y_raw, a, b) where (a, b) normalize
    y_raw on the NEXT fused layer's load — the 2D sibling of ConvBN3d's
    fused contract."""
    features: int
    kernel_size: int
    stride: int
    pad: int
    dilation: int = 1
    bn_running_avg: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, fused_in=None):
        p = self.dilation if self.dilation > 1 else self.pad
        conv = Conv(self.features, self.kernel_size, self.stride, p,
                    self.dilation, use_bias=False, dtype=self.dtype)
        bn = BatchNorm(self.bn_running_avg)
        if fused_in is not None:
            y, stats, _ = conv(x, fused_in=fused_in)
            count = float(y.shape[0] * y.shape[2])
            a, b = bn(None, train, fused_stats=(stats, count))
            return y, a, b
        x = conv(x)
        return bn(x, train)


class ConvBN3d(nn.Module):
    """convbn_3d (models.py:32-36). ``depth`` selects the flat-4D Conv3d
    path (input [B*D, H, W, C]); BatchNorm reduces over all-but-channel
    either way."""
    features: int
    kernel_size: int
    stride: int
    pad: int
    bn_running_avg: bool = False
    dtype: Any = None
    depth: int | None = None
    combine_pallas: Any = False
    combine_mesh: Any = None
    combine_axis: str = "data"

    @nn.compact
    def __call__(self, x, train: bool = True, fused_in=None):
        conv = Conv3d(self.features, self.kernel_size, self.stride,
                      self.pad, use_bias=False, dtype=self.dtype,
                      depth=self.depth,
                      combine_pallas=self.combine_pallas,
                      combine_mesh=self.combine_mesh,
                      combine_axis=self.combine_axis)
        bn = BatchNorm(self.bn_running_avg)
        if fused_in is not None:
            # fused-kernel chain (ops/convcomb_pallas.py): x is the RAW
            # previous output [N, C, H*W]; return (y_raw, a, b) where
            # (a, b) normalize y_raw on the NEXT layer's load.
            y, stats = conv(x, fused_in=fused_in)
            count = float(y.shape[0] * y.shape[2])
            a, b = bn(None, train, fused_stats=(stats, count))
            return y, a, b
        x = conv(x)
        return bn(x, train)


class PReLU(nn.Module):
    """Per-channel PReLU (torch default alpha 0.25)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


def leaky_relu(x, slope: float = 0.01):
    return jnp.where(x >= 0, x, slope * x)


def avg_pool(x, window: int, stride: int | None = None):
    stride = stride or window
    return nn.avg_pool(x, (window, window), (stride, stride), padding="VALID")


def max_pool(x, window: int):
    return nn.max_pool(x, (window, window), (window, window), padding="VALID")
