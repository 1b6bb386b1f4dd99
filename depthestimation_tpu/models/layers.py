"""Torch-geometry-compatible building blocks in Flax linen.

All modules operate channel-last (NHWC / NDHWC) — the TPU-native layout —
while reproducing the reference's PyTorch convolution geometry (explicit
symmetric padding, transposed-conv output sizes) and weight initialization
(fan-out normal for convs — models/models.py:505-524 in the reference;
bilinear kernels for transposed convs) so hyper-parameters transfer 1:1.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

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


class Conv(nn.Module):
    """2D conv, torch geometry: explicit symmetric padding. ``dtype``
    selects the compute precision (bf16 halves HBM traffic and doubles MXU
    rate; params stay f32)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Callable = fanout_normal_init()
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
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

    @nn.compact
    def __call__(self, x):
        k, p, s = self.kernel_size, self.padding, self.stride
        in_ch = x.shape[-1]
        kernel = self.param("kernel", fanout_normal_init(),
                            (k, k, k, in_ch, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        if s == 1 and p == k // 2:
            b, d, h, w, c = x.shape
            if self.dtype is not None:
                x = x.astype(self.dtype)
                kernel = kernel.astype(self.dtype)
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
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        axes = tuple(range(x.ndim - 1))

        if self.track_running_stats:
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((c,), jnp.float32))

        in_dtype = x.dtype
        # Statistics in f32 via ONE pass (mean + mean-of-squares, flax's own
        # formulation): the f32 converts fuse into the two reductions, so no
        # f32 copy of the activation is ever materialized (the centered
        # two-pass form cost ~32 ms/step of convert-copies at B=8). Safe here
        # — post-conv activations are O(10), far from f32 cancellation; the
        # max(., 0) guards the residual rounding case.
        if train or not self.track_running_stats:
            mean = jnp.mean(x.astype(jnp.float32), axis=axes)
            mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if self.track_running_stats and train and not self.is_initializing():
                n = float(np.prod([x.shape[a] for a in axes]))
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale_bias:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        # statistics/normalization in f32, but hand back the caller's compute
        # dtype: returning f32 under bf16 mixed precision reinflates every
        # conv->BN boundary to f32 HBM traffic (the next conv just casts back)
        return y.astype(in_dtype)


class ConvBN(nn.Module):
    """convbn (models.py:25-30): conv (no bias) + BN; padding follows the
    reference's quirk padding = dilation if dilation > 1 else pad."""
    features: int
    kernel_size: int
    stride: int
    pad: int
    dilation: int = 1
    bn_running_avg: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = self.dilation if self.dilation > 1 else self.pad
        x = Conv(self.features, self.kernel_size, self.stride, p,
                 self.dilation, use_bias=False, dtype=self.dtype)(x)
        return BatchNorm(self.bn_running_avg)(x, train)


class ConvBN3d(nn.Module):
    """convbn_3d (models.py:32-36)."""
    features: int
    kernel_size: int
    stride: int
    pad: int
    bn_running_avg: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3d(self.features, self.kernel_size, self.stride, self.pad,
                   use_bias=False, dtype=self.dtype)(x)
        return BatchNorm(self.bn_running_avg)(x, train)


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
