"""BaseDecoder: DPV refinement + 4x upsampler.

Treats the D depth bins as channels; fuses with image features at 1/4, 1/2
and 1x scales via two transposed convs; emits a log-softmax DPV at full
resolution (reference models/models.py:271-374).

``convbn2d`` runs the FULL-RESOLUTION refine tail (the three 3x3 convs
after the rgb concat — C=D+3=67, whose channels-last XLA layout pads to
128 lanes and whose weight-gradient convs alone cost ~15 ms of the B=8
step) through the fused Pallas strip kernel (ops/convbn2d_pallas.py):
each conv's bias + leaky-ReLU ride the NEXT kernel's load, so the
[8,256,384,67] activations move once per conv in the dense
channels-on-sublanes layout. The quarter/half-res pairs and the
transposed convs stay on XLA (C=128 loses — benchmarks/micro_convbn2d).
Same parameter tree: checkpoints are interchangeable."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from depthestimation_tpu.models.layers import Conv, ConvTranspose, leaky_relu


class BaseDecoder(nn.Module):
    """Inputs channel-last:
      dpv_raw: [B, H/4, W/4, D] probabilities (exp of the log-DPV);
      img_features: [feat_quarter [.,C0], feat_half [.,C1], rgb_full [.,C2]].
    Returns log-DPV [B, H, W, D]."""
    d: int = 64
    upsample_d: bool = False
    dtype: Any = None
    #: fused Pallas strip kernel for the full-res refine tail (resolved
    #: by BaseModelNet; False | True | "interpret")
    convbn2d: Any = False

    def _use_fused(self, h: int, w: int) -> bool:
        if not self.convbn2d:
            return False
        if self.convbn2d == "interpret":
            return True
        from depthestimation_tpu.models.encoder import _pick_rows
        return (self.dtype == jnp.bfloat16
                and _pick_rows(h, w) * w >= 512)

    @nn.compact
    def __call__(self, dpv_raw, img_features):
        d0 = 2 * self.d if self.upsample_d else self.d
        d1 = 2 * d0 if self.upsample_d else self.d
        dt = self.dtype

        x = jnp.concatenate([dpv_raw, img_features[0]], axis=-1)
        in_ch = x.shape[-1]
        x = leaky_relu(Conv(in_ch, 3, 1, 1, dtype=dt)(x))
        x = leaky_relu(Conv(in_ch, 3, 1, 1, dtype=dt)(x))
        x = leaky_relu(ConvTranspose(d0, 4, 2, 1, dtype=dt)(x))

        x = jnp.concatenate([x, img_features[1].astype(x.dtype)], axis=-1)
        c1 = x.shape[-1]
        x = leaky_relu(Conv(c1, 3, 1, 1, dtype=dt)(x))
        x = leaky_relu(Conv(c1, 3, 1, 1, dtype=dt)(x))
        x = leaky_relu(ConvTranspose(d1, 4, 2, 1, dtype=dt)(x))

        x = jnp.concatenate([x, img_features[2].astype(x.dtype)], axis=-1)
        c2 = x.shape[-1]
        if self._use_fused(x.shape[1], x.shape[2]):
            from depthestimation_tpu.models.encoder import _pick_rows
            from depthestimation_tpu.ops.convbn2d_pallas import (
                from_strips, to_strips)
            h, w = x.shape[1], x.shape[2]
            rows = _pick_rows(h, w)
            ctx = dict(spi=h // rows, rows=rows, w=w,
                       interpret=self.convbn2d == "interpret")
            z, _, b1 = Conv(c2, 3, 1, 1, dtype=dt)(
                to_strips(x, rows),
                fused_in=dict(a=None, b=None, act="none", **ctx))
            z, _, b2 = Conv(d1, 3, 1, 1, dtype=dt)(
                z, fused_in=dict(a=None, b=b1, act="leaky", **ctx))
            z, _, b3 = Conv(d1, 3, 1, 1, dtype=dt)(
                z, fused_in=dict(a=None, b=b2, act="leaky", **ctx))
            x = from_strips(z, rows, h) + b3.astype(z.dtype)
        else:
            x = leaky_relu(Conv(c2, 3, 1, 1, dtype=dt)(x))
            x = leaky_relu(Conv(d1, 3, 1, 1, dtype=dt)(x))
            x = Conv(d1, 3, 1, 1, dtype=dt)(x)

        return nn.log_softmax(x.astype(jnp.float32), axis=-1)
