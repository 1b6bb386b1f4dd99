"""BaseDecoder: DPV refinement + 4x upsampler.

Treats the D depth bins as channels; fuses with image features at 1/4, 1/2
and 1x scales via two transposed convs; emits a log-softmax DPV at full
resolution (reference models/models.py:271-374).
"""

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
        x = leaky_relu(Conv(c2, 3, 1, 1, dtype=dt)(x))
        x = leaky_relu(Conv(d1, 3, 1, 1, dtype=dt)(x))
        x = Conv(d1, 3, 1, 1, dtype=dt)(x)

        return nn.log_softmax(x.astype(jnp.float32), axis=-1)
