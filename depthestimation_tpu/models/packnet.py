"""PackNet-style DPV model (reference models/packnet.py:10-405).

Space-to-depth "packing" encoder with 3D convs over the packed axis,
GroupNorm+ELU convs, plane-sweep cost volume over the compressed D-channel
features, and an unpacking decoder with skip connections emitting a
log-softmax DPV at full resolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from depthestimation_tpu.models.layers import avg_pool, fanout_normal_init
from depthestimation_tpu.ops.plane_sweep import plane_sweep_volume
from depthestimation_tpu.ops.resample import resize_bilinear_align_corners


def space_to_depth(x, r: int = 2):
    """[B, H, W, C] -> [B, H/r, W/r, C*r^2], channel-major like the
    reference's ``packing`` (packnet.py:60-71: RRRRGGGGBBBB order)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # [B, H/r, W/r, C, r, r]
    return x.reshape(b, h // r, w // r, c * r * r)


def depth_to_space(x, r: int = 2):
    """Inverse of space_to_depth / torch PixelShuffle."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # [B, H, r, W, r, C]
    return x.reshape(b, h * r, w * r, c)


class GNConv(nn.Module):
    """Conv + GroupNorm(16) + ELU (packnet.py:42-58)."""
    features: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        x = nn.Conv(self.features, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2, padding=((p, p), (p, p)),
                    kernel_init=fanout_normal_init())(x)
        x = nn.GroupNorm(num_groups=16)(x)
        return nn.elu(x)


class ResConvBasic(nn.Module):
    features: int
    stride: int = 1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = GNConv(self.features, 3, self.stride)(x)
        out = GNConv(self.features, 3, 1)(out)
        short = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2)(x)
        if self.dropout:
            short = nn.Dropout(self.dropout, deterministic=not train)(short)
        return nn.elu(nn.GroupNorm(num_groups=16)(out + short))


class ResBlock(nn.Module):
    features: int
    blocks: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.blocks):
            x = ResConvBasic(self.features)(x, train)
        return x


class PackLayer3d(nn.Module):
    """space_to_depth -> 3D conv over a synthetic depth axis -> compress
    (packnet.py:102-121)."""
    features: int
    kernel_size: int
    r: int = 2
    d: int = 8

    @nn.compact
    def __call__(self, x):
        x = space_to_depth(x, self.r)          # [B, h, w, C*4]
        # 3D conv: treat channels as the depth axis with 1 feature channel
        v = x[..., None]                        # [B, h, w, C4, 1]
        v = jnp.moveaxis(v, 3, 1)               # [B, C4, h, w, 1]
        v = nn.Conv(self.d, (3, 3, 3), padding=((1, 1),) * 3)(v)
        v = jnp.moveaxis(v, 1, 3)               # [B, h, w, C4, d]
        v = v.reshape(v.shape[:3] + (-1,))      # [B, h, w, C4*d]
        return GNConv(self.features, self.kernel_size)(v)


class UnpackLayer3d(nn.Module):
    """conv -> 3D conv -> depth_to_space (packnet.py:123-142)."""
    features: int
    kernel_size: int
    r: int = 2
    d: int = 8

    @nn.compact
    def __call__(self, x):
        c = self.features * (self.r**2) // self.d
        x = GNConv(c, self.kernel_size)(x)
        v = x[..., None]
        v = jnp.moveaxis(v, 3, 1)
        v = nn.Conv(self.d, (3, 3, 3), padding=((1, 1),) * 3)(v)
        v = jnp.moveaxis(v, 1, 3)
        v = v.reshape(v.shape[:3] + (-1,))      # [B, h, w, c*d = feat*r^2]
        return depth_to_space(v, self.r)


class PackEncoder(nn.Module):
    feature_dim: int = 64
    d: int = 64

    @nn.compact
    def __call__(self, x, train: bool = True):
        ni, no = self.feature_dim // 2, self.feature_dim
        xf = GNConv(ni, 5)(x)
        x1 = GNConv(ni, 7)(xf)
        x1p = PackLayer3d(ni, 5)(x1)
        x2 = ResBlock(no)(x1p, train)
        x2p = PackLayer3d(no, 3)(x2)
        x3 = ResBlock(no)(x2p, train)
        x3p = PackLayer3d(no, 3)(x3)
        x4 = ResBlock(no)(x3p, train)
        x4p = PackLayer3d(no, 3)(x4)
        x5 = ResBlock(no)(x4p, train)
        x5p = PackLayer3d(no, 3)(x5)

        hw = x2p.shape[1:3]

        def up(t):
            nchw = jnp.moveaxis(t, -1, 1)
            out = resize_bilinear_align_corners(nchw, hw)
            return jnp.moveaxis(out, 1, -1)

        feat = jnp.concatenate([x2p, up(x3p), up(x4p), up(x5p)], axis=-1)
        toc = feat.shape[-1]
        feat = nn.Conv(toc // 2, (3, 3), padding=((1, 1), (1, 1)),
                       use_bias=False)(feat)
        feat = nn.relu(nn.GroupNorm(num_groups=16)(feat))
        compressed = nn.Conv(self.d, (1, 1), use_bias=False)(feat)
        return [x2p, x1p, xf], compressed


class PackDecoder(nn.Module):
    feature_dim: int = 64

    @nn.compact
    def __call__(self, dpv, features):
        x2p, x1p, xf = features
        x = GNConv(64, 3)(jnp.concatenate([dpv, x2p], axis=-1))
        x = UnpackLayer3d(64, 3)(x)
        x = GNConv(64, 3)(jnp.concatenate([x, x1p], axis=-1))
        x = UnpackLayer3d(64, 3)(x)
        x = GNConv(64, 3)(jnp.concatenate([x, xf], axis=-1))
        return nn.log_softmax(x, axis=-1)


class PackNetModel(nn.Module):
    feature_dim: int = 64
    d: int = 64
    sigma_soft_max: float = 10.0

    @nn.compact
    def __call__(self, model_input: dict, train: bool = True) -> dict:
        rgb = model_input["rgb"]                     # [B, T, 3, H, W]
        b, t = rgb.shape[:2]
        x = jnp.moveaxis(rgb.reshape((b * t,) + rgb.shape[2:]), -3, -1)
        feats, compressed = PackEncoder(self.feature_dim, self.d)(x, train)

        dw = x.shape[1] // compressed.shape[1]
        img_feat = avg_pool(x, dw)
        feat_all = jnp.concatenate([compressed, img_feat], axis=-1)
        feat_all = feat_all.reshape((b, t) + feat_all.shape[1:])
        feats_last = [f.reshape((b, t) + f.shape[1:])[:, -1] for f in feats]

        d_candi = model_input["d_candi"]
        feats_nchw = jnp.moveaxis(feat_all, -1, 2)   # [B, T, C, h, w]

        def per_item(fi, poses, intr, rays):
            return plane_sweep_volume(fi[-1], fi[:-1], d_candi,
                                      poses[:-1, :3, :3], poses[:-1, :3, 3],
                                      intr, rays, self.sigma_soft_max)

        cost = jax.vmap(per_item)(feats_nchw, model_input["src_cam_poses"],
                                  model_input["intrinsics"],
                                  model_input["unit_ray"])
        bv = jax.nn.log_softmax(cost, axis=1)        # [B, D, h, w]

        refined = PackDecoder(self.feature_dim)(
            jnp.exp(jnp.moveaxis(bv, 1, -1)), feats_last)
        return {"output": [bv], "output_refined": [jnp.moveaxis(refined, -1, 1)],
                "flow": None, "flow_refined": None}
