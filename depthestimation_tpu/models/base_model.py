"""BaseModel: the main recursive DPV network.

Rebuilt from the reference (models/models.py:441-1156) as a functional Flax
module. Differences from the reference that matter on TPU:

- the per-batch-item Python loops around the plane-sweep warp become a
  single ``jax.vmap`` (one fused XLA program, batch on the mesh);
- tensors are channel-last inside modules; the public contract keeps the
  reference layout: ``rgb [B, T, 3, H, W]`` in, DPVs ``[B, D, h, w]`` out;
- the light-curtain loop (``lc_process``) is NOT inside the network: it is a
  separate jitted function (``lc.process``) applied to the refined DPV by the
  step functions, mirroring the reference's ``BV_cur_refined.detach()``
  boundary with ``lax.stop_gradient``.

nmode dispatch parity (models.py:678-837): default, exp2, exp3, exp7,
exp7_lc, lc.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from depthestimation_tpu.models.base3d import Base3D
from depthestimation_tpu.models.decoder import BaseDecoder
from depthestimation_tpu.models.encoder import BaseEncoder
from depthestimation_tpu.models.layers import Conv, avg_pool, leaky_relu, max_pool
from depthestimation_tpu.ops.plane_sweep import (
    plane_sweep_and_warp,
    plane_sweep_and_warp_decomposed,
    plane_sweep_and_warp_decomposed_batched,
    plane_sweep_volume,
    plane_sweep_volume_decomposed,
    warp_feature_volume,
)


def _nchw(x):
    return jnp.moveaxis(x, -1, -3)


def _nhwc(x):
    return jnp.moveaxis(x, -3, -1)


class BaseModelNet(nn.Module):
    """See module docstring. ``d_candi`` is passed in ``model_input``."""
    feature_dim: int = 64
    d: int = 64
    nmode: str = "exp7"
    bn_avg: bool = False
    sigma_soft_max: float = 10.0
    diffhomo: bool = True
    use_lc_prob: float = 0.7
    dtype: Any = None     # bf16 conv compute when set (params stay f32)
    #: "decomposed" = MXU plane sweep (fixed homography resample + per-depth
    #: banded matmuls; ~5-10x faster fwd/bwd, exact for identity rotations,
    #: one extra bilinear smoothing otherwise — ops/plane_sweep.py); "gather"
    #: = the direct per-depth 4-tap gather (bit-parity with the torch oracle)
    sweep_impl: str = "decomposed"
    #: compute dtype of the decomposed sweep's resample matmuls. "auto" =
    #: follow ``dtype`` (bf16 training runs the sweep in bf16 — single MXU
    #: pass instead of f32 HIGHEST's six, and half the intermediate bytes;
    #: the cost reduction still accumulates in f32). f32 models keep the
    #: exact-at-identity f32/HIGHEST contract (ops/plane_sweep.py).
    sweep_dtype: Any = "auto"
    #: run stage 2 of the decomposed sweep as the fused Pallas kernel
    #: (ops/sweep_pallas.py — VMEM-resident depth sweep, no [C, D, H, W]
    #: HBM intermediates). "auto" = on a TPU backend when the sweep compute
    #: dtype is bf16 (the production training config) — single-device
    #: directly, multi-device through ``jax.shard_map`` over the batch axis
    #: of ``mesh`` (GSPMD cannot batch-partition an opaque pallas_call; the
    #: shard_map runs it per-device on the local shard instead). f32 keeps
    #: the XLA HIGHEST-precision einsums and their exact-at-identity
    #: contract. True/False force; "interpret" forces the kernel through
    #: the Pallas interpreter (CPU tests / the multichip dryrun).
    sweep_pallas: Any = "auto"
    #: jax.sharding.Mesh for the shard_map'd Pallas sweep on multi-device
    #: backends (set by the trainer / dryrun; factory.get_model(cfg, mesh)).
    #: None on a single device. Ignored by the XLA paths — GSPMD shards
    #: those from the input shardings alone.
    mesh: Any = None
    #: name of the batch axis of ``mesh``
    mesh_axis: str = "data"

    def _sweep_mesh(self):
        """The mesh to shard_map the Pallas sweep over, or None.

        Only a pure data-parallel mesh qualifies: on a 2-D data x model
        mesh the model axis shards the depth planes, which the Pallas
        kernel cannot partition — the XLA einsum path (which GSPMD can
        shard on D) stays in charge there."""
        m = self.mesh
        if m is None or m.size <= 1:
            return None
        shape = dict(zip(m.axis_names, m.devices.shape))
        if shape.get(self.mesh_axis, 1) != m.size:
            return None
        return m

    #: fuse the flat-Conv3d depth-tap combine into the Pallas kernel
    #: (ops/combine_pallas.py). "auto" = OFF: measured on the real chip the
    #: kernel LOSES — the opaque tpu_custom_call pins a {0,3,2,1} layout
    #: that XLA satisfies with ~20 extra 192 MB copy temps around Base3D's
    #: adds/relus, OOMing the B=8 full-size step (15.75 GB HBM), and the
    #: honest micro A/B (benchmarks/micro_combine.py) already has the
    #: XLA roll+select form ahead. The kernel stays available for forcing
    #: (True) and for the interpret-mode CPU tests + shard_map dryrun,
    #: which pin its numerics and mesh plumbing.
    combine_pallas: Any = "auto"

    def _resolved_combine_pallas(self):
        if self.combine_pallas != "auto":
            return self.combine_pallas
        return False

    #: fused Base3D block kernel (ops/convcomb_pallas.py): one Pallas
    #: pass per conv layer does normalize+ReLU on load, the 3x3x3 conv,
    #: the depth-tap combine, and the BN statistics on store — the tap
    #: tensor / combine selects / stat fusions never reach HBM. "auto" =
    #: on a TPU backend under bf16 with the flat layout (single-device
    #: directly, data meshes via shard_map — same contract as
    #: sweep_pallas). Measured fwd+bwd 8.40 vs 10.60 ms/layer at the B=8
    #: production volume (benchmarks/micro_convcomb.py). True/False
    #: force; "interpret" = Pallas interpreter (CPU tests / dryrun).
    convcomb_pallas: Any = "auto"

    def _resolved_convcomb_pallas(self):
        if self.convcomb_pallas != "auto":
            return self.convcomb_pallas
        if not self.conv3d_flat:
            return False
        if (self.dtype or jnp.float32) != jnp.bfloat16:
            return False
        if jax.default_backend() != "tpu":
            return False
        return len(jax.devices()) == 1 or self._sweep_mesh() is not None

    #: fused Pallas 2D strip kernel for the encoder's stride-1 ConvBN
    #: stacks (ops/convbn2d_pallas.py, models/encoder.py). "auto" = on a
    #: single-device TPU backend under bf16 (GSPMD cannot partition the
    #: opaque pallas_call; multi-device keeps XLA for now). True/False
    #: force; "interpret" = Pallas interpreter (CPU tests / dryrun).
    convbn2d: Any = "auto"

    def _resolved_convbn2d(self):
        if self.convbn2d != "auto":
            return self.convbn2d
        if (self.dtype or jnp.float32) != jnp.bfloat16:
            return False
        if jax.default_backend() != "tpu":
            return False
        return len(jax.devices()) == 1 and (self.mesh is None
                                            or self.mesh.size <= 1)

    def encoder_path(self, h: int, w: int) -> str:
        """Which encoder implementation runs at image resolution h x w
        in TRAIN mode: "convbn2d-pallas" or "xla". Mirrors
        BaseEncoder._use_fused (inlined — instantiating a child module
        on an unbound model trips Flax's naming assertions)."""
        cc = self._resolved_convbn2d()
        if not cc or h % 4 or w % 4:
            return "xla"
        if cc == "interpret":
            return "convbn2d-pallas"
        from depthestimation_tpu.models.encoder import _pick_rows
        ok = (self.dtype == jnp.bfloat16
              and _pick_rows(h // 2, w // 2) * (w // 2) >= 512)
        return "convbn2d-pallas" if ok else "xla"

    def conv3d_path(self, batch: int, depth: int, h: int, w: int) -> str:
        """Which Base3D implementation runs for a ``batch``-item volume
        [batch, depth, h, w, C] (h/w = the cost-volume resolution, i.e.
        image/4 — thread the real values from the config, the gates are
        resolution-dependent): "convcomb-pallas",
        "convcomb-pallas+shard_map", or "xla-flat"/"xla-5d". Mirrors
        Base3D._use_fused exactly; the dryrun prints this next to
        sweep_path."""
        cc = self._resolved_convcomb_pallas()
        if not cc or not self.conv3d_flat:
            return "xla-flat" if self.conv3d_flat else "xla-5d"
        mesh = self._sweep_mesh() if cc else None
        if mesh is not None and batch % mesh.size != 0:
            return "xla-flat"          # see Base3D._use_fused mesh gate
        if cc != "interpret" and (batch * depth < 192
                                  or (h * w) % 128 != 0):
            return "xla-flat"
        if len(jax.devices()) > 1 and mesh is not None:
            return "convcomb-pallas+shard_map"
        return "convcomb-pallas"

    def _use_sweep_pallas(self) -> bool:
        if self.sweep_pallas == "auto":
            if self._sweep_dtype() != jnp.bfloat16:
                return False
            if jax.default_backend() != "tpu":
                return False
            return len(jax.devices()) == 1 or self._sweep_mesh() is not None
        return bool(self.sweep_pallas)

    def sweep_path(self, batch: int) -> str:
        """Which sweep implementation a ``batch``-item fused forward runs:
        "pallas" (single device), "pallas+shard_map" (multi-device mesh),
        "xla-decomposed", or "gather". The dryrun prints this so the driver
        log shows the flagship kernel riding the mesh."""
        if self.sweep_impl != "decomposed":
            return "gather"
        if not self._use_sweep_pallas():
            return "xla-decomposed"
        if len(jax.devices()) > 1:
            m = self._sweep_mesh()
            if m is not None and batch % m.size == 0:
                return "pallas+shard_map"
            return "xla-decomposed"
        return "pallas"
    #: block-level rematerialization: the checkpointed blocks recompute their
    #: activations in the backward, so peak HBM = the largest single block
    #: instead of the whole graph. Needed for per-chip batch >= 4 at full
    #: size (un-remat'd B=8 wants 28 GB vs 16 GB HBM). False/"none" = off;
    #: "hot" = sweep + Base3D only (the two biggest activation producers);
    #: True/"full" = also encoder + decoder; "save3d" = remat encoder +
    #: decoder + sweep but STORE Base3D — Base3D is ~2/3 of the forward
    #: FLOPs yet its interior is only ~3 GB at batch 8, so storing it keeps
    #: most of the memory win while skipping the most expensive recompute
    remat: Any = False
    #: run Base3D in the flattened [B*D, H, W, C] layout (layers.Conv3d
    #: depth path) — same math, same parameter tree, fewer layout copies;
    #: False = the 5D per-tap-slice form
    conv3d_flat: bool = True

    def _remat_mode(self) -> str:
        if self.remat in (False, None, "none"):
            return "none"
        if self.remat in ("hot", "save3d"):
            return self.remat
        return "full"

    def setup(self):
        enc_cls, dec_cls, b3d_cls = BaseEncoder, BaseDecoder, Base3D
        mode = self._remat_mode()
        # NOTE: saving the named BN statistics across these remat boundaries
        # (policy=save_only_these_names("bn_stats")) would skip ~40 ms/step
        # of stat-reduce recompute at B=8, but XLA compile time exploded
        # from ~1 min to >28 min on the full train step — not shippable.
        if mode in ("hot", "full"):
            b3d_cls = nn.remat(Base3D, static_argnums=(2, 3))
        if mode in ("full", "save3d"):
            enc_cls = nn.remat(BaseEncoder, static_argnums=(2,))
            dec_cls = nn.remat(BaseDecoder)
        self.base_encoder = enc_cls(self.feature_dim, self.bn_avg,
                                    dtype=self.dtype,
                                    convbn2d=self._resolved_convbn2d())
        # decoder refine tail: MEASURED-REJECTED for auto (B=8 step 290
        # -> 310.6 ms with the full-res C=67 chain fused — the spi=64
        # strip grid's per-step overhead dominates at F<=72 tiles and
        # the bwd kernel loses its seam work to tiny strips). The path
        # stays available for forcing/interpret (tests pin it).
        self.base_decoder = dec_cls(
            self.d, dtype=self.dtype,
            convbn2d=(self.convbn2d
                      if self.convbn2d in (True, "interpret") else False))
        self.conv0 = Conv(self.d, 3, 1, 1, dtype=self.dtype)
        self.conv0_1 = Conv(self.d, 3, 1, 1, dtype=self.dtype)
        self.conv0_2 = Conv(self.d, 3, 1, 1, dtype=self.dtype)
        if self.nmode in ("exp3", "exp4", "exp6", "exp7", "exp7_lc", "lc"):
            cp = self._resolved_combine_pallas()
            cc = self._resolved_convcomb_pallas()
            self.based_3d = b3d_cls(feature_dim=32, dres_count=2,
                                    bn_avg=self.bn_avg, dtype=self.dtype,
                                    flat=self.conv3d_flat,
                                    combine_pallas=cp,
                                    combine_mesh=(self._sweep_mesh()
                                                  if cp else None),
                                    combine_axis=self.mesh_axis,
                                    convcomb_pallas=cc,
                                    convcomb_mesh=(self._sweep_mesh()
                                                   if cc else None),
                                    convcomb_axis=self.mesh_axis)
        if self.nmode == "exp8":
            # Structural parity with the reference's exp8 (models.py:477-478):
            # it allocates a second decoder but has NO forward branch —
            # forward raises "Nmode wrong" (models.py:835); __call__ below
            # reproduces that contract with a clearer message.
            self.base_decoder2 = dec_cls(self.d, dtype=self.dtype)

    def _sweep_dtype(self):
        if self.sweep_dtype == "auto":
            return self.dtype or jnp.float32
        return self.sweep_dtype or jnp.float32

    # -- shared encoder path --------------------------------------------

    def _encode(self, model_input, train: bool):
        rgb = model_input["rgb"]                      # [B, T, 3, H, W]
        b, t = rgb.shape[0], rgb.shape[1]
        x = _nhwc(rgb.reshape((b * t,) + rgb.shape[2:]))   # [BT, H, W, 3]
        feat1, feat_raw, feat = self.base_encoder(x, train)

        dw = x.shape[1] // feat.shape[1]
        img_feat = avg_pool(x, dw)                    # [BT, H/4, W/4, 3]
        feat_all = jnp.concatenate([feat, img_feat], axis=-1)   # [., C+3]

        def split(y):
            return y.reshape((b, t) + y.shape[1:])

        return split(feat1), split(feat_raw), split(feat_all)

    def _cost_volume(self, feat_all, model_input):
        """vmapped plane-sweep cost volume. feat_all: [B, T, h, w, C+3]."""
        d_candi = model_input["d_candi"]
        feats = _nchw(feat_all)                       # [B, T, C+3, h, w]

        if self.sweep_impl == "decomposed":
            sdt = self._sweep_dtype()

            def sweep(*a, **k):
                return plane_sweep_volume_decomposed(*a, dtype=sdt, **k)
        else:
            sweep = plane_sweep_volume

        def per_item(feats_i, poses_i, intr_i, rays_i):
            return sweep(
                feats_i[-1], feats_i[:-1], d_candi,
                poses_i[:-1, :3, :3], poses_i[:-1, :3, 3],
                intr_i, rays_i, self.sigma_soft_max)

        return jax.vmap(per_item)(feats, model_input["src_cam_poses"],
                                  model_input["intrinsics"],
                                  model_input["unit_ray"])   # [B, D, h, w]

    def _warped_features(self, feat_raw, model_input):
        """vmapped diagonal feature warp. feat_raw: [B, T, h, w, C=D]."""
        d_candi = model_input["d_candi"]
        feats = _nchw(feat_raw)

        def per_item(feats_i, poses_i, intr_i, rays_i):
            return warp_feature_volume(feats_i, d_candi, poses_i[:, :3, :3],
                                       poses_i[:, :3, 3], intr_i, rays_i)

        return jax.vmap(per_item)(feats, model_input["src_cam_poses"],
                                  model_input["intrinsics"],
                                  model_input["unit_ray"])   # [B, T, D, h, w]

    def _fused_sweep(self, feat_all, feat_raw, model_input):
        """Fused cost volume + diagonal warp (shared gathers; see
        ops.plane_sweep.plane_sweep_and_warp). Returns
        (cost [B, D, h, w], warped [B, T, D, h, w])."""
        d_candi = model_input["d_candi"]
        fa = _nchw(feat_all)
        fr = _nchw(feat_raw)

        path = self.sweep_path(fa.shape[0])
        if path.startswith("pallas"):
            sweep_mesh = (self._sweep_mesh() if path == "pallas+shard_map"
                          else None)

            def batched(fa_b, fr_b, poses, intr_b):
                return plane_sweep_and_warp_decomposed_batched(
                    fa_b, fr_b, d_candi, poses, intr_b, self.sigma_soft_max,
                    dtype=self._sweep_dtype(),
                    interpret=(self.sweep_pallas == "interpret"),
                    mesh=sweep_mesh, axis=self.mesh_axis)

            if self._remat_mode() != "none":
                batched = jax.checkpoint(batched)
            return batched(fa, fr, model_input["src_cam_poses"],
                           model_input["intrinsics"])

        if self.sweep_impl == "decomposed":
            sdt = self._sweep_dtype()

            def sweep(*a, **k):
                return plane_sweep_and_warp_decomposed(*a, dtype=sdt, **k)
        else:
            sweep = plane_sweep_and_warp

        def per_item(fa_i, fr_i, poses_i, intr_i, rays_i):
            return sweep(
                fa_i, fr_i, d_candi, poses_i[:, :3, :3], poses_i[:, :3, 3],
                intr_i, rays_i, self.sigma_soft_max)

        if self._remat_mode() != "none":
            # the [C1, D, H, W] warped volume is the single biggest
            # activation; recompute it in the backward instead of storing
            per_item = jax.checkpoint(per_item)

        return jax.vmap(per_item)(fa, fr, model_input["src_cam_poses"],
                                  model_input["intrinsics"],
                                  model_input["unit_ray"])

    def _constrain_dpv(self, cost, warped):
        """On a 2-D data x model mesh, pin the depth-plane axis of the cost
        volume / warped features onto the model axis (SURVEY §2.10: D is the
        natural TP axis — the per-depth banded matmuls and the depth-wise
        Base3D convs are parallel along D). GSPMD propagates the layout
        through the rest of the volume pipeline. No-op on 1-D meshes."""
        m = self.mesh
        if m is None or "model" not in m.axis_names:
            return cost, warped
        if dict(zip(m.axis_names, m.devices.shape)).get("model", 1) <= 1:
            return cost, warped
        from jax.sharding import NamedSharding, PartitionSpec as P
        cost = jax.lax.with_sharding_constraint(
            cost, NamedSharding(m, P("data", "model")))
        if warped is not None:
            warped = jax.lax.with_sharding_constraint(
                warped, NamedSharding(m, P("data", None, "model")))
        return cost, warped

    def _bv_head(self, cost):
        """conv0 stack + log_softmax -> low-res log DPV [B, h, w, D]."""
        x = _nhwc(cost)
        x = leaky_relu(self.conv0(x))
        x = leaky_relu(self.conv0_1(x))
        x = self.conv0_2(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)

    def _prev_or_uniform(self, prev, shape, log: bool = True):
        """prev (log DPV [B, D, h, w]) or a uniform default. The reference's
        t=0 default is PROBABILITY-uniform for exp7 (models.py:736) but
        LOG-uniform for exp7_lc/lc (models.py:757,796) — preserved here via
        ``log``."""
        if prev is None:
            fill = jnp.log(1.0 / self.d) if log else 1.0 / self.d
            return jnp.full(shape, fill, jnp.float32)
        return prev

    # -- forward ----------------------------------------------------------

    @nn.compact
    def __call__(self, model_input: dict, train: bool = True) -> dict:
        nmode = self.nmode
        feat1, feat_raw, feat_all = self._encode(model_input, train)
        rgb_last = _nhwc(model_input["rgb"][:, -1])          # [B, H, W, 3]

        warped = None
        if self.diffhomo:
            if nmode in ("exp3", "exp7", "exp7_lc"):
                # fused path: cost volume + diagonal warp share gathers
                cost, warped = self._fused_sweep(feat_all, feat_raw,
                                                 model_input)
            else:
                cost = self._cost_volume(feat_all, model_input)
            cost, warped = self._constrain_dpv(cost, warped)
        else:
            cost = _nchw(feat_all[:, -1, :, :, :-3])

        bv = self._bv_head(cost)                             # [B, h, w, D] log

        feats_dec = [feat_all[:, -1, :, :, :-3], feat1[:, -1], rgb_last]

        if nmode == "default":
            refined = self.base_decoder(jnp.exp(bv), feats_dec)
            return {"output": [_nchw(bv)], "output_refined": [_nchw(refined)],
                    "flow": None, "flow_refined": None}

        if nmode == "exp2":
            # Fuse an externally supplied GT/LIDAR DPV by log-addition
            tofuse = model_input["tofuse_dpv"]               # [B, D, h, w] prob
            fused = jnp.exp(_nchw(bv) + jnp.log(tofuse))
            fused = fused / jnp.sum(fused, axis=1, keepdims=True)
            fused = jnp.clip(fused, 1e-16, 1.0)
            bv_fused = jnp.log(fused)
            refined = self.base_decoder(_nhwc(fused), feats_dec)
            return {"output": [bv_fused, _nchw(bv)],
                    "output_refined": [_nchw(refined)],
                    "flow": None, "flow_refined": None}

        if nmode == "exp3":
            if warped is None:
                warped = self._warped_features(feat_raw, model_input)
            vol = jnp.concatenate([_nchw(bv)[:, None], warped], axis=1)
            bv_upd = self.based_3d(jnp.moveaxis(vol, 1, -1), train, True)
            refined = self.base_decoder(jnp.exp(_nhwc(bv_upd)), feats_dec)
            return {"output": [_nchw(bv), bv_upd],
                    "output_refined": [_nchw(refined)],
                    "flow": None, "flow_refined": None}

        if nmode in ("exp7", "exp7_lc"):
            if warped is None:
                warped = self._warped_features(feat_raw, model_input)
            bv_nchw = _nchw(bv)
            prev_output = self._prev_or_uniform(
                model_input.get("prev_output"), bv_nchw.shape,
                log=(nmode == "exp7_lc"))
            planes = [bv_nchw[:, None], prev_output[:, None]]
            if nmode == "exp7_lc":
                prev_lc = self._drop_prev_lc(
                    model_input.get("prev_lc"), bv_nchw.shape, train)
                planes.append(prev_lc[:, None])
            planes.append(warped)
            vol = jnp.concatenate(planes, axis=1)            # [B, C, D, h, w]
            resi = self.based_3d(jnp.moveaxis(vol, 1, -1), train, False)
            bv_upd = nn.log_softmax(bv_nchw + resi, axis=1)
            refined = self.base_decoder(jnp.exp(_nhwc(bv_upd)), feats_dec)
            return {"output": [bv_nchw, bv_upd],
                    "output_refined": [_nchw(refined)],
                    "flow": None, "flow_refined": None}

        if nmode == "lc":
            bv_nchw = _nchw(bv)
            prev_output = self._prev_or_uniform(
                model_input.get("prev_output"), bv_nchw.shape)
            prev_lc = self._drop_prev_lc(
                model_input.get("prev_lc"), bv_nchw.shape, train)
            feat_plane = _nchw(feat_all[:, -1, :, :, :-3])   # [B, C=D, h, w]
            vol = jnp.stack([bv_nchw, prev_output, prev_lc, feat_plane], axis=1)
            resi = self.based_3d(jnp.moveaxis(vol, 1, -1), train, False)
            bv_upd = nn.log_softmax(bv_nchw + resi, axis=1)
            refined = self.base_decoder(jnp.exp(_nhwc(bv_upd)), feats_dec)
            return {"output": [bv_nchw, bv_upd],
                    "output_refined": [_nchw(refined)],
                    "flow": None, "flow_refined": None}

        if nmode == "exp8":
            # the reference allocates exp8's extra decoder but provides no
            # forward branch: forward raises "Nmode wrong" (models.py:835)
            raise ValueError(
                "nmode 'exp8' has no forward pass (parity with the "
                "reference, models.py:477-478 + :835)")
        raise ValueError(f"unknown nmode {nmode!r}")

    def _drop_prev_lc(self, prev_lc: Optional[Any], shape, train: bool):
        """Randomly replace prev_lc with log-uniform during training with
        prob 1 - use_lc_prob (models.py:762-772)."""
        uniform = jnp.full(shape, jnp.log(1.0 / self.d), jnp.float32)
        if prev_lc is None:
            return uniform
        if not train:
            return prev_lc
        keep = jax.random.bernoulli(self.make_rng("lc_drop"),
                                    self.use_lc_prob)
        return jnp.where(keep, prev_lc, uniform)


class DefaultModel(nn.Module):
    """Tiny debug CNN (models.py:1158-1201)."""
    d: int = 64

    @nn.compact
    def __call__(self, model_input: dict, train: bool = True) -> dict:
        x = _nhwc(model_input["rgb"][:, -1])
        x = leaky_relu(Conv(32, 3, 1, 1)(x), 0.1)
        x = max_pool(x, 2)
        x = leaky_relu(Conv(self.d, 3, 1, 1)(x), 0.1)
        x = max_pool(x, 2)
        out = nn.log_softmax(x, axis=-1)
        up = jnp.repeat(jnp.repeat(x, 4, axis=1), 4, axis=2)  # nearest x4
        up = nn.log_softmax(up, axis=-1)
        return {"output": [_nchw(out)], "output_refined": [_nchw(up)],
                "flow": None, "flow_refined": None}
