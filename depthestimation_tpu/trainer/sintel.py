"""Optical-flow trainers (ARFlow lineage): the reference's
``trainer/sintel_trainer.py`` (plain photometric training) and
``trainer/sintel_trainer_ar.py`` (appearance/spatial-transform
self-supervision) rebuilt TPU-first.

Differences from the reference by design:
  * The whole optimization step — including the AR trainer's teacher pass,
    random spatial transform, student pass, and occlusion-hallucination
    pass — is ONE jitted function; the reference dispatches 3 separate
    forward graphs per iteration from Python (sintel_trainer_ar.py:45-96).
  * The reference's 1024x loss scaling + 1/1024 grad rescale
    (sintel_trainer.py:66-71) is a no-op in f32 and is omitted.
  * The occlusion-hallucination pass replaces SLIC superpixel masks
    (sintel_trainer_ar.py:86-92, run_slic_pt) with random rectangle noise
    patches — SLIC is a host-side, data-dependent segmentation that cannot
    live under jit; rectangles keep the "corrupt a region of img2, demand
    the teacher flow" objective with static shapes.
  * sintel_trainer_ar.py:70 computes l_atst but never adds it to the total
    (`l_atst += w_ar * l_atst` mutates only itself) — an apparent drift
    from upstream ARFlow, where the term IS applied. We follow upstream and
    add ``w_ar * l_atst``; set ``train.w_ar = 0`` to reproduce the
    reference's effective behavior.
"""

from __future__ import annotations

import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from depthestimation_tpu.ops.resample import grid_sample_pixel
from depthestimation_tpu.trainer.checkpoint import save_checkpoint


# -- flow metrics / geometry helpers ------------------------------------


def evaluate_flow_epe(gt_flow, pred_flow) -> float:
    """Mean end-point error between [B, 2, H, W] flows (reference
    utils/flow_utils.py evaluate_flow). Prediction is resized (and its
    vectors rescaled) to the ground-truth resolution first."""
    gt = jnp.asarray(gt_flow, jnp.float32)
    pr = jnp.asarray(pred_flow, jnp.float32)
    if pr.shape[-2:] != gt.shape[-2:]:
        sy = gt.shape[-2] / pr.shape[-2]
        sx = gt.shape[-1] / pr.shape[-1]
        pr = jax.image.resize(pr, pr.shape[:2] + gt.shape[-2:], "linear")
        pr = pr * jnp.asarray([sx, sy], pr.dtype)[None, :, None, None]
    return float(jnp.mean(jnp.linalg.norm(gt - pr, axis=1)))


def _affine_grid(theta, h: int, w: int):
    """theta [2, 3] (pixel coords, origin at image center) -> sample grid
    [H, W, 2] of (x, y) source pixels."""
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    px = theta[0, 0] * gx + theta[0, 1] * gy + theta[0, 2] + (w - 1) / 2.0
    py = theta[1, 0] * gx + theta[1, 1] * gy + theta[1, 2] + (h - 1) / 2.0
    return jnp.stack([px, py], axis=-1)


def random_affine(key, batch: int, rot: float = 0.2, trans: float = 0.04,
                  zoom: float = 0.1):
    """Per-sample random rotation/translation/zoom matrices [B, 2, 3]
    (the spatial part of ar_transforms.sp_transfroms.RandomAffineFlow)."""
    k1, k2, k3 = jax.random.split(key, 3)
    ang = jax.random.uniform(k1, (batch,), minval=-rot, maxval=rot)
    t = jax.random.uniform(k2, (batch, 2), minval=-trans, maxval=trans)
    z = 1.0 + jax.random.uniform(k3, (batch,), minval=-zoom, maxval=zoom)
    c, s = jnp.cos(ang) * z, jnp.sin(ang) * z
    row0 = jnp.stack([c, -s, t[:, 0]], axis=-1)
    row1 = jnp.stack([s, c, t[:, 1]], axis=-1)
    return jnp.stack([row0, row1], axis=1)          # [B, 2, 3]


def affine_resample(x, theta):
    """Resample [B, C, H, W] by per-sample affine theta [B, 2, 3]: output
    pixel p takes the value at A @ p + t (translation in pixel units is
    theta[:, :, 2] * image size)."""
    b, c, h, w = x.shape
    scale = jnp.asarray([w, h], jnp.float32)

    def one(img, th):
        th = th.at[:, 2].multiply(scale)
        return grid_sample_pixel(img, _affine_grid(th, h, w))

    return jax.vmap(one)(x, theta)


def transform_flow(flow, theta):
    """Spatially transform a flow field consistently with
    ``affine_resample`` of its images: resample, then rotate/scale the
    flow VECTORS by the linear part A (sp_transfroms.py flow handling)."""
    warped = affine_resample(flow, theta)           # [B, 2, H, W]
    a = theta[:, :, :2]                             # [B, 2, 2]
    inv = jnp.linalg.inv(a)
    return jnp.einsum("bij,bjhw->bihw", inv, warped)


# -- trainers ------------------------------------------------------------


class SintelTrainer:
    """Photometric flow training (reference trainer/sintel_trainer.py:8-151).

    Loaders yield dicts with ``img1``/``img2`` float arrays [B, 3, H, W]
    in [0, 1] — the reference's ToTensor contract; the smoothness edge
    weight exp(-|grad| * 10) and SSIM constants assume it — (and, for
    validation, ``target: {"flow": [B, 2, H, W]}``)."""

    def __init__(self, id, model, loss_func, logger, save_root, cfg,
                 train_loader=None, val_loader=None):
        self.id = id
        self.model = model
        self.loss_func = loss_func
        self._log = logger
        self.save_root = save_root
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader

        t = cfg.train
        self.n_epoch = int(t.get("n_epoch", 1))
        self.epoch_size = int(t.get("epoch_size", 10**9))
        self.valid_size = int(t.get("valid_size", 10**9))
        self.print_freq = int(t.get("print_freq", 10))
        self.halflr = set(t.get("halflr", []))
        self.lr = float(t.get("lr", 1e-4))
        betas = (float(t.get("momentum", 0.9)), float(t.get("beta", 0.999)))
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.lr, b1=betas[0], b2=betas[1])

        self.params = None
        self.opt_state = None
        self.i_epoch = 0
        self.i_iter = 0
        self.best_epe = np.inf
        self._step = None

    # -- jitted step ----------------------------------------------------

    def _loss_terms(self, params, img_pair, key):
        out = self.model.apply({"params": params}, img_pair, with_bk=True,
                               train=True)
        total, terms = self.loss_func(out, img_pair, return_terms=True)
        return total, (terms, out)

    def _build_step(self):
        def step(params, opt_state, img_pair, key):
            (loss, (terms, _)), grads = jax.value_and_grad(
                self._loss_terms, has_aux=True)(params, img_pair, key)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            terms = {k: v for k, v in terms.items() if k != "noc_mask"}
            return params, opt_state, loss, terms

        return jax.jit(step, donate_argnums=(0, 1))

    # -- epoch loops ----------------------------------------------------

    def _init_if_needed(self, img_pair):
        if self.params is None:
            variables = self.model.init(jax.random.PRNGKey(0), img_pair,
                                        with_bk=True, train=True)
            self.params = variables["params"]
            self.opt_state = self.tx.init(self.params)
        if self._step is None:
            self._step = self._build_step()

    def _set_lr(self, lr: float):
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32)

    def _run_one_epoch(self):
        # stage1 curriculum: swap loss weights at the configured epoch
        # (sintel_trainer.py:24-26)
        stage1 = self.cfg.get("stage1")
        if stage1 and self.i_epoch == int(stage1.get("epoch", -1)):
            self.loss_func.cfg.loss.update(stage1.get("loss", {}))
            type(self.loss_func).__init__(self.loss_func, self.loss_func.cfg)
            self._step = self._build_step()
        if self.i_epoch in self.halflr:
            self.lr /= 2.0
            self._log.info(self.id, f"[sintel] lr halved to {self.lr}")

        t0 = time.time()
        for i_step, data in enumerate(self.train_loader):
            if i_step >= self.epoch_size:
                break
            img_pair = jnp.concatenate(
                [jnp.asarray(data["img1"], jnp.float32),
                 jnp.asarray(data["img2"], jnp.float32)], axis=1)
            self._init_if_needed(img_pair)
            self._set_lr(self.lr)
            key = jax.random.fold_in(jax.random.PRNGKey(7), self.i_iter)
            self.params, self.opt_state, loss, terms = self._step(
                self.params, self.opt_state, img_pair, key)
            if self.i_iter % self.print_freq == 0:
                tstr = " ".join(f"{k}={float(v):.4f}"
                                for k, v in sorted(terms.items()))
                self._log.info(
                    self.id,
                    f"[sintel] ep {self.i_epoch} it {i_step} "
                    f"loss={float(loss):.4f} {tstr} "
                    f"({time.time() - t0:.1f}s)")
            self.i_iter += 1
        self.i_epoch += 1

    def _validate_with_gt(self):
        if self.val_loader is None:
            return np.nan
        epes, forward = [], jax.jit(
            lambda p, x: self.model.apply({"params": p}, x, with_bk=False,
                                          train=False)["flows_fw"][0])
        for i_step, data in enumerate(self.val_loader):
            if i_step >= self.valid_size:
                break
            img_pair = jnp.concatenate(
                [jnp.asarray(data["img1"], jnp.float32),
                 jnp.asarray(data["img2"], jnp.float32)], axis=1)
            self._init_if_needed(img_pair)
            pred = forward(self.params, img_pair)
            epes.append(evaluate_flow_epe(data["target"]["flow"], pred))
        epe = float(np.mean(epes)) if epes else np.nan
        self._log.info(self.id, f"[sintel] ep {self.i_epoch} val EPE={epe:.4f}")
        return epe

    def train(self):
        for _ in range(self.n_epoch):
            self._run_one_epoch()
            epe = self._validate_with_gt()
            if epe == epe and epe < self.best_epe:
                self.best_epe = epe
                save_checkpoint(self.save_root, self.cfg.data.exp_name,
                                {"params": self.params}, self.i_epoch,
                                is_best=True)
        return self.best_epe

    def eval(self):
        return self._validate_with_gt()


class SintelARTrainer(SintelTrainer):
    """ARFlow self-supervision (reference trainer/sintel_trainer_ar.py):
    on top of the photometric loss, a teacher->student consistency pass
    under a random spatial transform (l_atst) and under occlusion
    hallucination (l_ot), both inside the same jitted step."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        t = self.cfg.train
        self.run_atst = bool(t.get("run_atst", True))
        self.run_ot = bool(t.get("run_ot", True))
        self.mask_st = bool(t.get("mask_st", True))
        self.w_ar = float(t.get("w_ar", 0.1))
        self.ar_eps = float(t.get("ar_eps", 0.01))
        self.ar_q = float(t.get("ar_q", 0.38))
        self.ot_frac = float(t.get("ot_frac", 0.25))  # noise patch size

    def _loss_terms(self, params, img_pair, key):
        out = self.model.apply({"params": params}, img_pair, with_bk=True,
                               train=True)
        total, terms = self.loss_func(out, img_pair, return_terms=True)
        teacher = jax.lax.stop_gradient(out["flows_fw"][0])  # [B,2,h,w]
        noc = jax.lax.stop_gradient(terms.pop("noc_mask"))   # [B,1,h,w]
        b, _, h, w = img_pair.shape

        def robust(diff, mask):
            l = (jnp.abs(diff) + self.ar_eps) ** self.ar_q
            return jnp.mean(l * mask) / (jnp.mean(mask) + 1e-7)

        k_st, k_ot = jax.random.split(key)
        l_atst = jnp.float32(0.0)
        if self.run_atst:
            theta = random_affine(k_st, b)
            img_t = affine_resample(img_pair, theta)
            flow_t = transform_flow(teacher, theta)
            noc_t = (affine_resample(noc, theta)
                     if self.mask_st else jnp.ones_like(noc))
            student = self.model.apply({"params": params}, img_t,
                                       with_bk=False,
                                       train=True)["flows_fw"][0]
            l_atst = robust(student - flow_t, noc_t)
            total = total + self.w_ar * l_atst

        l_ot = jnp.float32(0.0)
        if self.run_ot:
            # corrupt a random rectangle of img2 with noise; the student
            # must still produce the teacher flow there (rectangle = jit-
            # compatible stand-in for the reference's SLIC masks)
            ph = max(int(h * self.ot_frac), 1)
            pw = max(int(w * self.ot_frac), 1)
            ky, kx, kn = jax.random.split(k_ot, 3)
            oy = jax.random.randint(ky, (b,), 0, h - ph + 1)
            ox = jax.random.randint(kx, (b,), 0, w - pw + 1)
            gy = jnp.arange(h)[None, :, None]
            gx = jnp.arange(w)[None, None, :]
            rect = ((gy >= oy[:, None, None]) & (gy < (oy + ph)[:, None, None])
                    & (gx >= ox[:, None, None])
                    & (gx < (ox + pw)[:, None, None]))
            rect = rect[:, None].astype(img_pair.dtype)      # [B,1,H,W]
            noise = jax.random.uniform(kn, (b, 3, h, w),
                                       dtype=img_pair.dtype)
            img2_oc = img_pair[:, 3:] * (1 - rect) + noise * rect
            img_oc = jnp.concatenate([img_pair[:, :3], img2_oc], axis=1)
            student = self.model.apply({"params": params}, img_oc,
                                       with_bk=False,
                                       train=True)["flows_fw"][0]
            l_ot = robust(student - teacher, noc)
            total = total + self.w_ar * l_ot

        terms = dict(terms, l_atst=l_atst, l_ot=l_ot)
        return total, (terms, out)


# -- synthetic data (tests / --synthetic runs) ---------------------------


def synthetic_flow_batches(n_batches: int, batch: int = 2, h: int = 64,
                           w: int = 96, max_shift: int = 4, seed: int = 0):
    """Random smooth images translated by integer per-sample shifts, with
    the exact ground-truth flow — stands in for Sintel frame pairs.
    Images are [0, 1] floats (the trainers' contract, matching the
    reference's ToTensor normalization — datasets/get_dataset.py)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        base = rng.uniform(0, 1, (batch, 3, h + 2 * max_shift,
                                  w + 2 * max_shift)).astype(np.float32)
        for axis in (2, 3):  # smooth so photometric loss has gradient
            k = np.ones(5) / 5
            base = np.apply_along_axis(
                lambda m: np.convolve(m, k, mode="same"), axis, base)
        sh = rng.integers(-max_shift, max_shift + 1, (batch, 2))
        img1 = base[..., max_shift:max_shift + h, max_shift:max_shift + w]
        img2 = np.stack([
            base[i, :, max_shift + sy:max_shift + sy + h,
                 max_shift + sx:max_shift + sx + w]
            for i, (sy, sx) in enumerate(sh)])
        flow = np.zeros((batch, 2, h, w), np.float32)
        flow[:, 0] = sh[:, 1, None, None]   # x-shift
        flow[:, 1] = sh[:, 0, None, None]   # y-shift
        out.append({"img1": img1, "img2": img2,
                    "target": {"flow": flow}})
    return out
