#!/usr/bin/env python3
"""Equal-weights TRAINING parity: N optimizer steps of the flax stack vs
the torch mirror of the reference formulation, from identical init on
identical synthetic batches.

Forward parity (parity_forward.py) pins the network; this pins the whole
optimization loop — gradients through encoder/plane-sweep/Base3D/decoder,
BN-in-train-mode semantics, Adam updates (reference
trainer/default_trainer.py:105-216 + losses/losses.py:8-210). Both stacks
use plain Adam (no decay) and the gather plane sweep (bit-parity path), and
train on the soft cross-entropy term at both scales — the depth-supervision
term that touches every parameter; the remaining loss terms are identical
formulas on both sides and are pinned separately by the loss unit tests.

Run:  python benchmarks/parity_train.py [--steps 60]
      python benchmarks/parity_train.py --full --steps 6   # production dims
Writes benchmarks/parity_train.json (or parity_train_full.json with --full);
exits non-zero above tolerance (final depth-RMSE-vs-GT within 1% between
stacks, matching loss curves).

``--full`` runs the comparison at the production regime's dimensions
(384x256, D=64, fd=64 — trainer/default_trainer.py:105-216) in f32 on the
gather sweep, pinning that the TRAINING dynamics (not just the forward)
match at the scale where the real workload runs; the bf16/Pallas production
path is separately pinned against this f32 math by tests/test_sweep_pallas
and tests/test_bf16_training.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.parity_forward import _torch_mirror  # noqa: E402

FD = 16
DB = 16
W, H = 48, 32
BATCH = 2
LR = 1e-4


def _ce_loss_torch(out, soft_small, soft_large, mask_small, mask_large):
    """Torch twin of the flax CE path (losses/base_loss.py:34-44): mean of
    the per-pyramid-entry masked soft cross-entropies. Both camera sides
    see the same input here, so single-side terms equal the two-side mean."""
    import torch

    def ce(soft, logp, mask):
        loss = -(soft * logp).sum(1)                       # [B, H, W]
        m = mask[:, 0]
        per = [(loss[b] * m[b]).sum() / m[b].sum().clamp(min=1)
               for b in range(loss.shape[0])]
        return torch.stack(per).mean()

    terms = [ce(soft_small, out["bv"], mask_small),
             ce(soft_small, out["bv_upd"], mask_small),
             ce(soft_large, out["refined"], mask_large)]
    return torch.stack(terms).mean()


def main():
    global FD, DB, W, H, BATCH
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--full", action="store_true",
                    help="production dims: 384x256, D=64, fd=64, batch 1")
    args = ap.parse_args()
    d_min, d_max = 3.0, 18.0
    out_name = "parity_train.json"
    if args.full:
        FD, DB, W, H, BATCH = 64, 64, 384, 256, 1
        d_min, d_max = 5.0, 40.0       # the k1 training range (BASELINE.md)
        out_name = "parity_train_full.json"

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    import torch

    from depthestimation_tpu.config import config_from_dict
    from depthestimation_tpu.data import synthetic
    from depthestimation_tpu.losses import get_loss
    from depthestimation_tpu.models.base_model import BaseModelNet
    from depthestimation_tpu.ops.dpv import dpv_to_depthmap, powerf
    from depthestimation_tpu.parallel.train_step import (TrainState,
                                                         make_train_step)
    from depthestimation_tpu.trainer.default import _soft_labels

    cfg = config_from_dict({
        "data": {"exp_name": "ptrain", "model_name": "base",
                 "loss_name": "base", "trainer_name": "default",
                 "dataset_path": "kitti", "dataset_split": "k1"},
        "var": {"sigma_soft_max": 10.0, "t_win": 1, "d_min": d_min,
                "d_max": d_max, "feature_dim": FD, "ndepth": DB,
                "softce": 0.3, "qpower": 1.0, "img_size": [W, H],
                "crop_w": W, "nmode": "exp7", "bn_avg": False},
        # CE-only: the one term whose gradient reaches every parameter
        "loss": {"ce_mul": 1.0, "dsc_mul": 0.0, "rsc_mul": 0.0,
                 "smooth_mul": 0.0, "dc_mul": 0.0, "rsc_low_mul": 0.0},
        "train": {"batch_size": BATCH, "lr": LR, "epoch_num": 1, "n_gpu": 1,
                  "optim": "adam", "beta": 0.999, "momentum": 0.9,
                  "weight_decay": 0.0, "bias_decay": 0.0},
    })

    # identical batches for both stacks (two alternating batches)
    batches = []
    for seed in (11, 12):
        mi, gt = synthetic.make_batch(batch=BATCH, t_win=1, h=H, w=W,
                                      d_min=d_min, d_max=d_max, ndepth=DB,
                                      qpower=1.0, seed=seed)
        batches.append((mi, gt))

    model = BaseModelNet(feature_dim=FD, d=DB, nmode="exp7", bn_avg=False,
                         sigma_soft_max=10.0, sweep_impl="gather")
    loss_mod = get_loss(cfg)

    mi0 = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
           for k, v in batches[0][0].items()}
    rngs = {"params": jax.random.PRNGKey(0), "lc_drop": jax.random.PRNGKey(1)}
    variables = model.init(rngs, mi0, train=False)
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])

    # ------------------------------------------------------------- flax side
    tx = optax.adam(LR, b1=0.9, b2=0.999)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    step_fn = make_train_step(model, loss_mod, tx, donate=False)

    d_candi = jnp.asarray(powerf(d_min, d_max, DB, 1.0), jnp.float32)

    def prep(mi, gt):
        mi = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in mi.items() if k not in ("prev_output", "prev_lc")}
        mi["prev_output"] = None
        mi["prev_lc"] = None
        gt = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
              for k, v in gt.items()}
        gt["soft_labels"] = _soft_labels(gt["dmaps"], gt["masks"], d_candi,
                                         jnp.float32(0.3), DB)
        gt["soft_labels_imgsize"] = _soft_labels(
            gt["dmap_imgsizes"], gt["masks_imgsizes"], d_candi,
            jnp.float32(0.3), DB)
        return mi, gt

    prepped = [prep(mi, gt) for mi, gt in batches]

    losses_j = []
    key = jax.random.PRNGKey(5)
    for i in range(args.steps):
        mi, gt = prepped[i % len(prepped)]
        state, l, _ = step_fn(state, mi, mi, gt, gt, jax.random.fold_in(key, i))
        losses_j.append(float(l))

    # ------------------------------------------------------------ torch side
    def to_torch(tree):
        if isinstance(tree, dict):
            return {k: to_torch(v) for k, v in tree.items()}
        return torch.nn.Parameter(torch.from_numpy(np.array(tree, np.float32)))

    tparams = to_torch(params0)

    leaves = []

    def collect(tree):
        if isinstance(tree, dict):
            for v in tree.values():
                collect(v)
        else:
            leaves.append(tree)

    collect(tparams)
    opt = torch.optim.Adam(leaves, lr=LR, betas=(0.9, 0.999), eps=1e-8)

    tbatches = []
    for (mi, gt), (_, gtp) in zip(batches, prepped):
        tt = lambda a: torch.from_numpy(np.asarray(a, np.float32))
        tbatches.append((mi,
                         tt(np.asarray(gtp["soft_labels"])),
                         tt(np.asarray(gtp["soft_labels_imgsize"])),
                         tt(np.asarray(gt["masks"])),
                         tt(np.asarray(gt["masks_imgsizes"]))))

    losses_t = []
    for i in range(args.steps):
        mi, ss, sl, ms, ml = tbatches[i % len(tbatches)]
        opt.zero_grad()
        out = _torch_mirror(tparams, mi, "exp7", 10.0, DB, as_numpy=False)
        loss = _ce_loss_torch(out, ss, sl, ms, ml)
        loss.backward()
        opt.step()
        losses_t.append(float(loss))

    # ------------------------------------------------------------- compare
    losses_j = np.asarray(losses_j)
    losses_t = np.asarray(losses_t)
    loss_rel = np.abs(losses_j - losses_t) / np.abs(losses_t)

    # final-model depth RMSE vs GT, both stacks, on batch 0
    mi, gt = prepped[0]
    final_vars = {"params": state.params, "batch_stats": state.batch_stats}
    out_j = model.apply(final_vars, mi, train=False)
    dj = np.asarray(dpv_to_depthmap(out_j["output_refined"][-1], d_candi,
                                    log=True))
    with torch.no_grad():
        out_t = _torch_mirror(tparams, batches[0][0], "exp7", 10.0, DB,
                              as_numpy=True)
    dt = np.asarray(dpv_to_depthmap(jnp.asarray(out_t["refined"]), d_candi,
                                    log=True))
    gt_depth = np.asarray(batches[0][0]["dmaps_up"], np.float32)

    def rmse(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    rj, rt = rmse(dj, gt_depth), rmse(dt, gt_depth)
    report = {
        "steps": args.steps,
        "loss_first_jax": float(losses_j[0]),
        "loss_first_torch": float(losses_t[0]),
        "loss_last_jax": float(losses_j[-1]),
        "loss_last_torch": float(losses_t[-1]),
        "loss_rel_diff_mean": float(loss_rel.mean()),
        "loss_rel_diff_max": float(loss_rel.max()),
        "loss_decreased_jax": bool(losses_j[-1] < losses_j[0]),
        "loss_decreased_torch": bool(losses_t[-1] < losses_t[0]),
        "final_depth_rmse_vs_gt_jax_m": rj,
        "final_depth_rmse_vs_gt_torch_m": rt,
        "final_depth_rmse_rel_diff_pct": 100.0 * abs(rj - rt) / max(rt, 1e-9),
        "loss_curve_jax": [round(x, 6) for x in losses_j.tolist()],
        "loss_curve_torch": [round(x, 6) for x in losses_t.tolist()],
    }

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            out_name)
    json.dump(report, open(out_path, "w"), indent=1)
    for k, v in report.items():
        if not k.startswith("loss_curve"):
            print(f"{k}: {v}")

    ok = (report["final_depth_rmse_rel_diff_pct"] < 1.0
          and report["loss_rel_diff_max"] < 0.02
          and report["loss_decreased_jax"] and report["loss_decreased_torch"])
    print("TRAIN PARITY " + ("OK" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
