#!/usr/bin/env python3
"""Training/eval entry point.

Same public surface as the reference (train.py:23-32):

    python3 train.py --config configs/default_exp7_lc.json [-b N] [--eval]
                     [--viz] [--lc] [--resume] [--init_model PATH]

TPU-native differences: no mp.spawn/NCCL process management — a single
process drives a jitted train step over a ``jax.sharding.Mesh`` spanning all
local devices (multi-host via ``jax.distributed.initialize`` when the env
provides a coordinator).
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("-b", "--batch_size", type=int, default=None)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--viz", action="store_true")
    p.add_argument("--lc", action="store_true")
    p.add_argument("--lc_debug", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--init_model", type=str, default=None)
    p.add_argument("--write_video", type=str, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (no KITTI on disk)")
    return p.parse_args(argv)


def build_loaders(cfg, use_synthetic: bool):
    from depthestimation_tpu.data.scheduler import BatchScheduler
    host_id, n_hosts = 0, 1
    try:
        import jax
        host_id, n_hosts = jax.process_index(), jax.process_count()
    except Exception:
        pass
    bs = int(cfg.train.batch_size)
    if use_synthetic or not os.path.isdir(cfg.data.dataset_path):
        from depthestimation_tpu.data.video_synthetic import (
            SyntheticStereoVideoDataset,
        )
        w, h = cfg.var.crop_w, cfg.var.img_size[1]
        common = dict(h=h, w=w, t_win=cfg.var.t_win, d_min=cfg.var.d_min,
                      d_max=cfg.var.d_max, ndepth=cfg.var.ndepth,
                      qpower=cfg.var.qpower)
        train_ds = SyntheticStereoVideoDataset(n_traj=max(bs * 2, 4),
                                               traj_len=4, seed=1, **common)
        val_ds = SyntheticStereoVideoDataset(n_traj=bs, traj_len=2, seed=2,
                                             **common)
    elif "ilim" in cfg.data.dataset_split or "sweep" in cfg.data.dataset_split:
        from depthestimation_tpu.data.ilim import IlimVideoDataset
        train_ds = IlimVideoDataset(cfg, split="train")
        val_ds = IlimVideoDataset(cfg, split="test")
    else:
        from depthestimation_tpu.data.kitti import KittiVideoDataset
        train_ds = KittiVideoDataset(cfg, split="train")
        val_ds = KittiVideoDataset(cfg, split="test")
    qmax = int(cfg.train.get("qmax", 4))
    # cfg.var.mload: decode in a spawned loader process (the reference's
    # BatchSchedulerMP); synthetic data is cheap enough to stay in-process
    mload = bool(cfg.var.get("mload", False)) and not use_synthetic
    return (BatchScheduler(train_ds, bs, shuffle=True, qmax=qmax,
                           host_id=host_id, n_hosts=n_hosts, mload=mload),
            BatchScheduler(val_ds, bs, shuffle=False, qmax=qmax,
                           host_id=host_id, n_hosts=n_hosts, mload=mload))


def init_distributed():
    """Multi-host initialization (replaces the reference's mp.spawn/NCCL
    env:// rendezvous, train.py:92-123): when a JAX coordinator is
    configured in the environment, join the cluster; single-process
    otherwise. After this, the mesh in parallel/ spans all hosts and GSPMD
    routes gradient reductions over ICI/DCN."""
    import os as _os
    if _os.environ.get("JAX_COORDINATOR_ADDRESS") or _os.environ.get(
            "COORDINATOR_ADDRESS"):
        import jax
        jax.distributed.initialize()


def main(argv=None):
    args = parse_args(argv)
    from depthestimation_tpu.utils.compile_cache import enable as _cc
    _cc()  # persistent XLA cache: full-size compiles drop from minutes to s
    init_distributed()

    from depthestimation_tpu.config import load_config
    cfg = load_config(args.config)

    # flag overrides (reference train.py:36-77)
    if args.batch_size:
        cfg.train.batch_size = args.batch_size
    cfg.lc.enabled = bool(args.lc)
    cfg["eval"] = bool(args.eval)
    cfg.var.viz = bool(args.viz)
    if args.eval:
        cfg.train.batch_size = 1

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    save_root = os.path.join("outputs", "checkpoints", cfg.data.exp_name)
    os.makedirs(save_root, exist_ok=True)

    from depthestimation_tpu.losses import get_loss
    from depthestimation_tpu.models import get_model
    from depthestimation_tpu.trainer import get_trainer
    from depthestimation_tpu.utils.logger import init_logger

    logger = init_logger(cfg.data.exp_name, save_root)
    model = get_model(cfg)
    loss = get_loss(cfg)
    train_loader, val_loader = build_loaders(cfg, args.synthetic)

    trainer = get_trainer(cfg)(0, model, loss, logger, save_root, cfg,
                               train_loader, val_loader)

    # state init needs one sample batch
    first = next(iter(val_loader.enumerate()))
    from depthestimation_tpu.data.video_synthetic import assemble_inputs
    mi, _ = assemble_inputs(first, "left", bool(cfg.var.get("stereo", False)))
    trainer.ensure_state({**mi, "prev_output": None, "prev_lc": None})

    from depthestimation_tpu.trainer import checkpoint as ckpt
    if args.resume and ckpt.checkpoint_exists(save_root, cfg.data.exp_name):
        trainer.resume()
    if args.eval and ckpt.checkpoint_exists(save_root, cfg.data.exp_name,
                                            best=True):
        trainer.resume(best=True)
    if args.init_model:
        trainer.load_init_model(args.init_model)

    if args.write_video:
        trainer.video_path = args.write_video

    if args.eval:
        trainer.eval()
    else:
        trainer.train()


if __name__ == "__main__":
    main()
