#!/usr/bin/env python3
"""AOT memory probe: compile the full-size train step (no execution) and
print XLA's HBM memory analysis. Used to attribute batch-8 HBM pressure to
specific configs (dtype / remat / rgb entry layout) without burning OOM
crashes.

Run (TPU):  python benchmarks/mem_probe.py --batch 8 --dtype bfloat16 \
               --remat none [--rgb-layout default]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--remat", default=None)
    args = ap.parse_args()
    args.rgb_layout = None

    from depthestimation_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cfg, _sample_input
    from depthestimation_tpu.losses import get_loss
    from depthestimation_tpu.models import get_model
    from depthestimation_tpu.parallel.train_step import (init_state,
                                                         make_train_step)
    from depthestimation_tpu.trainer.default import _soft_labels

    cfg = _cfg(batch=args.batch, nmode="exp7")
    if args.dtype:
        cfg["tpu"]["dtype"] = args.dtype
    if args.remat:
        cfg["tpu"]["remat"] = args.remat
    model = get_model(cfg)
    loss = get_loss(cfg)
    mi, gt = _sample_input(cfg, batch=args.batch)

    state, tx = init_state(model, cfg, mi, jax.random.PRNGKey(0))
    step = make_train_step(model, loss, tx, donate=True)

    mi = {k: v for k, v in mi.items() if k not in ("prev_output", "prev_lc")}
    mi["prev_output"] = None
    mi["prev_lc"] = None
    gt = dict(gt)
    from depthestimation_tpu.ops.dpv import powerf
    d_candi = jnp.asarray(np.asarray(powerf(
        cfg.var.d_min, cfg.var.d_max, cfg.var.ndepth, cfg.var.qpower)),
        jnp.float32)
    gt["soft_labels"] = _soft_labels(gt["dmaps"], gt["masks"], d_candi,
                                     jnp.float32(0.3), cfg.var.ndepth)
    gt["soft_labels_imgsize"] = _soft_labels(
        gt["dmap_imgsizes"], gt["masks_imgsizes"], d_candi, jnp.float32(0.3),
        cfg.var.ndepth)

    t0 = time.perf_counter()
    try:
        compiled = step.lower(state, mi, mi, gt, gt,
                              jax.random.PRNGKey(1)).compile()
    except Exception as e:
        msg = str(e)
        print(f"COMPILE FAILED after {time.perf_counter() - t0:.0f}s")
        emit = False
        n_alloc = 0
        for line in msg.splitlines():
            if ("Ran out of memory" in line or "Exceeded" in line
                    or "utilization" in line):
                print(" ", line.strip())
            if "Largest program allocations" in line:
                emit = True
            if emit and ("Size:" in line or "Shape:" in line
                         or "op_name=" in line or "expansion" in line):
                print(" ", line.strip()[:180])
                n_alloc += 1
                if n_alloc > 40:
                    break
        sys.exit(1)
    dt = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    print(f"compiled in {dt:.0f}s  batch={args.batch} dtype={args.dtype} "
          f"remat={args.remat} rgb_layout={args.rgb_layout}")
    for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes"):
        v = getattr(ma, attr, None)
        if v is not None:
            print(f"  {attr}: {v / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
