"""Measure how much of the B=8 step is input layout conversion.

The round-5 profile shows ~10-20 ms/step of `copy` ops converting the
step's fresh inputs (rgb stacks, image-size f32 ground truth) from the
default host-transfer layout to the executable's preferred one. The
production loader overlaps host->device transfer with compute, so
pre-formatting inputs to ``compiled.input_formats`` moves that
conversion off the critical path legitimately. This diag quantifies the
win before wiring it into the trainer/bench.

Run on TPU:  python -m benchmarks.diag_input_layouts

MEASURED (r5, v5e): baseline 290.3 ms vs pre-formatted 292.3 ms — NO
win. jax already transfers these inputs in (or XLA accepts) the
executable's preferred layouts; the `copy` ops in the profile are
internal (remat copies, transposes between fusions), not input
conversions. Idea rejected — kept as the negative result so the next
round doesn't re-run the experiment.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from depthestimation_tpu.utils.compile_cache import enable as _cc
_cc()

import jax
import numpy as np


def main():
    from bench_train import bench_train_step  # noqa: F401  (reuse helpers)
    import jax.numpy as jnp

    from __graft_entry__ import _cfg, _sample_input
    from depthestimation_tpu.losses import get_loss
    from depthestimation_tpu.models import get_model
    from depthestimation_tpu.ops.dpv import powerf
    from depthestimation_tpu.parallel.train_step import (
        init_state, make_train_step)
    from depthestimation_tpu.trainer.default import _soft_labels
    from depthestimation_tpu.utils.timing import readback, roundtrip_s

    batch = 8
    cfg = _cfg(batch=batch, nmode="exp7")
    cfg["tpu"]["dtype"] = "bfloat16"
    model = get_model(cfg)
    loss = get_loss(cfg)
    mi, gt = _sample_input(cfg, batch=batch)
    state, tx = init_state(model, cfg, mi, jax.random.PRNGKey(0))
    step = make_train_step(model, loss, tx, donate=True)

    mi = {k: v for k, v in mi.items() if k not in ("prev_output", "prev_lc")}
    mi["prev_output"] = None
    mi["prev_lc"] = None
    gt = dict(gt)
    d_candi = jnp.asarray(np.asarray(powerf(
        cfg.var.d_min, cfg.var.d_max, cfg.var.ndepth, cfg.var.qpower)),
        jnp.float32)
    gt["soft_labels"] = _soft_labels(gt["dmaps"], gt["masks"], d_candi,
                                     jnp.float32(0.3), cfg.var.ndepth)
    gt["soft_labels_imgsize"] = _soft_labels(
        gt["dmap_imgsizes"], gt["masks_imgsizes"], d_candi,
        jnp.float32(0.3), cfg.var.ndepth)

    key = jax.random.PRNGKey(1)
    state, l, _ = step(state, mi, mi, gt, gt, jax.random.fold_in(key, 9000))
    readback(l)

    salt = [0]

    def run(state, mi_, gt_, iters=10, reps=3):
        dts = []
        st = state
        for rep in range(reps):
            t0 = time.perf_counter()
            for i in range(iters):
                salt[0] += 1
                st, l, _ = step(st, mi_, mi_, gt_, gt_,
                                jax.random.fold_in(key, salt[0]))
            readback(l)
            dts.append((time.perf_counter() - t0 - rtt) / iters)
        return min(dts) * 1e3, st

    for i in range(2):
        state, l, _ = step(state, mi, mi, gt, gt,
                           jax.random.fold_in(key, 9001 + i))
    readback(l)
    rtt = roundtrip_s(l)

    base_ms, state = run(state, mi, gt)
    print(f"baseline step: {base_ms:.2f} ms")

    # pre-format inputs to the executable's preferred layouts
    lowered = step.lower(state, mi, mi, gt, gt, key)
    comp = lowered.compile()
    fmts = comp.input_formats[0]      # (state, mi, mi, gt, gt, key)
    mi_f = jax.device_put(mi, fmts[1])
    gt_f = jax.device_put(gt, fmts[3])
    jax.block_until_ready(jax.tree_util.tree_leaves(mi_f))
    pre_ms, state = run(state, mi_f, gt_f)
    print(f"pre-formatted inputs: {pre_ms:.2f} ms  "
          f"(saves {base_ms - pre_ms:.2f} ms)")


if __name__ == "__main__":
    main()
