#!/usr/bin/env python3
"""Op-level profile of the jitted train step via the JAX profiler.

Captures a device trace of a few train-step iterations, then parses the
xplane protobuf with tensorboard_plugin_profile into a per-HLO-op self-time
table, aggregated by source (framework op name), so step time can be
attributed to conv / BN / gather / copy instead of guessed at from
cost-analysis FLOPs.

Run:  python benchmarks/trace_profile.py [--batch 8] [--iters 3]
      [--dtype bfloat16] [--remat auto]
Writes the raw trace under /tmp/jax_trace_bN and prints the top-k table.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture_forward(batch: int, iters: int, dtype: str, logdir: str):
    """Trace the INFERENCE forward (bench.py's bench_jax program) — the
    deployment loop whose B=8 batch scaling lags training's
    (VERDICT r3 weak #2)."""
    from depthestimation_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cfg, _sample_input
    from depthestimation_tpu.models import get_model

    cfg = _cfg()
    cfg["tpu"] = {"dtype": dtype}
    model = get_model(cfg)
    mi, _ = _sample_input(cfg, batch=batch)
    mi = dict(mi)
    mi["prev_output"] = None
    mi["prev_lc"] = None
    rngs = {"params": jax.random.PRNGKey(0), "lc_drop": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(rngs, mi)

    @jax.jit
    def step(m):
        out = model.apply(variables, m, train=False,
                          rngs={"lc_drop": jax.random.PRNGKey(2)})
        feedback = jnp.sum(out["output_refined"][-1]) * 1e-12
        m = dict(m)
        m["rgb"] = m["rgb"] + feedback
        return m

    mi = step(step(mi))
    jax.tree_util.tree_leaves(mi)[0].block_until_ready()
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        mi = step(mi)
    jax.tree_util.tree_leaves(mi)[0].block_until_ready()
    jax.profiler.stop_trace()


def capture(batch: int, iters: int, dtype: str, remat: str, logdir: str,
            with_lc: bool = False):
    from depthestimation_tpu.utils.compile_cache import enable as _cc
    _cc()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _cfg, _sample_input
    from depthestimation_tpu.losses import get_loss
    from depthestimation_tpu.models import get_model
    from depthestimation_tpu.ops.dpv import powerf
    from depthestimation_tpu.parallel.train_step import (init_state,
                                                         make_train_step)
    from depthestimation_tpu.trainer.default import _soft_labels

    cfg = _cfg(batch=batch, nmode="exp7_lc" if with_lc else "exp7")
    cfg["tpu"]["dtype"] = dtype
    if remat and remat != "auto":
        cfg["tpu"]["remat"] = remat
    model = get_model(cfg)
    loss = get_loss(cfg)
    mi, gt = _sample_input(cfg, batch=batch)
    state, tx = init_state(model, cfg, mi, jax.random.PRNGKey(0))
    lc_fn = None
    if with_lc:
        from bench_train import _make_lc_fn
        lc_fn = _make_lc_fn(cfg, mi)
    step = make_train_step(model, loss, tx, donate=True, lc_fn=lc_fn)
    mi = {k: v for k, v in mi.items() if k not in ("prev_output", "prev_lc")}
    mi["prev_output"] = None
    mi["prev_lc"] = None
    gt = dict(gt)
    d_candi = jnp.asarray(np.asarray(
        powerf(cfg.var.d_min, cfg.var.d_max, cfg.var.ndepth,
               cfg.var.qpower)), jnp.float32)
    gt["soft_labels"] = _soft_labels(gt["dmaps"], gt["masks"], d_candi,
                                     jnp.float32(0.3), cfg.var.ndepth)
    gt["soft_labels_imgsize"] = _soft_labels(
        gt["dmap_imgsizes"], gt["masks_imgsizes"], d_candi,
        jnp.float32(0.3), cfg.var.ndepth)

    key = jax.random.PRNGKey(1)
    state, l, _ = step(state, mi, mi, gt, gt, key)   # compile
    l.block_until_ready()
    state, l, _ = step(state, mi, mi, gt, gt, jax.random.fold_in(key, 1))
    l.block_until_ready()

    jax.profiler.start_trace(logdir)
    for i in range(iters):
        state, l, _ = step(state, mi, mi, gt, gt,
                           jax.random.fold_in(key, 100 + i))
    l.block_until_ready()
    jax.profiler.stop_trace()


def op_table(logdir: str, top: int = 25):
    """Parse the captured xplane into (op name, self-time ms, count) rows.

    Uses the in-repo wire-format parser (tools/xplane.py) — the baked-in
    tensorboard_plugin_profile can't load under protobuf 5 here."""
    from tools.xplane import op_self_times

    total, agg, cnt = op_self_times(logdir)
    rows = [{"op": nm, "self_ms": round(ms, 3), "count": cnt[nm]}
            for nm, ms in agg.most_common(top)]
    return {"total_ms": round(total, 2), "ops": rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", default="auto")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; parse an existing --logdir")
    ap.add_argument("--lc", action="store_true",
                    help="profile the LC-on (exp7_lc + fused loop) step")
    ap.add_argument("--forward", action="store_true",
                    help="profile the inference forward instead of the "
                         "train step")
    args = ap.parse_args()

    kind = "fwd" if args.forward else ("train_lc" if args.lc else "train")
    logdir = args.logdir or f"/tmp/jax_trace_{kind}_b{args.batch}"
    if not args.parse_only:
        os.makedirs(logdir, exist_ok=True)
        if args.forward:
            capture_forward(args.batch, args.iters, args.dtype, logdir)
        else:
            capture(args.batch, args.iters, args.dtype, args.remat, logdir,
                    with_lc=args.lc)
        print(f"trace captured under {logdir}")

    data = op_table(logdir, top=args.top)
    out = os.path.join(logdir, "op_stats.json")
    with open(out, "w") as f:
        json.dump(data, f, indent=1)
    print(f"op stats written to {out}")
    print(f"device op self-time total: {data['total_ms']:.1f} ms "
          f"(over {args.iters} iters)")
    for r in data["ops"]:
        print(f"  {r['self_ms']:9.2f} ms  x{r['count']:4d}  {r['op'][:100]}")


if __name__ == "__main__":
    main()
