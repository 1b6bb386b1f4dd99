#!/usr/bin/env python3
"""Training-step benchmark: full jitted step (forward both camsides + loss +
backward + Adam) on the flagship BaseModel (exp7, KITTI 384x256, D=64) at
several batch sizes — the number that matters for the reference's
"batch 8 over 4 GPUs" training workload (BASELINE.md).

Prints one JSON line per batch size plus a summary line; also writes
benchmarks/bench_train.json.

Run:  python bench_train.py [--batches 1 2 4 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _tpu_peak_flops(device) -> float | None:
    """Peak dense-matmul FLOPs/s for the MFU denominator (bf16 MXU peak —
    the standard convention even for f32 runs, which decompose onto the
    same MXU passes)."""
    kind = getattr(device, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12
    if "v5p" in kind:
        return 459e12
    if "v4" in kind:
        return 275e12
    if "v6" in kind or "trillium" in kind:
        return 918e12
    return None


def _make_lc_fn(cfg, mi):
    """The trainer's fused in-step LC closure (trainer/default.py
    _fused_lc_fn) rebuilt from a sample input: one stacked 2B-batch
    plan->sense->Bayes loop on the stop-gradient refined DPVs, at the
    production setting (iterations=5, default planner)."""
    import jax.numpy as jnp

    from depthestimation_tpu.lc.curtain import LightCurtain
    from depthestimation_tpu.lc.process import lc_process
    from depthestimation_tpu.ops import ufield as ufield_ops

    lc = LightCurtain()
    params = lc.gen_params_from_model_input(mi)
    params = lc.expand_params(params, cfg, cfg.var.ndepth,
                              cfg.var.ndepth * 2)
    lc.init(params)
    ufp = ufield_ops.UFieldParams.for_dataset("kitti")
    iters, planner = 5, "default"
    lc_params = {"step": [0.5], "spread_iter": 2, "spread_n": 5}

    def lc_fn(refined_l, refined_r, mi_l, mi_r, key):
        refined = jnp.concatenate([refined_l, refined_r], axis=0)
        dmaps = jnp.concatenate([mi_l["dmaps"], mi_r["dmaps"]], axis=0)
        dmaps_up = jnp.repeat(jnp.repeat(dmaps, 4, axis=-2), 4, axis=-1)
        intr = jnp.concatenate([mi_l["intrinsics_up"],
                                mi_r["intrinsics_up"]], axis=0)
        out = lc_process(refined, dmaps_up, intr, lc, ufp,
                         iterations=iters, planner=planner,
                         params=lc_params, key=key)[:, :, ::4, ::4]
        b = refined_l.shape[0]
        return out[:b], out[b:]

    return lc_fn


def bench_train_step(batch: int, iters: int, warmup: int = 2,
                     dtype: str | None = None, remat: str | None = None,
                     conv3d_flat: bool | None = None,
                     with_cost: bool = False, repeats: int = 3,
                     with_lc: bool = False, scan: int = 0) -> dict:
    from depthestimation_tpu.utils.compile_cache import enable as _cc
    _cc()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cfg, _sample_input
    from depthestimation_tpu.losses import get_loss
    from depthestimation_tpu.models import get_model
    from depthestimation_tpu.parallel.train_step import (
        init_state, make_train_step)
    from depthestimation_tpu.trainer.default import _soft_labels

    cfg = _cfg(batch=batch, nmode="exp7_lc" if with_lc else "exp7")
    # production TPU training config: bf16 conv compute (params/optimizer
    # f32; convergence + parity pinned in tests), remat auto -> save3d at
    # batch >= 4. Override with --dtype float32 / --remat for ablations.
    cfg["tpu"]["dtype"] = dtype or "bfloat16"
    if os.environ.get("BENCH_COMBINE_PALLAS"):          # A/B ablation hook
        cfg["tpu"]["combine_pallas"] = (
            os.environ["BENCH_COMBINE_PALLAS"] == "on")
    if remat:
        cfg["tpu"]["remat"] = remat
    if conv3d_flat is not None:
        cfg["tpu"]["conv3d_flat"] = conv3d_flat
    model = get_model(cfg)
    loss = get_loss(cfg)
    mi, gt = _sample_input(cfg, batch=batch)

    state, tx = init_state(model, cfg, mi, jax.random.PRNGKey(0))
    step = make_train_step(model, loss, tx, donate=True,
                           lc_fn=_make_lc_fn(cfg, mi) if with_lc else None)

    mi = {k: v for k, v in mi.items() if k not in ("prev_output", "prev_lc")}
    mi["prev_output"] = None
    mi["prev_lc"] = None
    gt = dict(gt)
    d_candi = jnp.asarray(np.asarray(
        __import__("depthestimation_tpu.ops.dpv", fromlist=["powerf"]).powerf(
            cfg.var.d_min, cfg.var.d_max, cfg.var.ndepth, cfg.var.qpower)),
        jnp.float32)
    gt["soft_labels"] = _soft_labels(gt["dmaps"], gt["masks"], d_candi,
                                     jnp.float32(0.3), cfg.var.ndepth)
    gt["soft_labels_imgsize"] = _soft_labels(
        gt["dmap_imgsizes"], gt["masks_imgsizes"], d_candi, jnp.float32(0.3),
        cfg.var.ndepth)

    from depthestimation_tpu.utils.timing import readback, roundtrip_s

    key = jax.random.PRNGKey(1)

    if scan:
        return _bench_rollout(cfg, model, loss, tx, state, mi, gt, d_candi,
                              scan, iters, warmup, repeats,
                              with_lc=with_lc, key=key)

    # Kernel-FLOP log: XLA cost_analysis CANNOT count work inside opaque
    # pallas_calls (r4 reported a fake 40% MFU drop when convcomb went
    # live) — the kernel wrappers log their analytic MXU FLOPs at trace
    # time (ops/flop_log.py), so bracket the FIRST (compiling) call,
    # which is the only one that traces.
    from depthestimation_tpu.ops import flop_log
    flop_log.start()
    t_compile = time.perf_counter()
    state, l, _ = step(state, mi, mi, gt, gt, key)
    readback(l)
    compile_s = time.perf_counter() - t_compile
    kernel_flops = flop_log.drain()

    flops = None
    if with_cost:
        try:
            # XLA cost analysis of the whole compiled step (fwd+bwd+Adam),
            # plus the logged kernel FLOPs.  Convention (README):
            #   flops     = cost_analysis + convcomb kernel FLOPs
            #               (comparable with the r3 series, where the
            #               sweep kernel was active-and-uncounted too)
            #   flops_all = cost_analysis + ALL kernel FLOPs
            ca = step.lower(state, mi, mi, gt, gt, key).compile()\
                .cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca["flops"])
        except Exception as e:
            print(f"cost_analysis unavailable: {e}", file=sys.stderr)

    for i in range(warmup):
        state, l, _ = step(state, mi, mi, gt, gt,
                           jax.random.fold_in(key, i))
    readback(l)
    rtt = roundtrip_s(l)

    # the state chains through every step, so reading the final loss back
    # to the host forces the whole sequence (block_until_ready is not a
    # reliable completion barrier on the tunneled runtime — utils/timing.py).
    # min-of-`repeats` windows: the tunnel adds occasional multi-ms host
    # hiccups that moved the r3 headline 348->356 ms between identical runs;
    # the fastest window is the stable estimator of device time.
    dts = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            state, l, _ = step(state, mi, mi, gt, gt,
                               jax.random.fold_in(key,
                                                  100 + rep * iters + i))
        readback(l)
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9) / iters)
    dt = min(dts)
    out = {"batch": batch, "step_ms": round(dt * 1e3, 2),
           "step_ms_worst": round(max(dts) * 1e3, 2),
           "frames_per_sec": round(batch / dt, 3),
           "compile_s": round(compile_s, 1),
           "loss": round(float(l), 4)}
    if flops:
        # r3-comparable convention: count every kernel whose work was
        # XLA-visible in the r3 series (convcomb took over Base3D's
        # convs, convbn2d the encoder's) — exclude only the sweep
        # kernel, which was active-and-uncounted in r3 as well
        conv_fl = sum(v for k, v in kernel_flops.items()
                      if not k.startswith("sweep"))
        all_fl = sum(kernel_flops.values())
        fl_r3 = flops + conv_fl
        fl_all = flops + all_fl              # every MXU FLOP counted
        out["step_gflops"] = round(fl_r3 / 1e9, 1)
        out["step_gflops_xla_visible"] = round(flops / 1e9, 1)
        if kernel_flops:
            out["kernel_gflops"] = {k: round(v / 1e9, 1)
                                    for k, v in kernel_flops.items()}
        out["achieved_tflops"] = round(fl_r3 / dt / 1e12, 2)
        peak = _tpu_peak_flops(jax.devices()[0])
        if peak:
            out["mfu"] = round(fl_r3 / dt / peak, 4)
            out["mfu_all_kernels"] = round(fl_all / dt / peak, 4)
    return out


def _bench_rollout(cfg, model, loss, tx, state, mi, gt, d_candi, scan,
                   iters, warmup, repeats, with_lc, key):
    """Train-through-time throughput: chunks of ``scan`` frames as ONE
    lax.scan program (parallel.train_step.make_train_rollout) vs the
    per-frame jitted step. Reports per-FRAME time for comparability."""
    import jax
    import jax.numpy as jnp

    from depthestimation_tpu.parallel.train_step import (
        make_train_rollout, uniform_prev_seeds)
    from depthestimation_tpu.trainer.default import _soft_labels
    from depthestimation_tpu.utils.timing import readback, roundtrip_s

    raw_gt = {k: v for k, v in gt.items()
              if k not in ("soft_labels", "soft_labels_imgsize")}

    def gt_fn(g):
        g = dict(g)
        g["soft_labels"] = _soft_labels(g["dmaps"], g["masks"], d_candi,
                                        jnp.float32(0.3), cfg.var.ndepth)
        g["soft_labels_imgsize"] = _soft_labels(
            g["dmap_imgsizes"], g["masks_imgsizes"], d_candi,
            jnp.float32(0.3), cfg.var.ndepth)
        return g

    rollout = make_train_rollout(model, loss, tx, donate=True,
                                 lc_fn=(_make_lc_fn(cfg, mi) if with_lc
                                        else None), gt_fn=gt_fn)
    per_frame = ("rgb", "src_cam_poses", "dmaps", "masks", "dmaps_up",
                 "dmap_imgsizes", "masks_imgsizes")
    frames = {k: jnp.stack([jnp.asarray(mi[k])] * scan)
              for k in per_frame if mi.get(k) is not None}
    static = {k: v for k, v in mi.items()
              if k not in per_frame and k not in ("prev_output", "prev_lc")}
    gts = {k: jnp.stack([jnp.asarray(v)] * scan) for k, v in raw_gt.items()}
    carry = uniform_prev_seeds(model, mi)

    def run(state, carry, salt):
        rngs = jax.random.split(jax.random.fold_in(key, salt), scan)
        return rollout(state, carry, frames, frames, static, static,
                       gts, gts, rngs)

    t0 = time.perf_counter()
    state, losses, carry = run(state, carry, 0)
    readback(losses)
    compile_s = time.perf_counter() - t0
    for i in range(warmup):
        state, losses, carry = run(state, carry, 1 + i)
    readback(losses)
    rtt = roundtrip_s(losses)
    dts = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        for i in range(iters):
            state, losses, carry = run(state, carry, 100 + rep * iters + i)
        readback(losses)
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9)
                   / (iters * scan))
    dt = min(dts)
    batch = int(cfg.train.batch_size)
    return {"batch": batch, "scan": scan,
            "step_ms": round(dt * 1e3, 2),
            "step_ms_worst": round(max(dts) * 1e3, 2),
            "frames_per_sec": round(batch / dt, 3),
            "compile_s": round(compile_s, 1),
            "loss": round(float(np.asarray(losses)[-1]), 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default=None,
                    help="tpu.dtype override (float32/bfloat16)")
    ap.add_argument("--remat", default=None,
                    help="tpu.remat override (auto/none/hot/full/save3d)")
    ap.add_argument("--conv3d-flat", default=None, choices=["on", "off"],
                    help="Base3D layout ablation (default: config/on)")
    ap.add_argument("--cost", action="store_true",
                    help="report XLA-cost-analysis FLOPs + MFU")
    ap.add_argument("--lc", action="store_true",
                    help="exp7_lc with the fused in-step LC loop "
                         "(plan->sense->Bayes, iterations=5) — the "
                         "production LC-training step")
    ap.add_argument("--scan", type=int, default=0,
                    help="train-through-time: chunks of N frames as one "
                         "lax.scan rollout (0 = per-frame jitted step)")
    ap.add_argument("--no-save", action="store_true",
                    help="don't overwrite benchmarks/bench_train.json")
    args = ap.parse_args()

    results = []
    for b in args.batches:
        r = bench_train_step(b, args.iters, dtype=args.dtype,
                             remat=args.remat,
                             conv3d_flat=(None if args.conv3d_flat is None
                                          else args.conv3d_flat == "on"),
                             with_cost=args.cost, with_lc=args.lc,
                             scan=args.scan)
        results.append(r)
        tag = ("_lc" if args.lc else "") + (f"_scan{args.scan}" if args.scan else "")
        print(json.dumps({"metric": f"train_step{tag}_b{b}_kitti_384x256_d64",
                          "value": r["frames_per_sec"],
                          "unit": "frames/sec", **{k: v for k, v in r.items()
                                                   if k not in ("batch",
                                                                "frames_per_sec")}}),
              flush=True)

    # only production-config runs update the committed json (ablation
    # overrides would silently replace the headline rows); --scan is NOT
    # an ablation — the rollout numbers get their own committed file
    # (VERDICT r4 Missing #3: the guard prevented any rollout measurement
    # from ever being recorded)
    ablation = (args.dtype or args.remat or args.conv3d_flat is not None
                or os.environ.get("BENCH_COMBINE_PALLAS"))
    if not args.no_save and not ablation:
        if args.scan:
            name = "bench_train_scan.json"
            for r in results:
                r["lc"] = bool(args.lc)
            key = lambda r: (r["batch"], r.get("scan", 0),
                             r.get("lc", False))  # noqa: E731
        else:
            name = "bench_train_lc.json" if args.lc else "bench_train.json"
            key = lambda r: r["batch"]  # noqa: E731
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", name)
        # merge by key so partial runs refresh rows instead of dropping
        # the rows not measured this invocation
        merged = {}
        if os.path.exists(out):
            try:
                merged = {key(r): r for r in json.load(open(out))}
            except Exception:
                merged = {}
        merged.update({key(r): r for r in results})
        json.dump([merged[k] for k in sorted(merged, key=str)],
                  open(out, "w"), indent=1)
    if len(results) >= 2:
        scaling = results[-1]["frames_per_sec"] / results[0]["frames_per_sec"]
        print(json.dumps({"metric": "train_batch_scaling"
                          f"_b{results[0]['batch']}_to_b{results[-1]['batch']}",
                          "value": round(scaling, 3), "unit": "x"}))


if __name__ == "__main__":
    main()
