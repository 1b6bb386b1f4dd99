#!/usr/bin/env python3
"""Per-stage forward timing of BaseModelNet (exp7) on the current backend.

Isolates encoder / fused plane-sweep / BV head / Base3D / decoder so batch
scaling problems can be attributed.  Run: python benchmarks/profile_stages.py
[--batches 1 2] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 2])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _cfg, _sample_input
    from depthestimation_tpu.models import get_model

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    for batch in args.batches:
        cfg = _cfg(batch=batch, nmode="exp7")
        model = get_model(cfg)
        mi, _ = _sample_input(cfg, batch=batch)
        mi = dict(mi)
        mi["prev_output"] = None
        mi["prev_lc"] = None
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "lc_drop": jax.random.PRNGKey(1)},
            mi, train=False)

        net = model.bind(variables)

        def stage_encode(m):
            return net._encode(m, False)

        def stage_sweep(m, feat_all, feat_raw):
            return net._fused_sweep(feat_all, feat_raw, m)

        def stage_bv(cost):
            return net._bv_head(cost)

        def stage_3d(bv, warped, m):
            import depthestimation_tpu.models.base_model as bm
            bv_nchw = bm._nchw(bv)
            prev = jnp.full(bv_nchw.shape, 1.0 / net.d, jnp.float32)
            vol = jnp.concatenate([bv_nchw[:, None], prev[:, None], warped],
                                  axis=1)
            return net.based_3d(jnp.moveaxis(vol, 1, -1), False, prob=False)

        def stage_decoder(bv, feat1, feat_all, m):
            import depthestimation_tpu.models.base_model as bm
            rgb_last = bm._nhwc(m["rgb"][:, -1])
            feats_dec = [feat_all[:, -1, :, :, :-3], feat1[:, -1], rgb_last]
            return net.base_decoder(jnp.exp(bv), feats_dec)

        def full(m):
            return model.apply(variables, m, train=False,
                               rngs={"lc_drop": jax.random.PRNGKey(2)})

        # build intermediates once
        feat1, feat_raw, feat_all = jax.jit(stage_encode)(mi)
        cost, warped = jax.jit(stage_sweep)(mi, feat_all, feat_raw)
        bv = jax.jit(stage_bv)(cost)

        def timeit(name, fn, *a):
            # chain through the first float leaf + readback barrier
            # (utils/timing.py: block_until_ready unreliable, runtime
            # dedupes repeated input contents)
            from depthestimation_tpu.utils.timing import time_chain
            jfn = jax.jit(fn)

            def step(x0):
                out = jfn(x0, *a[1:]) if a else jfn(x0)
                leaf = [t for t in jax.tree_util.tree_leaves(out)
                        if jnp.issubdtype(t.dtype, jnp.floating)][0]
                fb = (jnp.sum(leaf.astype(jnp.float32))
                      * 1e-12).astype(jnp.float32)
                first = jax.tree_util.tree_leaves(x0)[0]
                bumped = jax.tree_util.tree_map(
                    lambda v: (v + fb.astype(v.dtype)
                               if jnp.issubdtype(v.dtype, jnp.floating)
                               else v), x0)
                del first
                return bumped

            seed = a[0] if a else None
            dt, _ = time_chain(step, seed, args.iters)
            dt = dt * 1e3
            print(f"  B={batch} {name:12s}: {dt:8.2f} ms")
            return dt

        print(f"-- batch {batch} --")
        t_enc = timeit("encoder", stage_encode, mi)
        t_swp = timeit("fused_sweep", stage_sweep, mi, feat_all, feat_raw)
        t_bv = timeit("bv_head", stage_bv, cost)
        t_3d = timeit("base3d", stage_3d, bv, warped, mi)
        t_dec = timeit("decoder", stage_decoder, bv, feat1, feat_all, mi)
        t_full = timeit("FULL", full, mi)
        print(f"  B={batch} sum-of-stages {t_enc+t_swp+t_bv+t_3d+t_dec:8.2f} "
              f"ms vs full {t_full:8.2f} ms")


if __name__ == "__main__":
    main()
