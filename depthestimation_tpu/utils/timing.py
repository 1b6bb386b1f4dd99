"""Trustworthy wall-clock timing over remote-tunneled accelerators.

``jax.block_until_ready()`` can return before device execution completes
on the tunneled axon TPU runtime: a chain of dependent 8192^3 bf16
matmuls "finished" at 180x the hardware's peak FLOPs when timed with
block_until_ready, and at a believable 120 TFLOP/s when timed with a
device->host readback of the result. The only reliable completion
barrier on this runtime is reading a value back to the host.

Timing recipe used by bench.py / bench_train.py / the micro benches:

    state = step(state); readback(state)      # compile + settle
    rtt = roundtrip_s(state)                   # measure barrier cost
    t0 = perf_counter()
    for _ in range(iters): state = step(state)
    readback(state)                            # barrier INSIDE the window
    dt = (perf_counter() - t0 - rtt) / iters

The chained state must also CHANGE content every iteration (the runtime
dedupes executions whose executable and input contents it has already
seen — a feedback term that rounds away in bf16 repeats the input and the
remaining iterations come back from cache at ~0 cost).
"""

from __future__ import annotations

import time


def readback(tree) -> float:
    """Force completion of ``tree``'s producing computation.

    Reads one element of the first leaf back to the host — unlike
    block_until_ready this cannot return before execution finishes.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(tree)[0]
    idx = tuple([0] * getattr(leaf, "ndim", 0))
    return float(jax.device_get(leaf[idx] if idx else leaf))


def roundtrip_s(tree, samples: int = 3) -> float:
    """Host<->device readback latency on an already-complete value."""
    readback(tree)
    best = float("inf")
    for _ in range(samples):
        t0 = time.perf_counter()
        readback(tree)
        best = min(best, time.perf_counter() - t0)
    return best


def time_chain(step, state, iters: int, warmup: int = 3, repeats: int = 3):
    """Time ``state = step(state)`` loops with a readback barrier.

    Returns (seconds_per_iter, final_state). ``step`` must return a
    value whose content changes every call (see module docstring).

    Runs ``repeats`` independent timing windows of ``iters`` each and
    returns the FASTEST window: the tunnel injects occasional multi-ms
    host hiccups, and the minimum over windows is the stable estimator
    of device time (single-window numbers moved ~2% between identical
    runs).
    """
    state = step(state)
    readback(state)
    for _ in range(warmup):
        state = step(state)
    readback(state)
    rtt = roundtrip_s(state)
    best = float("inf")
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        for _ in range(iters):
            state = step(state)
        readback(state)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / iters
        best = min(best, dt)
    return best, state
