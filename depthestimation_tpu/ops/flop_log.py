"""Trace-time FLOP log for opaque Pallas kernels.

XLA ``compiled.cost_analysis()`` cannot see work inside a
``pallas_call`` — when the fused convcomb kernel went live, the counted
step FLOPs fell 12.71 -> 6.40 TFLOP while the step got FASTER, and the
driver-visible MFU "dropped" 0.181 -> 0.109 (VERDICT r4 Missing #1).

Each kernel wrapper calls :func:`log` with its analytic MXU FLOPs at
TRACE time (static shapes — the count is exact, same convention XLA uses
for the equivalent conv/einsum). A bench brackets its ``jit(...).lower``
call with :func:`start` / :func:`drain` and adds the drained total to the
cost-analysis number. Logging is keyed off an explicit ``start()`` so
ordinary training runs never accumulate an unbounded list.
"""

from __future__ import annotations

_active = False
_entries: list[tuple[str, float]] = []


def start() -> None:
    """Begin collecting kernel FLOPs (clears any previous log)."""
    global _active
    _entries.clear()
    _active = True


def log(kind: str, flops: float) -> None:
    """Called by kernel wrappers at trace time. No-op unless started."""
    if _active:
        _entries.append((kind, float(flops)))


def drain() -> dict[str, float]:
    """Stop collecting; return {kind: total_flops} for the traced calls."""
    global _active
    _active = False
    out: dict[str, float] = {}
    for kind, f in _entries:
        out[kind] = out.get(kind, 0.0) + f
    _entries.clear()
    return out
