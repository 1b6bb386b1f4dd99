"""Loader/compute overlap contract: with prefetch (thread) or mload
(spawned process), sample production overlaps the training step so the
effective step time approaches max(load, step), not load + step — the
property the reference's BatchSchedulerMP process exists for
(batch_scheduler.py:330-350)."""

import time

import numpy as np
import pytest

from depthestimation_tpu.data.scheduler import BatchScheduler
from depthestimation_tpu.data.video_synthetic import SyntheticStereoVideoDataset


class SlowDataset(SyntheticStereoVideoDataset):
    """Synthetic video dataset with an injected per-sample IO latency
    (sleep releases the GIL, like file reads / image decode waits)."""

    DELAY_S = 0.05

    def frame(self, i: int, t: int) -> dict:
        time.sleep(self.DELAY_S)
        return super().frame(i, t)


def _drive(scheduler, step_s: float):
    """Steady-state wall time: the clock starts at the FIRST batch so
    one-time pipeline-fill cost (thread start / process spawn) is excluded
    from the overlap measurement."""
    n = 0
    t0 = None
    for batch in scheduler.enumerate():
        if t0 is None:
            t0 = time.perf_counter()
        time.sleep(step_s)  # simulated jitted train step (device-bound)
        n += 1
    return time.perf_counter() - t0, n


@pytest.mark.parametrize("mode", ["thread", "process"])
def test_loader_overlaps_compute(mode):
    common = dict(n_traj=2, traj_len=10, h=16, w=24, t_win=1,
                  d_min=5.0, d_max=40.0, ndepth=8, qpower=1.0, seed=0)
    step_s = 0.06
    delay = SlowDataset.DELAY_S

    # wall-clock assertion: best of 2 attempts, so transient machine
    # contention (CI neighbors, concurrent compiles) can't starve the
    # producer and fail an otherwise-correct overlap
    walls = []
    for _ in range(2):
        ds = SlowDataset(**common)
        sched = BatchScheduler(ds, batch_size=2, shuffle=False, seed=0,
                               prefetch=(mode == "thread"),
                               mload=(mode == "process"))
        wall, n = _drive(sched, step_s)
        assert n == 10  # 2 trajectories / batch 2 -> one batch x 10 frames
        walls.append(wall)
        # per-step load cost: 2 trajectories x delay = 0.1 s (sequential in
        # the producer); step 0.06 s. Serialized: n*(load+step) = 1.6 s;
        # overlapped steady-state ~ n*max(load, step) = 1.0 s.
        sequential = n * (2 * delay + step_s)
        if wall < sequential * 0.8:
            return
    assert min(walls) < sequential * 0.8, (walls, sequential, mode)


def test_no_prefetch_is_sequential_baseline():
    common = dict(n_traj=2, traj_len=6, h=16, w=24, t_win=1,
                  d_min=5.0, d_max=40.0, ndepth=8, qpower=1.0, seed=0)
    ds = SlowDataset(**common)
    sched = BatchScheduler(ds, batch_size=2, shuffle=False, seed=0,
                           prefetch=False, mload=False)
    wall, n = _drive(sched, 0.06)
    # without prefetch, load and step serialize (first load precedes the
    # clock start, so n-1 loads + n steps remain)
    assert wall >= ((n - 1) * 2 * SlowDataset.DELAY_S + n * 0.06) * 0.9
