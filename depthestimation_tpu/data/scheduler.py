"""Video-batch scheduling + host-side prefetch.

The reference streams "video batches": groups of trajectories advanced one
frame at a time so the trainer can carry ``prev_output``/``prev_lc`` DPVs
across frames (kittiloader/batch_loader.py:122-372, batch_scheduler.py:
317-492, one spawned loader process + bounded queue). Here the loader is a
prefetch thread feeding a bounded queue of ready numpy batches; arrays are
``device_put`` with a batch-sharded layout by the trainer.

A dataset is anything implementing the small ``VideoDataset`` protocol:
  n_trajectories, traj_len(i), frame(traj_idx, t) -> per-frame sample dicts.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Protocol

import numpy as np


class VideoDataset(Protocol):
    def n_trajectories(self) -> int: ...
    def traj_len(self, i: int) -> int: ...
    def frame(self, i: int, t: int) -> dict: ...


class BatchScheduler:
    """Groups ``batch_size`` trajectories and yields them frame-by-frame.

    Yields dicts with stacked per-frame samples plus bookkeeping
    (frame_count, traj_len, batch_idx, nbatch, iepoch) — the reference's
    ``enumerate()`` contract (batch_scheduler.py:329-343). Scene-level
    sharding across hosts mirrors batch_scheduler.py:378-385.
    """

    def __init__(self, dataset: VideoDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0, qmax: int = 4,
                 host_id: int = 0, n_hosts: int = 1, prefetch: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.qmax = qmax
        self.prefetch = prefetch
        idx = [i for i in range(dataset.n_trajectories())
               if i % n_hosts == host_id]
        self.traj_indices = idx
        self._stop = threading.Event()
        self._epoch = 0

    def stop(self):
        self._stop.set()

    # -- iteration ---------------------------------------------------------

    def _produce(self) -> Iterator[dict]:
        rng = np.random.default_rng(self.seed + self._epoch)
        order = list(self.traj_indices)
        if self.shuffle:
            rng.shuffle(order)
        nbatch = len(order) // self.batch_size
        for batch_idx in range(nbatch):
            trajs = order[batch_idx * self.batch_size:(batch_idx + 1) * self.batch_size]
            tlen = min(self.dataset.traj_len(i) for i in trajs)
            for t in range(tlen):
                frames = [self.dataset.frame(i, t) for i in trajs]
                # corrupted-sample protocol (reference kitti.py:991-1000):
                # a frame may come back {"success": False}; mark the batch
                # invalid so the trainer can skip it
                if any(not f.get("success", True) for f in frames):
                    yield {"is_valid": False, "frame_count": t,
                           "traj_len": tlen, "batch_idx": batch_idx,
                           "nbatch": nbatch, "iepoch": self._epoch}
                    continue
                batch = _stack_frames(frames)
                batch.update({"frame_count": t, "traj_len": tlen,
                              "batch_idx": batch_idx, "nbatch": nbatch,
                              "iepoch": self._epoch, "is_valid": True})
                yield batch
        self._epoch += 1

    def enumerate(self) -> Iterator[dict]:
        self._stop.clear()
        if not self.prefetch:
            for item in self._produce():
                if self._stop.is_set():
                    break
                yield item
            return

        q: queue.Queue = queue.Queue(maxsize=self.qmax)
        SENTINEL = object()

        def worker():
            try:
                for item in self._produce():
                    if self._stop.is_set():
                        break
                    q.put(item)
            finally:
                q.put(SENTINEL)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            if self._stop.is_set():
                # drain so the worker can exit
                continue
            yield item
        th.join(timeout=5)


def _stack_frames(frames: list) -> dict:
    """Stack a list of per-frame sample dicts along a new batch axis.
    Non-array values are taken from the first frame (shared metadata)."""
    shared = ("d_candi", "d_candi_up", "T_left2right", "intrinsics",
              "intrinsics_up", "unit_ray")
    out = {}
    for key in frames[0]:
        v0 = frames[0][key]
        if isinstance(v0, np.ndarray) and key not in shared:
            out[key] = np.stack([f[key] for f in frames])
        else:
            out[key] = v0
    return out
