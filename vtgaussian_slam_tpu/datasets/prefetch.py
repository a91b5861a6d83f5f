"""Asynchronous frame prefetching.

The reference performs blocking disk reads + cv2 decode/resize inside the
frame loop AND inside the mapping optimization loop
(/root/reference/src/vtgaussian_slam.py:1407, :2583-2585) — a per-frame host
stall. Here a small worker pool decodes frames ahead of the SLAM loop so the
(native cv2/libjpeg) decode work overlaps device compute; frames arrive as
ready numpy tuples and are staged to HBM on first use.

Usage:
    pf = FramePrefetcher(dataset, lookahead=2)
    for t in range(n):
        color, depth, K, pose = pf[t]     # usually already decoded
"""
from __future__ import annotations

import threading
from collections import OrderedDict
from concurrent.futures import Future, ThreadPoolExecutor


class FramePrefetcher:
    def __init__(self, dataset, lookahead: int = 2, workers: int = 2,
                 cache_size: int = 8):
        self._ds = dataset
        self._lookahead = lookahead
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._futures: OrderedDict[int, Future] = OrderedDict()
        self._lock = threading.Lock()

    def __len__(self):
        return len(self._ds)

    def _submit(self, idx: int):
        if 0 <= idx < len(self._ds) and idx not in self._futures:
            self._futures[idx] = self._pool.submit(self._ds.__getitem__, idx)
            while len(self._futures) > 2 * self._lookahead + 4:
                self._futures.popitem(last=False)

    def __getitem__(self, idx: int):
        with self._lock:
            self._submit(idx)
            for ahead in range(1, self._lookahead + 1):
                self._submit(idx + ahead)
            fut = self._futures[idx]
        return fut.result()

    def __getattr__(self, name):
        # transparent proxy for dataset attributes (intrinsics, poses, ...)
        return getattr(self._ds, name)

    def close(self):
        self._pool.shutdown(wait=False)
