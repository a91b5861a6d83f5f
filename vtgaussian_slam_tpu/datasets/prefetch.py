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
        self._cache_size = max(cache_size, 2 * lookahead + 2)
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._futures: OrderedDict[int, Future] = OrderedDict()
        self._lock = threading.Lock()

    def __len__(self):
        return len(self._ds)

    def _touch(self, idx: int):
        """Submit (or refresh LRU position of) one index. Marking hits as
        most-recent is what keeps the CURRENT index alive while its
        lookahead submissions evict — without it, interleaved far-away
        reads (keyframe fetches between sequential frames) could evict the
        very future __getitem__ is about to read."""
        if not (0 <= idx < len(self._ds)):
            return
        if idx in self._futures:
            self._futures.move_to_end(idx)
            return
        self._futures[idx] = self._pool.submit(self._ds.__getitem__, idx)
        while len(self._futures) > self._cache_size:
            _, old = self._futures.popitem(last=False)
            old.cancel()  # still-queued decodes of evicted frames are wasted

    def __getitem__(self, idx: int):
        with self._lock:
            self._touch(idx)
            for ahead in range(1, self._lookahead + 1):
                self._touch(idx + ahead)
            fut = self._futures[idx]
        res = fut.result()
        return res

    def __getattr__(self, name):
        # transparent proxy for dataset attributes (intrinsics, poses, ...);
        # guard dunder/underscore lookups so half-constructed copies
        # (deepcopy/unpickle probe __setstate__ before __init__ ran) raise
        # AttributeError instead of recursing through self._ds
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._ds, name)

    def close(self):
        self._pool.shutdown(wait=False)
