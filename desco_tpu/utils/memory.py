"""Memory pre-faulting.

This host serves fresh anonymous pages lazily at ~9MB/s single-threaded
(VM demand paging); the fault path parallelizes to ~70MB/s with a thread
pool. Touching every page of a large allocation up front — from many
threads — converts minutes of scattered stalls inside packing/filling
loops into seconds of bulk prefault.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterable

import numpy as np

_PAGE = 4096
_THREADS = 32
_MIN_BYTES = 1 << 20  # don't bother below 1MB (a skipped 4MB array
#                       still costs ~0.5s of serial faulting in fill())


def prefault(*arrays: np.ndarray, threads: int = _THREADS) -> None:
    """Touch every page of the given arrays in parallel."""
    views = []
    for a in arrays:
        if a is None or a.nbytes < _MIN_BYTES:
            continue
        flat = a.reshape(-1).view(np.uint8)
        views.append(flat)
    if not views:
        return
    total = sum(v.nbytes for v in views)
    n_chunks = max(threads, total // (64 << 20))
    jobs = []
    for v in views:
        step = max(v.nbytes // n_chunks, _MIN_BYTES)
        for lo in range(0, v.nbytes, step):
            jobs.append((v, lo, min(lo + step, v.nbytes)))

    def touch(job):
        v, lo, hi = job
        # read+write one byte per page (write forces a private fault)
        v[lo:hi:_PAGE] |= 0

    with ThreadPoolExecutor(threads) as ex:
        list(ex.map(touch, jobs))
