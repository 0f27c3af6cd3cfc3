"""Ordered chunked multiprocess fan-out for the offline pipeline.

Capability parity with /root/reference/utils/multiprocess_utils.py:23-111:
map a function over items with N worker processes, yielding results in
submission order; a worker exception skips that item (returns None) with a
logged traceback instead of killing the job — the binarizer's per-item
fault tolerance (SURVEY.md §5)."""

from __future__ import annotations

import logging
import multiprocessing as mp
import traceback
from typing import Callable, Iterable, Iterator

log = logging.getLogger("dicttts_tpu.mp")


def _worker(fn, item):
    try:
        return fn(*item) if isinstance(item, tuple) else fn(item)
    except Exception:
        log.warning("worker error:\n%s", traceback.format_exc())
        return None


def chunked_multiprocess_run(
    fn: Callable,
    args: Iterable,
    num_workers: int | None = None,
    ordered: bool = True,
    chunksize: int = 1,
) -> Iterator:
    """Yield fn(*item) for each item, computed across worker processes."""
    args = list(args)
    num_workers = num_workers if num_workers is not None else max(mp.cpu_count() - 1, 1)
    if num_workers <= 1 or len(args) <= 1:
        for item in args:
            yield _worker(fn, item)
        return
    ctx = mp.get_context("spawn")
    with ctx.Pool(num_workers) as pool:
        mapper = pool.imap if ordered else pool.imap_unordered
        jobs = [(fn, item) for item in args]
        for res in mapper(_star, jobs, chunksize=chunksize):
            yield res


def _star(job):
    fn, item = job
    return _worker(fn, item)


class MultiprocessManager:
    """Persistent worker pool with queued jobs and ordered result collection
    (reference MultiprocessManager semantics)."""

    def __init__(self, num_workers: int | None = None):
        self.num_workers = num_workers if num_workers is not None else max(mp.cpu_count() - 1, 1)
        ctx = mp.get_context("spawn")
        self.pool = ctx.Pool(self.num_workers)
        self._results = []

    def add_job(self, fn, args: tuple):
        self._results.append(self.pool.apply_async(_star, ((fn, args),)))

    def get_results(self):
        for r in self._results:
            yield r.get()
        self._results = []

    def close(self):
        self.pool.close()
        self.pool.join()
