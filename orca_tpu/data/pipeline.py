"""Parallel input pipeline: prefetching sampler workers.

The reference trains through selene's `SamplerDataLoader` with up to 32
worker processes (train/train_h1esc_a.py:74,133); `selene_utils2.py:155-162`
exists precisely to make the samplers fork-safe. Here `PrefetchLoader`
plays that role for any orca_tpu sampler: workers draw batches on the host
(memmap slices, cooler fetches, adaptive coarse-graining) and push them
into a bounded queue, so the accelerator step never waits on sampling.

backend='process' forks worker processes (the default; the data layer's
lazy handles — MemmapGenome's mmap, CoolerContactMatrix's cooler — re-open
per process, mirroring selene's delayed-init decorators).
backend='thread' uses threads (numpy/cooler release the GIL for the heavy
parts; useful where fork is unavailable or for tests).
"""

from __future__ import annotations

import copy
import multiprocessing as mp
import queue as queue_mod
import threading
from typing import Optional


def _reseed(sampler, worker_id: int, seed: int) -> None:
    """Give each worker an independent random stream (after fork all
    workers would otherwise replay identical draws)."""
    import numpy as np

    if hasattr(sampler, "rng"):
        sampler.rng = np.random.default_rng(seed + 7919 * (worker_id + 1))


def _worker_loop(sampler, batch_size, mode, out_queue, stop_event,
                 worker_id, seed):
    _reseed(sampler, worker_id, seed)
    while not stop_event.is_set():
        batch = sampler.sample(batch_size, mode=mode)
        while not stop_event.is_set():
            try:
                out_queue.put(batch, timeout=0.25)
                break
            except queue_mod.Full:
                continue


class PrefetchLoader:
    """Continuously prefetches `sampler.sample(batch_size, mode)` results.

    get() pops the next ready batch; close() stops the workers. Batch
    order is nondeterministic across workers (like the reference's
    SamplerDataLoader) — samplers are random-draw, so order carries no
    meaning.
    """

    def __init__(self, sampler, batch_size: int, mode: str = "train",
                 num_workers: int = 2, prefetch: Optional[int] = None,
                 backend: str = "process", seed: int = 0):
        if num_workers < 1:
            raise ValueError("num_workers must be >= 1")
        self.backend = backend
        prefetch = prefetch or 2 * num_workers
        self._workers = []
        if backend == "process":
            ctx = mp.get_context("fork")
            self._queue = ctx.Queue(maxsize=prefetch)
            self._stop = ctx.Event()
            for w in range(num_workers):
                p = ctx.Process(
                    target=_worker_loop,
                    args=(sampler, batch_size, mode, self._queue, self._stop,
                          w, seed),
                    daemon=True,
                )
                p.start()
                self._workers.append(p)
        elif backend == "thread":
            self._queue = queue_mod.Queue(maxsize=prefetch)
            self._stop = threading.Event()
            for w in range(num_workers):
                # each thread needs its own rng stream; share the rest
                s = copy.copy(sampler)
                t = threading.Thread(
                    target=_worker_loop,
                    args=(s, batch_size, mode, self._queue, self._stop,
                          w, seed),
                    daemon=True,
                )
                t.start()
                self._workers.append(t)
        else:
            raise ValueError(f"unknown backend {backend!r}")

    def get(self, timeout: Optional[float] = None):
        return self._queue.get(timeout=timeout)

    def __iter__(self):
        while True:
            yield self.get()

    def close(self) -> None:
        self._stop.set()
        for w in self._workers:
            if isinstance(w, threading.Thread):
                w.join(timeout=2.0)
            else:
                w.join(timeout=2.0)
                if w.is_alive():
                    w.terminate()
        # drain so producer puts never deadlock on a full queue
        try:
            while True:
                self._queue.get_nowait()
        except queue_mod.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
