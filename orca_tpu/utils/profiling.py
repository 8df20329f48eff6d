"""Profiling hooks (absent in the reference, SURVEY §5.1).

Thin wrappers over jax.profiler: xprof/tensorboard traces of the cascade or
training steps, plus a simple device-time timer that forces completion via a
host fetch (tunneled backends may return from block_until_ready before
execution finishes).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an xprof trace: `with trace('/tmp/prof'): run()` then
    `tensorboard --logdir /tmp/prof`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling regions inside traces."""
    return jax.profiler.TraceAnnotation(name)


def device_time(fn, *args, iters: int = 3, warmup: int = 1) -> float:
    """Median-free mean wall time per call with forced completion."""
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _force(fn(*args))
    return (time.time() - t0) / iters


def _force(out):
    leaves = jax.tree.leaves(out)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))
