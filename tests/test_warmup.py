"""Concurrent program warm-up for the predict cascades.

`warmup_cascade_32m`/`warmup_cascade_256m` compile the cascades' shared
jit programs from a thread pool so time-to-first-prediction is ~the
largest single program instead of the sum (the axon backend cannot
persist compiled executables, so every process pays cold compile —
docs/ARCHITECTURE.md). These tests assert the warm-up's dummy shapes
really match the production cascade: after warming, a full cascade call
must not add a single jit-cache entry.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from orca_tpu.models import zoo
from orca_tpu.predict import multiscale as ms
from orca_tpu.predict.multiscale import CascadeGeometry

pytestmark = pytest.mark.slow

GEOM = CascadeGeometry(window_bp=1_024_000, bin_bp=4000, crop=8)
GEOM256 = CascadeGeometry(window_bp=8_192_000, bin_bp=32000, crop=8)


def _cache_sizes():
    fns = (
        ms._encode_32mb_jit, ms._decode_level_jit, ms._crop_rows_jit,
        ms._combine_orientations, ms._encode_256mb_jit,
        ms._decode_level_256_jit, ms._block_average_rows_jit,
    )
    return tuple(f._cache_size() for f in fns)


def test_warmup_32m_covers_cascade():
    bundle = zoo.fold_bundle(
        zoo.random_32m_bundle(seed=0, nbins=GEOM.bins, crop=GEOM.crop)
    )
    dt = ms.warmup_cascade_32m(bundle, GEOM, n=1, seq_dtype=jnp.float32)
    assert dt > 0
    sizes = _cache_sizes()

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.rand(1, GEOM.window_bp, 4).astype(np.float32))
    preds, starts = ms._cascade_32mb(
        bundle, GEOM, seq, jnp.float32(GEOM.window_bp // 2),
        jnp.float32(GEOM.window_bp // 2),
        jnp.asarray(bundle.log_normmats()),
    )
    assert preds.shape == (6, 1, GEOM.crop, GEOM.crop, 1)
    assert np.all(np.isfinite(np.asarray(preds)))
    # the warm-up must have compiled every program the cascade needs
    assert _cache_sizes() == sizes, "cascade compiled beyond the warm-up"


def test_warmup_256m_covers_cascade():
    bundle = zoo.fold_256m_bundle(zoo.random_256m_bundle(seed=0))
    dt = ms.warmup_cascade_256m(bundle, GEOM256, n=1, seq_dtype=jnp.float32)
    assert dt > 0
    sizes = _cache_sizes()

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.rand(1, GEOM256.window_bp, 4).astype(np.float32))
    normmat = np.exp(
        -np.abs(np.arange(GEOM256.bins)[:, None]
                - np.arange(GEOM256.bins)[None, :]) / 50.0
    ).astype(np.float32) + 1e-4
    preds, starts, norms = ms._cascade_256mb(
        bundle, GEOM256, seq, jnp.float32(GEOM256.window_bp // 4),
        jnp.float32(GEOM256.window_bp // 2),
        jnp.float32(GEOM256.window_bp), jnp.asarray(normmat),
    )
    assert preds.shape[0] == 4
    assert np.all(np.isfinite(np.asarray(preds)))
    assert _cache_sizes() == sizes, "cascade compiled beyond the warm-up"
