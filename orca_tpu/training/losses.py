"""Training losses: distance-normalized masked MSE + auxiliary BCE.

Reference semantics: the 2D loss is the MSE between the prediction and
log((target + eps) / (normmat + eps)) over non-NaN entries
(train_h1esc_a.py:144-158 for stage a; train_h1esc_b.py:236-246 per level;
train_h1esc_c.py:195-203 normalizes by N*250^2 with an isfinite mask).
The 1D auxiliary loss is BCE on sigmoid chromatin-track outputs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def downsample_nanmean(target: jax.Array, crop: int, factor: int) -> jax.Array:
    """(..., crop*factor, crop*factor) -> (..., crop, crop) NaN-aware block
    mean. Leading axes (batch, multi-head datasets) pass through."""
    lead = target.shape[:-2]
    r = target.reshape(*lead, crop, factor, crop, factor)
    valid = jnp.isfinite(r)
    s = jnp.sum(jnp.where(valid, r, 0.0), axis=(-3, -1))
    c = jnp.sum(valid, axis=(-3, -1))
    return jnp.where(c > 0, s / jnp.maximum(c, 1), jnp.nan)


def log_fold_target(target_r: jax.Array, normmat: jax.Array,
                    eps: float) -> jax.Array:
    """log fold over distance background; NaNs propagate."""
    return jnp.log((target_r + eps) / (normmat + eps))


def masked_mse(pred: jax.Array, target: jax.Array,
               normalize: str = "valid_mean") -> jax.Array:
    """MSE over finite target entries.

    normalize='valid_mean': mean over valid entries (stages a/b,
    train_h1esc_b.py:236-246); 'full_count': sum / total entries (stage c,
    train_h1esc_c.py:197-203).
    """
    mask = jnp.isfinite(target)
    sq = jnp.where(mask, (pred - jnp.where(mask, target, 0.0)) ** 2, 0.0)
    if normalize == "valid_mean":
        return jnp.sum(sq) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(sq) / pred.size


def bce(pred: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Binary cross-entropy on probabilities (torch nn.BCELoss semantics,
    with clamping for numerical safety)."""
    p = jnp.clip(pred, eps, 1 - eps)
    return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log1p(-p))


def pearson_r_per_sample(pred: jax.Array, target: jax.Array,
                         min_valid: float = 0.3) -> jax.Array:
    """Per-sample Pearson r over finite target entries, NaN when fewer than
    `min_valid` of the entries are valid (the reference validation metric,
    train_h1esc_b.py:428-433)."""
    n = pred.shape[0]
    p = pred.reshape(n, -1)
    t = target.reshape(n, -1)
    valid = jnp.isfinite(t)
    cnt = jnp.maximum(valid.sum(axis=1), 1)
    tz = jnp.where(valid, t, 0.0)
    pz = jnp.where(valid, p, 0.0)
    mp = pz.sum(axis=1) / cnt
    mt = tz.sum(axis=1) / cnt
    dp = jnp.where(valid, p - mp[:, None], 0.0)
    dt = jnp.where(valid, t - mt[:, None], 0.0)
    cov = jnp.sum(dp * dt, axis=1)
    denom = jnp.sqrt(jnp.sum(dp**2, axis=1) * jnp.sum(dt**2, axis=1))
    r = cov / jnp.maximum(denom, 1e-12)
    frac = valid.sum(axis=1) / t.shape[1]
    return jnp.where(frac > min_valid, r, jnp.nan)


def pearson_r(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Pearson correlation over finite target entries (validation metric,
    train_h1esc_a.py:234-239)."""
    mask = jnp.isfinite(target)
    n = jnp.maximum(jnp.sum(mask), 1)
    t = jnp.where(mask, target, 0.0)
    p = jnp.where(mask, pred, 0.0)
    mp = jnp.sum(p) / n
    mt = jnp.sum(t) / n
    vp = jnp.where(mask, p - mp, 0.0)
    vt = jnp.where(mask, t - mt, 0.0)
    cov = jnp.sum(vp * vt)
    denom = jnp.sqrt(jnp.sum(vp**2) * jnp.sum(vt**2))
    return cov / jnp.maximum(denom, 1e-12)
