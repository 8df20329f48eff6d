"""Stochastic weight averaging (torch AveragedModel equivalent,
train_h1esc_a.py:113-115,162-165): running equal-weight average of
parameters, updated after every optimizer step during the SWA phase.

BatchNorm note: the reference refreshes the averaged model's BN running
stats by forwarding each batch through the SWA model in train mode
(train_h1esc_a.py:164-165); `swa_forward_update_bn` does the same here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swa_init(params):
    return {"avg": params, "n": jnp.zeros((), jnp.int32)}


def swa_update(swa_state, params):
    """avg <- avg + (p - avg)/(n+1), n <- n+1 (torch default avg_fn)."""
    n = swa_state["n"]
    avg = jax.tree.map(
        lambda a, p: a + (p - a) / (n + 1).astype(a.dtype), swa_state["avg"],
        params,
    )
    return {"avg": avg, "n": n + 1}
