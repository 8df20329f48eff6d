"""Stochastic weight averaging (torch AveragedModel equivalent,
train_h1esc_a.py:113-115,162-165): running equal-weight average of
parameters, updated after every optimizer step during the SWA phase.

BatchNorm note: the reference refreshes the averaged model's BN running
stats by forwarding each batch through the SWA model in train mode
(train_h1esc_a.py:164-165); `swa_forward_update_bn` /
`make_swa_bn_refresh` do the same here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orca_tpu.nn.core import BNUpdates, merge_bn_updates


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


def make_swa_bn_refresh(cfg):
    """Returns refresh(swa_state, seq, rng) -> swa_state with the averaged
    params' BatchNorm running stats updated by a train-mode forward of the
    batch (the torch `swa_model(sequence)` call, train_h1esc_a.py:164-165).
    `cfg` is a StageAConfig."""
    from orca_tpu.nn import decoders

    @jax.jit
    def _collect(avg_params, seq, rng):
        bn = BNUpdates()
        decoders.apply_net(
            avg_params, seq, num_1d=cfg.num_1d,
            num_2d=getattr(cfg, "num_2d", 1), train=True, rng=rng,
            bn_updates=bn, remat=cfg.remat,
        )
        return bn.updates

    def refresh(swa_state, seq, rng):
        updates = _collect(swa_state["avg"], seq, rng)
        bn = BNUpdates()
        bn.updates = updates
        return {
            "avg": merge_bn_updates(swa_state["avg"], bn),
            "n": swa_state["n"],
        }

    return refresh


def swa_forward_update_bn(swa_state, cfg, seq, rng):
    """One-shot convenience wrapper around make_swa_bn_refresh."""
    return make_swa_bn_refresh(cfg)(swa_state, seq, rng)
