"""Optimizer and LR scheduling.

The reference trains every stage with SGD(lr=0.002, momentum=0.98) and a
ReduceLROnPlateau(mode='max', factor=0.9, patience=10, threshold=0) on the
validation Pearson r (train_h1esc_a.py:118-125). Here the optimizer is optax
SGD with trace momentum (matching torch's momentum buffer update
v = mu*v + g; p -= lr*v) and a host-side plateau scheduler scaling a
mutable LR passed into the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def sgd(momentum: float = 0.98) -> optax.GradientTransformation:
    """SGD with torch-style momentum; LR is injected per-step (scale by the
    schedule outside so the plateau scheduler needs no optimizer rebuild)."""
    return optax.trace(decay=momentum, nesterov=False)


def apply_sgd(opt, params, opt_state, grads, lr):
    updates, opt_state = opt.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
    return params, opt_state


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau scheduler (torch semantics, mode='max')."""

    lr: float
    factor: float = 0.9
    patience: int = 10
    threshold: float = 0.0
    min_lr: float = 0.0
    best: Optional[float] = None
    num_bad: int = 0

    def step(self, metric: float) -> float:
        if self.best is None or metric > self.best + self.threshold:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        """Full scheduler state — persisting only `lr` would reset the
        plateau counters on resume and let a plateau decision double-fire
        (the reference reloads optimizer state, train_h1esc_a.py:119-124;
        step-identical resume needs best/num_bad too)."""
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, s: dict) -> None:
        self.lr = float(s["lr"])
        self.best = None if s.get("best") is None else float(s["best"])
        self.num_bad = int(s.get("num_bad", 0))
