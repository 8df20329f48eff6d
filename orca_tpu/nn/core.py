"""Spec-driven conv blocks: the two motifs all Orca towers are made of.

Every tower in the reference is a composition of just a few motifs
(orca_modules.py): a "linear" conv pair without activations (optionally
preceded by MaxPool or Upsample), and an "active" conv pair with ReLUs,
combined residually as ``conv(lconv(x)) + lconv(x)``. Rather than
transliterating ~1900 lines of nn.Sequential declarations, blocks here are
data: a `Block` spec (static) plus a parameter pytree, consumed by one
`apply_block` function. Inference params carry no BatchNorm: fold_params()
absorbs BN into conv weights ahead of time.

Parameter pytree for a Block: list (one entry per Unit) of dicts
  {'w': (K.., Cin, Cout), 'b': (Cout,), optional 'bn': {scale,bias,mean,var}}.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from orca_tpu.ops import nn_ops


@dataclasses.dataclass(frozen=True)
class Unit:
    """One conv (+BN)(+activation) step.

    dropout is applied before the conv, matching the torch Sequential order
    nn.Dropout -> nn.Conv2d (orca_modules.py:24-30).
    """

    dim: int  # 1 or 2 (spatial dims)
    cin: int
    cout: int
    k: int = 9
    dilation: int = 1
    bn: bool = True
    relu: bool = False
    sigmoid: bool = False
    dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class Block:
    """A motif: optional pool/upsample followed by a chain of Units."""

    units: tuple
    pool: int = 0  # maxpool kernel==stride before the units (1D only)
    upsample: int = 0  # nearest-upsample scale before the units
    upsample_mode: str = "nearest"  # for 2D coarse-pred upsampling


def conv_pair_1d(cin: int, cout: int, *, relu: bool, pool: int = 0,
                 upsample: int = 0, second_bn: bool = True) -> Block:
    """The 1D motif: two k=9 convs. relu=False gives the 'lconv' flavor,
    relu=True the 'conv' flavor (orca_modules.py:811-826)."""
    return Block(
        units=(
            Unit(1, cin, cout, k=9, relu=relu),
            Unit(1, cout, cout, k=9, relu=relu, bn=second_bn),
        ),
        pool=pool,
        upsample=upsample,
    )


def conv_pair_2d(cin: int, cmid: int, cout: int, dilation: int, *, relu: bool,
                 dropout: float = 0.0, k: int = 3) -> Block:
    """The 2D motif: 64->32->64 dilated conv pair (orca_modules.py:22-36)."""
    return Block(
        units=(
            Unit(2, cin, cmid, k=k, dilation=dilation, relu=relu, dropout=dropout),
            Unit(2, cmid, cout, k=k, dilation=dilation, relu=relu),
        )
    )


# --------------------------------------------------------------------------
# Initialization (torch Conv default: kaiming_uniform(a=sqrt(5)) == U(-l, l)
# with l = 1/sqrt(fan_in); bias U(-l, l) as well).
# --------------------------------------------------------------------------


def _init_unit(rng: jax.Array, unit: Unit, dtype=jnp.float32) -> dict:
    kshape = (unit.k,) * unit.dim + (unit.cin, unit.cout)
    fan_in = unit.cin * unit.k**unit.dim
    limit = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(rng)
    p = {
        "w": jax.random.uniform(kw, kshape, dtype, -limit, limit),
        "b": jax.random.uniform(kb, (unit.cout,), dtype, -limit, limit),
    }
    if unit.bn:
        p["bn"] = {
            "scale": jnp.ones((unit.cout,), dtype),
            "bias": jnp.zeros((unit.cout,), dtype),
            "mean": jnp.zeros((unit.cout,), dtype),
            "var": jnp.ones((unit.cout,), dtype),
        }
    return p


def init_block(rng: jax.Array, block: Block, dtype=jnp.float32) -> list:
    rngs = jax.random.split(rng, len(block.units))
    return [_init_unit(r, u, dtype) for r, u in zip(rngs, block.units)]


# --------------------------------------------------------------------------
# Application
# --------------------------------------------------------------------------


class BNUpdates:
    """Collects training-mode BatchNorm running-stat updates during a forward.

    Updates are keyed by the structural path of the unit inside the model's
    parameter tree ("<block path>/<unit index>"), so they can be written back
    with `merge_bn_updates` after the step. Momentum follows torch (0.1, with
    running stats updated from the *unbiased* batch variance).
    """

    def __init__(self, momentum: float = 0.1):
        self.momentum = momentum
        self.updates = {}  # path -> (new_running_mean, new_running_var)

    def record(self, path, mean, var_unbiased):
        self.updates[path] = (mean, var_unbiased)


def merge_bn_updates(params, bn_updates: BNUpdates):
    """Return a copy of `params` with recorded running stats written back.

    Paths address nested dict keys / list indices, e.g.
    "encoder/lconv/0/1" -> params["encoder"]["lconv"][0][1]["bn"].
    """
    import copy

    out = copy.copy(params) if isinstance(params, dict) else list(params)

    def _set(tree, parts, mean, var):
        head = parts[0]
        if isinstance(tree, list):
            key = int(head)
        elif head in tree:
            key = head
        else:  # dict keyed by ints (e.g. decoder levels)
            key = int(head)
        if len(parts) == 1:
            unit = dict(tree[key])
            unit["bn"] = dict(unit["bn"], mean=mean, var=var)
            tree[key] = unit
        else:
            child = tree[key]
            child = copy.copy(child) if isinstance(child, dict) else list(child)
            tree[key] = child
            _set(child, parts[1:], mean, var)

    for path, (mean, var) in bn_updates.updates.items():
        _set(out, path.split("/"), mean, var)
    return out


def apply_unit(
    params: dict,
    unit: Unit,
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_updates: Optional[BNUpdates] = None,
    path: str = "",
) -> jax.Array:
    if unit.dropout > 0.0 and train:
        if rng is None:
            raise ValueError("dropout in train mode requires an rng")
        x = nn_ops.dropout(x, unit.dropout, rng)
    conv = nn_ops.conv1d if unit.dim == 1 else nn_ops.conv2d
    x = conv(x, params["w"], params["b"], dilation=unit.dilation)
    if "bn" in params:
        bn = params["bn"]
        if train:
            x, bmean, _bvar, bvar_u = nn_ops.batchnorm_train(
                x, bn["scale"], bn["bias"]
            )
            if bn_updates is not None:
                m = bn_updates.momentum
                bn_updates.record(
                    path,
                    (1 - m) * bn["mean"] + m * bmean,
                    (1 - m) * bn["var"] + m * bvar_u,
                )
        else:
            x = nn_ops.batchnorm(x, bn["scale"], bn["bias"], bn["mean"], bn["var"])
    if unit.relu:
        x = nn_ops.relu(x)
    if unit.sigmoid:
        x = nn_ops.sigmoid(x)
    return x


def apply_block(
    params: list,
    block: Block,
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_updates: Optional[BNUpdates] = None,
    path: str = "",
) -> jax.Array:
    if block.pool:
        x = nn_ops.maxpool1d(x, block.pool)
    if block.upsample:
        if block.units and block.units[0].dim == 2:
            if block.upsample_mode == "bilinear":
                x = nn_ops.upsample2d_bilinear(x, block.upsample)
            else:
                x = nn_ops.upsample2d_nearest(x, block.upsample)
        else:
            x = nn_ops.upsample1d_nearest(x, block.upsample)
    rngs = (
        jax.random.split(rng, len(block.units)) if rng is not None else
        [None] * len(block.units)
    )
    for i, (p, u, r) in enumerate(zip(params, block.units, rngs)):
        x = apply_unit(p, u, x, train=train, rng=r, bn_updates=bn_updates,
                       path=f"{path}/{i}" if path else str(i))
    return x


def fold_params(params, spec):
    """Recursively fold BN into conv weights for inference.

    `params` / `spec` may be a (unit-dict, Unit), (list, Block), or arbitrary
    nesting of dict/list with matching structure of Block/Unit leaves.
    """
    if isinstance(spec, Block):
        return [fold_params(p, u) for p, u in zip(params, spec.units)]
    if isinstance(spec, Unit):
        if "bn" in params:
            w, b = nn_ops.fold_bn_into_conv(params["w"], params["b"], params["bn"])
            return {"w": w, "b": b}
        return {"w": params["w"], "b": params["b"]}
    if isinstance(spec, dict):
        return {k: fold_params(params[k], spec[k]) for k in spec}
    if isinstance(spec, (list, tuple)):
        return [fold_params(p, s) for p, s in zip(params, spec)]
    raise TypeError(f"unsupported spec node: {type(spec)}")
