"""PyTorch statedict -> orca_tpu parameter pytree conversion.

The reference ships nine model bundles as torch ``.statedict`` files loaded
with per-module `strict=True` plus manual ``"module."`` DataParallel prefix
filtering and key-subset slicing (orca_models.py:53-123). This module maps
those state dicts onto orca_tpu's spec-driven parameter trees.

Index arithmetic: every torch nn.Sequential in the reference is a chain of
[Pool|Upsample]? ([Dropout]? Conv [BN]? [ReLU|Sigmoid]?)* — exactly the
structure a `Block` spec describes — so the torch child indices can be
recomputed from the spec instead of being hardcoded per module.

Weight layout transforms:
  Conv1d (out,in,k)    -> (k,in,out)
  Conv2d (out,in,kh,kw)-> (kh,kw,in,out)
  BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from orca_tpu.nn.core import Block, Unit
from orca_tpu.nn import decoders, encoders


def _to_np(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor
    return v.detach().cpu().numpy()


def strip_module_prefix(sd: Dict) -> Dict:
    """Drop DataParallel's 'module.' key prefix (orca_models.py:111)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _convert_unit(sd: Dict, prefix: str, idx: int, unit: Unit):
    """Convert one Unit starting at torch Sequential child index `idx`.

    Returns (params_dict, next_idx).
    """
    if unit.dropout > 0.0:
        idx += 1  # nn.Dropout holds no params
    w = _to_np(sd[f"{prefix}{idx}.weight"]).astype(np.float32)
    b = _to_np(sd[f"{prefix}{idx}.bias"]).astype(np.float32)
    if unit.dim == 1:
        w = np.transpose(w, (2, 1, 0))
    else:
        w = np.transpose(w, (2, 3, 1, 0))
    p = {"w": w, "b": b}
    idx += 1
    if unit.bn:
        p["bn"] = {
            "scale": _to_np(sd[f"{prefix}{idx}.weight"]).astype(np.float32),
            "bias": _to_np(sd[f"{prefix}{idx}.bias"]).astype(np.float32),
            "mean": _to_np(sd[f"{prefix}{idx}.running_mean"]).astype(np.float32),
            "var": _to_np(sd[f"{prefix}{idx}.running_var"]).astype(np.float32),
        }
        idx += 1
    if unit.relu or unit.sigmoid:
        idx += 1
    return p, idx


def convert_block(sd: Dict, prefix: str, block: Block) -> list:
    """Convert a torch nn.Sequential at `prefix` (e.g. 'lconv1.') to Block
    params."""
    idx = 1 if (block.pool or block.upsample) else 0
    params = []
    for unit in block.units:
        p, idx = _convert_unit(sd, prefix, idx, unit)
        params.append(p)
    return params


def convert_encoder_tower(sd: Dict, prefix: str = "") -> dict:
    sd = strip_module_prefix(sd)
    spec = encoders.encoder_tower_spec()
    return {
        "lconv": [
            convert_block(sd, f"{prefix}lconv{i + 1}.", b)
            for i, b in enumerate(spec["lconv"])
        ],
        "conv": [
            convert_block(sd, f"{prefix}conv{i + 1}.", b)
            for i, b in enumerate(spec["conv"])
        ],
    }


_PYRAMID_TORCH_NAMES = {
    "lblocks": "lblocks",
    "blocks": "blocks",
    "downl": "downlblocks",
    "down": "downblocks",
}


def convert_pyramid(sd: Dict, levels: int, up_pass: bool, prefix: str = "") -> dict:
    sd = strip_module_prefix(sd)
    spec = encoders.pyramid_spec(levels, up_pass)
    return {
        name: [
            convert_block(sd, f"{prefix}{_PYRAMID_TORCH_NAMES[name]}.{i}.", b)
            for i, b in enumerate(blocks)
        ]
        for name, blocks in spec.items()
    }


def convert_decoder(sd: Dict, num_2d: int = 1, prefix: str = "") -> dict:
    sd = strip_module_prefix(sd)
    spec = decoders.decoder_spec(num_2d)
    out = {}
    for name, node in spec.items():
        if isinstance(node, Block):
            out[name] = convert_block(sd, f"{prefix}{name}.", node)
        else:
            out[name] = [
                convert_block(sd, f"{prefix}{name}.{i}.", b)
                for i, b in enumerate(node)
            ]
    return out


def convert_decoder1m(sd: Dict, num_2d: int = 1, prefix: str = "") -> dict:
    sd = strip_module_prefix(sd)
    spec = decoders.decoder1m_spec(num_2d)
    out = {}
    for name, node in spec.items():
        if isinstance(node, Block):
            out[name] = convert_block(sd, f"{prefix}{name}.", node)
        else:
            out[name] = [
                convert_block(sd, f"{prefix}{name}.{i}.", b)
                for i, b in enumerate(node)
            ]
    return out


def convert_net(sd: Dict, num_1d: Optional[int] = None, num_2d: int = 1,
                prefix: str = "") -> dict:
    """Convert a stage-a `Net` statedict (also the source that H1esc/Hff carve
    their net0/denet_1_pt out of, orca_models.py:103-123)."""
    sd = strip_module_prefix(sd)
    params = {
        "encoder": convert_encoder_tower(sd, prefix),
        "decoder": convert_decoder1m(sd, num_2d, prefix),
    }
    if num_1d:
        params["final_1d"] = convert_block(
            sd, f"{prefix}final_1d.", decoders.final1d_spec(num_1d)
        )
    return params


def load_statedict(path: str) -> Dict:
    """Load a torch .statedict file into a name->ndarray dict (host-side;
    requires torch only here, never on the TPU compute path)."""
    import torch  # local import: conversion is an offline host step

    sd = torch.load(path, map_location="cpu")
    return {k: _to_np(v) for k, v in sd.items()}
