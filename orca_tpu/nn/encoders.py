"""Orca encoder towers, TPU-native.

Three encoder sections mirror the reference capability surface:
  * EncoderTower: one-hot bp sequence -> 128ch features at 4kb bins
    (reference `Encoder`, orca_modules.py:803-980).
  * PyramidEncoder(levels=5, up_pass=True): 4kb -> 128kb U-Net style
    (reference `Encoder2`, orca_modules.py:984-1169; up_pass=False gives
    `Encoder2b`, :1173-1276).
  * PyramidEncoder(levels=3, up_pass=True): 128kb -> 1024kb
    (reference `Encoder3`, orca_modules.py:1279-1406).

The bp-resolution tower supports *blocked* execution: the input is split
into fixed-size chunks with a halo that covers the encoder's entire
receptive field (~104 kb < 112 kb halo), so blocked and monolithic execution
are mathematically identical. The reference runs these blocks in a
sequential Python loop (orca_modules.py:955-979); here they are a
`lax.map`/scan over a stacked block axis (one compiled program, bounded
memory) or sharded across devices (orca_tpu.parallel.sequence).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from orca_tpu.nn.core import (
    Block,
    BNUpdates,
    apply_block,
    conv_pair_1d,
    init_block,
)

# (cin, cout) and pre-pool for the 7 stages of the bp-resolution tower;
# pool product = 4*4*5*5*5*2 = 4000 bp/bin (orca_modules.py:811-927).
STAGES = (
    (4, 64, 0),
    (64, 96, 4),
    (96, 128, 4),
    (128, 128, 5),
    (128, 128, 5),
    (128, 128, 5),
    (128, 128, 2),
)
BIN_BP = 4000
# Radius of the tower's receptive field in bp: sum over stages of
# 16 * cumulative_pool (4 convs of k=9 per stage -> radius 16 bins).
RECEPTIVE_FIELD_BP = 104016


def encoder_tower_spec() -> dict:
    return {
        "lconv": [
            conv_pair_1d(ci, co, relu=False, pool=p) for ci, co, p in STAGES
        ],
        "conv": [conv_pair_1d(co, co, relu=True) for _, co, _ in STAGES],
    }


def init_encoder_tower(rng: jax.Array, dtype=jnp.float32) -> dict:
    spec = encoder_tower_spec()
    kl, kc = jax.random.split(rng)
    return {
        "lconv": [
            init_block(r, b, dtype)
            for r, b in zip(jax.random.split(kl, len(spec["lconv"])), spec["lconv"])
        ],
        "conv": [
            init_block(r, b, dtype)
            for r, b in zip(jax.random.split(kc, len(spec["conv"])), spec["conv"])
        ],
    }


def apply_encoder_stages(
    params: dict,
    x: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_updates: Optional[BNUpdates] = None,
    path: str = "",
) -> jax.Array:
    """Run the 7 residual stages on (N, L, 4); returns (N, L/4000, 128).

    Stage i+1 consumes ``conv_i(lconv_i(x)) + lconv_i(x)``, but the tower's
    return value is the final stage's conv output *without* the residual
    (orca_modules.py:948-950: ``out7 = self.conv7(lout7); return out7``).
    """
    spec = encoder_tower_spec()
    pre = f"{path}/" if path else ""
    out = x
    cout = x
    for i, (lb, lp, cb, cp) in enumerate(zip(
        spec["lconv"], params["lconv"], spec["conv"], params["conv"]
    )):
        lout = apply_block(lp, lb, out, train=train, rng=rng,
                           bn_updates=bn_updates, path=f"{pre}lconv/{i}")
        cout = apply_block(cp, cb, lout, train=train, rng=rng,
                           bn_updates=bn_updates, path=f"{pre}conv/{i}")
        out = cout + lout
    return cout


def apply_encoder_stages_masked(
    params: dict,
    x: jax.Array,
    valid_start_bp,
    valid_end_bp,
) -> jax.Array:
    """apply_encoder_stages over an extended array whose positions outside
    [valid_start_bp, valid_end_bp) are out-of-sequence.

    Zeroing the invalid region after *every* conv unit makes the extended
    computation bit-equivalent to the monolithic tower's per-layer zero
    padding at the true sequence boundary (a plain zero-padded input is NOT:
    conv biases propagate non-zeros into the pad region from layer 2 on).
    Both bounds must be multiples of 4000 (bin alignment guarantees pool
    windows never straddle the boundary). Inference-mode only.
    """
    from orca_tpu.ops import nn_ops
    from orca_tpu.nn.core import apply_unit

    spec = encoder_tower_spec()

    def mask(arr, res):
        idx = jnp.arange(arr.shape[1])
        m = (idx >= valid_start_bp // res) & (idx < valid_end_bp // res)
        return arr * m[None, :, None].astype(arr.dtype)

    def run_block(block_params, block, arr, res):
        if block.pool:
            arr = nn_ops.maxpool1d(arr, block.pool)
            res *= block.pool
        for p, u in zip(block_params, block.units):
            arr = mask(apply_unit(p, u, arr), res)
        return arr, res

    out = x
    cout = x
    res = 1
    for lb, lp, cb, cp in zip(
        spec["lconv"], params["lconv"], spec["conv"], params["conv"]
    ):
        lout, res = run_block(lp, lb, out, res)
        cout, _ = run_block(cp, cb, lout, res)
        out = cout + lout
    return cout


def apply_encoder_tower(
    params: dict,
    x: jax.Array,
    *,
    block_bp: Optional[int] = None,
    halo_bp: int = 112000,
    checkpoint_blocks: bool = False,
) -> jax.Array:
    """bp -> 4kb encoder forward with optional blocked execution.

    x: (N, L, 4) one-hot. May be int8/uint8: a 256Mb one-hot input is 4GB in
        fp32 but 1GB as int8; conversion to float happens per block so the
        full-precision sequence never materializes in HBM.
    block_bp: if set, process the sequence in chunks of this many bp with a
        `halo_bp` halo on each side (must both be multiples of 4000, and
        halo_bp >= RECEPTIVE_FIELD_BP for exact equivalence). Bounds peak
        activation memory at O(block) instead of O(L).
    """
    # match the parameter dtype (bf16 params select the fast MXU path)
    param_dtype = params["lconv"][0][0]["w"].dtype
    if param_dtype == jnp.bfloat16:
        compute_dtype = jnp.bfloat16
    elif x.dtype in (jnp.float32, jnp.bfloat16):
        compute_dtype = x.dtype
    else:
        compute_dtype = jnp.float32
    n, length, _ = x.shape
    if block_bp is None or length <= block_bp:
        return apply_encoder_stages(params, x.astype(compute_dtype))

    if block_bp % BIN_BP or halo_bp % BIN_BP or length % BIN_BP:
        raise ValueError(
            "block_bp, halo_bp and the sequence length must be multiples of "
            f"4000; got {block_bp=} {halo_bp=} {length=}"
        )
    nblocks = length // block_bp
    rem_bp = length - nblocks * block_bp
    halo_bins = halo_bp // BIN_BP
    block_bins = block_bp // BIN_BP

    # Zero-pad both ends by the halo, then every block sees
    # [i*B - halo, i*B + B + halo). The halo absorbs the receptive field at
    # interior block edges; at the true sequence ends, masked execution
    # (apply_encoder_stages_masked) reproduces the monolithic conv's
    # per-layer zero padding exactly.
    xp = jnp.pad(x, ((0, 0), (halo_bp, halo_bp), (0, 0)))

    def run_block(i):
        seg = lax.dynamic_slice_in_dim(xp, i * block_bp, block_bp + 2 * halo_bp, 1)
        # valid bp range inside the extended segment
        seg_start_global = i * block_bp - halo_bp
        valid_start = jnp.maximum(0, -seg_start_global)
        valid_end = jnp.minimum(seg.shape[1], length - seg_start_global)
        out = apply_encoder_stages_masked(
            params, seg.astype(compute_dtype), valid_start, valid_end
        )
        return lax.slice_in_dim(out, halo_bins, halo_bins + block_bins, axis=1)

    if checkpoint_blocks:
        run_block = jax.checkpoint(run_block)
    outs = lax.map(run_block, jnp.arange(nblocks))
    # (nblocks, N, block_bins, C) -> (N, nblocks*block_bins, C)
    outs = jnp.moveaxis(outs, 0, 1).reshape(n, nblocks * block_bins, -1)
    if rem_bp:
        # Partial tail block: [L - rem - halo, L + halo) of the padded array.
        tail = xp[:, nblocks * block_bp :, :]
        tail_out = apply_encoder_stages_masked(
            params, tail.astype(compute_dtype), halo_bp, halo_bp + rem_bp
        )
        outs = jnp.concatenate(
            [outs, tail_out[:, halo_bins:-halo_bins or None, :]], axis=1
        )
    return outs


# --------------------------------------------------------------------------
# Pyramid encoders (4kb->128kb and 128kb->1024kb)
# --------------------------------------------------------------------------


def pyramid_spec(levels: int, up_pass: bool) -> dict:
    spec = {
        "lblocks": [conv_pair_1d(128, 128, relu=False, pool=2) for _ in range(levels)],
        "blocks": [conv_pair_1d(128, 128, relu=True) for _ in range(levels)],
    }
    if up_pass:
        spec["downl"] = [
            conv_pair_1d(128, 128, relu=False, upsample=2) for _ in range(levels)
        ]
        # Up-pass active blocks lack BatchNorm on their second conv
        # (orca_modules.py:1114-1120) — load-bearing for checkpoint parity.
        spec["down"] = [
            conv_pair_1d(128, 128, relu=True, second_bn=False)
            for _ in range(levels)
        ]
    return spec


def init_pyramid(rng: jax.Array, levels: int, up_pass: bool, dtype=jnp.float32):
    spec = pyramid_spec(levels, up_pass)
    out = {}
    keys = jax.random.split(rng, len(spec))
    for key, (name, blocks) in zip(keys, spec.items()):
        out[name] = [
            init_block(r, b, dtype)
            for r, b in zip(jax.random.split(key, len(blocks)), blocks)
        ]
    return out


def apply_pyramid(
    params: dict,
    x: jax.Array,
    *,
    levels: int,
    up_pass: bool,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_updates: Optional[BNUpdates] = None,
    path: str = "",
) -> list:
    """Returns `levels+1` encodings, finest-first.

    With up_pass (Encoder2/3): U-Net — down pass halves resolution per level,
    up pass doubles it back, skip-adding the matching down encoding
    (orca_modules.py:1151-1169). Without (Encoder2b): raw down-pass encodings.
    """
    spec = pyramid_spec(levels, up_pass)
    pre = f"{path}/" if path else ""
    kw = dict(train=train, rng=rng, bn_updates=bn_updates)
    out = x
    encodings = [out]
    for i, (lb, lp, cb, cp) in enumerate(zip(
        spec["lblocks"], params["lblocks"], spec["blocks"], params["blocks"]
    )):
        lout = apply_block(lp, lb, out, path=f"{pre}lblocks/{i}", **kw)
        out = apply_block(cp, cb, lout, path=f"{pre}blocks/{i}", **kw) + lout
        encodings.append(out)
    if not up_pass:
        return encodings

    encodings2 = [out]
    for i, (enc, lb, lp, cb, cp) in enumerate(zip(
        reversed(encodings[:-1]),
        spec["downl"],
        params["downl"],
        spec["down"],
        params["down"],
    )):
        lout = apply_block(lp, lb, out, path=f"{pre}downl/{i}", **kw)
        out = apply_block(cp, cb, lout, path=f"{pre}down/{i}", **kw) + lout
        out = enc + out
        encodings2.append(out)
    encodings2.reverse()
    return encodings2
