"""Orca 2D decoders and the integrated 1Mb model, TPU-native.

  * `decoder_*`: per-level pairwise decoder with distance encoding and
    optional coarse-prediction refinement (reference `Decoder`,
    orca_modules.py:16-488). `num_2d` generalizes the output heads to the
    multi-cell-type variants (orca_leukemia.py:426-431).
  * `decoder1m_*`: the simpler 19-block decoder used by the 1Mb model
    (reference `Decoder_1m`, orca_modules.py:491-800).
  * `net_*`: integrated 1Mb model = encoder tower + decoder1m 2D stack +
    optional 1D chromatin-track head (reference `Net`,
    orca_modules.py:1409-1901).

All 2D work is NHWC on 250x250 maps with 32..128 channels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from jax import lax

from orca_tpu.nn.core import (
    Block,
    BNUpdates,
    Unit,
    apply_block,
    conv_pair_2d,
    init_block,
)
from orca_tpu.nn import encoders
from orca_tpu.ops import nn_ops

# Dilation schedules (orca_modules.py): Decoder uses 4 groups of
# (1,2,4,8,16,32,64); Decoder_1m/Net use 1 group of 7 then 2 groups of 6.
DILATIONS_DECODER = (1, 2, 4, 8, 16, 32, 64) * 4
DILATIONS_1M = (1, 2, 4, 8, 16, 32, 64) + (2, 4, 8, 16, 32, 64) * 2


def pairwise(x: jax.Array) -> jax.Array:
    """(N, L, C) -> (N, L, L, C) outer sum: mat[i,j] = x[i] + x[j].

    Matches reference `x[:,:,:,None] + x[:,:,None,:]` in NCHW
    (orca_modules.py:462) transposed to NHWC.
    """
    return x[:, :, None, :] + x[:, None, :, :]


def _head_block(num_2d: int) -> Block:
    cmid = max(num_2d, 5)
    return Block(
        units=(
            Unit(2, 64, cmid, k=1, bn=True, relu=True),
            Unit(2, cmid, num_2d, k=1, bn=False),
        )
    )


def decoder_spec(num_2d: int = 1) -> dict:
    twos = [
        conv_pair_2d(64, 32, 64, d, relu=False, dropout=0.1 if i == 0 else 0.0)
        for i, d in enumerate(DILATIONS_DECODER)
    ]
    twos_relu = [conv_pair_2d(64, 32, 64, d, relu=True) for d in DILATIONS_DECODER]
    return {
        "lcombinerD": Block(
            units=(
                Unit(2, 128 + num_2d, 64, k=3),
                Unit(2, 64, 64, k=3),
            )
        ),
        "combinerD": Block(
            units=(Unit(2, 64, 64, k=3, relu=True), Unit(2, 64, 64, k=3, relu=True))
        ),
        "lcombiner": Block(
            units=(
                Unit(2, 64 + num_2d, 64, k=3, dropout=0.1),
                Unit(2, 64, 64, k=3),
            )
        ),
        "combiner": Block(
            units=(Unit(2, 64, 64, k=3, relu=True), Unit(2, 64, 64, k=3, relu=True))
        ),
        "lconvtwos": twos,
        "convtwos": twos_relu,
        "final": _head_block(num_2d),
    }


def init_decoder(rng, num_2d: int = 1, dtype=jnp.float32) -> dict:
    return _init_from_spec(rng, decoder_spec(num_2d), dtype)


def _init_from_spec(rng, spec, dtype):
    params = {}
    keys = jax.random.split(rng, len(spec))
    for key, (name, node) in zip(keys, spec.items()):
        if name.startswith("_"):
            continue
        if isinstance(node, Block):
            params[name] = init_block(key, node, dtype)
        else:
            params[name] = [
                init_block(r, b, dtype)
                for r, b in zip(jax.random.split(key, len(node)), node)
            ]
    return params


def _scan_repeated_groups(cur, lparams, cparams, lblocks, cblocks,
                          group_len: int, first_flags=None):
    """Run trailing dilation groups as a `lax.scan` over stacked params.

    The reference decoders repeat an identical sub-schedule of dilations
    (orca_modules.py:36-460: 4x(1..64) for Decoder, 2x(2..64) after the
    first 7 blocks of Decoder_1m). Scanning those groups compiles the group
    body ONCE instead of inlining it per repeat — cutting the dominant
    per-decoder graph roughly in half (cold-compile fix). Inference-mode
    only: params are stacked per call (free under jit), so checkpoints and
    the train-mode unrolled path are unchanged.

    first_flags: optional (n_groups,) 0/1 scalars gating the residual add
    of each group's FIRST l-block (`r + flag*c`). The no-coarse decoder's
    very first block is the one block without a residual
    (orca_modules.py:480: `cur = lconvtwos[0](mat)`), so passing
    [0, 1, 1, ...] lets ALL groups share one scan body instead of
    unrolling group 0 — the unrolled first group dominated the fp32
    cold compile (measured 100.3s -> scan-body cost; exact numerics:
    1.0*c == c and r + 0.0*c == r bitwise).
    """
    n_groups = len(lparams) // group_len
    group_trees = [
        (lparams[g * group_len : (g + 1) * group_len],
         cparams[g * group_len : (g + 1) * group_len])
        for g in range(n_groups)
    ]
    groups = jax.tree.map(lambda *xs: jnp.stack(xs), *group_trees)
    if first_flags is not None:
        groups = (groups, jnp.asarray(first_flags, cur.dtype))

    def body(c, gp):
        if first_flags is not None:
            (lps, cps), flag = gp
        else:
            (lps, cps), flag = gp, None
        for j in range(group_len):
            r = apply_block(lps[j], lblocks[j], c)
            c = r + (flag * c if (j == 0 and flag is not None) else c)
            c = apply_block(cps[j], cblocks[j], c) + c
        return c, None

    cur, _ = lax.scan(body, cur, groups)
    return cur


def _upsample_coarse(y: jax.Array, mode: str) -> jax.Array:
    if mode == "bilinear":
        return nn_ops.upsample2d_bilinear(y, 2)
    return nn_ops.upsample2d_nearest(y, 2)


def symmetrize(m: jax.Array) -> jax.Array:
    """0.5*(M + M^T) over the two spatial axes of NHWC."""
    return 0.5 * m + 0.5 * jnp.swapaxes(m, 1, 2)


def apply_decoder(
    params: dict,
    x: jax.Array,
    distenc: jax.Array,
    y: Optional[jax.Array] = None,
    *,
    num_2d: int = 1,
    upsample_mode: str = "bilinear",
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_updates: Optional[BNUpdates] = None,
    path: str = "",
    remat_blocks: bool = False,
) -> jax.Array:
    """Per-level decoder forward (reference Decoder.forward,
    orca_modules.py:461-488).

    x: (N, 250, 128) encoding crop; distenc: (N, 250, 250, num_2d) log
    background; y: optional (N, 125, 125, num_2d) coarse prediction from the
    parent level. Returns (N, 250, 250, num_2d) symmetric map.

    remat_blocks (training): jax.checkpoint every block, saving only each
    block's 15.6MB input for the backward. Decisive at production
    geometry: the six cascade decoders' backwards are data-independent
    (stop_gradient coarse), so XLA overlaps them — with full residuals
    that is ~6 x 2.6GB and a whole-decoder checkpoint doesn't help (the
    six recomputes overlap the same way); per-block granularity caps the
    overlap at 6 x ~0.5GB of saved inputs.
    """
    spec = decoder_spec(num_2d)
    pre = f"{path}/" if path else ""
    kw = dict(train=train, rng=rng, bn_updates=bn_updates)

    if train and remat_blocks:
        def _ckblock(p, b, cur, bpath):
            def f(p, cur):
                local = BNUpdates()
                out = apply_block(p, b, cur, train=True, rng=rng,
                                  bn_updates=local, path=bpath)
                return out, local.updates

            out, upd = jax.checkpoint(f)(p, cur)
            if bn_updates is not None:
                bn_updates.updates.update(upd)
            return out

        def apply_block_(p, b, cur, path, **_kw):  # noqa: ANN001
            return _ckblock(p, b, cur, path)
    else:
        def apply_block_(p, b, cur, path, **kw2):
            return apply_block(p, b, cur, path=path, **kw2)

    distenc = distenc.astype(x.dtype)
    if y is not None:
        y = y.astype(x.dtype)
    mat = jnp.concatenate([pairwise(x), distenc], axis=-1)
    mat = apply_block_(params["lcombinerD"], spec["lcombinerD"], mat,
                       f"{pre}lcombinerD", **kw)
    mat = apply_block_(params["combinerD"], spec["combinerD"], mat,
                       f"{pre}combinerD", **kw) + mat

    if y is not None:
        mat = jnp.concatenate([mat, _upsample_coarse(y, upsample_mode)], axis=-1)
    cur = mat
    group_len = 7  # the dilation schedule repeats in groups of 7
    # Inference: scan the identical groups (no per-block BN-update
    # collection or dropout rngs needed). Without a coarse pred all 4
    # groups share one scan body (group 0's missing first residual is a
    # 0/1 flag — see _scan_repeated_groups); with one, the combiner pair
    # replaces block 0, so the first group stays unrolled.
    if train:
        n_unroll = len(spec["lconvtwos"])
    elif y is None:
        n_unroll = 0
    else:
        n_unroll = group_len
    for i in range(n_unroll):
        lb, lp = spec["lconvtwos"][i], params["lconvtwos"][i]
        cb, cp = spec["convtwos"][i], params["convtwos"][i]
        if i == 0:
            if y is not None:
                # With a coarse pred, the first dilation block is replaced by
                # the combiner pair (orca_modules.py:472-478).
                cur = apply_block_(params["lcombiner"], spec["lcombiner"],
                                   cur, f"{pre}lcombiner", **kw)
                cur = (
                    apply_block_(params["combiner"], spec["combiner"], cur,
                                 f"{pre}combiner", **kw)
                    + cur
                )
            else:
                cur = apply_block_(lp, lb, cur, f"{pre}lconvtwos/{i}", **kw)
                cur = apply_block_(cp, cb, cur, f"{pre}convtwos/{i}",
                                   **kw) + cur
        else:
            cur = apply_block_(lp, lb, cur, f"{pre}lconvtwos/{i}", **kw) + cur
            cur = apply_block_(cp, cb, cur, f"{pre}convtwos/{i}", **kw) + cur
    if n_unroll < len(spec["lconvtwos"]):
        cur = _scan_repeated_groups(
            cur,
            params["lconvtwos"][n_unroll:], params["convtwos"][n_unroll:],
            spec["lconvtwos"][n_unroll : n_unroll + group_len],
            spec["convtwos"][n_unroll : n_unroll + group_len],
            group_len,
            first_flags=(
                [0.0] + [1.0] * (len(spec["lconvtwos"]) // group_len - 1)
                if n_unroll == 0 else None
            ),
        )
    cur = apply_block_(params["final"], spec["final"], cur,
                       f"{pre}final", **kw)
    return symmetrize(cur)


# --------------------------------------------------------------------------
# Decoder_1m — 19-block decoder over the raw 128ch pairwise map
# --------------------------------------------------------------------------


def decoder1m_spec(num_2d: int = 1) -> dict:
    twos = [
        conv_pair_2d(
            128 if i == 0 else 64, 32, 64, d,
            relu=False, dropout=0.1 if i == 0 else 0.0,
        )
        for i, d in enumerate(DILATIONS_1M)
    ]
    twos_relu = [conv_pair_2d(64, 32, 64, d, relu=True) for d in DILATIONS_1M]
    return {"lconvtwos": twos, "convtwos": twos_relu, "final": _head_block(num_2d)}


def init_decoder1m(rng, num_2d: int = 1, dtype=jnp.float32) -> dict:
    return _init_from_spec(rng, decoder1m_spec(num_2d), dtype)


def apply_decoder1m_mat(
    params: dict,
    mat: jax.Array,
    *,
    num_2d: int = 1,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_updates: Optional[BNUpdates] = None,
    path: str = "",
) -> jax.Array:
    """2D stack over an already-built pairwise map (N, 250, 250, 128)."""
    spec = decoder1m_spec(num_2d)
    pre = f"{path}/" if path else ""
    kw = dict(train=train, rng=rng, bn_updates=bn_updates)
    cur = mat
    # The 19-block schedule is 7 blocks then 2 identical groups of 6
    # (DILATIONS_1M); inference scans the trailing groups (see
    # _scan_repeated_groups).
    group_len = 6
    n_unroll = 7 if not train else len(spec["lconvtwos"])
    for i in range(n_unroll):
        lb, lp = spec["lconvtwos"][i], params["lconvtwos"][i]
        cb, cp = spec["convtwos"][i], params["convtwos"][i]
        lout = apply_block(lp, lb, cur, path=f"{pre}lconvtwos/{i}", **kw)
        # First block maps 128->64 channels, so no residual on the l-branch
        # (orca_modules.py:787-798).
        cur = lout if i == 0 else lout + cur
        cur = apply_block(cp, cb, cur, path=f"{pre}convtwos/{i}", **kw) + cur
    if n_unroll < len(spec["lconvtwos"]):
        cur = _scan_repeated_groups(
            cur,
            params["lconvtwos"][n_unroll:], params["convtwos"][n_unroll:],
            spec["lconvtwos"][n_unroll : n_unroll + group_len],
            spec["convtwos"][n_unroll : n_unroll + group_len],
            group_len,
        )
    cur = apply_block(params["final"], spec["final"], cur,
                      path=f"{pre}final", **kw)
    return symmetrize(cur)


def apply_decoder1m(params: dict, x: jax.Array, **kwargs) -> jax.Array:
    """(N, 250, 128) encoding -> (N, 250, 250, num_2d) map."""
    return apply_decoder1m_mat(params, pairwise(x), **kwargs)


# --------------------------------------------------------------------------
# Net — integrated 1Mb model
# --------------------------------------------------------------------------


def final1d_spec(num_1d: int) -> Block:
    return Block(
        units=(
            Unit(1, 128, 128, k=1, bn=True, relu=True),
            Unit(1, 128, num_1d, k=1, bn=False, sigmoid=True),
        )
    )


def init_net(rng, num_1d: Optional[int] = None, num_2d: int = 1,
             dtype=jnp.float32) -> dict:
    ke, kd, k1 = jax.random.split(rng, 3)
    params = {
        "encoder": encoders.init_encoder_tower(ke, dtype),
        "decoder": init_decoder1m(kd, num_2d, dtype),
    }
    if num_1d:
        params["final_1d"] = init_block(k1, final1d_spec(num_1d), dtype)
    return params


def apply_net(
    params: dict,
    x: jax.Array,
    *,
    num_1d: Optional[int] = None,
    num_2d: int = 1,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    bn_updates: Optional[BNUpdates] = None,
    remat: bool = False,
):
    """1Mb model forward: (N, 1e6, 4) -> ((N, 250, 250, num_2d), (N, 250, num_1d)?).

    With remat=True the encoder and 2D stack are wrapped in jax.checkpoint,
    mirroring the reference's 4-segment torch checkpointing
    (orca_modules.py:1862-1895) via XLA rematerialization.

    x may be packed quarter-scale uint8 one-hot (the input pipeline's wire
    format, nn.encoders.to_compute_dtype) — expanded on device here.
    """
    param_dtype = params["encoder"]["lconv"][0][0]["w"].dtype
    if x.dtype == jnp.uint8:
        compute = (
            param_dtype if param_dtype == jnp.bfloat16 else jnp.float32
        )
        x = encoders.to_compute_dtype(x, compute)
    elif param_dtype == jnp.bfloat16 and x.dtype == jnp.float32:
        # bf16 serving: follow the parameter dtype (fast MXU path)
        x = x.astype(jnp.bfloat16)
    kw = dict(train=train, rng=rng)

    # BN running-stat updates are returned as explicit outputs of the
    # checkpointed segments (side-collected tracers may not escape
    # jax.checkpoint), then merged into the caller's collector.
    def run_encoder(p, x):
        local = BNUpdates() if bn_updates is not None else None
        out = encoders.apply_encoder_stages(
            p, x, bn_updates=local, path="encoder", **kw
        )
        return out, (local.updates if local else {})

    def run_decoder(p, mat):
        local = BNUpdates() if bn_updates is not None else None
        out = apply_decoder1m_mat(
            p, mat, num_2d=num_2d, bn_updates=local, path="decoder", **kw
        )
        return out, (local.updates if local else {})

    if remat:
        run_encoder = jax.checkpoint(run_encoder)
        run_decoder = jax.checkpoint(run_decoder)

    out7, enc_updates = run_encoder(params["encoder"], x)
    pred, dec_updates = run_decoder(params["decoder"], pairwise(out7))
    if bn_updates is not None:
        bn_updates.updates.update(enc_updates)
        bn_updates.updates.update(dec_updates)
    if num_1d:
        out1d = apply_block(params["final_1d"], final1d_spec(num_1d), out7,
                            path="final_1d", bn_updates=bn_updates, **kw)
        return pred, out1d
    return pred
