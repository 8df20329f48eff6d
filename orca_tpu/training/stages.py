"""Three-stage training steps (jitted; data-parallel via sharded batch).

Mirrors the reference training pipeline (train/README.md):
  * stage a: integrated 1Mb `Net` on 1kb micro-C, masked log-fold MSE +
    BCE on 1D chromatin tracks, 50% reverse-complement augmentation
    (train_h1esc_a.py).
  * stage b: Encoder2 + 6 Decoders on 32Mb windows with the bp encoder and
    Decoder_1m frozen from stage a; random zoom cascade with detached
    (stop_gradient) coarse predictions (train_h1esc_b.py:198-266).
  * stage c: Encoder3 + 4 Decoders on 256Mb cross-chromosome samples with
    per-sample background normmats (train_h1esc_c.py:150-227).

Design deviations from the reference (documented, deliberate):
  * frozen towers run in inference mode (folded running stats), not
    train-mode BN under no_grad (train_h1esc_b.py:186-187) — deterministic
    and faster; the reference's frozen-encoder batch statistics were an
    artifact of DataParallel, not a modeling choice.
  * all module BN running stats are updated functionally and returned from
    the step (no hidden buffers).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orca_tpu.nn import decoders, encoders
from orca_tpu.nn.core import BNUpdates, merge_bn_updates
from orca_tpu.predict.multiscale import CascadeGeometry, GEOM_32M, GEOM_256M
from orca_tpu.training import losses, optim


@dataclasses.dataclass(frozen=True)
class StageAConfig:
    num_1d: Optional[int] = 32
    num_2d: int = 1  # output heads (multi-cell-type leukemia variants > 1)
    crop: int = 250  # output map bins
    target_factor: int = 4  # raw target bins per output bin (1kb -> 4kb)
    seq_len: int = 1_000_000
    momentum: float = 0.98
    remat: bool = True


def _align_heads(pred: jax.Array, num_2d: int) -> jax.Array:
    """(N, crop, crop, num_2d) channel-last prediction -> the target layout:
    (N, crop, crop) single-head, (N, num_2d, crop, crop) multi-head."""
    if num_2d == 1:
        return pred[..., 0]
    return jnp.moveaxis(pred, -1, 1)


def make_stage_a_step(cfg: StageAConfig):
    """Returns jitted step(params, opt_state, seq, target, target_1d, rng,
    lr, normmat_r, eps) -> (params, opt_state, metrics).

    seq: (N, L, 4); target: (N, crop*f, crop*f) raw balanced contacts
    ((N, num_2d, crop*f, crop*f) for multi-head models, one dataset per
    head — orca_leukemia-style training); target_1d: (N, crop, num_1d)
    binary tracks. normmat_r: (crop, crop) or (num_2d, crop, crop).
    """
    opt = optim.sgd(cfg.momentum)

    def loss_fn(params, seq, target, target_1d, rng, normmat_r, eps):
        bn = BNUpdates()
        out = decoders.apply_net(
            params, seq, num_1d=cfg.num_1d, num_2d=cfg.num_2d, train=True,
            rng=rng, bn_updates=bn, remat=cfg.remat,
        )
        pred, pred_1d = out if cfg.num_1d else (out, None)
        target_r = losses.downsample_nanmean(target, cfg.crop, cfg.target_factor)
        tlog = losses.log_fold_target(target_r, normmat_r, eps)
        loss2d = losses.masked_mse(_align_heads(pred, cfg.num_2d), tlog)
        loss1d = (
            losses.bce(pred_1d, target_1d) if cfg.num_1d else jnp.float32(0)
        )
        loss = loss2d + loss1d
        return loss, (bn.updates, {"loss2d": loss2d, "loss1d": loss1d})

    @jax.jit
    def step(params, opt_state, seq, target, target_1d, rng, lr, normmat_r,
             eps):
        rng_flip, rng_drop = jax.random.split(rng)
        # 50% reverse-complement augmentation (train_h1esc_a.py:136-139)
        flip = jax.random.bernoulli(rng_flip)
        seq = jnp.where(flip, jnp.flip(seq, axis=(1, 2)), seq)
        target = jnp.where(flip, jnp.flip(target, axis=(-2, -1)), target)
        if cfg.num_1d:
            target_1d = jnp.where(flip, jnp.flip(target_1d, axis=(1,)),
                                  target_1d)
        (loss, (bn_updates, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, seq, target, target_1d, rng_drop, normmat_r, eps)
        params, opt_state = optim.apply_sgd(opt, params, opt_state, grads, lr)
        bn = BNUpdates()
        bn.updates = bn_updates
        params = merge_bn_updates(params, bn)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    return opt, step


def stage_a_eval_metrics(params, cfg: StageAConfig, seq, target, target_1d,
                         normmat_r, eps):
    """Validation forward: returns (pearson r per sample, mse, bce)
    (train_h1esc_a.py:183-247)."""
    out = decoders.apply_net(params, seq, num_1d=cfg.num_1d,
                             num_2d=cfg.num_2d)
    pred, pred_1d = out if cfg.num_1d else (out, None)
    target_r = losses.downsample_nanmean(target, cfg.crop, cfg.target_factor)
    tlog = losses.log_fold_target(target_r, normmat_r, eps)
    aligned = _align_heads(pred, cfg.num_2d)
    mse = losses.masked_mse(aligned, tlog)
    corr = jax.vmap(losses.pearson_r)(
        aligned.reshape(pred.shape[0], -1),
        tlog.reshape(pred.shape[0], -1),
    )
    loss1d = losses.bce(pred_1d, target_1d) if cfg.num_1d else jnp.float32(0)
    return corr, mse, loss1d


# --------------------------------------------------------------------------
# Stage b: 1-32Mb (Encoder2 + 6 Decoders)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StageBConfig:
    geometry: CascadeGeometry = GEOM_32M
    levels: Tuple[int, ...] = (32, 16, 8, 4, 2, 1)
    momentum: float = 0.98
    encoder_block_bp: Optional[int] = 800_000
    up_pass: bool = True  # Encoder2 (True) or Encoder2b (HCTnoc variant)
    use_1pt: bool = True  # add frozen Decoder_1m head at level 1
    upsample_mode: str = "nearest"  # training decoders default (Decoder())
    # rematerialize each trainable decoder in the backward: without it the
    # six 28-block decoders' saved residuals alone exceed a 16GB chip at
    # production geometry (18.35G measured); with it only one decoder's
    # residuals are ever live (jax.checkpoint per level)
    remat: bool = True
    # multi-cell-type heads (leukemia variants: one dataset per head,
    # num_2d-channel decoders and distance encodings, orca_leukemia.py);
    # targets/normmats gain a (num_2d,) axis after batch/level
    num_2d: int = 1


def _distenc(normmat_j: jax.Array, n: int, crop: int,
             num_2d: int) -> jax.Array:
    """Per-level distance encoding -> (N, crop, crop, num_2d) channel-last
    (single-head normmats are (crop, crop); multi-head (num_2d, crop, crop))."""
    log_nm = jnp.log(normmat_j)
    if log_nm.ndim == 2:
        log_nm = log_nm[None]
    return jnp.broadcast_to(
        jnp.moveaxis(log_nm, 0, -1)[None], (n, crop, crop, num_2d)
    )


def make_stage_b_step(cfg: StageBConfig, encoder_fn=None):
    """Returns jitted step(trainable, frozen, opt_state, seq, target, rng,
    lr, normmats, epss) -> (trainable, opt_state, metrics).

    trainable = {"pyramid": ..., "decoders": {level: ...}};
    frozen = {"encoder": ..., "decoder_1pt": ...} (inference-folded).
    normmats: (n_levels, crop, crop) stacked coarse->fine; epss: (n_levels,).
    encoder_fn(params, seq): override the frozen bp->4kb encoder execution —
    e.g. orca_tpu.parallel.sequence.sharded_encoder_tower for a
    sequence-sharded mesh run.
    """
    opt = optim.sgd(cfg.momentum)
    geom = cfg.geometry
    crop, half = geom.crop, geom.half
    if encoder_fn is None:
        def encoder_fn(p, s):
            return encoders.apply_encoder_tower(
                p, s, block_bp=cfg.encoder_block_bp
            )

    def run_decoder(dec_params, enc_crop, distenc, coarse, rng_j, path):
        """One trainable decoder; cfg.remat checkpoints per BLOCK inside
        (see apply_decoder remat_blocks — whole-decoder checkpoints don't
        cap memory because the six levels' backwards overlap)."""
        local = BNUpdates()
        pred = decoders.apply_decoder(
            dec_params, enc_crop, distenc, coarse,
            num_2d=cfg.num_2d, upsample_mode=cfg.upsample_mode,
            train=True, rng=rng_j, bn_updates=local, path=path,
            remat_blocks=cfg.remat,
        )
        return pred, local.updates

    def cascade_loss(trainable, frozen, seq, target, rng, normmats, epss):
        bn = BNUpdates()
        feats = encoder_fn(frozen["encoder"], seq)
        encs = dict(zip(
            (1, 2, 4, 8, 16, 32),
            encoders.apply_pyramid(
                trainable["pyramid"], feats, levels=5, up_pass=cfg.up_pass,
                train=True, rng=rng, bn_updates=bn, path="pyramid",
            ),
        ))
        rngs = jax.random.split(rng, len(cfg.levels))
        start = jnp.int32(0)
        total = 0.0
        metrics = {}
        coarse = None
        for j, level in enumerate(cfg.levels):
            target_r = _dynamic_downsample(target, start, crop, level)
            distenc = _distenc(normmats[j], seq.shape[0], crop, cfg.num_2d)
            enc_crop = jax.lax.dynamic_slice_in_dim(
                encs[level], start // level, crop, axis=1
            )
            pred, dec_bn = run_decoder(
                trainable["decoders"][level], enc_crop, distenc, coarse,
                rngs[j], f"decoders/{level}",
            )
            bn.updates.update(dec_bn)
            if level == 1 and cfg.use_1pt and frozen.get("decoder_1pt") is not None:
                pred = pred + decoders.apply_decoder1m(
                    frozen["decoder_1pt"], enc_crop, num_2d=cfg.num_2d
                )
            tlog = losses.log_fold_target(target_r, normmats[j], epss[j])
            lvl_loss = losses.masked_mse(
                _align_heads(pred, cfg.num_2d), tlog
            )
            total = total + lvl_loss
            metrics[f"loss_{level}"] = lvl_loss
            # random zoom (train_h1esc_b.py:247-263), detached coarse pred
            r = jax.random.randint(rngs[j], (), 0, half)
            start = start + r * level
            coarse = jax.lax.stop_gradient(
                jax.lax.dynamic_slice(
                    pred, (0, r, r, 0),
                    (pred.shape[0], half, half, pred.shape[3]),
                )
            )
        return total, (bn.updates, metrics)

    @jax.jit
    def step(trainable, frozen, opt_state, seq, target, rng, lr, normmats,
             epss):
        (loss, (bn_updates, metrics)), grads = jax.value_and_grad(
            cascade_loss, has_aux=True
        )(trainable, frozen, seq, target, rng, normmats, epss)
        trainable, opt_state = optim.apply_sgd(
            opt, trainable, opt_state, grads, lr
        )
        bn = BNUpdates()
        bn.updates = bn_updates
        trainable = merge_bn_updates(trainable, bn)
        return trainable, opt_state, dict(metrics, loss=loss)

    return opt, step


def make_stage_b_eval(cfg: StageBConfig, encoder_fn=None):
    """Jitted validation forward at the reference's fixed zoom offsets
    (train_h1esc_b.py:465-476: start 0, then +63*32, then +62*level),
    returning per-level (mse, per-sample pearson r with the >30%-valid
    gate). Drives ReduceLROnPlateau in the trainer (the reference only
    prints these; wiring them into the scheduler is a deliberate upgrade).
    """
    geom = cfg.geometry
    crop, half = geom.crop, geom.half
    if encoder_fn is None:
        def encoder_fn(p, s):
            return encoders.apply_encoder_tower(
                p, s, block_bp=cfg.encoder_block_bp
            )

    @jax.jit
    def evaluate(trainable, frozen, seq, target, normmats, epss):
        feats = encoder_fn(frozen["encoder"], seq)
        encs = dict(zip(
            (1, 2, 4, 8, 16, 32),
            encoders.apply_pyramid(
                trainable["pyramid"], feats, levels=5, up_pass=cfg.up_pass,
            ),
        ))
        start = 0
        coarse = None
        mses, corrs = {}, {}
        for j, level in enumerate(cfg.levels):
            target_r = _dynamic_downsample(target, start, crop, level)
            distenc = _distenc(normmats[j], seq.shape[0], crop, cfg.num_2d)
            enc_crop = jax.lax.slice_in_dim(
                encs[level], start // level, start // level + crop, axis=1
            )
            pred = decoders.apply_decoder(
                trainable["decoders"][level], enc_crop, distenc, coarse,
                num_2d=cfg.num_2d, upsample_mode=cfg.upsample_mode,
            )
            if (level == 1 and cfg.use_1pt
                    and frozen.get("decoder_1pt") is not None):
                pred = pred + decoders.apply_decoder1m(
                    frozen["decoder_1pt"], enc_crop, num_2d=cfg.num_2d
                )
            tlog = losses.log_fold_target(target_r, normmats[j], epss[j])
            aligned = _align_heads(pred, cfg.num_2d)
            mses[level] = losses.masked_mse(aligned, tlog)
            corrs[level] = losses.pearson_r_per_sample(aligned, tlog)
            # fixed zoom offsets: 63 after the coarsest level, 62 after
            # the rest (train_h1esc_b.py:465-476), generalized to crop/2
            off = half // 2 + 1 if j == 0 else half // 2
            start = start + off * level
            coarse = pred[:, off : off + half, off : off + half, :]
        return mses, corrs

    return evaluate


def make_stage_c_eval(cfg: StageCConfig, encoder_fn=None):
    """Stage-c validation at the reference's fixed offsets
    (train_h1esc_c.py:406-412: +62*32 after the coarsest, then +63*factor),
    with per-sample background normmats. encoder_fn: see make_stage_b_step."""
    geom = cfg.geometry
    crop, half = geom.crop, geom.half
    if encoder_fn is None:
        def encoder_fn(p, s):
            return encoders.apply_encoder_tower(
                p, s, block_bp=cfg.encoder_block_bp
            )

    @jax.jit
    def evaluate(trainable, frozen, seq, target, normmat):
        feats = encoder_fn(frozen["encoder"], seq)
        enc128k = encoders.apply_pyramid(
            frozen["pyramid1"], feats, levels=5, up_pass=True
        )[-1]
        encs = dict(zip(
            (32, 64, 128, 256),
            encoders.apply_pyramid(
                trainable["pyramid"], enc128k, levels=3, up_pass=True,
            ),
        ))
        start = 0
        coarse = None
        mses, corrs = {}, {}
        for j, level in enumerate(cfg.levels):
            factor = geom.bins // (crop * 2**j)
            target_r = _dynamic_downsample(target, start, crop, factor)
            normmat_r = jax.vmap(
                lambda m: _dynamic_downsample(m[None], start, crop, factor)[0]
            )(normmat)
            distenc = jnp.log(normmat_r)[..., None]
            enc_crop = jax.lax.slice_in_dim(
                encs[level], start // factor, start // factor + crop, axis=1
            )
            pred = decoders.apply_decoder(
                trainable["decoders"][level], enc_crop, distenc, coarse,
                upsample_mode=cfg.upsample_mode,
            )
            eps = jnp.nanmin(normmat_r)
            tlog = losses.log_fold_target(target_r, normmat_r, eps)
            mses[level] = losses.masked_mse(pred[..., 0], tlog,
                                            normalize="full_count")
            corrs[level] = losses.pearson_r_per_sample(pred[..., 0], tlog)
            # fixed offsets: 62 after the coarsest, 63 after the rest
            # (train_h1esc_c.py:406-412)
            off = half // 2 if j == 0 else half // 2 + 1
            start = start + off * factor
            coarse = pred[:, off : off + half, off : off + half, :]
        return mses, corrs

    return evaluate


def _dynamic_downsample(target: jax.Array, start, crop: int, factor: int):
    """NaN-aware block mean of target[..., start:start+crop*f, start:...]
    with a dynamic start (in-jit version of train_h1esc_b.py:200-208).
    Leading axes (batch, multi-head datasets) pass through."""
    n = crop * factor
    lead = target.shape[:-2]
    sl = jax.lax.dynamic_slice(
        target, (0,) * len(lead) + (start, start), (*lead, n, n)
    )
    return losses.downsample_nanmean(sl, crop, factor)


# --------------------------------------------------------------------------
# Stage c: 32-256Mb (Encoder3 + 4 Decoders, per-sample normmats)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StageCConfig:
    geometry: CascadeGeometry = GEOM_256M
    levels: Tuple[int, ...] = (256, 128, 64, 32)
    momentum: float = 0.98
    encoder_block_bp: Optional[int] = 800_000
    upsample_mode: str = "nearest"
    remat: bool = True  # see StageBConfig.remat


def make_stage_c_step(cfg: StageCConfig, encoder_fn=None):
    """Returns jitted step(trainable, frozen, opt_state, seq, target,
    normmat, rng, lr) -> (trainable, opt_state, metrics).

    trainable = {"pyramid": Encoder3 params, "decoders": {level: ...}};
    frozen = {"encoder": ..., "pyramid1": ...}; normmat: (N, bins, bins)
    per-sample background (NaNs pre-filled by the sampler).
    encoder_fn: see make_stage_b_step (sequence-sharded mesh override).
    """
    opt = optim.sgd(cfg.momentum)
    geom = cfg.geometry
    crop, half = geom.crop, geom.half
    if encoder_fn is None:
        def encoder_fn(p, s):
            return encoders.apply_encoder_tower(
                p, s, block_bp=cfg.encoder_block_bp
            )

    def run_decoder(dec_params, enc_crop, distenc, coarse, rng_j, path):
        """See make_stage_b_step.run_decoder: per-block remat inside."""
        local = BNUpdates()
        pred = decoders.apply_decoder(
            dec_params, enc_crop, distenc, coarse,
            upsample_mode=cfg.upsample_mode, train=True, rng=rng_j,
            bn_updates=local, path=path, remat_blocks=cfg.remat,
        )
        return pred, local.updates

    def cascade_loss(trainable, frozen, seq, target, normmat, rng):
        bn = BNUpdates()
        feats = encoder_fn(frozen["encoder"], seq)
        enc128k = encoders.apply_pyramid(
            frozen["pyramid1"], feats, levels=5, up_pass=True
        )[-1]
        encs = dict(zip(
            (32, 64, 128, 256),
            encoders.apply_pyramid(
                trainable["pyramid"], enc128k, levels=3, up_pass=True,
                train=True, rng=rng, bn_updates=bn, path="pyramid",
            ),
        ))
        rngs = jax.random.split(rng, len(cfg.levels))
        start = jnp.int32(0)
        total = 0.0
        metrics = {}
        coarse = None
        for j, level in enumerate(cfg.levels):
            factor = geom.bins // (crop * 2**j)
            target_r = _dynamic_downsample(target, start, crop, factor)
            normmat_r = jax.vmap(
                lambda m: _dynamic_downsample(m[None], start, crop, factor)[0]
            )(normmat)
            distenc = jnp.log(normmat_r)[..., None]
            enc_crop = jax.lax.dynamic_slice_in_dim(
                encs[level], start // factor, crop, axis=1
            )
            pred, dec_bn = run_decoder(
                trainable["decoders"][level], enc_crop, distenc, coarse,
                rngs[j], f"decoders/{level}",
            )
            bn.updates.update(dec_bn)
            eps = jnp.nanmin(normmat_r)
            tlog = losses.log_fold_target(target_r, normmat_r, eps)
            lvl_loss = losses.masked_mse(pred[..., 0], tlog,
                                         normalize="full_count")
            total = total + lvl_loss
            metrics[f"loss_{level}"] = lvl_loss
            r = jax.random.randint(rngs[j], (), 0, half)
            start = start + r * factor
            coarse = jax.lax.stop_gradient(
                jax.lax.dynamic_slice(
                    pred, (0, r, r, 0),
                    (pred.shape[0], half, half, pred.shape[3]),
                )
            )
        return total, (bn.updates, metrics)

    @jax.jit
    def step(trainable, frozen, opt_state, seq, target, normmat, rng, lr):
        (loss, (bn_updates, metrics)), grads = jax.value_and_grad(
            cascade_loss, has_aux=True
        )(trainable, frozen, seq, target, normmat, rng)
        trainable, opt_state = optim.apply_sgd(
            opt, trainable, opt_state, grads, lr
        )
        bn = BNUpdates()
        bn.updates = bn_updates
        trainable = merge_bn_updates(trainable, bn)
        return trainable, opt_state, dict(metrics, loss=loss)

    return opt, step
