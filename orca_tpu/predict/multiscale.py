"""Multiscale zoom-in prediction cascades (TPU-jitted).

The reference implements the cascade as a host loop of torch calls with
shape-changing crops (orca_predict.py:231-540 `genomepredict`, :543-878
`genomepredict_256Mb`). Here the entire cascade — forward and
reverse-complement passes, zoom-index arithmetic, per-level decoding and
fwd/RC averaging — is a single jitted program per model with static shapes:
crops are `lax.dynamic_slice` with traced start indices, so any zoom target
reuses one compilation.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from orca_tpu.models.zoo import (
    LEVELS_32M,
    LEVELS_256M,
    Model256MBundle,
    ModelBundle,
)
from orca_tpu.nn import decoders, encoders
from orca_tpu.utils.config import get_config

BINS = 8000  # 4kb bins in a 32Mb window; 32kb bins in a 256Mb window
CROP = 250
HALF = 125


@dataclasses.dataclass(frozen=True)
class CascadeGeometry:
    """Static shape parameters of a zoom cascade.

    The production values reproduce the reference exactly (window 32Mb at
    4kb bins / 256Mb at 32kb bins, 250-bin decoder crops); smaller
    geometries let the identical cascade logic run in CPU tests.
    """

    window_bp: int = 32_000_000
    bin_bp: int = 4000  # finest-level bin size in bp
    crop: int = 250  # decoder input size in bins

    @property
    def bins(self) -> int:
        return self.window_bp // self.bin_bp

    @property
    def half(self) -> int:
        return self.crop // 2

    def span_bp(self, m: int) -> int:
        """Window span of a level whose bins are `m` finest bins wide."""
        return self.crop * self.bin_bp * m


GEOM_32M = CascadeGeometry(32_000_000, 4000, 250)
GEOM_256M = CascadeGeometry(256_000_000, 32000, 250)


def _device_sequence(sequence) -> jax.Array:
    """Pack a float one-hot for transfer when exactly representable as
    quarter-scale uint8 ({0, 0.25, 1} values — always true for sequences
    from the genome/retrieval layer): 16x less host->device traffic.
    Arbitrary float inputs pass through unchanged."""
    arr = np.asarray(sequence)
    if arr.dtype == np.uint8:
        return jnp.asarray(arr)
    q = arr * 4
    if q.size and q.min() >= 0 and q.max() <= 255 and np.all(q == np.round(q)):
        return jnp.asarray(q.astype(np.uint8))
    return jnp.asarray(arr)


def _encode_32mb(bundle: ModelBundle, seq: jax.Array,
                 mesh=None) -> Dict[int, jax.Array]:
    """One-hot (1, L, 4) -> encodings at levels 1..32 (finest L/4000 bins).

    With a mesh, the bp-resolution tower (>=95% of the FLOPs) runs
    sequence-sharded across its 'seq' axis with ppermute halo exchange; the
    per-shard encoding tiles are then merged by an all-gather (the
    replication constraint below) so the tiny pyramid/cascade run
    replicated. The reference's equivalent is a *sequential* block loop on
    one device (orca_modules.py:955-979).
    """
    cfg = get_config()
    if mesh is None:
        # blocking left to the tower: the fused-Pallas path picks
        # cfg.pallas_block_bp (4Mb) blocks, the XLA path cfg.encoder_block_bp.
        feats = encoders.apply_encoder_tower(
            bundle.encoder, seq, halo_bp=cfg.encoder_halo_bp,
        )
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from orca_tpu.parallel.sequence import sharded_encoder_tower

        feats = sharded_encoder_tower(
            bundle.encoder, seq, mesh, halo_bp=cfg.encoder_halo_bp,
        )
        # all-gather the per-shard encoding tiles (8000x128 — a few MB)
        feats = jax.lax.with_sharding_constraint(
            feats, NamedSharding(mesh, P())
        )
    encs = encoders.apply_pyramid(
        bundle.pyramid, feats, levels=5, up_pass=bundle.pyramid_up_pass
    )
    return {lv: e for lv, e in zip((1, 2, 4, 8, 16, 32), encs)}


def _zoom_start_index(geom: CascadeGeometry, m: int, mpos, wpos, start_bins,
                      rc: bool):
    """Zoom-window start in [0, half]; `m` is the level's bin size in finest
    bins. Reference formulas (orca_predict.py:470-497) with 1e6*level/4 ==
    span/4 and 16e6 == window/2 generalized."""
    span4 = geom.span_bp(m) / 4.0
    halfwin = geom.window_bp / 2.0
    binw = float(geom.bin_bp)
    if not rc:
        raw = jnp.floor(
            ((mpos - span4) - (wpos - halfwin + start_bins * binw)) / (binw * m)
        )
    else:
        raw = jnp.ceil(
            ((wpos + halfwin - start_bins * binw) - (mpos + span4)) / (binw * m)
        )
    return jnp.clip(raw, 0, geom.half).astype(jnp.int32)


def _vmap_crop_1d(enc: jax.Array, starts: jax.Array, size: int) -> jax.Array:
    """Per-row dynamic crop along axis 1: (B, L, C), (B,) -> (B, size, C)."""
    return jax.vmap(
        lambda e, s: lax.dynamic_slice_in_dim(e, s, size, axis=0)
    )(enc, starts)


def _vmap_crop_2d(pred: jax.Array, starts: jax.Array, size: int) -> jax.Array:
    """Per-row dynamic square crop: (B, H, W, C), (B,) -> (B, size, size, C)."""
    return jax.vmap(
        lambda p, s: lax.dynamic_slice(
            p, (s, s, 0), (size, size, p.shape[2])
        )
    )(pred, starts)


@partial(jax.jit, static_argnums=(1, 3))
def _encode_32mb_jit(bundle: ModelBundle, geom: CascadeGeometry, seq,
                     mesh=None):
    """Encoder + pyramid for the orientation-batched input; one program."""
    seq2 = jnp.concatenate([seq, jnp.flip(seq, axis=(1, 2))], axis=0)
    encs = _encode_32mb(bundle, seq2, mesh=mesh)
    return tuple(encs[lv] for lv in (1, 2, 4, 8, 16, 32))


@partial(jax.jit, static_argnums=(2,))
def _crop_rows_jit(enc, starts, size: int):
    return _vmap_crop_1d(enc, starts, size)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _decode_level_jit(dec_params, dec_1pt, enc_crop,
                      geom: CascadeGeometry, upsample_mode: str, num_2d: int,
                      level, log_nm, start_bins, mpos, wpos, coarse):
    """One decoder level of the orientation-batched cascade.

    `enc_crop` is pre-cropped to (B, crop, 128) so every level shares one
    compiled program per (coarse?, 1pt?) variant; `level` is a traced
    scalar. Rows [0, B/2) are the forward pass, [B/2, B)
    reverse-complement. Returns (pred, next start_bins, next coarse).
    """
    b = enc_crop.shape[0]
    n = b // 2
    if log_nm.ndim == 2:
        log_nm = log_nm[:, :, None]
    else:
        log_nm = jnp.moveaxis(log_nm, 0, -1)
    distenc = jnp.broadcast_to(
        log_nm[None], (b, geom.crop, geom.crop, num_2d)
    )
    pred = decoders.apply_decoder(
        dec_params, enc_crop, distenc, coarse,
        num_2d=num_2d, upsample_mode=upsample_mode,
    )
    if dec_1pt is not None:
        pred = pred + decoders.apply_decoder1m(
            dec_1pt, enc_crop, num_2d=num_2d
        )
    si_fwd = _zoom_start_index(geom, level, mpos, wpos, start_bins[:n],
                               rc=False)
    si_rc = _zoom_start_index(geom, level, mpos, wpos, start_bins[n:],
                              rc=True)
    start_index = jnp.concatenate([si_fwd, si_rc])
    next_start = start_bins + start_index * level
    coarse_next = _vmap_crop_2d(pred, start_index, geom.half)
    return pred, next_start, coarse_next


@jax.jit
def _combine_orientations(pred):
    n = pred.shape[0] // 2
    return (
        0.5 * pred[:n] + 0.5 * jnp.flip(pred[n:], axis=(1, 2))
    ).astype(jnp.float32)


def _cascade_32mb(bundle: ModelBundle, geom: CascadeGeometry, seq, mpos, wpos,
                  log_normmats, mesh=None):
    """Full fwd+RC cascade; returns (stacked (6,N,crop,crop,C), starts (6,)).

    Both orientations run as one batch with per-row zoom starts (the fwd/RC
    formulas differ, orca_predict.py:470-497); the 32Mb distance encoding is
    symmetric under the RC flip so both halves share it. Orchestrated as a
    host loop over small shared jit programs (encoder; one decoder program
    per coarse/1pt variant, cropped inputs so all levels share it) — data
    stays on device between levels, and nothing recompiles across levels,
    models, or zoom targets.
    """
    n = seq.shape[0]
    encs = dict(zip((1, 2, 4, 8, 16, 32),
                    _encode_32mb_jit(bundle, geom, seq, mesh)))
    lvl_list = sorted(bundle.decoders, reverse=True)  # [32, 16, ..., 1]
    preds = []
    starts = []
    start_bins = jnp.zeros((2 * n,), jnp.int32)
    coarse = None
    mpos = jnp.float32(mpos)
    wpos = jnp.float32(wpos)
    for j, level in enumerate(lvl_list):
        dec_1pt = (
            bundle.decoder_1pt
            if (level == 1 and bundle.decoder_1pt is not None)
            else None
        )
        starts.append(start_bins[:n])
        enc_crop = _crop_rows_jit(encs[level], start_bins // level, geom.crop)
        pred, start_bins, coarse = _decode_level_jit(
            bundle.decoders[level], dec_1pt, enc_crop, geom,
            bundle.upsample_mode, bundle.num_2d, jnp.int32(level),
            log_normmats[j], start_bins, mpos, wpos, coarse,
        )
        preds.append(pred)
    out = [_combine_orientations(p) for p in preds]
    return jnp.stack(out), jnp.stack([s[0] for s in starts])


def warmup_cascade_32m(bundle: ModelBundle,
                       geom: CascadeGeometry = GEOM_32M,
                       n: int = 1, mesh=None, seq_dtype=jnp.uint8) -> float:
    """Compile the 32Mb cascade's shared jit programs CONCURRENTLY.

    A first `_cascade_32mb` call compiles its programs one after another
    (encoder, then each decoder variant), so time-to-first-prediction is
    their SUM — and on the axon backend every process pays it (persistent
    compile cache unsupported, docs/ARCHITECTURE.md). The programs are
    independent, so this warms them from a thread pool and the wall cost
    is ~the largest single program. Dummy inputs match every production
    shape/dtype (packed-uint8 sequence, param-dtype activations), so
    subsequent predictions with `n` windows recompile nothing. Returns
    elapsed seconds.
    """
    import concurrent.futures as cf

    t0 = time.time()
    pdt = jax.tree.leaves(bundle.encoder)[0].dtype
    b = 2 * n
    row = jnp.asarray(np.asarray(bundle.log_normmats())[0])
    seq = jnp.zeros((n, geom.window_bp, 4), seq_dtype)
    enc_crop = jnp.zeros((b, geom.crop, 128), pdt)
    coarse = jnp.zeros((b, geom.half, geom.half, bundle.num_2d), pdt)
    sb = jnp.zeros((b,), jnp.int32)
    zf = jnp.float32(0.0)

    def dec(params, dec_1pt, c):
        return _decode_level_jit(
            params, dec_1pt, enc_crop, geom, bundle.upsample_mode,
            bundle.num_2d, jnp.int32(1), row, sb, zf, zf, c,
        )

    lvls = sorted(bundle.decoders, reverse=True)
    tasks = [
        lambda: _encode_32mb_jit(bundle, geom, seq, mesh),
        lambda: dec(bundle.decoders[lvls[0]], None, None),
    ]
    if len(lvls) > 1:
        tasks.append(lambda: dec(bundle.decoders[lvls[1]], None, coarse))
    if bundle.decoder_1pt is not None and 1 in bundle.decoders:
        tasks.append(
            lambda: dec(bundle.decoders[1], bundle.decoder_1pt, coarse)
        )
    for lv in lvls:
        tasks.append(partial(
            lambda size: _crop_rows_jit(
                jnp.zeros((b, size, 128), pdt), sb, geom.crop
            ),
            geom.bins // lv,
        ))
    tasks.append(lambda: _combine_orientations(
        jnp.zeros((b, geom.crop, geom.crop, bundle.num_2d), pdt)
    ))
    with cf.ThreadPoolExecutor(max_workers=len(tasks)) as ex:
        for f in [ex.submit(t) for t in tasks]:
            jax.block_until_ready(f.result())
    return time.time() - t0


def warmup_cascade_256m(bundle: Model256MBundle,
                        geom: CascadeGeometry = GEOM_256M,
                        n: int = 1, mesh=None,
                        seq_dtype=jnp.uint8) -> float:
    """Concurrent program warm-up for the 256Mb cascade (see
    `warmup_cascade_32m`). Returns elapsed seconds."""
    import concurrent.futures as cf

    t0 = time.time()
    pdt = jax.tree.leaves(bundle.encoder)[0].dtype
    b = 2 * n
    seq = jnp.zeros((n, geom.window_bp, 4), seq_dtype)
    enc_crop = jnp.zeros((b, geom.crop, 128), pdt)
    coarse = jnp.zeros((b, geom.half, geom.half, 1), pdt)
    normmat = jnp.zeros((geom.bins, geom.bins), jnp.float32)
    normmat_r = jnp.zeros((b, geom.crop, geom.crop), jnp.float32)
    sb = jnp.zeros((b,), jnp.int32)
    zf = jnp.float32(0.0)

    def dec(params, c):
        return _decode_level_256_jit(
            params, enc_crop, geom, bundle.upsample_mode, jnp.int32(4),
            normmat_r, sb, zf, zf, zf, c,
        )

    lvls = sorted(bundle.decoders, reverse=True)
    tasks = [
        lambda: _encode_256mb_jit(bundle, geom, seq, mesh),
        lambda: dec(bundle.decoders[lvls[0]], None),
    ]
    if len(lvls) > 1:
        tasks.append(lambda: dec(bundle.decoders[lvls[1]], coarse))
    for j in range(len(lvls)):
        factor = geom.bins // (geom.crop * 2 ** j)
        tasks.append(partial(
            lambda f_: _block_average_rows_jit(normmat, sb, f_, geom.crop),
            factor,
        ))
        tasks.append(partial(
            lambda size: _crop_rows_jit(
                jnp.zeros((b, size, 128), pdt), sb, geom.crop
            ),
            geom.crop * 2 ** j,
        ))
    tasks.append(lambda: _combine_orientations(
        jnp.zeros((b, geom.crop, geom.crop, 1), pdt)
    ))
    with cf.ThreadPoolExecutor(max_workers=len(tasks)) as ex:
        for f in [ex.submit(t) for t in tasks]:
            jax.block_until_ready(f.result())
    return time.time() - t0


def _downsample_target(target: np.ndarray, start: int, factor: int,
                       nan_thresh: float, crop_bins: int = CROP):
    """NaN-aware block average of an observed matrix crop to crop_bins^2,
    over an optional leading feature axis (orca_predict.py:404-435)."""
    n = crop_bins * factor
    squeeze = target.ndim == 2
    if squeeze:
        target = target[None]
    crop = target[:, start : start + n, start : start + n]
    r = crop.reshape(target.shape[0], crop_bins, factor, crop_bins, factor)
    with np.errstate(invalid="ignore"):
        avg = np.nanmean(np.nanmean(r, axis=4), axis=2)
    nanfrac = np.isnan(r).mean(axis=(2, 4))
    avg[nanfrac > nan_thresh] = np.nan
    return avg[0] if squeeze else avg


def genomepredict(
    sequence: np.ndarray,
    mchr: str,
    mpos: int = -1,
    wpos: int = -1,
    models: Sequence[ModelBundle] = (),
    targets: Optional[List[np.ndarray]] = None,
    annotation=None,
    nan_thresh: float = 1.0,
    geometry: CascadeGeometry = GEOM_32M,
    mesh=None,
) -> dict:
    """Multiscale 32Mb prediction, API-compatible with the reference
    `genomepredict` (orca_predict.py:231): returns a dict with keys
    predictions/experiments/normmats/start_coords/end_coords/chr/annos.

    sequence: (1, 32000000, 4) one-hot (length-major layout, same as the
        reference's input convention).
    models: ModelBundle objects (e.g. from orca_tpu.models.zoo).
    mesh: optional jax.sharding.Mesh with a 'seq' axis — the encoder runs
        sequence-sharded across it (orca_tpu.parallel.sequence) and the
        encoding tiles are merged with an all-gather.
    """
    if mesh is None:
        from orca_tpu.parallel.mesh import get_inference_mesh

        mesh = get_inference_mesh()
    n_models = len(models)
    allpreds, allstarts = [], []
    for bundle in models:
        preds, starts = _cascade_32mb(
            bundle,
            geometry,
            _device_sequence(sequence),
            jnp.float32(mpos),
            jnp.float32(wpos),
            jnp.asarray(bundle.log_normmats()),
            mesh=mesh,
        )
        allpreds.append(np.asarray(preds))
        allstarts.append(np.asarray(starts))

    lvl_list = sorted(models[0].decoders, reverse=True)
    output = {}
    # (crop, crop) maps for single-head models; (num_2d, crop, crop) for
    # multi-cell-type heads (reference channel-first convention,
    # orca_predict.py:514-523)
    output["predictions"] = [
        [
            allpreds[i][j][0, :, :, 0]
            if allpreds[i][j].shape[-1] == 1
            else np.moveaxis(allpreds[i][j][0], -1, 0)
            for j in range(len(lvl_list))
        ]
        for i in range(n_models)
    ]
    if targets is not None:
        alltargets = []
        for i, bundle in enumerate(models):
            ts = []
            for j, level in enumerate(lvl_list):
                t = np.asarray(targets[i])
                if t.ndim == 3 and t.shape[0] == 1:
                    t = t[0]
                target_r = _downsample_target(
                    t, int(allstarts[i][j]), level, nan_thresh,
                    crop_bins=geometry.crop,
                )
                eps = bundle.epss[level]
                with np.errstate(invalid="ignore", divide="ignore"):
                    ts.append(
                        np.log((target_r + eps) / (bundle.normmats[level] + eps))
                    )
            alltargets.append(ts)
        output["experiments"] = alltargets
    else:
        output["experiments"] = None
    starts0 = allstarts[0]
    halfwin = geometry.window_bp // 2
    output["start_coords"] = [
        int(wpos - halfwin + s * geometry.bin_bp) for s in starts0
    ]
    output["end_coords"] = [
        int(output["start_coords"][j] + geometry.window_bp / 2**j)
        for j in range(len(lvl_list))
    ]
    output["chr"] = mchr
    output["annos"] = _process_annotation(
        annotation, starts0, [geometry.crop * lv for lv in lvl_list],
        geometry.bins,
    )
    output["normmats"] = [
        [m.normmats[lv] for lv in lvl_list] for m in models
    ]
    return output


def _process_annotation(annotation, starts, window_bins, total_bins=BINS):
    """Window-relative annotation rescaling per level: `starts` and
    `window_bins` are in finest-bin units (orca_predict.py:451-468)."""
    if annotation is None:
        return None
    annos = []
    for j, nbins in enumerate(window_bins):
        newstart = starts[j] / float(total_bins)
        newend = (starts[j] + nbins) / float(total_bins)
        anno_r = []
        for r in annotation:
            if len(r) == 3:
                if not (r[0] >= newend or r[1] <= newstart):
                    anno_r.append(
                        (
                            np.fmax((r[0] - newstart) / (newend - newstart), 0),
                            np.fmin((r[1] - newstart) / (newend - newstart), 1),
                            r[2],
                        )
                    )
            else:
                if newstart <= r[0] < newend:
                    anno_r.append(((r[0] - newstart) / (newend - newstart), r[1]))
        annos.append(anno_r)
    return annos


# --------------------------------------------------------------------------
# 256Mb cascade
# --------------------------------------------------------------------------


def _encode_256mb(bundle: Model256MBundle, seq: jax.Array,
                  mesh=None) -> Dict[int, jax.Array]:
    cfg = get_config()
    if mesh is None:
        # blocking left to the tower: the fused-Pallas path picks
        # cfg.pallas_block_bp (4Mb) blocks, the XLA path cfg.encoder_block_bp.
        feats = encoders.apply_encoder_tower(
            bundle.encoder, seq, halo_bp=cfg.encoder_halo_bp,
        )
    else:
        # Whole-chromosome path tiled across chips: each shard encodes its
        # 256Mb/n_seq slice, tiles merged via all-gather (BASELINE.md row 3).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from orca_tpu.parallel.sequence import sharded_encoder_tower

        feats = sharded_encoder_tower(
            bundle.encoder, seq, mesh, halo_bp=cfg.encoder_halo_bp,
        )
        feats = jax.lax.with_sharding_constraint(
            feats, NamedSharding(mesh, P())
        )
    enc128k = encoders.apply_pyramid(
        bundle.pyramid1, feats, levels=5, up_pass=True
    )[-1]
    encs = encoders.apply_pyramid(bundle.pyramid, enc128k, levels=3, up_pass=True)
    return {lv: e for lv, e in zip((32, 64, 128, 256), encs)}


def _block_average(mat: jax.Array, start: jax.Array, factor: int,
                   crop_bins: int) -> jax.Array:
    """Crop (crop*factor)^2 at (start, start) and block average to crop^2
    (orca_predict.py:724-737)."""
    n = crop_bins * factor
    crop = lax.dynamic_slice(mat, (start, start), (n, n))
    return crop.reshape(crop_bins, factor, crop_bins, factor).mean(axis=(1, 3))


@partial(jax.jit, static_argnums=(1, 3))
def _encode_256mb_jit(bundle: Model256MBundle, geom: CascadeGeometry, seq,
                      mesh=None):
    seq2 = jnp.concatenate([seq, jnp.flip(seq, axis=(1, 2))], axis=0)
    encs = _encode_256mb(bundle, seq2, mesh=mesh)
    return tuple(encs[lv] for lv in (32, 64, 128, 256))


@partial(jax.jit, static_argnums=(2, 3))
def _block_average_rows_jit(normmat, starts, factor: int, crop: int):
    """Per-row block-averaged background crops: (B,) starts ->
    (B, crop, crop)."""
    return jax.vmap(lambda s: _block_average(normmat, s, factor, crop))(starts)


@partial(jax.jit, static_argnums=(2, 3))
def _decode_level_256_jit(dec_params, enc_crop, geom: CascadeGeometry,
                          upsample_mode: str, factor, normmat_r, start_bins,
                          mpos, wpos, chrlen, coarse):
    """One 256Mb decoder level, orientation-batched with per-region
    backgrounds: RC rows use the spatially flipped distance encoding
    (orca_predict.py:703) and the mirrored zoom start (:832-833); zoom
    proposals clamp to the first chromosome's bounds (:821-829)."""
    b = enc_crop.shape[0]
    n = b // 2
    halfwin = geom.window_bp / 2.0
    binw = float(geom.bin_bp)
    distenc_2d = jnp.log(normmat_r)
    distenc_2d = jnp.concatenate(
        [distenc_2d[:n], jnp.flip(distenc_2d[n:], axis=(1, 2))], axis=0
    )
    pred = decoders.apply_decoder(
        dec_params, enc_crop, distenc_2d[..., None], coarse,
        upsample_mode=upsample_mode,
    )
    span = geom.crop * geom.bin_bp * factor.astype(jnp.float32)
    prop_fwd = (mpos - span / 4) - (wpos - halfwin + start_bins[:n] * binw)
    prop_rc = (mpos - span / 4) - (
        wpos + halfwin - start_bins[n:] * binw - span
    )
    b0 = 0.0 - (wpos - halfwin)
    b1 = chrlen - span / 2 - (wpos - halfwin)
    prop_fwd = jnp.where(b0 < b1, jnp.clip(prop_fwd, b0, b1), b0)
    prop_rc = jnp.where(b0 < b1, jnp.clip(prop_rc, b0, b1), b0)
    si_fwd = jnp.clip(
        jnp.floor(prop_fwd / (binw * factor)), 0, geom.half
    ).astype(jnp.int32)
    si_rc = geom.crop - (
        jnp.clip(
            jnp.floor(prop_rc / (binw * factor)), 0, geom.half
        ).astype(jnp.int32)
        + geom.half
    )
    start_index = jnp.concatenate([si_fwd, si_rc])
    next_start = start_bins + start_index * factor
    coarse_next = _vmap_crop_2d(pred, start_index, geom.half)
    return pred, next_start, coarse_next


def _cascade_256mb(bundle: Model256MBundle, geom: CascadeGeometry, seq, mpos,
                   wpos, chrlen, normmat, mesh=None):
    """Full fwd+RC 4-level cascade with per-region backgrounds, both
    orientations batched (reference loop: orca_predict.py:661-845),
    orchestrated as small shared jit programs like the 32Mb path."""
    n = seq.shape[0]
    encs = dict(zip((32, 64, 128, 256),
                    _encode_256mb_jit(bundle, geom, seq, mesh)))
    lvl_list = sorted(bundle.decoders, reverse=True)  # [256, 128, 64, 32]
    preds, starts, norms = [], [], []
    start_bins = jnp.zeros((2 * n,), jnp.int32)
    coarse = None
    mpos = jnp.float32(mpos)
    wpos = jnp.float32(wpos)
    chrlen = jnp.float32(chrlen)
    normmat = jnp.asarray(normmat)
    for j, level in enumerate(lvl_list):
        factor = geom.bins // (geom.crop * 2**j)  # == level // 8 in production
        normmat_r = _block_average_rows_jit(
            normmat, start_bins, factor, geom.crop
        )
        enc_crop = _crop_rows_jit(
            encs[level], start_bins // factor, geom.crop
        )
        starts.append(start_bins[:n])
        norms.append(normmat_r[0])
        pred, start_bins, coarse = _decode_level_256_jit(
            bundle.decoders[level], enc_crop, geom, bundle.upsample_mode,
            jnp.int32(factor), normmat_r, start_bins, mpos, wpos, chrlen,
            coarse,
        )
        preds.append(pred)
    out = [_combine_orientations(p)[..., 0] for p in preds]
    return (
        jnp.stack(out),
        jnp.stack([s[0] for s in starts]),
        jnp.stack(norms),
    )


def genomepredict_256mb(
    sequence: np.ndarray,
    mchr: str,
    normmats: List[np.ndarray],
    chrlen: int,
    mpos: int = -1,
    wpos: int = -1,
    models: Sequence[Model256MBundle] = (),
    targets: Optional[List[np.ndarray]] = None,
    annotation=None,
    padding_chr: Optional[str] = None,
    nan_thresh: float = 1.0,
    geometry: CascadeGeometry = GEOM_256M,
    mesh=None,
) -> dict:
    """256Mb multiscale prediction (reference genomepredict_256Mb,
    orca_predict.py:543). `normmats` are per-region 8000x8000 backgrounds at
    32kb resolution (cis distance lookup + trans fill), one per model.
    With `mesh` the encoder tiles the window across the mesh's 'seq' axis
    (all-gathered encodings; see genomepredict)."""
    if mesh is None:
        from orca_tpu.parallel.mesh import get_inference_mesh

        mesh = get_inference_mesh()
    n_models = len(models)
    allpreds, allstarts, allnormmats = [], [], []
    for ii, bundle in enumerate(models):
        normmat = np.array(normmats[ii], dtype=np.float32)
        mask = np.isnan(normmat)
        if mask.any():
            normmat[mask] = np.nanmin(normmat[~mask]) if (~mask).any() else 1.0
        preds, starts, norms = _cascade_256mb(
            bundle,
            geometry,
            _device_sequence(sequence),
            jnp.float32(mpos),
            jnp.float32(wpos),
            jnp.float32(chrlen),
            jnp.asarray(normmat),
            mesh=mesh,
        )
        allpreds.append(np.asarray(preds))
        allstarts.append(np.asarray(starts))
        allnormmats.append(np.asarray(norms))

    lvl_list = sorted(models[0].decoders, reverse=True)
    output = {}
    output["predictions"] = [
        [allpreds[i][j][0] for j in range(len(lvl_list))] for i in range(n_models)
    ]
    if targets is not None:
        alltargets = []
        for i, bundle in enumerate(models):
            ts = []
            for j, level in enumerate(lvl_list):
                t = np.asarray(targets[i])
                if t.ndim == 3 and t.shape[0] == 1:
                    t = t[0]
                factor = geometry.bins // (geometry.crop * 2**j)
                target_r = _downsample_target(
                    t, int(allstarts[i][j]), factor, nan_thresh,
                    crop_bins=geometry.crop,
                )
                normmat_r = allnormmats[i][j]
                eps = float(np.nanmin(normmat_r))
                with np.errstate(invalid="ignore", divide="ignore"):
                    ts.append(np.log((target_r + eps) / (normmat_r + eps)))
            alltargets.append(ts)
        output["experiments"] = alltargets
    else:
        output["experiments"] = None
    starts0 = allstarts[0]
    halfwin = geometry.window_bp // 2
    output["start_coords"] = [
        int(wpos - halfwin + s * geometry.bin_bp) for s in starts0
    ]
    output["end_coords"] = [
        int(min(output["start_coords"][j] + geometry.window_bp / 2**j, chrlen))
        for j in range(len(lvl_list))
    ]
    output["chr"] = mchr
    output["padding_chr"] = padding_chr
    output["annos"] = _process_annotation(
        annotation, starts0,
        [geometry.crop * (geometry.bins // (geometry.crop * 2**j))
         for j in range(len(lvl_list))],
        geometry.bins,
    )
    output["normmats"] = [
        {lv: allnormmats[i][j] for j, lv in enumerate(lvl_list)}
        for i in range(n_models)
    ]
    return output
