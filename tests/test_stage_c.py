"""Stage-c (32-256Mb) training: step, eval, trainer drive, torch oracle.

Covers the round-2 VERDICT gap: make_stage_c_step / make_stage_c_eval /
StageCTrainer had no tests. Geometry is scaled (window 2-4Mb at 32kb bins)
but the full 4-level cascade structure, per-sample background normmats,
nanmin fill, and the reference's full-count loss normalization
(train_h1esc_c.py:150-227) are all exercised.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import import_reference_modules, reference_available
from orca_tpu.data import genome as g
from orca_tpu.data.sampler import RandomWindowSampler
from orca_tpu.data.targets import DenseContactMatrix
from orca_tpu.nn import decoders, encoders
from orca_tpu.nn.core import fold_params
from orca_tpu.predict.multiscale import CascadeGeometry
from orca_tpu.training.loop import LoopConfig, StageCTrainer
from orca_tpu.training.stages import (
    StageCConfig,
    make_stage_c_eval,
    make_stage_c_step,
)

pytestmark = pytest.mark.slow

LEVELS = (256, 128, 64, 32)


def _geom(window_bp):
    # bins = 32*crop keeps the production factor ladder (32,16,8,4) and
    # makes the coarsest encoding exactly crop bins long
    bins = window_bp // 32_000
    return CascadeGeometry(window_bp=window_bp, bin_bp=32_000, crop=bins // 32)


def _random_params(key):
    ke, kp1, kp, kd = jax.random.split(key, 4)
    trainable = {
        "pyramid": encoders.init_pyramid(kp, 3, True),
        "decoders": {
            lv: decoders.init_decoder(k)
            for lv, k in zip(LEVELS, jax.random.split(kd, len(LEVELS)))
        },
    }
    frozen = {
        "encoder": fold_params(
            encoders.init_encoder_tower(ke), encoders.encoder_tower_spec()
        ),
        "pyramid1": fold_params(
            encoders.init_pyramid(kp1, 5, True), encoders.pyramid_spec(5, True)
        ),
    }
    return trainable, frozen


def _normmat(bins, n=1, seed=0):
    """Per-sample distance-decay background, NaNs pre-filled (the trainer's
    _accumulate_batch nanmin-fill; train_h1esc_c.py:168-170)."""
    d = np.abs(np.arange(bins)[None, :] - np.arange(bins)[:, None])
    nm = np.exp(-1.2 * np.log1p(d) - 3.0).astype(np.float32)
    return np.broadcast_to(nm, (n, bins, bins)).copy()


def test_stage_c_step_decreases_loss():
    geom = _geom(2_048_000)
    cfg = StageCConfig(geometry=geom, levels=LEVELS, encoder_block_bp=None)
    trainable, frozen = _random_params(jax.random.PRNGKey(0))
    opt, step = make_stage_c_step(cfg)
    opt_state = opt.init(trainable)
    rng = np.random.RandomState(3)
    seq = jnp.asarray(rng.rand(1, geom.window_bp, 4).astype(np.float32))
    target = jnp.asarray(
        np.abs(rng.rand(1, geom.bins, geom.bins)).astype(np.float32)
    )
    normmat = jnp.asarray(_normmat(geom.bins))
    hist = []
    for i in range(4):
        trainable, opt_state, metrics = step(
            trainable, frozen, opt_state, seq, target, normmat,
            jax.random.PRNGKey(7), jnp.float32(0.002),
        )
        hist.append(float(metrics["loss"]))
        assert set(metrics) == {"loss"} | {f"loss_{lv}" for lv in LEVELS}
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]


def test_stage_c_eval_runs():
    geom = _geom(2_048_000)
    cfg = StageCConfig(geometry=geom, levels=LEVELS, encoder_block_bp=None)
    trainable, frozen = _random_params(jax.random.PRNGKey(1))
    evaluate = make_stage_c_eval(cfg)
    rng = np.random.RandomState(4)
    seq = jnp.asarray(rng.rand(2, geom.window_bp, 4).astype(np.float32))
    target = np.abs(rng.rand(2, geom.bins, geom.bins)).astype(np.float32)
    target[:, ::5, ::3] = np.nan  # eval must mask NaNs
    normmat = jnp.asarray(_normmat(geom.bins, n=2))
    mses, corrs = evaluate(
        trainable, frozen, seq, jnp.asarray(target), normmat
    )
    for lv in LEVELS:
        assert np.isfinite(float(mses[lv]))
        assert np.asarray(corrs[lv]).shape == (2,)


def _make_stage_c_sampler(geom, seed=0):
    """Cross-chromosome sampler with cis/trans backgrounds: each 2Mb window
    mosaics two 1Mb chromosomes with a per-sample normmat (the reference's
    RandomPositionsSamplerHiC stage-c configuration, train_h1esc_c.py:36-53).
    """
    rng = np.random.RandomState(seed)
    chrlen = geom.window_bp // 2
    gen = g.CodeGenome({
        "chr1": rng.randint(0, 4, chrlen).astype(np.uint8),
        "chr2": rng.randint(0, 4, chrlen).astype(np.uint8),
        "chr3": rng.randint(0, 4, chrlen).astype(np.uint8),
    })
    nb = chrlen // geom.bin_bp
    mats = {
        c: np.abs(rng.rand(nb, nb)).astype(np.float32)
        for c, _ in gen.get_chr_lens()
    }
    target = DenseContactMatrix(mats, resolution=geom.bin_bp,
                                shape=(geom.bins, geom.bins))
    d = np.arange(geom.bins, dtype=np.float64)
    background_cis = np.exp(-1.2 * np.log1p(d) - 3.0)
    return RandomWindowSampler(
        gen, target, background_cis=background_cis,
        background_trans=float(np.exp(-9.0)),
        sequence_length=geom.window_bp, position_resolution=geom.bin_bp,
        random_strand=True, cross_chromosome=True, permute_segments=True,
        validation_holdout=["chr3"], test_holdout=[], seed=seed,
        packed_sequence=True,
    )


def test_stage_c_trainer_validate_lr_drop_save_restore(tmp_path):
    """Full StageCTrainer drive: train -> validate -> LR drop -> save ->
    restore, with per-sample backgrounds from the cross-chromosome sampler
    and packed uint8 sequences end-to-end."""
    geom = _geom(2_048_000)
    cfg = StageCConfig(geometry=geom, levels=LEVELS, encoder_block_bp=None)
    trainable, frozen = _random_params(jax.random.PRNGKey(2))
    sampler = _make_stage_c_sampler(geom)
    loop = LoopConfig(
        workdir=str(tmp_path), lr=0.002, batch_size=1,
        checkpoint_every=2, validate_every=2, val_batches=1, max_steps=2,
    )
    tr = StageCTrainer(cfg, loop, sampler, trainable, frozen,
                       nan_skip=1.1, accumulate=1)
    tr.run()
    assert tr.step == 2
    tr.scheduler.patience = 0
    corr = tr.validate()
    assert np.isfinite(corr)
    tr.scheduler.step(corr)
    tr.scheduler.step(corr - 1.0)  # strictly worse -> plateau -> drop
    assert tr.scheduler.lr < loop.lr
    tr.save()

    tr2 = StageCTrainer(cfg, loop, sampler, trainable, frozen,
                        nan_skip=1.1, accumulate=1)
    assert tr2.try_restore()
    assert tr2.step == tr.step
    assert abs(tr2.scheduler.lr - tr.scheduler.lr) < 1e-12
    w1 = np.asarray(tr.trainable["pyramid"]["lblocks"][0][0]["w"])
    w2 = np.asarray(tr2.trainable["pyramid"]["lblocks"][0][0]["w"])
    np.testing.assert_allclose(w1, w2)


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo or torch unavailable")
def test_stage_c_eval_matches_torch_oracle():
    """Per-level eval MSEs vs a torch oracle implementing the reference
    stage-c loss semantics exactly (train_h1esc_c.py:159-205: per-level
    normmat block-averaging, nanmin eps, isfinite mask, full-count
    normalization) at the fixed validation offsets."""
    import torch

    from orca_tpu.models import convert

    ref = import_reference_modules()
    torch.manual_seed(0)
    geom = _geom(4_096_000)
    crop, half = geom.crop, geom.half
    cfg = StageCConfig(geometry=geom, levels=LEVELS, encoder_block_bp=None)

    net0 = ref.Encoder().eval()
    net1 = ref.Encoder2().eval()
    net3 = ref.Encoder3().eval()
    denets = {lv: ref.Decoder().eval() for lv in LEVELS}  # nearest (train default)

    trainable = {
        "pyramid": convert.convert_pyramid(net3.state_dict(), 3, True),
        "decoders": {
            lv: convert.convert_decoder(m.state_dict())
            for lv, m in denets.items()
        },
    }
    frozen = {
        "encoder": convert.convert_encoder_tower(net0.state_dict()),
        "pyramid1": convert.convert_pyramid(net1.state_dict(), 5, True),
    }

    rng = np.random.RandomState(5)
    seq = rng.rand(1, geom.window_bp, 4).astype(np.float32)
    target = np.abs(rng.rand(1, geom.bins, geom.bins)).astype(np.float32)
    target[:, ::7, ::5] = np.nan
    normmat = _normmat(geom.bins, seed=5)

    evaluate = make_stage_c_eval(cfg)
    mses, _corrs = evaluate(
        trainable, frozen, jnp.asarray(seq), jnp.asarray(target),
        jnp.asarray(normmat),
    )

    # -- torch oracle ------------------------------------------------------
    with torch.no_grad():
        x = torch.FloatTensor(seq).transpose(1, 2)
        enc128k = net1(net0(x))[-1]
        encs = dict(zip((32, 64, 128, 256), net3(enc128k)))
        start = 0
        coarse = None
        want = {}
        for j, level in enumerate(LEVELS):
            d = geom.bins // (crop * 2**j)
            n = crop * d
            target_r = np.nanmean(
                target[:, start:start + n, start:start + n]
                .reshape(1, crop, d, crop, d),
                axis=(2, 4),
            )
            normmat_r = (
                normmat[:, start:start + n, start:start + n]
                .reshape(1, crop, d, crop, d)
                .mean(axis=(2, 4))
            )
            args = [
                encs[level][:, :, start // d : start // d + crop],
                torch.log(torch.Tensor(normmat_r))[:, None, :, :],
            ]
            if coarse is not None:
                args.append(coarse)
            pred = denets[level](*args)
            eps = np.nanmin(normmat_r)
            tlog = torch.Tensor(
                np.log((eps + target_r) / (eps + normmat_r))
            )
            fin = torch.isfinite(tlog)
            want[level] = float(
                ((pred[:, 0][fin] - tlog[fin]) ** 2).sum()
                / (pred.shape[0] * crop**2)
            )
            off = half // 2 if j == 0 else half // 2 + 1
            start = start + off * d
            coarse = pred[:, :, off:off + half, off:off + half]

    for lv in LEVELS:
        np.testing.assert_allclose(float(mses[lv]), want[lv], rtol=2e-3,
                                   atol=2e-4)
