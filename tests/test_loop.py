"""End-to-end mini training runs: sampler -> trainer -> validation ->
ReduceLROnPlateau -> orbax checkpoint -> restore, for stages a and b."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orca_tpu.data import genome as g
from orca_tpu.data.sampler import RandomWindowSampler
from orca_tpu.data.targets import DenseContactMatrix
from orca_tpu.models.zoo import _random_normmats
from orca_tpu.nn import decoders, encoders
from orca_tpu.nn.core import fold_params
from orca_tpu.predict.multiscale import CascadeGeometry
from orca_tpu.training import swa as swa_lib
from orca_tpu.training.loop import (
    LoopConfig,
    StageATrainer,
    StageBTrainer,
)
from orca_tpu.training.stages import StageAConfig, StageBConfig


pytestmark = pytest.mark.slow


def _make_sampler(seed=0):
    rng = np.random.RandomState(seed)
    gen = g.CodeGenome({
        "chr1": rng.randint(0, 4, 200_000).astype(np.uint8),
        "chr2": rng.randint(0, 4, 200_000).astype(np.uint8),
    })
    res = 1000
    mats = {
        c: np.abs(rng.rand(200, 200)).astype(np.float32)
        for c, _ in gen.get_chr_lens()
    }
    target = DenseContactMatrix(mats, resolution=res, shape=(40, 40))
    return RandomWindowSampler(
        gen, target, sequence_length=40_000, position_resolution=res,
        random_strand=False, cross_chromosome=False,
        validation_holdout=["chr2"], test_holdout=[], seed=seed,
    )


def test_stage_a_trainer_runs_and_checkpoints(tmp_path):
    sampler = _make_sampler()
    cfg = StageAConfig(num_1d=None, crop=10, target_factor=4,
                      seq_len=40_000, remat=False)
    loop = LoopConfig(
        workdir=str(tmp_path), lr=0.002, batch_size=2,
        checkpoint_every=2, validate_every=4, val_batches=1, max_steps=4,
    )
    normmat_r = np.full((10, 10), 0.1, np.float32)
    tr = StageATrainer(cfg, loop, sampler, normmat_r, eps=0.1)
    metrics = tr.run()
    assert np.isfinite(float(metrics["loss"]))
    assert tr.step == 4

    # restore into a fresh trainer
    tr2 = StageATrainer(cfg, loop, sampler, normmat_r, eps=0.1)
    assert tr2.try_restore()
    assert tr2.step in (2, 4)
    w1 = np.asarray(tr.params["encoder"]["lconv"][0][0]["w"])
    if tr2.step == tr.step:
        w2 = np.asarray(tr2.params["encoder"]["lconv"][0][0]["w"])
        np.testing.assert_allclose(w1, w2)


def test_stage_a_kill_and_resume_step_identical(tmp_path):
    """A killed-and-resumed run must replay the exact losses of an unkilled
    one: rng stream, plateau counters and the sampler's bit-generator state
    all persist (the reference reloads only model+optimizer,
    train_h1esc_a.py:106-124 — resume there diverges)."""
    cfg = StageAConfig(num_1d=None, crop=10, target_factor=4,
                       seq_len=40_000, remat=False)
    normmat_r = np.full((10, 10), 0.1, np.float32)

    def make(workdir, checkpoint_every):
        loop = LoopConfig(
            workdir=workdir, lr=0.002, batch_size=2,
            checkpoint_every=checkpoint_every, validate_every=100,
            val_batches=1,
        )
        return StageATrainer(cfg, loop, _make_sampler(), normmat_r, eps=0.1)

    def step_losses(tr, upto):
        losses = []
        while tr.step < upto:
            m = tr.run(max_steps=tr.step + 1)
            losses.append(float(m["loss"]))
        return losses

    # unkilled reference run: 5 steps straight through
    ref = make(str(tmp_path / "ref"), checkpoint_every=100)
    ref_losses = step_losses(ref, 5)

    # killed run: same config/seed, checkpointed at step 2, then "killed"
    killed = make(str(tmp_path / "kill"), checkpoint_every=2)
    killed_losses = step_losses(killed, 2)
    # pollute the scheduler to verify counters round-trip
    killed.scheduler.step(0.5)
    killed.scheduler.step(0.4)
    killed.save()
    np.testing.assert_allclose(killed_losses, ref_losses[:2], rtol=1e-6)
    del killed

    resumed = make(str(tmp_path / "kill"), checkpoint_every=100)
    assert resumed.try_restore()
    assert resumed.step == 2
    assert resumed.scheduler.best == 0.5
    assert resumed.scheduler.num_bad == 1
    resumed_losses = step_losses(resumed, 5)
    np.testing.assert_allclose(resumed_losses, ref_losses[2:], rtol=1e-6)


def test_swa_bn_refresh_updates_running_stats():
    cfg = StageAConfig(num_1d=None, crop=10, target_factor=4,
                       seq_len=40_000, remat=False)
    params = decoders.init_net(jax.random.PRNGKey(0), num_1d=None)
    swa_state = swa_lib.swa_init(params)
    rng = np.random.RandomState(7)
    seq = jnp.asarray(rng.rand(2, 40_000, 4).astype(np.float32))
    new = swa_lib.swa_forward_update_bn(
        swa_state, cfg, seq, jax.random.PRNGKey(1)
    )
    before = np.asarray(params["encoder"]["lconv"][0][0]["bn"]["mean"])
    after = np.asarray(new["avg"]["encoder"]["lconv"][0][0]["bn"]["mean"])
    assert not np.allclose(before, after)
    # weights untouched; only running stats move
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["lconv"][0][0]["w"]),
        np.asarray(new["avg"]["encoder"]["lconv"][0][0]["w"]),
    )


def _make_stage_b_sampler(geom, seed=0):
    rng = np.random.RandomState(seed)
    chrlen = 2 * geom.window_bp
    gen = g.CodeGenome({
        "chr1": rng.randint(0, 4, chrlen).astype(np.uint8),
        "chr2": rng.randint(0, 4, chrlen).astype(np.uint8),
    })
    nb = chrlen // geom.bin_bp
    mats = {
        c: np.abs(rng.rand(nb, nb)).astype(np.float32)
        for c, _ in gen.get_chr_lens()
    }
    target = DenseContactMatrix(mats, resolution=geom.bin_bp,
                                shape=(geom.bins, geom.bins))
    return RandomWindowSampler(
        gen, target, sequence_length=geom.window_bp,
        position_resolution=geom.bin_bp, random_strand=False,
        cross_chromosome=False, validation_holdout=["chr2"],
        test_holdout=[], seed=seed,
    )


def test_stage_b_trainer_validate_lr_drop_save_restore(tmp_path):
    """Drives a B trainer through train -> validate -> LR drop -> save ->
    restore (the VERDICT round-1 gap: plateau scheduler + restore for
    stages b/c)."""
    geom = CascadeGeometry(window_bp=1_024_000, bin_bp=4000, crop=8)
    levels = (32, 1)
    cfg = StageBConfig(geometry=geom, encoder_block_bp=None, levels=levels)
    sampler = _make_stage_b_sampler(geom)
    key = jax.random.PRNGKey(0)
    ke, kp, kd = jax.random.split(key, 3)
    trainable = {
        "pyramid": encoders.init_pyramid(kp, 5, True),
        "decoders": {
            lv: decoders.init_decoder(k)
            for lv, k in zip(levels, jax.random.split(kd, len(levels)))
        },
    }
    frozen = {
        "encoder": fold_params(
            encoders.init_encoder_tower(ke), encoders.encoder_tower_spec()
        ),
        "decoder_1pt": fold_params(
            decoders.init_decoder1m(jax.random.PRNGKey(9)),
            decoders.decoder1m_spec(1),
        ),
    }
    normmats, epss = _random_normmats(levels=levels, nbins=geom.bins,
                                      crop=geom.crop)
    nm = np.stack([normmats[lv].astype(np.float32) for lv in levels])
    ep = np.array([epss[lv] for lv in levels], np.float32)
    loop = LoopConfig(
        workdir=str(tmp_path), lr=0.002, batch_size=1,
        checkpoint_every=2, validate_every=2, val_batches=1, max_steps=2,
    )
    tr = StageBTrainer(cfg, loop, sampler, trainable, frozen, nm, ep,
                       accumulate=1)
    tr.run()
    assert tr.step == 2
    # validation ran inside run() (validate_every=2); now force an LR drop
    tr.scheduler.patience = 0
    corr = tr.validate()
    assert np.isfinite(corr)
    tr.scheduler.step(corr)
    tr.scheduler.step(corr - 1.0)  # strictly worse -> plateau -> drop
    assert tr.scheduler.lr < loop.lr
    tr.save()

    tr2 = StageBTrainer(cfg, loop, sampler, trainable, frozen, nm, ep,
                        accumulate=1)
    assert tr2.try_restore()
    assert tr2.step == tr.step
    assert abs(tr2.scheduler.lr - tr.scheduler.lr) < 1e-12
    w1 = np.asarray(tr.trainable["pyramid"]["lblocks"][0][0]["w"])
    w2 = np.asarray(tr2.trainable["pyramid"]["lblocks"][0][0]["w"])
    np.testing.assert_allclose(w1, w2)
