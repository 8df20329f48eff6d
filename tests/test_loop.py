"""End-to-end mini training run: sampler -> stage-a trainer -> orbax
checkpoint -> restore."""

import numpy as np
import pytest

from orca_tpu.data import genome as g
from orca_tpu.data.sampler import RandomWindowSampler
from orca_tpu.data.targets import DenseContactMatrix
from orca_tpu.training.loop import LoopConfig, StageATrainer
from orca_tpu.training.stages import StageAConfig


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
