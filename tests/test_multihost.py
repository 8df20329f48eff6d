"""Multi-host helpers exercised on the 8-device CPU mesh (single process
degenerate case): host-major mesh construction, per-process batch slices,
shard_batch placement, and a mesh-driven StageATrainer run matching the
unsharded trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from orca_tpu.parallel import multihost

pytestmark = pytest.mark.slow


def test_make_multihost_mesh_shapes():
    mesh = multihost.make_multihost_mesh(seq_per_host=2)
    assert mesh.axis_names == ("data", "seq")
    assert mesh.shape["seq"] == 2
    assert mesh.shape["data"] == len(jax.devices()) // 2


def test_local_batch_slice_single_process():
    s = multihost.local_batch_slice(16)
    assert (s.start, s.stop) == (0, 16)
    assert multihost.is_primary()


def test_shard_batch_places_on_data_axis():
    mesh = multihost.make_multihost_mesh(seq_per_host=1)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    y = np.arange(8, dtype=np.float32)
    xd, yd = multihost.shard_batch(mesh, x, y)
    assert xd.sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(xd), x)
    np.testing.assert_array_equal(np.asarray(yd), y)


def test_stage_a_trainer_on_mesh(tmp_path):
    from orca_tpu.data import genome as g
    from orca_tpu.data.sampler import RandomWindowSampler
    from orca_tpu.data.targets import DenseContactMatrix
    from orca_tpu.training.loop import LoopConfig, StageATrainer
    from orca_tpu.training.stages import StageAConfig

    rng = np.random.RandomState(0)
    gen = g.CodeGenome({
        "chr1": rng.randint(0, 4, 200_000).astype(np.uint8),
        "chr2": rng.randint(0, 4, 200_000).astype(np.uint8),
    })
    mats = {c: np.abs(rng.rand(200, 200)).astype(np.float32)
            for c, _ in gen.get_chr_lens()}
    target = DenseContactMatrix(mats, resolution=1000, shape=(40, 40))
    sampler = RandomWindowSampler(
        gen, target, sequence_length=40_000, position_resolution=1000,
        random_strand=False, cross_chromosome=False,
        validation_holdout=["chr2"], test_holdout=[], seed=0,
    )
    cfg = StageAConfig(num_1d=None, crop=10, target_factor=4,
                       seq_len=40_000, remat=False)
    loop = LoopConfig(workdir=str(tmp_path), lr=0.002, batch_size=8,
                      checkpoint_every=100, validate_every=100,
                      val_batches=1, max_steps=2)
    mesh = multihost.make_multihost_mesh(seq_per_host=1)
    tr = StageATrainer(cfg, loop, sampler,
                       np.full((10, 10), 0.1, np.float32), eps=0.1,
                       mesh=mesh)
    metrics = tr.run()
    assert np.isfinite(float(metrics["loss"]))
    assert tr.step == 2
