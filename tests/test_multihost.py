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


def _run_rig(workdir, nproc, local_devices, steps, stage):
    """Launch an N-process jax.distributed training rig of subprocess
    workers and return process 0's losses/val/param-checksum record."""
    import json
    import os
    import socket
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), str(port),
             str(workdir), str(local_devices), str(steps), stage],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-4000:]
    with open(os.path.join(workdir, f"losses.{stage}.n{nproc}.json")) as f:
        return json.load(f), outs


def test_true_two_process_training(tmp_path):
    """A REAL 2-process jax.distributed run (not monkeypatched): two
    subprocess workers with 4 CPU devices each train stage-a for 3 steps
    on an 8-device global mesh. Asserts the loss trajectory matches a
    1-process run of the same global batch (global-batch semantics:
    identically-seeded samplers + local_batch_slice), the collective orbax
    checkpoint restores IN THIS fresh process to the writer's exact
    parameters, and process 0 alone writes metrics."""
    import json

    from multihost_worker import build_trainer, param_sum

    steps = 3
    d1 = tmp_path / "single"
    d2 = tmp_path / "dual"
    d1.mkdir(), d2.mkdir()
    ref, _ = _run_rig(d1, 1, 8, steps, "a")
    got, _ = _run_rig(d2, 2, 4, steps, "a")

    # step 1 sees the identical global batch -> near-exact loss; later
    # steps drift slightly (gradient all-reduce order differs between the
    # 8-local-device and 4+4 cross-process topologies), bounded here
    np.testing.assert_allclose(got["losses"][0], ref["losses"][0], rtol=1e-5)
    np.testing.assert_allclose(got["losses"], ref["losses"], rtol=2e-2)
    np.testing.assert_allclose(
        got["val_pearson"], ref["val_pearson"], atol=2e-2
    )
    np.testing.assert_allclose(
        got["param_sum"], ref["param_sum"], rtol=1e-3
    )

    # only process 0 wrote the losses file, and it wrote metrics JSONL
    # rows exactly once (no duplicate steps from process 1)
    assert not (d2 / "losses.a.n2.json.p1").exists()
    metrics = d2 / "stage_a.metrics.jsonl"
    assert metrics.exists(), "process 0 must write the metrics JSONL"
    lines = metrics.read_text().splitlines()
    stepvals = [json.loads(ln)["step"] for ln in lines]
    assert stepvals, "metrics JSONL is empty"
    assert len(stepvals) == len(set(stepvals)), "duplicate metric rows"

    # the collective checkpoint written by the 2-process run restores in
    # THIS fresh single process to the writer's exact parameters
    tr = build_trainer(str(d2), batch_size=8, steps=steps)
    init_sum = param_sum(tr.params)
    assert tr.try_restore(), "collective checkpoint failed to restore"
    assert tr.step == steps
    restored_sum = param_sum(tr.params)
    assert restored_sum != init_sum  # actually loaded, not re-inited
    np.testing.assert_allclose(restored_sum, got["param_sum"], rtol=1e-12)


def test_true_two_process_stage_c(tmp_path):
    """2-process stage-c: cross-chromosome sampler with per-sample
    background normmats, a mesh with a REAL 'seq' axis (the frozen encoder
    runs ppermute-halo sequence-sharded across the 4+4 topology), and the
    fetch_global (process_allgather) validation path crossing processes.
    Loss/val/params must match the 1-process run of the same global
    batch."""
    from multihost_worker import build_trainer_c, param_sum

    steps = 2
    d1 = tmp_path / "single"
    d2 = tmp_path / "dual"
    d1.mkdir(), d2.mkdir()
    # 4 global devices (2 data x 2 seq), not 8: 8 heavy stage-c device
    # threads over 2 processes starve XLA:CPU's 40s all-reduce rendezvous
    # on this 2-core host (SIGABRT in rendezvous.cc)
    ref, _ = _run_rig(d1, 1, 4, steps, "c")
    got, _ = _run_rig(d2, 2, 2, steps, "c")

    # looser than stage-a's 1e-5 first step — measured and root-caused:
    # with the IDENTICAL global batch, params and rng key, one train step
    # differs 0.23% across collective topologies (4-local vs 2+2-gloo
    # all-reduce order through ~20 train-mode BN layers; the eval-mode
    # forward is bit-identical across topologies). Weights stay close;
    # BN running stats inherit the drift at activation-variance scale, so
    # the robust cross-topology checksum is weight_l1 (stats excluded).
    np.testing.assert_allclose(got["losses"][0], ref["losses"][0], rtol=3e-2)
    np.testing.assert_allclose(got["losses"], ref["losses"], rtol=3e-2)
    # step-0 validation: identical params + eval-mode forward -> the
    # cross-process fetch_global (process_allgather) path must reproduce
    # the single-process value near-exactly
    np.testing.assert_allclose(
        got["val_pearson0"], ref["val_pearson0"], atol=1e-5
    )
    assert np.isfinite(got["val_pearson"])  # post-training val is noise
    # on the 2x2-crop maps once topologies diverge (see comment above)
    # post-step weights: at this scaled rig the SGD updates dwarf the
    # init weights (random-init log-fold grads), so the 0.23%/step
    # topology divergence compounds into tens of percent of L1 after 2
    # steps — assert bounded, not equal (val_pearson0 above is the sharp
    # cross-process correctness pin)
    np.testing.assert_allclose(
        got["weight_l1"], ref["weight_l1"], rtol=0.35
    )

    # the 2-process collective stage-c checkpoint restores here exactly
    # (this process has 8 CPU devices; accumulate must match the writers'
    # global batch of 2 only for state SHAPE purposes — it does not)
    tr = build_trainer_c(str(d2), accumulate=2)
    assert tr.try_restore(), "collective checkpoint failed to restore"
    assert tr.step == steps
    np.testing.assert_allclose(
        param_sum(tr.trainable), got["param_sum"], rtol=1e-12
    )


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
