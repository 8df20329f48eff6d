"""Subprocess worker for the TRUE multi-process multihost tests.

Each invocation is one jax.distributed process of an N-process training
rig on localhost (CPU devices). Run with:

    python multihost_worker.py <proc_id> <nproc> <port> <workdir> \
        <local_devices> <steps> [stage]

stage: 'a' (default) = StageATrainer on a data-parallel mesh;
       'c' = StageCTrainer (cross-chromosome sampler, per-sample
       background normmats, fetch_global eval) on a data x seq mesh —
       the seq axis exercises the ppermute-halo sharded encoder across
       a REAL multi-process topology.

Process 0 writes `losses.<stage>.n<nproc>.json` with the per-step loss
trajectory, validation Pearson and a param checksum into workdir. All
processes participate in the collective orbax checkpoint.
"""

import json
import os
import sys


def param_sum(params) -> float:
    """Deterministic float64 checksum over a parameter pytree."""
    import jax
    import numpy as np

    return float(np.asarray(jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda x: jax.numpy.sum(x.astype(jax.numpy.float64)), params
        ),
    )))


def weight_l1(params) -> float:
    """L1 over WEIGHTS only (BN running mean/var excluded): the
    cross-topology robust checksum. Train-mode BN batch stats amplify the
    collective-implementation reduction-order difference (4-local vs
    2+2-gloo) ~1e-7 -> ~1e-3 through ~20 normalization layers, and the
    running stats (absolute activation variances) inherit it at full
    scale, so a stats-inclusive checksum drifts percent-level between
    topologies while the weights stay 1e-5-close (measured; see
    test_true_two_process_stage_c)."""
    import jax
    from jax.tree_util import tree_flatten_with_path

    leaves, _ = tree_flatten_with_path(params)
    total = 0.0
    for path, leaf in leaves:
        last = getattr(path[-1], "key", None)
        if last in ("mean", "var"):
            continue
        total = total + jax.numpy.sum(
            jax.numpy.abs(leaf.astype(jax.numpy.float64))
        )
    import numpy as np

    return float(np.asarray(total))


def build_trainer(workdir, batch_size, steps):
    import numpy as np

    from orca_tpu.data import genome as g
    from orca_tpu.data.sampler import RandomWindowSampler
    from orca_tpu.data.targets import DenseContactMatrix
    from orca_tpu.parallel import multihost
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
    loop = LoopConfig(workdir=workdir, lr=0.002, batch_size=batch_size,
                      checkpoint_every=1000, validate_every=steps,
                      val_batches=1)
    mesh = multihost.make_multihost_mesh(seq_per_host=1)
    return StageATrainer(cfg, loop, sampler,
                         np.full((10, 10), 0.1, np.float32), eps=0.1,
                         mesh=mesh)


def build_trainer_c(workdir, accumulate):
    """Scaled stage-c rig (mirrors tests/test_stage_c.py geometry): 2Mb
    cross-chromosome windows with per-sample cis/trans backgrounds, on a
    mesh with a non-trivial 'seq' axis so the frozen encoder runs
    ppermute-halo sequence-sharded across the distributed topology
    (train_h1esc_c.py:36-53,150-227)."""
    import numpy as np

    import jax

    from orca_tpu.data import genome as g
    from orca_tpu.data.sampler import RandomWindowSampler
    from orca_tpu.data.targets import DenseContactMatrix
    from orca_tpu.nn import decoders, encoders
    from orca_tpu.nn.core import fold_params
    from orca_tpu.parallel import multihost
    from orca_tpu.predict.multiscale import CascadeGeometry
    from orca_tpu.training.loop import LoopConfig, StageCTrainer
    from orca_tpu.training.stages import StageCConfig

    # 2-level prefix, same trade as __graft_entry__.dryrun_multichip: the
    # full 4-level compile on an oversubscribed 2-core host skews the two
    # processes' arrival at the first collective beyond gloo's 30s
    # rendezvous budget; the 2-level step exercises the same structure
    # (per-sample normmats, seq-sharded frozen tower, coarse chain, grads)
    levels = (256, 128)
    geom = CascadeGeometry(window_bp=2_048_000, bin_bp=32_000, crop=2)

    ke, kp1, kp, kd = jax.random.split(jax.random.PRNGKey(11), 4)
    trainable = {
        "pyramid": encoders.init_pyramid(kp, 3, True),
        "decoders": {
            lv: decoders.init_decoder(k)
            for lv, k in zip(levels, jax.random.split(kd, len(levels)))
        },
    }
    frozen = {
        "encoder": fold_params(
            encoders.init_encoder_tower(ke), encoders.encoder_tower_spec()
        ),
        "pyramid1": fold_params(
            encoders.init_pyramid(kp1, 5, True),
            encoders.pyramid_spec(5, True),
        ),
    }

    rng = np.random.RandomState(0)
    chrlen = geom.window_bp // 2
    gen = g.CodeGenome({
        "chr1": rng.randint(0, 4, chrlen).astype(np.uint8),
        "chr2": rng.randint(0, 4, chrlen).astype(np.uint8),
        "chr3": rng.randint(0, 4, chrlen).astype(np.uint8),
    })
    nb = chrlen // geom.bin_bp
    mats = {c: np.abs(rng.rand(nb, nb)).astype(np.float32)
            for c, _ in gen.get_chr_lens()}
    target = DenseContactMatrix(mats, resolution=geom.bin_bp,
                                shape=(geom.bins, geom.bins))
    d = np.arange(geom.bins, dtype=np.float64)
    sampler = RandomWindowSampler(
        gen, target, background_cis=np.exp(-1.2 * np.log1p(d) - 3.0),
        background_trans=float(np.exp(-9.0)),
        sequence_length=geom.window_bp, position_resolution=geom.bin_bp,
        random_strand=False, cross_chromosome=True, permute_segments=False,
        validation_holdout=["chr3"], test_holdout=[], seed=0,
        packed_sequence=True,
    )
    cfg = StageCConfig(geometry=geom, levels=levels, encoder_block_bp=None)
    loop = LoopConfig(workdir=workdir, lr=0.002, batch_size=accumulate,
                      checkpoint_every=1000, validate_every=1000,
                      val_batches=1)
    mesh = multihost.make_multihost_mesh(seq_per_host=2)
    return StageCTrainer(cfg, loop, sampler, trainable, frozen,
                         nan_skip=1.1, accumulate=accumulate, mesh=mesh)


def main():
    proc_id, nproc, port = (int(a) for a in sys.argv[1:4])
    workdir = sys.argv[4]
    local_devices, steps = int(sys.argv[5]), int(sys.argv[6])
    stage = sys.argv[7] if len(sys.argv) > 7 else "a"

    # sitecustomize registers the axon TPU at interpreter startup and pins
    # JAX_PLATFORMS; env vars set here are too late — force the CPU
    # platform through jax.config + clear_backends (the conftest pattern).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_backend_optimization_level=0"
    ).strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", local_devices)
    except RuntimeError:
        pass
    # reset any backend sitecustomize already initialized — distributed
    # init must precede backend initialization
    from jax.extend.backend import clear_backends

    clear_backends()
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=proc_id,
        )
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.process_count() == nproc, jax.process_count()
    if nproc > 1:
        # Create the cross-process gloo context NOW, while the processes
        # are still in lock-step: its rendezvous has a 30s deadline, and
        # the first collective of the big training program would otherwise
        # pay it after minutes of (skewed) per-process compilation.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("worker-start")

    if stage == "a":
        tr = build_trainer(workdir, batch_size=8, steps=steps)
        watched = lambda: tr.params  # noqa: E731
    else:
        # accumulate == data-axis extent (device_count / seq 2); the
        # stage-c rig runs 4 global devices, not 8: on the 2-core host,
        # 8 heavy device threads across 2 processes starve XLA:CPU's
        # 40s all-reduce rendezvous (observed SIGABRT in rendezvous.cc)
        tr = build_trainer_c(workdir, accumulate=max(1, jax.device_count() // 2))
        watched = lambda: tr.trainable  # noqa: E731
    # pre-training validation: params are identical across topologies at
    # step 0 and the eval-mode forward has no train-BN amplification, so
    # this pins the cross-process fetch_global/process_allgather eval
    # path near-exactly (post-training val on the scaled rigs is noise:
    # topology-divergent BN stats + tiny maps)
    corr0 = tr.validate()
    losses = []
    while tr.step < steps:
        m = tr.run(max_steps=tr.step + 1)
        losses.append(float(m["loss"]))
    corr = tr.validate()
    tr.save()  # collective on multi-process runs: every process calls it

    if jax.process_index() == 0:
        name = f"losses.{stage}.n{nproc}.json"
        with open(os.path.join(workdir, name), "w") as f:
            json.dump({"losses": losses, "val_pearson": float(corr),
                       "val_pearson0": float(corr0),
                       "param_sum": param_sum(watched()),
                       "weight_l1": weight_l1(watched())}, f)
    if nproc > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    main()
