"""Subprocess worker for the TRUE multi-process multihost test.

Each invocation is one jax.distributed process of an N-process stage-a
training rig on localhost (CPU devices). Run with:

    python multihost_worker.py <proc_id> <nproc> <port> <workdir> \
        <local_devices> <steps>

Process 0 writes `losses.p0.json` with the per-step loss trajectory into
workdir. All processes participate in the collective orbax checkpoint.
"""

import json
import os
import sys


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


def main():
    proc_id, nproc, port = (int(a) for a in sys.argv[1:4])
    workdir = sys.argv[4]
    local_devices, steps = int(sys.argv[5]), int(sys.argv[6])

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

    import numpy as np

    tr = build_trainer(workdir, batch_size=8, steps=steps)
    losses = []
    while tr.step < steps:
        m = tr.run(max_steps=tr.step + 1)
        losses.append(float(m["loss"]))
    corr = tr.validate()
    tr.save()  # collective on multi-process runs: every process calls it

    if jax.process_index() == 0:
        with open(os.path.join(workdir, f"losses.n{nproc}.json"), "w") as f:
            json.dump({"losses": losses, "val_pearson": float(corr),
                       "param_sum": float(np.asarray(jax.tree.reduce(
                           lambda a, b: a + b,
                           jax.tree.map(
                               lambda x: jax.numpy.sum(
                                   x.astype(jax.numpy.float64)
                               ),
                               tr.params,
                           ),
                       )))},
                      f)
    if nproc > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    main()
