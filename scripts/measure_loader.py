"""Measure PrefetchLoader throughput: packed uint8 vs float32 wire format.

The training input pipeline's sampler can emit packed quarter-scale uint8
sequences (16x smaller through the worker queues). This measures delivered
batches/s for both formats on a stage-b-like geometry (32Mb windows scaled
down by SCALE to fit the host) and prints one JSON line for
ARCHITECTURE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from orca_tpu.data import genome as g
from orca_tpu.data.pipeline import PrefetchLoader
from orca_tpu.data.sampler import RandomWindowSampler
from orca_tpu.data.targets import DenseContactMatrix


def make_sampler(window_bp, res, packed, seed=0):
    rng = np.random.RandomState(seed)
    chrlen = 2 * window_bp
    gen = g.CodeGenome({
        "chr1": rng.randint(0, 4, chrlen).astype(np.uint8),
        "chr2": rng.randint(0, 4, chrlen).astype(np.uint8),
    })
    nb = chrlen // res
    mats = {c: np.abs(rng.rand(nb, nb)).astype(np.float32)
            for c, _ in gen.get_chr_lens()}
    target = DenseContactMatrix(mats, resolution=res,
                                shape=(window_bp // res, window_bp // res))
    return RandomWindowSampler(
        gen, target, sequence_length=window_bp, position_resolution=res,
        random_strand=True, cross_chromosome=False,
        validation_holdout=["chr2"], test_holdout=[], seed=seed,
        packed_sequence=packed,
    )


def measure(packed, window_bp, res, n_batches=24, workers=2):
    sampler = make_sampler(window_bp, res, packed)
    with PrefetchLoader(sampler, 1, num_workers=workers,
                        backend="process") as loader:
        loader.get(timeout=120)  # warm
        t0 = time.time()
        nbytes = 0
        for _ in range(n_batches):
            batch = loader.get(timeout=120)
            nbytes += sum(a.nbytes for a in batch)
        dt = time.time() - t0
    return n_batches / dt, nbytes / n_batches


def main():
    window_bp = int(os.environ.get("ORCA_LOADER_WINDOW", "4000000"))
    res = 4000
    bps, nb_p = measure(True, window_bp, res)
    bfs, nb_f = measure(False, window_bp, res)
    print(json.dumps({
        "metric": "prefetch_loader_batches_per_s",
        "window_bp": window_bp,
        "workers": 2,
        "packed_uint8": round(bps, 2),
        "float32": round(bfs, 2),
        "packed_batch_mb": round(nb_p / 1e6, 1),
        "float32_batch_mb": round(nb_f / 1e6, 1),
        "speedup": round(bps / bfs, 2),
    }))


if __name__ == "__main__":
    main()
