"""Multi-host (DCN) execution support.

The reference has no multi-process capability at all (SURVEY §2.5); here
multi-host runs initialize jax.distributed and build meshes whose 'data'
axis spans hosts (gradients all-reduce over ICI within a slice and DCN
across slices) while 'seq' stays intra-slice (halo exchange must ride ICI).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (TPU pods auto-detect all
    arguments; explicit values support manual GPU/CPU rigs). Idempotent:
    a second call (e.g. launcher after manual setup) is a no-op."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def make_multihost_mesh(seq_per_host: int = 1,
                        axis_names: Tuple[str, str] = ("data", "seq")) -> Mesh:
    """Mesh over all global devices: 'seq' spans `seq_per_host` devices
    *within* each host (ICI), 'data' spans the rest.

    Devices are ordered host-major so the seq axis never crosses DCN.
    """
    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, getattr(d, "id", 0))
    )
    n = len(devices)
    if n % seq_per_host:
        raise ValueError(f"{seq_per_host=} does not divide {n} devices")
    arr = np.array(devices).reshape(n // seq_per_host, seq_per_host)
    return Mesh(arr, axis_names)


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this process should feed (per-host input
    pipelines shard the sampler output by process index)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def shard_batch(mesh: Mesh, *arrays, batch_axis: str = "data",
                global_batch: bool = True):
    """Place numpy batches as global arrays sharded over `batch_axis`.

    global_batch=True (the trainer path): every process passes the SAME
    full global batch (samplers are identically seeded across hosts, so
    their draws agree); each process keeps only its local_batch_slice and
    jax assembles the global sharded array without gathering data onto any
    single host. This makes an N-process run bit-identical to the
    single-process run on the same seed — the multi-host analogue of the
    reference's single-process DataParallel split (train_h1esc_a.py:102).

    global_batch=False: each process passes only ITS precomputed slice.
    Single-process runs degenerate to an ordinary device_put with a batch
    sharding. Replicated axes (all but the first) stay unsharded.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    pc = jax.process_count()
    out = []
    for arr in arrays:
        arr = np.asarray(arr)
        spec = P(batch_axis, *([None] * (arr.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if pc == 1:
            out.append(jax.device_put(arr, sharding))
        else:
            local = arr[local_batch_slice(arr.shape[0])] if global_batch \
                else arr
            out.append(
                jax.make_array_from_process_local_data(sharding, local)
            )
    return out[0] if len(out) == 1 else tuple(out)


def is_primary() -> bool:
    return jax.process_index() == 0


def fetch_global(array) -> np.ndarray:
    """Bring a (possibly cross-process data-sharded) array to the host.

    np.asarray on an array spanning non-addressable devices raises on
    multi-process runs; process_allgather assembles the global value on
    every host (validation metrics are small). Single-process arrays take
    the plain fetch."""
    if jax.process_count() == 1:
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))
