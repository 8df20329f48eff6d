"""Device-mesh construction helpers.

The reference's only parallelism is single-process nn.DataParallel over <=4
GPUs (orca_models.py:44, train scripts). Here parallelism is a JAX mesh:
  * 'data'  — batch data-parallelism (gradient psum over ICI/DCN)
  * 'seq'   — sequence-axis model parallelism for the bp-resolution encoder
              (halo exchange via ppermute, orca_tpu.parallel.sequence)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axis_sizes: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None,
              axis_names: Tuple[str, str] = ("data", "seq")) -> Mesh:
    """Create a (data, seq) mesh over the available devices.

    axis_sizes: explicit (data, seq) factorization; by default all devices go
    to 'data' (seq=1) — the right default for variant-screening throughput —
    while long-context encoding can ask for seq>1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n, 1)
    need = axis_sizes[0] * axis_sizes[1]
    if need > n:
        raise ValueError(f"{axis_sizes} needs {need} devices, have {n}")
    arr = np.array(devices[:need]).reshape(axis_sizes)
    return Mesh(arr, axis_names)


# Default mesh for inference cascades: when set, genomepredict /
# genomepredict_256mb run the encoder sequence-sharded over its 'seq' axis
# without every process_* caller having to thread a mesh argument.
_INFERENCE_MESH: Optional[Mesh] = None


def set_inference_mesh(mesh: Optional[Mesh]) -> None:
    """Set (or clear, with None) the process-wide inference mesh."""
    global _INFERENCE_MESH
    _INFERENCE_MESH = mesh


def get_inference_mesh() -> Optional[Mesh]:
    return _INFERENCE_MESH


def inference_mesh_from_seq_shards(seq_shards: int) -> Mesh:
    """All-devices mesh with `seq_shards` sequence shards (the remaining
    devices go to 'data' for batched window screening)."""
    n = len(jax.devices())
    if n % seq_shards:
        raise ValueError(f"{seq_shards=} does not divide {n} devices")
    return make_mesh((n // seq_shards, seq_shards))
