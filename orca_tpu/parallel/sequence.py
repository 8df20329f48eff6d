"""Sequence-axis sharded encoder with halo exchange over ICI.

The reference bounds encoder memory with a *sequential* Python loop over
800kb blocks with 112kb halos (orca_modules.py:929-980). On a TPU mesh the
same decomposition runs *in parallel*: the sequence axis is sharded across
devices, each device encodes its shard, and the 112kb halos are exchanged
with neighbors via `lax.ppermute` (collective-permute rides the ICI
links). Because the halo covers the tower's full receptive field
(~104kb, encoders.RECEPTIVE_FIELD_BP), the sharded result is exactly the
monolithic convolution: a device missing a neighbor (sequence boundary)
receives zeros from ppermute, which is precisely the conv zero padding.

Each shard's local forward is the ordinary `apply_encoder_tower` with
traced validity bounds — so the sharded path inherits the full fast path:
bf16 params, the fused Pallas chain kernels, packed uint8 inputs, and
intra-shard blocking for long local extents (a 256Mb window on 8 chips is
still 32Mb/chip).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from orca_tpu.nn import encoders


def _halo_exchange(xs: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad the local length axis with neighbors' edges (zeros at mesh ends).

    xs: (N, L_local, C). Non-circular ppermute fills absent sources with
    zeros — the conv boundary condition.
    """
    n_shards = lax.axis_size(axis_name)
    # receive my LEFT halo = right edge of my left neighbor (i -> i+1)
    left = lax.ppermute(
        xs[:, -halo:, :], axis_name,
        [(i, i + 1) for i in range(n_shards - 1)],
    )
    # receive my RIGHT halo = left edge of my right neighbor (i -> i-1)
    right = lax.ppermute(
        xs[:, :halo, :], axis_name,
        [(i + 1, i) for i in range(n_shards - 1)],
    )
    return jnp.concatenate([left, xs, right], axis=1)


def sharded_encoder_tower(
    params,
    x: jax.Array,
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    batch_axis: Optional[str] = "data",
    halo_bp: int = 112_000,
    block_bp: Optional[int] = None,
) -> jax.Array:
    """bp->4kb encoder with the length axis sharded over `seq_axis`.

    x: (N, L, 4) one-hot (uint8 packed quarter-scale supported) with L
    divisible by (shards * 4000). Returns (N, L/4000, 128) sharded the same
    way. Call under jit for SPMD lowering. Compute dtype follows the param
    dtype (bf16 params select the fast MXU/Pallas path), identical to the
    single-device tower.
    """
    halo_bins = halo_bp // encoders.BIN_BP
    # Shard the batch over `batch_axis` only when it divides evenly;
    # otherwise replicate over it (e.g. a 2-row fwd+RC inference batch on a
    # training mesh with a wider 'data' axis).
    in_batch = (
        batch_axis
        if batch_axis in mesh.axis_names
        and x.shape[0] % mesh.shape[batch_axis] == 0
        else None
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(in_batch, seq_axis, None)),
        out_specs=P(in_batch, seq_axis, None),
        check_vma=False,  # params are closed-over replicated arrays
    )
    def run(p, xs):
        local_bp = xs.shape[1]
        xs = _halo_exchange(xs, halo_bp, seq_axis)
        # Edge shards receive zeros for the missing neighbor; masked
        # execution turns that into exact monolithic boundary semantics
        # (per-layer conv zero padding at the traced bounds).
        idx = lax.axis_index(seq_axis)
        n_shards = lax.axis_size(seq_axis)
        valid_start = jnp.where(idx == 0, halo_bp, 0)
        valid_end = jnp.where(
            idx == n_shards - 1, halo_bp + local_bp, local_bp + 2 * halo_bp
        )
        out = encoders.apply_encoder_tower(
            p, xs,
            block_bp=block_bp,
            halo_bp=halo_bp,
            valid_start_bp=valid_start,
            valid_end_bp=valid_end,
        )
        return out[:, halo_bins:-halo_bins, :]

    return run(params, x)
