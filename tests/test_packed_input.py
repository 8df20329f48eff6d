"""Packed uint8 quarter-scale one-hot input equals the float path."""

import numpy as np

import jax
import jax.numpy as jnp

from orca_tpu.nn import encoders


def test_packed_input_matches_float():
    params = encoders.init_encoder_tower(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    # one-hot with some unknown (0.25) rows
    codes = rng.randint(0, 5, 40_000)
    onehot = np.vstack(
        [np.eye(4, dtype=np.float32), np.full(4, 0.25, np.float32)]
    )[codes][None]
    packed = encoders.pack_onehot(onehot)
    assert packed.dtype == np.uint8
    a = encoders.apply_encoder_tower(params, jnp.asarray(onehot))
    b = encoders.apply_encoder_tower(params, jnp.asarray(packed))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sampler_packed_sequence_matches_float():
    """packed_sequence=True emits uint8 quarter-scale equal to 4x the
    float path (16x less IPC traffic through the worker queues)."""
    from orca_tpu.data import genome as g
    from orca_tpu.data.sampler import RandomWindowSampler
    from orca_tpu.data.targets import DenseContactMatrix

    rng = np.random.RandomState(0)
    gen = g.CodeGenome({
        "chr1": rng.randint(0, 5, 50_000).astype(np.uint8),
        "chr2": rng.randint(0, 5, 50_000).astype(np.uint8),
    })
    mats = {c: np.abs(rng.rand(50, 50)).astype(np.float32)
            for c, _ in gen.get_chr_lens()}
    target = DenseContactMatrix(mats, resolution=1000, shape=(10, 10))
    kw = dict(
        genome=gen, target=target, sequence_length=10_000,
        position_resolution=1000, random_strand=True,
        cross_chromosome=True, validation_holdout=["chr2"],
        test_holdout=[], seed=7,
    )
    sp = RandomWindowSampler(packed_sequence=True, **kw)
    sf = RandomWindowSampler(packed_sequence=False, **kw)
    seq_p, tgt_p = sp.sample(2)[:2]
    seq_f, tgt_f = sf.sample(2)[:2]
    assert seq_p.dtype == np.uint8
    np.testing.assert_array_equal(seq_p, (seq_f * 4).astype(np.uint8))
    np.testing.assert_array_equal(tgt_p, tgt_f)


def test_apply_net_accepts_packed_input():
    from orca_tpu.nn import decoders

    params = decoders.init_net(jax.random.PRNGKey(0), num_1d=None)
    rng = np.random.RandomState(1)
    codes = rng.randint(0, 5, 16_000)
    onehot = np.vstack(
        [np.eye(4, dtype=np.float32), np.full(4, 0.25, np.float32)]
    )[codes][None]
    a = decoders.apply_net(params, jnp.asarray(onehot), num_1d=None)
    b = decoders.apply_net(
        params, jnp.asarray(encoders.pack_onehot(onehot)), num_1d=None
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_device_sequence_packs_and_passes_through():
    from orca_tpu.predict.multiscale import _device_sequence

    onehot = np.vstack(
        [np.eye(4, dtype=np.float32), np.full(4, 0.25, np.float32)]
    )[None]
    packed = _device_sequence(onehot)
    assert packed.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(packed), (onehot * 4).astype(np.uint8))
    arbitrary = np.full((1, 4, 4), 0.3, np.float32)
    out = _device_sequence(arbitrary)
    assert out.dtype == jnp.float32
