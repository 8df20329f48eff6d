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
