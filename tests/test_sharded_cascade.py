"""Sharded-inference parity on the 8-device CPU mesh: the full multiscale
cascades with a sequence-sharded encoder (halo exchange + all-gather tile
merge) match the single-device cascades bit-for-near-bit, for both the
32Mb and 256Mb geometries (scaled down)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from orca_tpu.models.zoo import (
    Model256MBundle,
    fold_bundle,
    random_32m_bundle,
)
from orca_tpu.nn import decoders, encoders
from orca_tpu.nn.core import fold_params
from orca_tpu.parallel.mesh import make_mesh
from orca_tpu.predict.multiscale import (
    CascadeGeometry,
    _cascade_32mb,
    _cascade_256mb,
)

import pytest

pytestmark = pytest.mark.slow


GEOM32 = CascadeGeometry(window_bp=1_024_000, bin_bp=4000, crop=8)
GEOM256 = CascadeGeometry(window_bp=8_192_000, bin_bp=32_000, crop=8)


def test_sharded_cascade_32mb_matches_single_device():
    bundle = fold_bundle(
        random_32m_bundle(seed=3, nbins=GEOM32.bins, crop=GEOM32.crop)
    )
    log_nm = jnp.asarray(bundle.log_normmats())
    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.rand(1, GEOM32.window_bp, 4).astype(np.float32))
    mpos = jnp.float32(GEOM32.window_bp * 0.6)
    wpos = jnp.float32(GEOM32.window_bp // 2)

    want_preds, want_starts = _cascade_32mb(
        bundle, GEOM32, seq, mpos, wpos, log_nm
    )

    mesh = make_mesh((1, 4))
    seq_sh = jax.device_put(seq, NamedSharding(mesh, P(None, "seq", None)))
    got_preds, got_starts = _cascade_32mb(
        bundle, GEOM32, seq_sh, mpos, wpos, log_nm, mesh=mesh
    )
    np.testing.assert_array_equal(np.asarray(got_starts),
                                  np.asarray(want_starts))
    np.testing.assert_allclose(
        np.asarray(got_preds), np.asarray(want_preds), atol=5e-4
    )


def _random_256m_small(geom: CascadeGeometry):
    key = jax.random.PRNGKey(11)
    ke, kp1, kp, kd = jax.random.split(key, 4)
    levels = (32, 64, 128, 256)
    dec = {
        lv: fold_params(decoders.init_decoder(k), decoders.decoder_spec(1))
        for lv, k in zip(levels, jax.random.split(kd, len(levels)))
    }
    d = np.arange(geom.bins, dtype=np.float64)
    background_cis = np.hstack(
        [np.exp(-1.2 * np.log1p(d) - 3.0), np.repeat(np.nan, 200)]
    )
    return Model256MBundle(
        name="sharded256",
        encoder=fold_params(encoders.init_encoder_tower(ke),
                            encoders.encoder_tower_spec()),
        pyramid1=fold_params(encoders.init_pyramid(kp1, 5, True),
                             encoders.pyramid_spec(5, True)),
        pyramid=fold_params(encoders.init_pyramid(kp, 3, True),
                            encoders.pyramid_spec(3, True)),
        decoders=dec,
        background_cis=background_cis,
        background_trans=float(np.exp(-9.0)),
    )


def test_sharded_cascade_256mb_matches_single_device():
    geom = GEOM256
    bundle = _random_256m_small(geom)
    rng = np.random.RandomState(1)
    seq = jnp.asarray(rng.rand(1, geom.window_bp, 4).astype(np.float32))
    d = np.abs(np.arange(geom.bins)[None, :] - np.arange(geom.bins)[:, None])
    normmat = np.exp(-1.2 * np.log1p(d) - 3.0).astype(np.float32)
    mpos = jnp.float32(geom.window_bp * 0.4)
    wpos = jnp.float32(geom.window_bp // 2)
    chrlen = jnp.float32(geom.window_bp)

    want = _cascade_256mb(bundle, geom, seq, mpos, wpos, chrlen, normmat)

    mesh = make_mesh((1, 4))
    seq_sh = jax.device_put(seq, NamedSharding(mesh, P(None, "seq", None)))
    got = _cascade_256mb(
        bundle, geom, seq_sh, mpos, wpos, chrlen, normmat, mesh=mesh
    )
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), atol=5e-4
    )
