"""Multi-device tests on the 8-device virtual CPU mesh: sequence-sharded
encoder (halo exchange) matches the monolithic forward; data-parallel stage-a
step matches the single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from orca_tpu.nn import decoders, encoders
from orca_tpu.nn.core import fold_params
from orca_tpu.parallel.mesh import make_mesh
from orca_tpu.parallel.sequence import sharded_encoder_tower
from orca_tpu.training.stages import StageAConfig, make_stage_a_step


pytestmark = pytest.mark.slow


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_encoder_matches_monolithic():
    mesh = make_mesh((1, 4))
    params = fold_params(
        encoders.init_encoder_tower(jax.random.PRNGKey(0)),
        encoders.encoder_tower_spec(),
    )
    L = 4 * 448_000  # 4 shards of 112 bins each
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, L, 4))
    want = encoders.apply_encoder_tower(params, x)

    xs = jax.device_put(x, NamedSharding(mesh, P(None, "seq", None)))

    @jax.jit
    def run(p, xx):
        return sharded_encoder_tower(p, xx, mesh)

    got = run(params, xs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4
    )


def test_sharded_encoder_batch_and_seq():
    mesh = make_mesh((2, 4))
    params = fold_params(
        encoders.init_encoder_tower(jax.random.PRNGKey(0)),
        encoders.encoder_tower_spec(),
    )
    L = 4 * 224_000
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, L, 4))
    want = encoders.apply_encoder_tower(params, x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq", None)))

    @jax.jit
    def run(p, xx):
        return sharded_encoder_tower(p, xx, mesh)

    got = run(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_data_parallel_stage_a_step_matches_single_device():
    cfg = StageAConfig(num_1d=None, crop=4, target_factor=2, seq_len=16_000,
                      remat=False)
    params = decoders.init_net(jax.random.PRNGKey(0), num_1d=None)
    opt, step = make_stage_a_step(cfg)
    opt_state = opt.init(params)
    rng = np.random.RandomState(0)
    seq = jnp.array(rng.rand(8, 16_000, 4).astype(np.float32))
    target = jnp.array(np.abs(rng.rand(8, 8, 8)).astype(np.float32))
    normmat_r = jnp.full((4, 4), 0.1, jnp.float32)

    p1, _, m1 = step(params, opt_state, seq, target, jnp.zeros((8, 4, 0)),
                     jax.random.PRNGKey(1), jnp.float32(0.002), normmat_r, 0.1)

    mesh = make_mesh((8, 1))
    batch_sh = NamedSharding(mesh, P("data"))
    seq_d = jax.device_put(seq, NamedSharding(mesh, P("data", None, None)))
    target_d = jax.device_put(target, NamedSharding(mesh, P("data", None, None)))
    p2, _, m2 = step(params, opt_state, seq_d, target_d,
                     jnp.zeros((8, 4, 0)), jax.random.PRNGKey(1),
                     jnp.float32(0.002), normmat_r, 0.1)
    # sharded reductions reassociate float sums; only near-equality holds
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    l1 = p1["encoder"]["lconv"][0][0]["w"]
    l2 = p2["encoder"]["lconv"][0][0]["w"]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=5e-4,
                               rtol=1e-3)
