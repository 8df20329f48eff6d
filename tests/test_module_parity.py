"""Module-level parity vs the reference torch implementation.

Each test instantiates a reference torch module (random default init, eval
mode), converts its state_dict into an orca_tpu parameter pytree, runs both
on the same input, and compares. This simultaneously validates the
architecture transcription and the statedict converter used for the released
checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import import_reference_modules, reference_available
from orca_tpu.models import convert
from orca_tpu.nn import decoders, encoders
from orca_tpu.nn.core import fold_params

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference repo or torch unavailable"
)]

if reference_available():
    import torch

    ref = import_reference_modules()


def _np(x):
    return x.detach().cpu().numpy()


@pytest.fixture(scope="module", autouse=True)
def _seed():
    torch.manual_seed(0)


def test_encoder_tower_parity():
    m = ref.Encoder().eval()
    params = convert.convert_encoder_tower(m.state_dict())
    L = 40000
    x = np.random.RandomState(1).rand(1, L, 4).astype(np.float32)
    with torch.no_grad():
        theirs = _np(m(torch.tensor(x).permute(0, 2, 1))).transpose(0, 2, 1)
    ours = np.asarray(encoders.apply_encoder_tower(params, jnp.array(x)))
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_encoder_tower_blockwise_equals_monolithic():
    key = jax.random.PRNGKey(0)
    params = encoders.init_encoder_tower(key)
    L = 1_600_000
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, L, 4))
    mono = encoders.apply_encoder_tower(params, x)
    blocked = encoders.apply_encoder_tower(
        params, x, block_bp=400_000, halo_bp=112_000
    )
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(mono), atol=2e-4
    )


def test_encoder_tower_blockwise_scan_and_row_chunking():
    """Blockwise parity through the lax.scan path: ngroups>1 (block_group
    forces multiple scan steps), batch rows exceeding the rows cap (batch
    axis chunked inside the scan), a non-multiple-of-block length (partial
    last block), and traced validity bounds."""
    key = jax.random.PRNGKey(0)
    params = encoders.init_encoder_tower(key)
    L = 1_200_000  # 3 blocks of 400k; not a multiple of 2 blocks
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, L, 4))
    mono = encoders.apply_encoder_tower(params, x)
    # block_group=2 rows with n=4: rchunk=2, bpg=1 -> 6 scan steps
    blocked = encoders.apply_encoder_tower(
        params, x, block_bp=400_000, halo_bp=112_000, block_group=2
    )
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(mono), atol=2e-4
    )
    # validity bounds: zero outside [vs, ve) must match masked monolithic
    vs, ve = 400_000, 800_000
    bounded = encoders.apply_encoder_tower(
        params, x, block_bp=400_000, halo_bp=112_000, block_group=2,
        valid_start_bp=vs, valid_end_bp=ve,
    )
    mono_bounded = encoders.apply_encoder_tower(
        params, x, valid_start_bp=vs, valid_end_bp=ve
    )
    np.testing.assert_allclose(
        np.asarray(bounded), np.asarray(mono_bounded), atol=2e-4
    )


@pytest.mark.parametrize(
    "refcls,levels,up", [("Encoder2", 5, True), ("Encoder2b", 5, False),
                          ("Encoder3", 3, True)]
)
def test_pyramid_parity(refcls, levels, up):
    m = getattr(ref, refcls)().eval()
    params = convert.convert_pyramid(m.state_dict(), levels, up)
    L = 2 ** max(levels, 5) * 8
    x = np.random.RandomState(2).randn(1, L, 128).astype(np.float32) * 0.1
    with torch.no_grad():
        theirs = [
            _np(t).transpose(0, 2, 1)
            for t in m(torch.tensor(x).permute(0, 2, 1))
        ]
    ours = encoders.apply_pyramid(params, jnp.array(x), levels=levels, up_pass=up)
    assert len(ours) == len(theirs) == levels + 1
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), t, atol=3e-4)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("with_coarse", [True, False])
def test_decoder_parity(mode, with_coarse):
    m = ref.Decoder(upsample_mode=mode).eval()
    params = convert.convert_decoder(m.state_dict())
    S = 64
    x = np.random.RandomState(3).randn(1, S, 128).astype(np.float32) * 0.1
    dist = np.abs(np.random.RandomState(4).randn(1, S, S, 1)).astype(np.float32)
    dist = 0.5 * (dist + dist.transpose(0, 2, 1, 3)) + 0.1
    y = (
        np.random.RandomState(5).randn(1, S // 2, S // 2, 1).astype(np.float32)
        if with_coarse
        else None
    )
    with torch.no_grad():
        theirs = _np(
            m(
                torch.tensor(x).permute(0, 2, 1),
                torch.tensor(dist).permute(0, 3, 1, 2),
                torch.tensor(y).permute(0, 3, 1, 2) if with_coarse else None,
            )
        ).transpose(0, 2, 3, 1)
    ours = np.asarray(
        decoders.apply_decoder(
            params,
            jnp.array(x),
            jnp.array(dist),
            jnp.array(y) if with_coarse else None,
            upsample_mode=mode,
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_decoder1m_parity():
    m = ref.Decoder_1m().eval()
    params = convert.convert_decoder1m(m.state_dict())
    S = 64
    x = np.random.RandomState(6).randn(1, S, 128).astype(np.float32) * 0.1
    with torch.no_grad():
        theirs = _np(m(torch.tensor(x).permute(0, 2, 1))).transpose(0, 2, 3, 1)
    ours = np.asarray(decoders.apply_decoder1m(params, jnp.array(x)))
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_net_parity():
    m = ref.Net(num_1d=4).eval()
    params = convert.convert_net(m.state_dict(), num_1d=4)
    L = 40000
    x = np.random.RandomState(7).rand(1, L, 4).astype(np.float32)
    with torch.no_grad():
        pred_t, out1d_t = m(torch.tensor(x).permute(0, 2, 1))
    pred, out1d = decoders.apply_net(params, jnp.array(x), num_1d=4)
    np.testing.assert_allclose(
        np.asarray(pred), _np(pred_t).transpose(0, 2, 3, 1), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(out1d), _np(out1d_t).transpose(0, 2, 1), atol=3e-4
    )


def test_folded_params_match_unfolded():
    m = ref.Decoder_1m().eval()
    params = convert.convert_decoder1m(m.state_dict())
    folded = fold_params(params, decoders.decoder1m_spec(1))
    S = 32
    x = jnp.array(
        np.random.RandomState(8).randn(1, S, 128).astype(np.float32) * 0.1
    )
    a = np.asarray(decoders.apply_decoder1m(params, x))
    b = np.asarray(decoders.apply_decoder1m(folded, x))
    np.testing.assert_allclose(a, b, atol=2e-4)
