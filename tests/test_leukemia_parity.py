"""Parity of the num_2d-generalized modules vs the reference leukemia
variants (multi-cell-type heads, orca_leukemia.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference_leukemia, reference_available
from orca_tpu.models import convert
from orca_tpu.nn import decoders, encoders

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference repo or torch unavailable"
)]

if reference_available():
    import torch

    leu = import_reference_leukemia()


def _np(x):
    return x.detach().cpu().numpy()


def test_leukemia_decoder_num2d_parity():
    torch.manual_seed(0)
    num_2d = 2
    m = leu.Decoder(num_2d).eval()
    params = convert.convert_decoder(m.state_dict(), num_2d=num_2d)
    S = 48
    x = np.random.RandomState(1).randn(1, S, 128).astype(np.float32) * 0.1
    dist = (
        np.abs(np.random.RandomState(2).randn(1, S, S, num_2d)) + 0.1
    ).astype(np.float32)
    y = np.random.RandomState(3).randn(1, S // 2, S // 2, num_2d).astype(
        np.float32
    )
    with torch.no_grad():
        theirs = _np(
            m(
                torch.tensor(x).permute(0, 2, 1),
                torch.tensor(dist).permute(0, 3, 1, 2),
                torch.tensor(y).permute(0, 3, 1, 2),
            )
        ).transpose(0, 2, 3, 1)
    ours = np.asarray(
        decoders.apply_decoder(
            params, jnp.array(x), jnp.array(dist), jnp.array(y),
            num_2d=num_2d, upsample_mode="nearest",
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_leukemia_decoder1m_num2d_parity():
    torch.manual_seed(1)
    num_2d = 6
    m = leu.Decoder_1m(num_2d).eval()
    params = convert.convert_decoder1m(m.state_dict(), num_2d=num_2d)
    S = 40
    x = np.random.RandomState(4).randn(1, S, 128).astype(np.float32) * 0.1
    with torch.no_grad():
        theirs = _np(m(torch.tensor(x).permute(0, 2, 1))).transpose(0, 2, 3, 1)
    ours = np.asarray(
        decoders.apply_decoder1m(params, jnp.array(x), num_2d=num_2d)
    )
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_leukemia_encoder2_is_pyramid_without_up_pass():
    torch.manual_seed(2)
    m = leu.Encoder2().eval()
    params = convert.convert_pyramid(m.state_dict(), levels=5, up_pass=False)
    L = 128
    x = np.random.RandomState(5).randn(1, L, 128).astype(np.float32) * 0.1
    with torch.no_grad():
        theirs = [
            _np(t).transpose(0, 2, 1)
            for t in m(torch.tensor(x).permute(0, 2, 1))
        ]
    ours = encoders.apply_pyramid(params, jnp.array(x), levels=5,
                                  up_pass=False)
    assert len(ours) == len(theirs)
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), t, atol=3e-4)
