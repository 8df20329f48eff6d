"""1Mb-model predict path tests."""

import numpy as np
import pytest

import jax

from orca_tpu.models.zoo import Model1MBundle, normmat_1m_from_expectation
from orca_tpu.nn import decoders
from orca_tpu.predict.onemb import predict_1m, screen_windows


pytestmark = pytest.mark.slow


def _bundle(num_1d=4):
    net = decoders.init_net(jax.random.PRNGKey(0), num_1d=num_1d)
    d = np.arange(1000, dtype=np.float64)
    normmats, epss = normmat_1m_from_expectation(-1.0 * np.log1p(d) - 2.0)
    return Model1MBundle(name="t", net=net, num_1d=num_1d,
                         normmats=normmats, epss=epss)


def test_predict_1m_shapes_and_1d():
    b = _bundle()
    rng = np.random.RandomState(0)
    seq = np.eye(4, dtype=np.float32)[rng.randint(0, 4, (2, 40_000))]
    pred = predict_1m(b, seq)
    assert pred.shape == (2, 10, 10, 1)
    pred2, tracks = predict_1m(b, seq, with_1d=True)
    np.testing.assert_allclose(pred, pred2, atol=1e-6)
    assert tracks.shape == (2, 10, 4)
    assert (tracks >= 0).all() and (tracks <= 1).all()


def test_predict_1m_rc_average_symmetry():
    b = _bundle(num_1d=None)
    rng = np.random.RandomState(1)
    codes = rng.randint(0, 4, 40_000)
    seq = np.eye(4, dtype=np.float32)[codes][None]
    rc = seq[:, ::-1, ::-1]
    a = predict_1m(b, seq, rc_average=True)
    bb = predict_1m(b, rc, rc_average=True)
    # rc-averaged prediction of the reverse complement is the flipped map
    np.testing.assert_allclose(a, bb[:, ::-1, ::-1, :], atol=1e-4)


def test_screen_windows_chunks():
    b = _bundle(num_1d=None)
    rng = np.random.RandomState(2)
    seqs = np.eye(4, dtype=np.float32)[rng.randint(0, 4, (5, 40_000))]
    out = screen_windows(b, seqs, batch_size=2)
    assert out.shape == (5, 10, 10, 1)
    single = predict_1m(b, seqs[4:5])
    np.testing.assert_allclose(out[4], single[0], atol=1e-5)
