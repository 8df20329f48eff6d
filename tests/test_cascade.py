"""End-to-end multiscale cascade parity vs a torch oracle.

Runs the reference modules (orca_modules.py) under a faithful
re-implementation of the reference genomepredict zoom loop
(orca_predict.py:316-523) at a scaled-down geometry (1.024Mb window, 8-bin
crops), and compares against orca_tpu's single-jit cascade using the same
(converted) weights. Exercises encoder, pyramid, per-level decoders, the
denet_1_pt additive head, zoom-index arithmetic, and fwd/RC averaging.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference_modules, reference_available
from orca_tpu.models import convert
from orca_tpu.models.zoo import ModelBundle, _random_normmats
from orca_tpu.predict.multiscale import CascadeGeometry, _cascade_32mb

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference repo or torch unavailable"
)]

if reference_available():
    import torch

    ref = import_reference_modules()

GEOM = CascadeGeometry(window_bp=1_024_000, bin_bp=4000, crop=8)
LEVELS = (32, 16, 8, 4, 2, 1)


def _build_pair(seed=0):
    """Build matching (torch modules, orca_tpu bundle)."""
    torch.manual_seed(seed)
    net0 = ref.Encoder().eval()
    net = ref.Encoder2().eval()
    denets = {lv: ref.Decoder(upsample_mode="bilinear").eval() for lv in LEVELS}
    denet_1pt = ref.Decoder_1m().eval()
    normmats, epss = _random_normmats(nbins=GEOM.bins, crop=GEOM.crop)
    bundle = ModelBundle(
        name="oracle",
        encoder=convert.convert_encoder_tower(net0.state_dict()),
        pyramid=convert.convert_pyramid(net.state_dict(), 5, True),
        decoders={
            lv: convert.convert_decoder(d.state_dict())
            for lv, d in denets.items()
        },
        decoder_1pt=convert.convert_decoder1m(denet_1pt.state_dict()),
        normmats=normmats,
        epss=epss,
    )
    return (net0, net, denets, denet_1pt, normmats), bundle


# the oracle zoom loop lives in the certification module so the same code
# path that certifies real checkpoints is what these tests validate
from orca_tpu.certify import torch_cascade_32m as _torch_cascade


@pytest.mark.parametrize("mpos_frac", [0.5, 0.13, 0.97])
def test_cascade_parity(mpos_frac):
    modules, bundle = _build_pair()
    rng = np.random.RandomState(42)
    seq = rng.rand(1, GEOM.window_bp, 4).astype(np.float32)
    wpos = GEOM.window_bp // 2
    mpos = int(GEOM.window_bp * mpos_frac)

    want, want_starts = _torch_cascade(
        modules, seq, mpos, wpos, GEOM
    )
    got, got_starts = _cascade_32mb(
        bundle, GEOM, jnp.asarray(seq), jnp.float32(mpos), jnp.float32(wpos),
        jnp.asarray(bundle.log_normmats()),
    )
    np.testing.assert_array_equal(np.asarray(got_starts), np.array(want_starts))
    for j in range(6):
        np.testing.assert_allclose(
            np.asarray(got[j][0, :, :, 0]), want[j], atol=2e-3,
            err_msg=f"level index {j}",
        )
