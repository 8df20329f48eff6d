"""256Mb-path cascade parity vs a torch oracle at scaled geometry.

Covers the three-tower encoder stack (Encoder -> Encoder2 -> Encoder3), the
4-level zoom with per-region normmats (dynamic block-averaging), the
chromosome-bound zoom clamping, and the RC-pass distenc flip + mirrored
start index (orca_predict.py:543-878)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference_modules, reference_available
from orca_tpu.models import convert
from orca_tpu.models.zoo import Model256MBundle
from orca_tpu.predict.multiscale import CascadeGeometry, _cascade_256mb
from orca_tpu.predict.retrieval import assemble_normmat

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference repo or torch unavailable"
)]

if reference_available():
    import torch

    ref = import_reference_modules()

# window 8.192Mb at 32kb bins: 256 bins, crop 8, levels [256,128,64,32]
# with factors [32,16,8,4]
GEOM = CascadeGeometry(window_bp=8_192_000, bin_bp=32_000, crop=8)
LEVELS = (32, 64, 128, 256)


def _build_pair(seed=0):
    torch.manual_seed(seed)
    net0 = ref.Encoder().eval()
    net1 = ref.Encoder2().eval()
    net = ref.Encoder3().eval()
    denets = {lv: ref.Decoder(upsample_mode="bilinear").eval() for lv in LEVELS}
    d = np.arange(GEOM.bins, dtype=np.float64)
    background_cis = np.hstack(
        [np.exp(-1.2 * np.log1p(d) - 3.0), np.repeat(np.nan, 2000)]
    )
    bundle = Model256MBundle(
        name="oracle256",
        encoder=convert.convert_encoder_tower(net0.state_dict()),
        pyramid1=convert.convert_pyramid(net1.state_dict(), 5, True),
        pyramid=convert.convert_pyramid(net.state_dict(), 3, True),
        decoders={
            lv: convert.convert_decoder(m.state_dict())
            for lv, m in denets.items()
        },
        background_cis=background_cis,
        background_trans=float(np.exp(-9.0)),
    )
    return (net0, net1, net, denets), bundle


# the torch oracle lives in orca_tpu.certify (shared with `orca-tpu
# certify --families 256m`), so certification logic is continuously
# validated at scaled geometry here
from orca_tpu.certify import torch_cascade_256m as _torch_cascade_256


@pytest.mark.parametrize("mpos_frac", [0.3, 0.62])
def test_cascade_256m_parity(mpos_frac):
    modules, bundle = _build_pair()
    rng = np.random.RandomState(7)
    seq = rng.rand(1, GEOM.window_bp, 4).astype(np.float32)
    # two-region mosaic background (main chromosome + padding chromosome)
    chrlen = int(GEOM.window_bp * 0.75)
    chrlen -= chrlen % GEOM.bin_bp
    normmat = assemble_normmat(
        [["chrM", 0, chrlen, "+"],
         ["chrP", 0, GEOM.window_bp - chrlen, "+"]],
        bundle.background_cis, bundle.background_trans, binsize=GEOM.bin_bp,
    ).astype(np.float32)
    wpos = GEOM.window_bp // 2
    mpos = int(GEOM.window_bp * mpos_frac)

    want, want_starts = _torch_cascade_256(
        modules, seq, normmat, chrlen, mpos, wpos, GEOM
    )
    nm_filled = normmat.copy()
    mask = np.isnan(nm_filled)
    nm_filled[mask] = np.nanmin(nm_filled[~mask])
    got, got_starts, got_norms = _cascade_256mb(
        bundle, GEOM, jnp.asarray(seq), jnp.float32(mpos), jnp.float32(wpos),
        jnp.float32(chrlen), jnp.asarray(nm_filled),
    )
    np.testing.assert_array_equal(np.asarray(got_starts), np.array(want_starts))
    for j in range(4):
        np.testing.assert_allclose(
            np.asarray(got[j][0]), want[j], atol=2e-3, err_msg=f"level {j}"
        )
