"""End-to-end certification flow self-test: synthetic reference-format
statedicts + genome resources on disk -> `certify_32m` loads both sides
from the files and reports parity (at scaled geometry)."""

import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, reference_available
from orca_tpu.predict.multiscale import CascadeGeometry

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not reference_available(), reason="reference repo or torch unavailable"
)]

GEOM = CascadeGeometry(window_bp=1_024_000, bin_bp=4000, crop=8)


def _write_fake_resources(tmp_path):
    import torch

    from conftest import import_reference_modules

    ref = import_reference_modules()
    model_dir = tmp_path / "models"
    resource_dir = tmp_path / "resources"
    model_dir.mkdir()
    resource_dir.mkdir()

    torch.manual_seed(7)
    net0 = ref.Encoder()
    net = ref.Encoder2()
    denet_1pt = ref.Decoder_1m()
    # the net0 file mimics the released stage-a checkpoint: one statedict
    # holding both the encoder's and Decoder_1m's keys, 'module.'-prefixed
    # (orca_models.py:103-123)
    net0_sd = {}
    for mod in (net0, denet_1pt):
        for k, v in mod.state_dict().items():
            net0_sd[f"module.{k}"] = v
    torch.save(net0_sd, model_dir / "orca_h1esc.net0.statedict")
    torch.save(
        {f"module.{k}": v for k, v in net.state_dict().items()},
        model_dir / "orca_h1esc.net.statedict",
    )
    for level in (1, 2, 4, 8, 16, 32):
        d = ref.Decoder(upsample_mode="bilinear")
        torch.save(
            {f"module.{k}": v for k, v in d.state_dict().items()},
            model_dir / f"orca_h1esc.d{level}.statedict",
        )

    # expectation npy for the background normmats
    d = np.arange(GEOM.bins, dtype=np.float64)
    np.save(
        resource_dir / "4DNFI9GMP2J8.rebinned.mcool.expected.res4000.npy",
        -1.5 * np.log1p(d) - 2.0,
    )

    # tiny hg38 stand-in: two chromosomes, 2 windows each
    rng = np.random.RandomState(0)
    bases = "ACGT"
    fasta = resource_dir / "Homo_sapiens.GRCh38.dna.primary_assembly.fa"
    with open(fasta, "w") as f:
        for chrom in ("chr8", "chr9"):
            f.write(f">{chrom}\n")
            seq = "".join(bases[i] for i in rng.randint(0, 4, 2_048_000))
            for i in range(0, len(seq), 80):
                f.write(seq[i : i + 80] + "\n")
    return str(model_dir), str(resource_dir)


def test_certify_32m_scaled(tmp_path):
    from orca_tpu.certify import certify_32m

    model_dir, resource_dir = _write_fake_resources(tmp_path)
    report = certify_32m(
        model_dir, resource_dir, REFERENCE_DIR,
        names=("h1esc",),
        windows=[("chr9", 1_300_000, 1_024_000)],
        atol=2e-3,
        geometry=GEOM,
    )
    assert report["pass"], report
    diffs = report["h1esc"]["chr9:1300000"]
    assert set(diffs) == {32, 16, 8, 4, 2, 1}
    assert all(v <= 2e-3 for v in diffs.values()), diffs
