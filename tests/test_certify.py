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
    full_net = ref.Net(num_1d=32)
    net = ref.Encoder2()
    # the net0 file mimics the released stage-a checkpoint: the full Net
    # statedict, of which the Encoder's and Decoder_1m's keys are subsets
    # sliced out by key filtering (orca_models.py:103-123), and which the
    # 1M model loads whole (orca_models.py:449-494); 'module.'-prefixed
    torch.save(
        {f"module.{k}": v for k, v in full_net.state_dict().items()},
        model_dir / "orca_h1esc.net0.statedict",
    )
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
    # 256m family: Encoder3 + 4 decoders (orca_models.py:545-760)
    net3 = ref.Encoder3()
    torch.save(
        {f"module.{k}": v for k, v in net3.state_dict().items()},
        model_dir / "orca_h1esc_256m.net.statedict",
    )
    for level in (32, 64, 128, 256):
        d = ref.Decoder(upsample_mode="bilinear")
        torch.save(
            {f"module.{k}": v for k, v in d.state_dict().items()},
            model_dir / f"orca_h1esc_256m.d{level}.statedict",
        )

    # expectation npys for the background normmats (res4000: 32m; res1000:
    # 1m; res32000 mono/trans: 256m)
    d = np.arange(GEOM.bins, dtype=np.float64)
    np.save(
        resource_dir / "4DNFI9GMP2J8.rebinned.mcool.expected.res4000.npy",
        -1.5 * np.log1p(d) - 2.0,
    )
    d = np.arange(1000, dtype=np.float64)
    np.save(
        resource_dir / "4DNFI9GMP2J8.rebinned.mcool.expected.res1000.npy",
        -1.5 * np.log1p(d) - 2.0,
    )
    d = np.arange(128, dtype=np.float64)
    np.save(
        resource_dir / "4DNFI9GMP2J8.rebinned.mcool.expected.res32000.mono.npy",
        -1.2 * np.log1p(d) - 3.0,
    )
    np.save(
        resource_dir / "4DNFI9GMP2J8.rebinned.mcool.expected.res32000.trans.npy",
        np.float64(-9.0),
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


def test_certify_1m_scaled(tmp_path):
    from orca_tpu.certify import certify_1m

    model_dir, resource_dir = _write_fake_resources(tmp_path)
    report = certify_1m(
        model_dir, resource_dir, REFERENCE_DIR,
        names=("h1esc",),
        windows=[("chr9", 512_000)],
        atol=2e-3,
        seq_len=128_000,
    )
    assert report["pass"], report
    diffs = report["h1esc"]["chr9:512000"]
    assert set(diffs) == {"2d", "1d"}
    # bf16 serving-precision report mode: must run and report (looser) diffs
    report_bf16 = certify_1m(
        model_dir, resource_dir, REFERENCE_DIR,
        names=("h1esc",), windows=[("chr9", 512_000)],
        atol=0.5, seq_len=128_000, dtype="bfloat16",
    )
    assert report_bf16["dtype"] == "bfloat16"
    assert report_bf16["h1esc"]["chr9:512000"]["2d"] >= diffs["2d"]


def test_certify_256m_scaled(tmp_path):
    from orca_tpu.certify import certify_256m

    model_dir, resource_dir = _write_fake_resources(tmp_path)
    geom256 = CascadeGeometry(window_bp=4_096_000, bin_bp=32_000, crop=4)
    report = certify_256m(
        model_dir, resource_dir, REFERENCE_DIR,
        names=("h1esc",),
        windows=[("chr8", "chr9", 1_000_000)],
        atol=2e-3,
        geometry=geom256,
    )
    assert report["pass"], report
    diffs = report["h1esc"]["chr8:1000000"]
    assert set(diffs) == {256, 128, 64, 32}
    assert all(v <= 2e-3 for v in diffs.values()), diffs


def test_certify_synthetic_scaled():
    """certify_synthetic_32m flow at scaled geometry (the production run
    uses GEOM_32M on the accelerator; same code path)."""
    from orca_tpu.certify import certify_synthetic_32m

    report = certify_synthetic_32m(
        REFERENCE_DIR, seed=3, geometry=GEOM, windows=(0.5,),
    )
    assert report["pass"], report
    diffs = report["mpos_frac_0.5"]["max_abs_diff"]
    assert set(diffs) == {32, 16, 8, 4, 2, 1}
    assert report["mpos_frac_0.5"]["starts_equal"]


def test_certify_synthetic_1m_scaled():
    """certify_synthetic_1m flow at a scaled window (production is the
    full 1Mb Net on the accelerator; same code path)."""
    from orca_tpu.certify import certify_synthetic_1m

    report = certify_synthetic_1m(REFERENCE_DIR, seed=5, seq_len=128_000)
    assert report["pass"], report
    assert set(report["max_abs_diff"]) == {"2d", "1d"}


def test_certify_synthetic_256m_scaled():
    """certify_synthetic_256m flow at scaled geometry, including an
    active chromosome-bound zoom clamp (the second mpos frac sits at the
    chromosome end) and the RC start-index mirror."""
    from orca_tpu.certify import certify_synthetic_256m

    geom256 = CascadeGeometry(window_bp=4_096_000, bin_bp=32_000, crop=4)
    report = certify_synthetic_256m(
        REFERENCE_DIR, seed=7, geometry=geom256, chrlen=2_496_000,
    )
    assert report["pass"], report
    for frac in (0.44, 0.995):
        sub = report[f"mpos_frac_{frac}"]
        assert set(sub["max_abs_diff"]) == {256, 128, 64, 32}
        assert sub["starts_equal"]
    assert report["geometry"]["chrlen"] == 2_496_000
