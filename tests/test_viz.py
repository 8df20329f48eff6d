"""Viz parity: reference colormaps value-match, PdfPages output, NaN-mask
overlay path, and gene-panel rendering from a BED."""

import gzip
import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR
from orca_tpu import viz
from orca_tpu.colormaps import bwcmap, hnh_cmap_ext5


def _fake_output(n_levels=3, crop=16, with_exp=True):
    rng = np.random.RandomState(0)
    preds = [[rng.randn(crop, crop) for _ in range(n_levels)]]
    exps = None
    if with_exp:
        exps = [[rng.randn(crop, crop) for _ in range(n_levels)]]
        for e in exps[0]:
            e[:3, :3] = np.nan
    normmats = [[np.abs(rng.rand(crop, crop)) + 0.1
                 for _ in range(n_levels)]]
    return {
        "predictions": preds,
        "experiments": exps,
        "normmats": normmats,
        "start_coords": [1_000_000 * (j + 1) for j in range(n_levels)],
        "end_coords": [1_000_000 * (j + 1) + 500_000 for j in range(n_levels)],
        "chr": "chr1",
        "annos": None,
    }


def test_colormaps_match_reference():
    try:
        sys.path.insert(0, REFERENCE_DIR)
        import colormaps as ref
    except Exception:
        pytest.skip("reference colormaps unavailable")
    x = np.linspace(0, 1, 513)
    np.testing.assert_allclose(hnh_cmap_ext5()(x), ref.hnh_cmap_ext5(x),
                               atol=1e-12)
    np.testing.assert_allclose(bwcmap()._lut, ref.bwcmap._lut, atol=1e-12)


def test_genomeplot_pdf_and_maskpred(tmp_path):
    out = _fake_output()
    pdf = str(tmp_path / "plot.pdf")
    viz.genomeplot(out, file=pdf, maskpred=True, unscaled=False)
    assert os.path.exists(pdf) and os.path.getsize(pdf) > 0
    # unscaled mode (per-panel vmax from the first off-diagonal)
    pdf2 = str(tmp_path / "plot_unscaled.pdf")
    viz.genomeplot(out, file=pdf2, unscaled=True)
    assert os.path.exists(pdf2) and os.path.getsize(pdf2) > 0


def test_gene_panels_rendered_from_bed(tmp_path):
    bed = tmp_path / "genes.bed.gz"
    with gzip.open(bed, "wt") as f:
        f.write("chr1\t1050000\t1200000\tGENE_A\n")
        f.write("chr1\t1300000\t1400000\tGENE_B\n")
        f.write("chr2\t1000000\t1100000\tOTHER\n")
    out = _fake_output()
    pdf = str(tmp_path / "plot.pdf")
    viz.genomeplot(out, file=pdf, show_genes=True, genes_bed=str(bed))
    anno = str(tmp_path / "plot.anno.pdf")
    assert os.path.exists(anno) and os.path.getsize(anno) > 0


def test_gene_panel_warns_when_bed_missing(tmp_path):
    out = _fake_output()
    pdf = str(tmp_path / "plot.pdf")
    with pytest.warns(UserWarning, match="gene panel disabled"):
        viz.genomeplot(out, file=pdf, show_genes=True,
                       genes_bed=str(tmp_path / "nope.bed.gz"))
    assert not os.path.exists(str(tmp_path / "plot.anno.pdf"))
