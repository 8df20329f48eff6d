"""Visualization: multiscale contact-map grids to PDF.

Capability parity with the reference plotting layer (orca_utils.py:67-730
genomeplot/genomeplot_256Mb and colormaps.py): prediction (and observation)
heatmap grids across zoom levels, window annotations, unscaled mode (adds
back the log background), chromosome-boundary marks for padded 256Mb runs,
and optional gene/chromatin-track panels via pygenometracks when installed.

All plotting is host-side matplotlib — deliberately not TPU work.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return matplotlib, plt


_CONTACT_CMAP = None


def contact_cmap():
    """Diverging contact-map colormap: blue (depleted) -> white ->
    yellow/orange/red (enriched), gray for missing data."""
    global _CONTACT_CMAP
    if _CONTACT_CMAP is None:
        mpl, _ = _mpl()
        stops = [
            (0.00, "#2166ac"),
            (0.18, "#67a9cf"),
            (0.33, "#ffffff"),
            (0.50, "#fee090"),
            (0.66, "#fc8d59"),
            (0.83, "#d73027"),
            (1.00, "#7f0000"),
        ]
        cmap = mpl.colors.LinearSegmentedColormap.from_list(
            "orca_tpu_contacts", stops
        )
        cmap.set_bad(color="#AAAAAA")
        _CONTACT_CMAP = cmap
    return _CONTACT_CMAP


def _draw_anno(ax, annos, n: int):
    """Draw region (span) and site (line) annotations on a heatmap axis."""
    for r in annos or []:
        if len(r) == 3:
            start, end, color = r
            ax.plot(
                [start * n, end * n], [n * 0.99, n * 0.99],
                color=color, linewidth=3, solid_capstyle="butt",
            )
        else:
            pos, style = r
            ls = "-" if style == "single" else "--"
            ax.axvline(pos * n, color="black", linewidth=0.8, linestyle=ls)
            ax.axhline(pos * n, color="black", linewidth=0.8, linestyle=ls)


def _plot_grid(
    output: dict,
    n_levels: int,
    level_span_bp: int,
    file: Optional[str],
    model_labels: Optional[List[str]],
    show_coordinates: bool,
    unscaled: bool,
    cmap,
    vmin: float,
    vmax: float,
    maskpred: bool,
    colorbar: bool,
    boundary_key: Optional[str] = None,
):
    mpl, plt = _mpl()
    cmap = cmap or contact_cmap()
    preds = output["predictions"]
    exps = output.get("experiments")
    n_models = len(preds)
    model_labels = model_labels or [f"Model {i}" for i in range(n_models)]
    rows = []
    for i in range(n_models):
        rows.append(("pred", i))
        if exps:
            rows.append(("exp", i))

    fig, axes = plt.subplots(
        len(rows), n_levels,
        figsize=(3.2 * n_levels, 3.4 * len(rows)),
        squeeze=False,
    )
    for ri, (kind, mi) in enumerate(rows):
        for j in range(n_levels):
            ax = axes[ri][j]
            if kind == "pred":
                mat = np.array(preds[mi][j], dtype=float)
                if maskpred and exps:
                    mat[np.isnan(np.array(exps[mi][j], dtype=float))] = np.nan
                label = f"{model_labels[mi]} pred"
            else:
                mat = np.array(exps[mi][j], dtype=float)
                label = f"{model_labels[mi]} obs"
            if unscaled:
                nm = output["normmats"][mi]
                nm_j = nm[j] if not isinstance(nm, dict) else list(nm.values())[j]
                mat = mat + np.log(np.asarray(nm_j, dtype=float))
            im = ax.imshow(mat, cmap=cmap, vmin=vmin, vmax=vmax,
                           interpolation="none")
            _draw_anno(ax, (output.get("annos") or [None] * n_levels)[j],
                       mat.shape[0])
            ax.set_xticks([])
            ax.set_yticks([])
            if ri == 0:
                span = level_span_bp // 2**j
                ax.set_title(f"{span / 1e6:.0f} Mb", fontsize=11)
            if j == 0:
                ax.set_ylabel(label, fontsize=10)
            if show_coordinates and ri == len(rows) - 1:
                start = output["start_coords"][j]
                end = output["end_coords"][j]
                ax.set_xlabel(
                    f"{output['chr']}:{start:,}-{end:,}", fontsize=7
                )
            if boundary_key and output.get(boundary_key):
                # chromosome boundary lines for padded 256Mb windows
                chr_end = output["end_coords"][j] - output["start_coords"][j]
                frac = chr_end / (level_span_bp / 2**j)
                if 0 < frac < 1:
                    n = mat.shape[0]
                    ax.axvline(frac * n, color="black", linewidth=0.6)
                    ax.axhline(frac * n, color="black", linewidth=0.6)
    if colorbar:
        fig.colorbar(im, ax=axes, fraction=0.012, pad=0.01)
    if file is not None:
        fig.savefig(file, bbox_inches="tight", dpi=150)
        plt.close(fig)
        return None
    return fig


def genomeplot(
    output: dict,
    show_genes: bool = False,
    show_tracks: bool = False,
    show_coordinates: bool = True,
    unscaled: bool = False,
    file: Optional[str] = None,
    cmap=None,
    unscaled_cmap=None,
    colorbar: bool = True,
    maskpred: bool = False,
    vmin: float = -1,
    vmax: float = 2,
    model_labels: Optional[List[str]] = None,
):
    """32Mb multiscale plot (reference orca_utils.py:67-538)."""
    fig = _plot_grid(
        output, n_levels=len(output["predictions"][0]), level_span_bp=32000000,
        file=file, model_labels=model_labels,
        show_coordinates=show_coordinates, unscaled=unscaled,
        cmap=(unscaled_cmap if unscaled else cmap), vmin=vmin, vmax=vmax,
        maskpred=maskpred, colorbar=colorbar,
    )
    if file is not None and (show_genes or show_tracks):
        plot_annotation_panels(output, file, show_genes, show_tracks)
    return fig


def genomeplot_256mb(
    output: dict,
    show_coordinates: bool = True,
    unscaled: bool = False,
    file: Optional[str] = None,
    cmap=None,
    unscaled_cmap=None,
    colorbar: bool = True,
    maskpred: bool = False,
    vmin: float = -1,
    vmax: float = 2,
    model_labels: Optional[List[str]] = None,
):
    """256Mb multiscale plot with padding-chromosome boundary marks
    (reference orca_utils.py:541-730)."""
    return _plot_grid(
        output, n_levels=len(output["predictions"][0]),
        level_span_bp=256000000, file=file, model_labels=model_labels,
        show_coordinates=show_coordinates, unscaled=unscaled,
        cmap=(unscaled_cmap if unscaled else cmap), vmin=vmin, vmax=vmax,
        maskpred=maskpred, colorbar=colorbar, boundary_key="padding_chr",
    )


def plot_annotation_panels(output: dict, file: str, show_genes: bool,
                           show_tracks: bool,
                           genes_bed: Optional[str] = None,
                           track_bigwigs: Optional[List[str]] = None):
    """Gene / chromatin-track panels matching the prediction windows.

    Uses pygenometracks when available (the reference renders these via a
    generated tracks INI, orca_utils.py:295-525); silently skips with a
    warning otherwise so the core pipeline has no hard viz dependencies.
    """
    try:
        import pygenometracks.tracksClass  # noqa: F401
    except ImportError:
        global _WARNED_NO_TRACKS
        if not globals().get("_WARNED_NO_TRACKS"):
            import warnings

            warnings.warn(
                "pygenometracks not installed; skipping gene/track panels"
            )
            _WARNED_NO_TRACKS = True
        return
    import tempfile

    ini = []
    if show_genes and genes_bed:
        ini.append(
            f"[genes]\nfile = {genes_bed}\ntitle = genes\nheight = 3\n"
            "file_type = bed\n"
        )
    if show_tracks and track_bigwigs:
        for bw in track_bigwigs:
            ini.append(
                f"[{bw}]\nfile = {bw}\nheight = 1.5\nfile_type = bigwig\n"
            )
    if not ini:
        return
    with tempfile.NamedTemporaryFile(
        "w", suffix=".ini", delete=False
    ) as f:
        f.write("\n".join(ini))
        ini_path = f.name
    from pygenometracks.tracksClass import PlotTracks

    trp = PlotTracks(ini_path, dpi=100)
    for j, (start, end) in enumerate(
        zip(output["start_coords"], output["end_coords"])
    ):
        fig_file = f"{file}.anno.{j}.pdf"
        trp.plot(fig_file, output["chr"], start, end)
