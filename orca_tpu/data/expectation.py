"""Distance-expectation preprocessing (port of misc/process_expectation.py).

Converts `cooltools compute-expected` style per-diagonal statistics into the
framework's expectation files: the log cis expectation curve (two-scale
lowess smoothing), its monotonic variant (np.minimum.accumulate), and the
scalar log trans expectation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _lowess(y: np.ndarray, x: np.ndarray, frac: float) -> np.ndarray:
    """Lowess smoother; uses statsmodels when present, otherwise a local
    linear-regression fallback with tricube weights (same model class)."""
    try:
        from statsmodels.nonparametric.smoothers_lowess import lowess

        return lowess(y, x, frac=frac)[:, 1]
    except ImportError:
        n = len(x)
        k = max(int(np.ceil(frac * n)), 2)
        out = np.empty(n)
        order = np.argsort(x)
        xs, ys = x[order], y[order]
        for i in range(n):
            d = np.abs(xs - xs[i])
            idx = np.argpartition(d, k - 1)[:k]
            dmax = d[idx].max() or 1.0
            w = (1 - (d[idx] / dmax) ** 3) ** 3
            xi, yi = xs[idx], ys[idx]
            sw = w.sum()
            mx, my = (w * xi).sum() / sw, (w * yi).sum() / sw
            vx = (w * (xi - mx) ** 2).sum()
            slope = ((w * (xi - mx) * (yi - my)).sum() / vx) if vx > 0 else 0.0
            out[i] = my + slope * (xs[i] - mx)
        inv = np.empty(n, dtype=int)
        inv[order] = np.arange(n)
        return out[inv]


def expectation_from_diagonals(
    balanced_sum: np.ndarray,
    n_valid: np.ndarray,
    res: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-diagonal sums -> smoothed log expectation (+ monotonic variant).

    Mirrors misc/process_expectation.py:19-45: log of the per-diagonal
    balanced average truncated at the first non-finite value, kept raw below
    ~400 bins (at 4kb-equivalent), lowess frac=0.01 up to ~10k bins, 0.1
    beyond, then np.minimum.accumulate for the monotonic curve.
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        v = np.log(balanced_sum / n_valid)
    bad = np.argwhere(~np.isfinite(v))
    if len(bad):
        v = v[: int(bad.min())]
    lo = int(400 / (res / 4000))
    hi = int(10000 / (res / 4000))
    if len(v) <= lo:
        return v, np.minimum.accumulate(v)
    logx = np.log(np.arange(lo, len(v)) + 1)
    sv0 = _lowess(v[lo:], logx, frac=0.01)
    sv2 = _lowess(v[lo:], logx, frac=0.1)
    sv = np.hstack([v[:lo], sv0[:hi], sv2[hi:]])
    return sv, np.minimum.accumulate(sv)


def trans_expectation(balanced_sum_trans: np.ndarray,
                      n_valid_trans: np.ndarray) -> float:
    """Scalar log trans expectation (misc/process_expectation.py:47-53)."""
    return float(np.log(np.sum(balanced_sum_trans) / np.sum(n_valid_trans)))


def process_expectation_tsv(path: str, res: int, out_prefix: Optional[str] = None):
    """Full port of the misc/process_expectation.py CLI: read the cooltools
    TSV (columns diag, n_valid, balanced.sum), write .npy/.mono.npy (and
    .trans.npy if `<path>.trans` exists)."""
    import csv

    diags = {}
    with open(path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            d = int(float(row["diag"]))
            nv = float(row["n_valid"] or 0)
            bs = float(row["balanced.sum"] or 0)
            acc = diags.setdefault(d, [0.0, 0.0])
            acc[0] += nv
            acc[1] += bs
    dmax = max(diags) + 1
    n_valid = np.zeros(dmax)
    balanced = np.zeros(dmax)
    for d, (nv, bs) in diags.items():
        n_valid[d] = nv
        balanced[d] = bs
    sv, sv_mono = expectation_from_diagonals(balanced, n_valid, res)
    out_prefix = out_prefix or path
    np.save(out_prefix + ".npy", sv)
    np.save(out_prefix + ".mono.npy", sv_mono)
    import os

    if os.path.exists(path + ".trans"):
        nv_t, bs_t = [], []
        with open(path + ".trans") as f:
            reader = csv.DictReader(f, delimiter="\t")
            for row in reader:
                nv_t.append(float(row["n_valid"] or 0))
                bs_t.append(float(row["balanced.sum"] or 0))
        np.save(out_prefix + ".trans.npy",
                trans_expectation(np.array(bs_t), np.array(nv_t)))
    return sv, sv_mono
