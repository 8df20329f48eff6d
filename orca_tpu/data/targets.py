"""Target data sources: 2D contact matrices and binned 1D genomic features.

Capability parity with the reference data layer:
  * `CoolerContactMatrix` — balanced Hi-C/micro-C retrieval from
    cooler/mcool with optional adaptive coarse-graining and cross-region
    (interchromosomal) queries (reference Genomic2DFeatures,
    selene_utils2.py:507-584). Requires `cooler` (host-side only; gated).
  * `DenseContactMatrix` — the same interface over in-memory dense arrays
    (tests, small organisms, preprocessed tile stores).
  * `BinnedBedFeatures` — 1D chromatin-track targets binned over a query
    window with modes any/center/proportion (reference
    MultibinGenomicFeatures, selene_utils2.py:587-758), implemented with
    sorted interval arrays + searchsorted instead of pyranges.
"""

from __future__ import annotations

import gzip
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from orca_tpu.data.coarsegrain import adaptive_coarsegrain_any


class CoolerContactMatrix:
    """Balanced contact-matrix retrieval from a cooler URI.

    The handle is opened lazily per process (fork-safe, mirroring the
    reference's unpicklable-init pattern, selene_utils2.py:555-563).

    backend: 'auto' uses the `cooler` package when importable and falls
    back to the in-repo h5py reader (orca_tpu.data.mcool.NativeCooler,
    same balance semantics) otherwise; 'cooler'/'native' force one.
    """

    def __init__(self, input_path: str, shape: Tuple[int, int],
                 cg: bool = False, backend: str = "auto"):
        self.input_path = input_path
        self.shape = shape
        self.cg = cg
        self.backend = backend
        self._cooler = None
        self._native = None

    def _handle(self):
        if self._cooler is not None or self._native is not None:
            return
        if self.backend in ("auto", "cooler"):
            try:
                import cooler  # optional fast path

                self._cooler = cooler.Cooler(self.input_path)
                return
            except ImportError:
                if self.backend == "cooler":
                    raise
        from orca_tpu.data.mcool import NativeCooler

        self._native = NativeCooler(self.input_path)

    def _fetch(self, chrom, start, end, chrom2, start2, end2, balance):
        self._handle()
        if self._cooler is not None:
            if chrom2 is None:
                q1 = q2 = f"{chrom}:{start}-{end}"
            else:
                q1 = f"{chrom}:{start}-{end}"
                q2 = f"{chrom2}:{start2}-{end2}"
            return self._cooler.matrix(balance=balance).fetch(q1, q2)
        return self._native.fetch(chrom, start, end, chrom2, start2, end2,
                                  balance=balance)

    def get_feature_data(self, chrom, start, end, chrom2=None, start2=None,
                         end2=None):
        mat = self._fetch(chrom, start, end, chrom2, start2, end2, True)
        if self.cg:
            raw = self._fetch(chrom, start, end, chrom2, start2, end2, False)
            mat = adaptive_coarsegrain_any(mat, raw)
        return mat.astype(np.float32)


class DenseContactMatrix:
    """In-memory contact matrices at a fixed resolution.

    matrices: {chrom: (n_bins, n_bins) balanced matrix}. Cross-chromosome
    queries return `trans_fill` (NaN by default).
    """

    def __init__(self, matrices: Dict[str, np.ndarray], resolution: int,
                 trans_fill: float = np.nan,
                 counts: Optional[Dict[str, np.ndarray]] = None,
                 cg: bool = False,
                 shape: Optional[Tuple[int, int]] = None):
        self.matrices = matrices
        self.resolution = resolution
        self.trans_fill = trans_fill
        self.counts = counts
        self.cg = cg
        self._shape = shape

    @property
    def shape(self):
        if self._shape is not None:
            return self._shape
        n = max(m.shape[0] for m in self.matrices.values())
        return (n, n)

    def _slice(self, source, chrom, start, end):
        res = self.resolution
        b0, b1 = start // res, end // res
        mat = source[chrom]
        nb = mat.shape[0]
        lo, hi = max(b0, 0), min(b1, nb)
        out = np.full((b1 - b0, mat.shape[1]), np.nan, np.float32)
        if lo < hi:
            out[lo - b0 : hi - b0] = mat[lo:hi]
        return out

    def get_feature_data(self, chrom, start, end, chrom2=None, start2=None,
                         end2=None):
        res = self.resolution
        if chrom2 is None or (chrom2 == chrom and start2 == start and end2 == end):
            chrom2, start2, end2 = chrom, start, end
        n1 = (end - start) // res
        n2 = (end2 - start2) // res
        if chrom2 != chrom:
            return np.full((n1, n2), self.trans_fill, np.float32)
        rows = self._slice(self.matrices, chrom, start, end)
        b2_0, b2_1 = start2 // res, end2 // res
        nb = self.matrices[chrom].shape[1]
        lo, hi = max(b2_0, 0), min(b2_1, nb)
        out = np.full((n1, n2), np.nan, np.float32)
        if lo < hi:
            out[:, lo - b2_0 : hi - b2_0] = rows[:, lo:hi]
        if self.cg and self.counts is not None:
            cnt_rows = self._slice(self.counts, chrom, start, end)
            cnt = np.full((n1, n2), np.nan, np.float32)
            if lo < hi:
                cnt[:, lo - b2_0 : hi - b2_0] = cnt_rows[:, lo:hi]
            out = adaptive_coarsegrain_any(out, cnt).astype(np.float32)
        return out


class StackedContactMatrix:
    """Multi-dataset 2D target: stacks several contact-matrix sources along
    a leading axis -> (num_datasets, n1, n2). The data path for training
    multi-cell-type (leukemia-style) heads: each dataset feeds one of the
    model's num_2d output channels (orca_leukemia.py:1604-1873)."""

    def __init__(self, sources: Sequence):
        if not sources:
            raise ValueError("need at least one contact-matrix source")
        self.sources = list(sources)

    @property
    def shape(self):
        s = self.sources[0].shape
        return (len(self.sources),) + tuple(s[-2:])

    def get_feature_data(self, chrom, start, end, chrom2=None, start2=None,
                         end2=None):
        return np.stack([
            s.get_feature_data(chrom, start, end, chrom2=chrom2,
                               start2=start2, end2=end2)
            for s in self.sources
        ])


class BinnedBedFeatures:
    """Binned 1D feature targets from a BED file (or in-memory intervals).

    get_feature_data(chrom, start, end) returns (n_features, n_bins) with
    bins of `bin_size` every `step_size`.

    modes: 'any' (1 if any overlap), 'center' (1 if the bin's center bp is
    covered), 'proportion' (overlap fraction of the bin; note the reference
    adds the full unclipped feature length per overlap,
    selene_utils2.py:744-750 — here the fraction is the clipped overlap,
    which is what the name implies).
    """

    def __init__(self, input_path_or_intervals, features: Sequence[str],
                 bin_size: int, step_size: int, shape: Tuple[int, int],
                 mode: str = "center"):
        self.features = list(features)
        self.n_features = len(self.features)
        self.feature_index = {f: i for i, f in enumerate(self.features)}
        self.bin_size = bin_size
        self.step_size = step_size
        self.shape = shape
        self.mode = mode
        if isinstance(input_path_or_intervals, str):
            intervals = self._read_bed(input_path_or_intervals)
        else:
            intervals = input_path_or_intervals  # [(chrom, start, end, name)]
        # per (chrom, feature): sorted interval arrays
        self._index: Dict[Tuple[str, int], Tuple[np.ndarray, np.ndarray]] = {}
        grouped = defaultdict(list)
        for chrom, s, e, name in intervals:
            if name in self.feature_index:
                grouped[(chrom, self.feature_index[name])].append((s, e))
        for key, ivs in grouped.items():
            ivs.sort()
            arr = np.array(ivs, dtype=np.int64)
            self._index[key] = (arr[:, 0], arr[:, 1])

    @staticmethod
    def _read_bed(path: str) -> List[Tuple[str, int, int, str]]:
        opener = gzip.open if path.endswith(".gz") else open
        out = []
        with opener(path, "rt") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 4 or parts[0].startswith(("#", "track")):
                    continue
                out.append((parts[0], int(parts[1]), int(parts[2]), parts[3]))
        return out

    def get_feature_data(self, chrom: str, start: int, end: int) -> np.ndarray:
        n_bins = int((end - start - self.bin_size) / self.step_size) + 1
        targets = np.zeros((self.n_features, n_bins), dtype=np.float32)
        bin_starts = start + self.step_size * np.arange(n_bins)
        for fi in range(self.n_features):
            key = (chrom, fi)
            if key not in self._index:
                continue
            ivs, ive = self._index[key]
            if self.mode == "center":
                centers = bin_starts + self.bin_size // 2
                # bin hit if some interval covers its center bp; a running
                # max of interval ends handles overlapping intervals
                j = np.searchsorted(ivs, centers, side="right") - 1
                run_end = np.maximum.accumulate(ive)
                hit = (j >= 0) & (centers < run_end[np.clip(j, 0, None)])
                targets[fi, hit] = 1.0
            else:
                bin_ends = bin_starts + self.bin_size
                run_end = np.maximum.accumulate(ive)
                if self.mode == "any":
                    j = np.searchsorted(ivs, bin_ends, side="left") - 1
                    hit = (j >= 0) & (bin_starts < run_end[np.clip(j, 0, None)])
                    targets[fi, hit] = 1.0
                elif self.mode == "proportion":
                    # restrict to intervals overlapping the query window
                    # (run_end monotonic over the start-sorted list), then
                    # one broadcasted clipped-overlap sum — exact per-
                    # interval contributions (overlaps may double-count,
                    # like the per-interval reference accumulation) without
                    # the per-interval Python loop
                    i0 = np.searchsorted(run_end, start, side="right")
                    i1 = np.searchsorted(ivs, end, side="left")
                    if i1 > i0:
                        s_w = ivs[i0:i1][:, None]
                        e_w = ive[i0:i1][:, None]
                        ov = np.clip(
                            np.minimum(e_w, bin_ends[None, :])
                            - np.maximum(s_w, bin_starts[None, :]),
                            0, None,
                        )
                        targets[fi] += ov.sum(axis=0) / self.bin_size
                else:
                    raise ValueError(f"unknown mode {self.mode}")
        return targets
