"""Checkpoint certification: numerical parity vs the reference implementation.

One command — ``orca-tpu certify --reference /path/to/jzhoulab-orca`` —
that, the moment the released statedicts (`models/orca_*.statedict`) and
resources are present, runs BOTH implementations from the same checkpoint
files on fixed windows and reports per-level max|Δ| + allclose:

  1. our side: `zoo.load_32m_bundle` (the converter, fp32, BN folded) ->
     the jitted multiscale cascade;
  2. oracle side: the reference's own torch modules (orca_modules.py)
     loaded with the reference's key filtering (orca_models.py:103-123),
     driven by a faithful re-implementation of the reference
     `genomepredict` zoom loop (orca_predict.py:316-523).

The oracle loop here is the SAME code path the repo's scaled-geometry
parity tests exercise (tests/test_cascade.py imports `torch_cascade_32m`),
so certification logic is continuously validated even without the Zenodo
download.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Optional, Sequence

import numpy as np


def torch_cascade_32m(modules, seq_np: np.ndarray, mpos: int, wpos: int,
                      geom):
    """Reference genomepredict zoom loop (orca_predict.py:316-523) over
    torch modules, generalized to any CascadeGeometry.

    modules: (net0, net, {level: decoder}, denet_1pt_or_None, normmats).
    Returns ([6 fwd/RC-averaged (crop, crop) maps, coarsest first], starts).
    """
    import torch

    net0, net, denets, denet_1pt, normmats = modules
    crop, half = geom.crop, geom.half
    binw = geom.bin_bp
    allpreds = []
    allstarts = []
    with torch.no_grad():
        for iii, seq in enumerate(
            [seq_np, np.ascontiguousarray(seq_np[:, ::-1, ::-1])]
        ):
            x = torch.FloatTensor(seq).transpose(1, 2)
            encodings = dict(zip((1, 2, 4, 8, 16, 32), net(net0(x))))
            preds = []
            starts = [0]
            for j, level in enumerate((32, 16, 8, 4, 2, 1)):
                distenc = torch.log(
                    torch.FloatTensor(normmats[level][None, None])
                )
                enc_crop = encodings[level][
                    :, :, starts[j] // level : starts[j] // level + crop
                ]
                if j == 0:
                    pred = denets[level](enc_crop, distenc)
                else:
                    coarse = preds[j - 1][
                        :, :, start_index : start_index + half,
                        start_index : start_index + half,
                    ]
                    pred = denets[level](enc_crop, distenc, coarse)
                    if level == 1 and denet_1pt is not None:
                        pred = pred + denet_1pt(enc_crop)
                span4 = geom.span_bp(level) / 4
                halfwin = geom.window_bp / 2
                if iii == 0:
                    start_index = int(np.clip(
                        np.floor(
                            ((mpos - span4)
                             - (wpos - halfwin + starts[j] * binw))
                            / (binw * level)
                        ),
                        0, half,
                    ))
                else:
                    start_index = int(np.clip(
                        np.ceil(
                            ((wpos + halfwin - starts[j] * binw)
                             - (mpos + span4))
                            / (binw * level)
                        ),
                        0, half,
                    ))
                starts.append(starts[j] + start_index * level)
                preds.append(pred)
            allpreds.append(preds)
            if iii == 0:
                allstarts = starts[:-1]
    outs = [
        allpreds[0][j].numpy()[0, 0] * 0.5
        + allpreds[1][j].numpy()[0, 0, ::-1, ::-1] * 0.5
        for j in range(6)
    ]
    return outs, allstarts


def _load_filtered(module, sd):
    """Reference key filtering: pick this module's keys out of a (possibly
    larger, 'module.'-prefixed) statedict (orca_models.py:104-123)."""
    import torch

    filtered = {}
    for key in module.state_dict():
        if "module." + key in sd:
            filtered[key] = torch.as_tensor(sd["module." + key])
        else:
            filtered[key] = torch.as_tensor(sd[key])
    module.load_state_dict(filtered)
    return module.eval()


def build_torch_32m(model_dir: str, name: str, reference_path: str):
    """Instantiate the reference torch modules for a 1-32Mb model and load
    the released statedicts the way orca_models.py does."""
    import torch

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import orca_modules as ref

    def load_sd(fname):
        return torch.load(os.path.join(model_dir, fname),
                          map_location="cpu")

    net0_sd = load_sd(f"orca_{name}.net0.statedict")
    net_sd = load_sd(f"orca_{name}.net.statedict")
    up_pass = name != "hctnoc"
    upsample_mode = "bilinear" if up_pass else "nearest"
    net0 = _load_filtered(ref.Encoder(), net0_sd)
    net = _load_filtered(
        ref.Encoder2() if up_pass else ref.Encoder2b(), net_sd
    )
    denet_1pt = (
        _load_filtered(ref.Decoder_1m(), net0_sd) if up_pass else None
    )
    denets = {}
    for level in (1, 2, 4, 8, 16, 32):
        dsd = load_sd(f"orca_{name}.d{level}.statedict")
        denets[level] = _load_filtered(
            ref.Decoder(upsample_mode=upsample_mode), dsd
        )
    return net0, net, denets, denet_1pt


def certify_32m(
    model_dir: str,
    resource_dir: str,
    reference_path: str,
    names: Sequence[str] = ("h1esc", "hff"),
    windows: Optional[Sequence] = None,
    atol: float = 2e-3,
    geometry=None,
) -> Dict:
    """Run both implementations from the same checkpoints on fixed hg38
    windows; returns {name: {window: {level: max_abs_diff}, 'pass': bool}}.
    `geometry` defaults to the production 32Mb cascade; scaled geometries
    support fast self-tests of the certification flow.
    """
    import jax.numpy as jnp

    from orca_tpu.models import zoo
    from orca_tpu.predict.multiscale import GEOM_32M, _cascade_32mb
    from orca_tpu.predict.resources import _load_genome

    geom = geometry or GEOM_32M
    genome = _load_genome(resource_dir, True,
                          "Homo_sapiens.GRCh38.dna.primary_assembly")
    if genome is None:
        raise FileNotFoundError(
            f"hg38 genome resources not found under {resource_dir}"
        )
    # reference README example region + one off-center zoom
    windows = windows or [
        ("chr9", 110_404_000, 94_904_000),   # (chrom, mpos, wpos)
        ("chr8", 64_000_000, 64_000_000),
    ]
    report = {}
    ok = True
    for name in names:
        bundle = zoo.load_32m_bundle(model_dir, resource_dir, name,
                                     nbins=geom.bins, crop=geom.crop)
        torch_modules = build_torch_32m(model_dir, name, reference_path)
        per_window = {}
        for chrom, mpos, wpos in windows:
            seq = genome.get_encoding_from_coords(
                chrom, wpos - geom.window_bp // 2,
                wpos + geom.window_bp // 2,
            )[None].astype(np.float32)
            got, got_starts = _cascade_32mb(
                bundle, geom, jnp.asarray(seq), jnp.float32(mpos),
                jnp.float32(wpos), jnp.asarray(bundle.log_normmats()),
            )
            want, want_starts = torch_cascade_32m(
                (*torch_modules, bundle.normmats), seq, mpos, wpos, geom,
            )
            diffs = {}
            for j, level in enumerate((32, 16, 8, 4, 2, 1)):
                d = float(np.max(np.abs(
                    np.asarray(got[j][0, :, :, 0]) - want[j]
                )))
                diffs[level] = d
                ok = ok and d <= atol
            ok = ok and list(np.asarray(got_starts)) == list(want_starts)
            per_window[f"{chrom}:{mpos}"] = diffs
        report[name] = per_window
    report["atol"] = atol
    report["pass"] = ok
    return report
