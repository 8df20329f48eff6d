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


def _cast_bundle(bundle, dtype: str):
    """bf16 tolerance-report mode: cast the jax-side bundle to bfloat16 (the
    production serving precision) while the torch oracle stays fp32, so the
    reported max|Δ| measures the serving config's deviation."""
    from orca_tpu.models.zoo import cast_bundle

    return cast_bundle(bundle, dtype)


def _load_genome_or_raise(resource_dir: str):
    from orca_tpu.predict.resources import _load_genome

    genome = _load_genome(resource_dir, True,
                          "Homo_sapiens.GRCh38.dna.primary_assembly")
    if genome is None:
        raise FileNotFoundError(
            f"hg38 genome resources not found under {resource_dir}"
        )
    return genome


def certify_32m(
    model_dir: str,
    resource_dir: str,
    reference_path: str,
    names: Sequence[str] = ("h1esc", "hff"),
    windows: Optional[Sequence] = None,
    atol: float = 2e-3,
    geometry=None,
    dtype: str = "float32",
) -> Dict:
    """Run both implementations from the same checkpoints on fixed hg38
    windows; returns {name: {window: {level: max_abs_diff}, 'pass': bool}}.
    `geometry` defaults to the production 32Mb cascade; scaled geometries
    support fast self-tests of the certification flow. dtype='bfloat16'
    reports the serving-precision deviation vs the fp32 torch oracle.
    """
    import jax.numpy as jnp

    from orca_tpu.models import zoo
    from orca_tpu.predict.multiscale import GEOM_32M, _cascade_32mb

    geom = geometry or GEOM_32M
    genome = _load_genome_or_raise(resource_dir)
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
        bundle = _cast_bundle(bundle, dtype)
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
    report["dtype"] = dtype
    report["pass"] = ok
    return report


# --------------------------------------------------------------------------
# 1Mb model certification (BASELINE row 1)
# --------------------------------------------------------------------------


def build_torch_1m(model_dir: str, name: str, reference_path: str):
    """Reference Net(num_1d) loaded from the stage-a statedict the way
    orca_models.py:449-542 does."""
    import torch

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import orca_modules as ref

    num_1d_by_name = {"h1esc": 32, "hff": 22}
    if name not in num_1d_by_name:
        raise ValueError(
            f"the 1m family ships only h1esc/hff checkpoints "
            f"(orca_models.py:449-542); got {name!r}"
        )
    num_1d = num_1d_by_name[name]
    sd = torch.load(os.path.join(model_dir, f"orca_{name}.net0.statedict"),
                    map_location="cpu")
    return _load_filtered(ref.Net(num_1d=num_1d), sd), num_1d


def certify_1m(
    model_dir: str,
    resource_dir: str,
    reference_path: str,
    names: Sequence[str] = ("h1esc", "hff"),
    windows: Optional[Sequence] = None,
    atol: float = 2e-3,
    seq_len: int = 1_000_000,
    dtype: str = "float32",
) -> Dict:
    """1Mb Net forward parity (2D map + 1D track head) vs the reference
    Net from the same checkpoint (orca_models.py:449-542). `seq_len`
    overrides the window for scaled self-tests."""
    import jax.numpy as jnp
    import torch

    from orca_tpu.models import zoo
    from orca_tpu.nn import decoders

    genome = _load_genome_or_raise(resource_dir)
    windows = windows or [
        ("chr9", 110_404_000),
        ("chr8", 64_000_000),
    ]
    report = {}
    ok = True
    for name in names:
        bundle = _cast_bundle(
            zoo.load_1m_bundle(model_dir, resource_dir, name), dtype
        )
        net, num_1d = build_torch_1m(model_dir, name, reference_path)
        per_window = {}
        for chrom, mpos in windows:
            seq = genome.get_encoding_from_coords(
                chrom, mpos - seq_len // 2, mpos + seq_len // 2
            )[None].astype(np.float32)
            got = decoders.apply_net(
                bundle.net, jnp.asarray(seq), num_1d=num_1d
            )
            got2d, got1d = got
            with torch.no_grad():
                want2d, want1d = net(
                    torch.FloatTensor(seq).transpose(1, 2)
                )
            d2 = float(np.max(np.abs(
                np.asarray(got2d[0, :, :, 0], np.float32)
                - want2d.numpy()[0, 0]
            )))
            d1 = float(np.max(np.abs(
                np.asarray(got1d[0], np.float32) - want1d.numpy()[0].T
            )))
            ok = ok and d2 <= atol and d1 <= atol
            per_window[f"{chrom}:{mpos}"] = {"2d": d2, "1d": d1}
        report[name] = per_window
    report["atol"] = atol
    report["dtype"] = dtype
    report["pass"] = ok
    return report


# --------------------------------------------------------------------------
# 256Mb cascade certification (BASELINE row 3)
# --------------------------------------------------------------------------


def torch_encodings_256m(modules, seq_np: np.ndarray):
    """Reference 256Mb encoder stack (net3(net1(net0(x))[-1])) for both
    orientations — the expensive part of the oracle (the 512Mb of encoder
    dominates; the zoom loop is cheap), split out so multiple zoom targets
    on one sequence share it."""
    import torch

    net0, net1, net3 = modules[:3]
    out = []
    with torch.no_grad():
        for seq in (seq_np, np.ascontiguousarray(seq_np[:, ::-1, ::-1])):
            x = torch.FloatTensor(seq).transpose(1, 2)
            out.append(dict(
                zip((32, 64, 128, 256), net3(net1(net0(x))[-1]))
            ))
    return out


def torch_cascade_256m(modules, seq_np: np.ndarray, normmat: np.ndarray,
                       chrlen: float, mpos: int, wpos: int, geom,
                       encodings_pair=None):
    """Reference genomepredict_256Mb zoom loop (orca_predict.py:661-845)
    over torch modules: per-region normmat block-averaging, RC distenc
    flip, chromosome-bound zoom clamping, RC start-index mirror.

    modules: (net0, net1, net3, {level: decoder}). encodings_pair: optional
    [fwd, rc] encoding dicts from `torch_encodings_256m` to amortize the
    encoder across zoom targets. Returns ([4 fwd/RC-averaged (crop, crop)
    maps, coarsest first], starts).
    """
    import torch

    net0, net1, net3, denets = modules
    crop, half = geom.crop, geom.half
    nm = normmat.copy()
    mask = np.isnan(nm)
    if mask.any():
        nm[mask] = np.nanmin(nm[~mask])
    if encodings_pair is None:
        encodings_pair = torch_encodings_256m(modules, seq_np)
    allpreds = []
    allstarts = []
    with torch.no_grad():
        for iii, encodings in enumerate(encodings_pair):
            preds = []
            starts = [0]
            for j, level in enumerate((256, 128, 64, 32)):
                factor = geom.bins // (crop * 2**j)
                n = crop * factor
                s = starts[j]
                nr = (
                    nm[s : s + n, s : s + n]
                    .reshape(crop, factor, crop, factor)
                    .mean(axis=(1, 3))
                )
                distenc = torch.log(torch.FloatTensor(nr[None, None]))
                if iii != 0:
                    distenc = torch.flip(distenc, [2, 3])
                enc = encodings[level][
                    :, :, s // factor : s // factor + crop
                ]
                if j == 0:
                    pred = denets[level](enc, distenc)
                else:
                    coarse = preds[j - 1][
                        :, :, start_index : start_index + half,
                        start_index : start_index + half,
                    ]
                    pred = denets[level](enc, distenc, coarse)
                span = geom.span_bp(factor)
                halfwin = geom.window_bp / 2
                if iii == 0:
                    proposed = (mpos - span / 4) - (
                        wpos - halfwin + s * geom.bin_bp
                    )
                else:
                    proposed = (mpos - span / 4) - (
                        wpos + halfwin - s * geom.bin_bp - span
                    )
                b0 = 0 - (wpos - halfwin)
                b1 = chrlen - span / 2 - (wpos - halfwin)
                proposed = np.clip(proposed, b0, b1) if b0 < b1 else b0
                start_index = int(np.clip(
                    np.floor(proposed / (geom.bin_bp * factor)), 0, half
                ))
                if iii != 0:
                    start_index = crop - (start_index + half)
                starts.append(s + start_index * factor)
                preds.append(pred)
            allpreds.append(preds)
            if iii == 0:
                allstarts = starts[:-1]
    outs = [
        allpreds[0][j].numpy()[0, 0] * 0.5
        + allpreds[1][j].numpy()[0, 0, ::-1, ::-1] * 0.5
        for j in range(4)
    ]
    return outs, allstarts


def build_torch_256m(model_dir: str, name: str, reference_path: str):
    """Reference 256Mb model stack from the released statedicts: Encoder3 +
    decoders from orca_{name}_256m.*, Encoder/Encoder2 reused from the
    32Mb model's files (orca_models.py:545-760, :620-626)."""
    import torch

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import orca_modules as ref

    def load_sd(fname):
        return torch.load(os.path.join(model_dir, fname),
                          map_location="cpu")

    net0 = _load_filtered(ref.Encoder(), load_sd(f"orca_{name}.net0.statedict"))
    net1 = _load_filtered(ref.Encoder2(), load_sd(f"orca_{name}.net.statedict"))
    net3 = _load_filtered(
        ref.Encoder3(), load_sd(f"orca_{name}_256m.net.statedict")
    )
    denets = {}
    for level in (32, 64, 128, 256):
        denets[level] = _load_filtered(
            ref.Decoder(upsample_mode="bilinear"),
            load_sd(f"orca_{name}_256m.d{level}.statedict"),
        )
    return net0, net1, net3, denets


def certify_256m(
    model_dir: str,
    resource_dir: str,
    reference_path: str,
    names: Sequence[str] = ("h1esc", "hff"),
    windows: Optional[Sequence] = None,
    atol: float = 2e-3,
    geometry=None,
    dtype: str = "float32",
) -> Dict:
    """256Mb cascade parity: whole-chromosome + padding-chromosome input
    with per-region backgrounds assembled from the cis/trans expectations,
    both sides from the same checkpoints.

    windows: [(chrom, padding_chrom, mpos)]; default is the BASELINE row-3
    configuration (chr8 whole-chromosome, chr9 padding).
    """
    import jax.numpy as jnp

    from orca_tpu.models import zoo
    from orca_tpu.predict import retrieval
    from orca_tpu.predict.multiscale import GEOM_256M, _cascade_256mb

    geom = geometry or GEOM_256M
    genome = _load_genome_or_raise(resource_dir)
    windows = windows or [("chr8", "chr9", 64_000_000)]
    report = {}
    ok = True
    for name in names:
        bundle = _cast_bundle(
            zoo.load_256m_bundle(model_dir, resource_dir, name), dtype
        )
        torch_modules = build_torch_256m(model_dir, name, reference_path)
        per_window = {}
        for chrom, padding_chr, mpos in windows:
            chrlen = genome.chr_len(chrom)
            chrlen_round = chrlen - chrlen % geom.bin_bp
            regions = [
                [chrom, 0, chrlen_round, "+"],
                [padding_chr, 0, geom.window_bp - chrlen_round, "+"],
            ]
            seq = retrieval.encode_regions(regions, genome)  # (1, L, 4)
            normmat = retrieval.assemble_normmat(
                regions, bundle.background_cis, bundle.background_trans,
                binsize=geom.bin_bp,
            ).astype(np.float32)
            wpos = geom.window_bp // 2
            nm_filled = normmat.copy()
            mask = np.isnan(nm_filled)
            if mask.any():
                nm_filled[mask] = np.nanmin(nm_filled[~mask])
            got, got_starts, _ = _cascade_256mb(
                bundle, geom, jnp.asarray(seq), jnp.float32(mpos),
                jnp.float32(wpos), jnp.float32(chrlen_round),
                jnp.asarray(nm_filled),
            )
            want, want_starts = torch_cascade_256m(
                torch_modules, seq, normmat, chrlen_round, mpos, wpos, geom,
            )
            diffs = {}
            for j, level in enumerate((256, 128, 64, 32)):
                d = float(np.max(np.abs(
                    np.asarray(got[j][0], np.float32) - want[j]
                )))
                diffs[level] = d
                ok = ok and d <= atol
            ok = ok and list(np.asarray(got_starts)) == list(want_starts)
            per_window[f"{chrom}:{mpos}"] = diffs
        report[name] = per_window
    report["atol"] = atol
    report["dtype"] = dtype
    report["pass"] = ok
    return report


def certify_synthetic_32m(
    reference_path: str,
    seed: int = 0,
    atol: float = 2e-3,
    geometry=None,
    windows: Optional[Sequence[float]] = None,
    dtype: str = "float32",
) -> Dict:
    """FULL-GEOMETRY parity on synthetic (random-init) weights — no Zenodo
    download needed. Builds matching torch reference modules and a
    converted+folded bundle, then compares the production 32Mb cascade
    (8000 bins, crop 250, dilation-64 decoder blocks, production
    block-boundary layout — shapes the scaled-geometry tests never reach)
    against the reference genomepredict loop (orca_predict.py:316-523).
    The jax side runs the real serving path (folded BN -> fused Pallas
    kernels on TPU); the torch oracle runs on host CPU (~544s per window
    at full geometry, BASELINE_TORCH.json).

    windows: mpos fractions of the window (default one centered + one
    off-center zoom path).
    """
    import torch

    import jax.numpy as jnp

    from orca_tpu.models import convert
    from orca_tpu.models.zoo import ModelBundle, _random_normmats, fold_bundle
    from orca_tpu.predict.multiscale import GEOM_32M, _cascade_32mb

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import orca_modules as ref

    geom = geometry or GEOM_32M
    levels = (32, 16, 8, 4, 2, 1)
    torch.manual_seed(seed)
    net0 = ref.Encoder().eval()
    net = ref.Encoder2().eval()
    denets = {lv: ref.Decoder(upsample_mode="bilinear").eval()
              for lv in levels}
    denet_1pt = ref.Decoder_1m().eval()
    normmats, epss = _random_normmats(nbins=geom.bins, crop=geom.crop)
    bundle = fold_bundle(ModelBundle(
        name="synthetic",
        encoder=convert.convert_encoder_tower(net0.state_dict()),
        pyramid=convert.convert_pyramid(net.state_dict(), 5, True),
        decoders={
            lv: convert.convert_decoder(d.state_dict())
            for lv, d in denets.items()
        },
        decoder_1pt=convert.convert_decoder1m(denet_1pt.state_dict()),
        normmats=normmats,
        epss=epss,
    ))
    bundle = _cast_bundle(bundle, dtype)

    rng = np.random.RandomState(seed + 1)
    seq = rng.rand(1, geom.window_bp, 4).astype(np.float32)
    wpos = geom.window_bp // 2
    log_nm = jnp.asarray(bundle.log_normmats())
    report = {}
    ok = True
    for frac in (windows or (0.5, 0.13)):
        mpos = int(geom.window_bp * frac)
        got, got_starts = _cascade_32mb(
            bundle, geom, jnp.asarray(seq), jnp.float32(mpos),
            jnp.float32(wpos), log_nm,
        )
        got = [np.asarray(g[0, :, :, 0], np.float32) for g in got]
        want, want_starts = torch_cascade_32m(
            (net0, net, denets, denet_1pt, normmats), seq, mpos, wpos, geom,
        )
        diffs = {}
        for j, level in enumerate(levels):
            d = float(np.max(np.abs(got[j] - want[j])))
            diffs[level] = d
            ok = ok and d <= atol
        starts_ok = list(np.asarray(got_starts)) == list(want_starts)
        ok = ok and starts_ok
        report[f"mpos_frac_{frac}"] = {
            "max_abs_diff": diffs, "starts_equal": starts_ok,
        }
    report["geometry"] = {
        "window_bp": geom.window_bp, "bin_bp": geom.bin_bp,
        "crop": geom.crop,
    }
    report["atol"] = atol
    report["dtype"] = dtype
    report["seed"] = seed
    report["pass"] = ok
    return report


def certify_synthetic_1m(
    reference_path: str,
    seed: int = 0,
    atol: float = 2e-3,
    seq_len: int = 1_000_000,
    num_1d: int = 32,
    dtype: str = "float32",
) -> Dict:
    """FULL-GEOMETRY 1Mb Net parity on synthetic weights: random-init
    reference `Net(num_1d)` (orca_modules.py:1409-1901) -> the statedict
    converter -> `apply_net` (2D map + 1D track head + final_1d) vs the
    torch forward at the production 1Mb window."""
    import torch

    import jax.numpy as jnp

    from orca_tpu.models import convert
    from orca_tpu.nn import decoders

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import orca_modules as ref

    torch.manual_seed(seed)
    net = ref.Net(num_1d=num_1d).eval()
    params = _cast_bundle(
        convert.convert_net(net.state_dict(), num_1d=num_1d), dtype
    )

    rng = np.random.RandomState(seed + 1)
    codes = rng.randint(0, 4, size=seq_len)
    seq = np.eye(4, dtype=np.float32)[codes][None]
    got2d, got1d = decoders.apply_net(
        params, jnp.asarray(seq), num_1d=num_1d
    )
    with torch.no_grad():
        want2d, want1d = net(torch.FloatTensor(seq).transpose(1, 2))
    d2 = float(np.max(np.abs(
        np.asarray(got2d[0, :, :, 0], np.float32) - want2d.numpy()[0, 0]
    )))
    d1 = float(np.max(np.abs(
        np.asarray(got1d[0], np.float32) - want1d.numpy()[0].T
    )))
    return {
        "max_abs_diff": {"2d": d2, "1d": d1},
        "geometry": {"seq_len": seq_len, "num_1d": num_1d},
        "atol": atol,
        "dtype": dtype,
        "seed": seed,
        "pass": d2 <= atol and d1 <= atol,
    }


def certify_synthetic_256m(
    reference_path: str,
    seed: int = 0,
    atol: float = 2e-3,
    geometry=None,
    chrlen: Optional[int] = None,
    mpos_fracs: Sequence[float] = (0.44, 0.995),
    dtype: str = "float32",
) -> Dict:
    """FULL-GEOMETRY 256Mb cascade parity on synthetic weights — the
    production shapes the scaled-geometry tests never reach: 256Mb window,
    32kb bins, crop 250, per-region 8000x8000 normmat block-averaging, RC
    start-index mirror (orca_predict.py:832-833), and the chromosome-bound
    zoom clamp at a REAL chromosome length (default chr8-like 145.1Mb; the
    second mpos_frac sits near the chromosome end so the clamp is active).
    The torch oracle (orca_predict.py:661-845 over random-init reference
    modules) computes its encoder pass once and replays the zoom loop per
    target."""
    import torch

    import jax.numpy as jnp

    from orca_tpu.models import convert
    from orca_tpu.models.zoo import Model256MBundle, fold_256m_bundle
    from orca_tpu.predict import retrieval
    from orca_tpu.predict.multiscale import GEOM_256M, _cascade_256mb

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import orca_modules as ref

    geom = geometry or GEOM_256M
    levels = (32, 64, 128, 256)
    torch.manual_seed(seed)
    net0 = ref.Encoder().eval()
    net1 = ref.Encoder2().eval()
    net3 = ref.Encoder3().eval()
    denets = {lv: ref.Decoder(upsample_mode="bilinear").eval()
              for lv in levels}

    d = np.arange(geom.bins, dtype=np.float64)
    background_cis = np.hstack([
        np.exp(-1.2 * np.log1p(d) - 3.0),
        np.repeat(np.nan, geom.bins // 4),
    ])
    bundle = fold_256m_bundle(Model256MBundle(
        name="synthetic_256m",
        encoder=convert.convert_encoder_tower(net0.state_dict()),
        pyramid1=convert.convert_pyramid(net1.state_dict(), 5, True),
        pyramid=convert.convert_pyramid(net3.state_dict(), 3, True),
        decoders={
            lv: convert.convert_decoder(dn.state_dict())
            for lv, dn in denets.items()
        },
        background_cis=background_cis,
        background_trans=float(np.exp(-9.0)),
    ))
    bundle = _cast_bundle(bundle, dtype)

    # chr8-like whole chromosome + padding chromosome filling the window
    if chrlen is None:
        chrlen = int(geom.window_bp * (145_138_636 / 256_000_000))
    chrlen -= chrlen % geom.bin_bp
    regions = [["chrM", 0, chrlen, "+"],
               ["chrP", 0, geom.window_bp - chrlen, "+"]]
    normmat = retrieval.assemble_normmat(
        regions, bundle.background_cis, bundle.background_trans,
        binsize=geom.bin_bp,
    ).astype(np.float32)
    nm_filled = normmat.copy()
    mask = np.isnan(nm_filled)
    if mask.any():
        nm_filled[mask] = np.nanmin(nm_filled[~mask])

    rng = np.random.RandomState(seed + 1)
    codes = rng.randint(0, 4, size=geom.window_bp)
    seq = np.eye(4, dtype=np.float32)[codes][None]
    # packed quarter-scale uint8: the production transfer format
    seq_dev = jnp.asarray((np.eye(4, dtype=np.uint8) * 4)[codes][None])
    wpos = geom.window_bp // 2
    torch_modules = (net0, net1, net3, denets)
    encodings_pair = torch_encodings_256m(torch_modules, seq)

    report = {}
    ok = True
    for frac in mpos_fracs:
        mpos = int(chrlen * frac)
        got, got_starts, _ = _cascade_256mb(
            bundle, geom, seq_dev, jnp.float32(mpos), jnp.float32(wpos),
            jnp.float32(chrlen), jnp.asarray(nm_filled),
        )
        want, want_starts = torch_cascade_256m(
            torch_modules, seq, normmat, chrlen, mpos, wpos, geom,
            encodings_pair=encodings_pair,
        )
        diffs = {}
        for j, level in enumerate((256, 128, 64, 32)):
            dmax = float(np.max(np.abs(
                np.asarray(got[j][0], np.float32) - want[j]
            )))
            diffs[level] = dmax
            ok = ok and dmax <= atol
        starts_ok = list(np.asarray(got_starts)) == list(want_starts)
        ok = ok and starts_ok
        report[f"mpos_frac_{frac}"] = {
            "max_abs_diff": diffs, "starts_equal": starts_ok,
        }
    report["geometry"] = {
        "window_bp": geom.window_bp, "bin_bp": geom.bin_bp,
        "crop": geom.crop, "chrlen": chrlen,
    }
    report["atol"] = atol
    report["dtype"] = dtype
    report["seed"] = seed
    report["pass"] = ok
    return report


CERTIFY_FAMILIES = {
    "32m": certify_32m,
    "1m": certify_1m,
    "256m": certify_256m,
}

CERTIFY_SYNTHETIC_FAMILIES = {
    "32m": certify_synthetic_32m,
    "1m": certify_synthetic_1m,
    "256m": certify_synthetic_256m,
}
