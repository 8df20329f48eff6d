"""Model bundles: encoder/decoder parameter sets + distance backgrounds.

Mirrors the reference model assemblies (orca_models.py): each bundle packs
the multi-resolution encoder params, per-level decoder params, and the
distance-based background statistics (`normmats`/`epss` for 1-32Mb models,
`background_cis`/`background_trans` for 32-256Mb models).

Checkpoint-backed bundles are built from converted torch statedicts; random
bundles (deterministic seed) support tests and benchmarks without the
~1.3 GB resource download.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from orca_tpu.models import convert
from orca_tpu.nn import decoders, encoders
from orca_tpu.nn.core import fold_params

LEVELS_32M = (1, 2, 4, 8, 16, 32)
LEVELS_256M = (32, 64, 128, 256)


def normmats_from_expectation(expected_log: np.ndarray, levels=LEVELS_32M,
                              nbins: int = 8000, crop: int = 250):
    """Distance-based background matrices per level.

    normmat[i,j] = exp(expected_log[|i-j|]) over `nbins` finest bins, block
    averaged to crop x crop per level, with eps = min
    (orca_models.py:139-156).
    """
    idx = np.abs(np.arange(nbins)[None, :] - np.arange(nbins)[:, None])
    normmat = np.exp(expected_log[idx])
    normmats, epss = {}, {}
    for level in levels:
        n = crop * level
        r = (
            np.reshape(normmat[:n, :n], (crop, level, crop, level))
            .mean(axis=1)
            .mean(axis=2)
        )
        normmats[level] = r
        epss[level] = float(np.min(r))
    return normmats, epss


def normmat_1m_from_expectation(expected_log: np.ndarray):
    """1Mb-model background: 1000 bins at 1kb, averaged 4x to 250x250
    (orca_models.py:478-488)."""
    e = expected_log[:1000]
    normmat = np.exp(e[np.abs(np.arange(1000)[None, :] - np.arange(1000)[:, None])])
    r = np.reshape(normmat, (250, 4, 250, 4)).mean(axis=1).mean(axis=2)
    return {1: r}, {1: float(np.min(r))}


@dataclasses.dataclass
class ModelBundle:
    """A 1-32Mb multiscale model (reference H1esc/Hff/HCTnoc)."""

    name: str
    encoder: dict  # bp->4kb tower params
    pyramid: dict  # 4kb->128kb params
    decoders: Dict[int, dict]  # level -> Decoder params
    decoder_1pt: Optional[dict]  # Decoder_1m params added at level 1, or None
    normmats: Dict[int, np.ndarray]
    epss: Dict[int, float]
    upsample_mode: str = "bilinear"
    pyramid_up_pass: bool = True
    num_2d: int = 1  # output heads (multi-cell-type variants use >1)

    @property
    def levels(self):
        return tuple(sorted(self.decoders))

    def log_normmats(self) -> np.ndarray:  # noqa: D102  (host-side helper)
        """Stacked (L, 250, 250) log backgrounds, coarsest level first."""
        return np.stack(
            [np.log(self.normmats[lv]) for lv in sorted(self.decoders, reverse=True)]
        ).astype(np.float32)


@dataclasses.dataclass
class Model1MBundle:
    """A standalone 1Mb model (reference H1esc_1M/Hff_1M)."""

    name: str
    net: dict  # Net params: encoder/decoder/final_1d
    num_1d: Optional[int]
    normmats: Dict[int, np.ndarray]
    epss: Dict[int, float]


@dataclasses.dataclass
class Model256MBundle:
    """A 32-256Mb model (reference H1esc_256M/Hff_256M)."""

    name: str
    encoder: dict  # bp->4kb tower
    pyramid1: dict  # 4kb->128kb (Encoder2, reused from the 32Mb model)
    pyramid: dict  # 128kb->1024kb (Encoder3)
    decoders: Dict[int, dict]
    background_cis: np.ndarray  # exp() 1D expectation at 32kb + NaN tail
    background_trans: float
    upsample_mode: str = "bilinear"

    @property
    def levels(self):
        return tuple(sorted(self.decoders))


# Bundles are pytrees: parameter/stat fields are leaves (traced under jit),
# structural fields are static metadata baked into the jit cache key.
jax.tree_util.register_dataclass(
    ModelBundle,
    data_fields=["encoder", "pyramid", "decoders", "decoder_1pt",
                 "normmats", "epss"],
    meta_fields=["name", "upsample_mode", "pyramid_up_pass", "num_2d"],
)
jax.tree_util.register_dataclass(
    Model1MBundle,
    data_fields=["net", "normmats", "epss"],
    meta_fields=["name", "num_1d"],
)
jax.tree_util.register_dataclass(
    Model256MBundle,
    data_fields=["encoder", "pyramid1", "pyramid", "decoders",
                 "background_cis", "background_trans"],
    meta_fields=["name", "upsample_mode"],
)


# --------------------------------------------------------------------------
# Construction from reference checkpoints
# --------------------------------------------------------------------------

_EXPECTED_FILES = {
    "h1esc": "4DNFI9GMP2J8.rebinned.mcool.expected.res4000.npy",
    "hff": "4DNFI643OYP9.rebinned.mcool.expected.res4000.npy",
    "hctnoc": "4DNFILP99QJS.HCT_auxin6h.rebinned.mcool.expected.res4000.npy",
}


def load_32m_bundle(model_dir: str, resource_dir: str, name: str,
                    fold: bool = True, nbins: int = 8000,
                    crop: int = 250) -> ModelBundle:
    """Assemble a 1-32Mb bundle from reference-format statedicts
    (orca_models.py:41-175 for H1esc; :335-446 for the HCTnoc variants).
    nbins/crop override the background geometry for scaled test runs."""
    up_pass = name != "hctnoc"
    upsample_mode = "bilinear" if name != "hctnoc" else "nearest"
    sd = convert.load_statedict(os.path.join(model_dir, f"orca_{name}.net.statedict"))
    pyramid = convert.convert_pyramid(sd, levels=5, up_pass=up_pass)
    net0_sd = convert.load_statedict(
        os.path.join(model_dir, f"orca_{name}.net0.statedict")
    )
    encoder = convert.convert_encoder_tower(net0_sd)
    decoder_1pt = (
        convert.convert_decoder1m(net0_sd) if up_pass else None
    )
    dec = {}
    for level in LEVELS_32M:
        dsd = convert.load_statedict(
            os.path.join(model_dir, f"orca_{name}.d{level}.statedict")
        )
        dec[level] = convert.convert_decoder(dsd)
    expected_log = np.load(os.path.join(resource_dir, _EXPECTED_FILES[name]))
    normmats, epss = normmats_from_expectation(expected_log, nbins=nbins,
                                               crop=crop)
    bundle = ModelBundle(
        name=name,
        encoder=encoder,
        pyramid=pyramid,
        decoders=dec,
        decoder_1pt=decoder_1pt,
        normmats=normmats,
        epss=epss,
        upsample_mode=upsample_mode,
        pyramid_up_pass=up_pass,
    )
    return fold_bundle(bundle) if fold else bundle


def fold_256m_bundle(bundle: Model256MBundle) -> Model256MBundle:
    """Fold all BatchNorms into conv weights for inference (256M family)."""
    return dataclasses.replace(
        bundle,
        encoder=fold_params(bundle.encoder, encoders.encoder_tower_spec()),
        pyramid1=fold_params(bundle.pyramid1, encoders.pyramid_spec(5, True)),
        pyramid=fold_params(bundle.pyramid, encoders.pyramid_spec(3, True)),
        decoders={
            lv: fold_params(p, decoders.decoder_spec(1))
            for lv, p in bundle.decoders.items()
        },
    )


def fold_bundle(bundle: ModelBundle) -> ModelBundle:
    """Fold all BatchNorms into conv weights for inference."""
    return dataclasses.replace(
        bundle,
        encoder=fold_params(bundle.encoder, encoders.encoder_tower_spec()),
        pyramid=fold_params(
            bundle.pyramid, encoders.pyramid_spec(5, bundle.pyramid_up_pass)
        ),
        decoders={
            lv: fold_params(p, decoders.decoder_spec(bundle.num_2d))
            for lv, p in bundle.decoders.items()
        },
        decoder_1pt=(
            fold_params(bundle.decoder_1pt,
                        decoders.decoder1m_spec(bundle.num_2d))
            if bundle.decoder_1pt is not None
            else None
        ),
    )


# --------------------------------------------------------------------------
# Random bundles (tests / benchmarks without checkpoint resources)
# --------------------------------------------------------------------------


def _random_normmats(levels=LEVELS_32M, nbins: int = 8000, crop: int = 250):
    # smooth decaying expectation similar in shape to real micro-C
    d = np.arange(nbins, dtype=np.float64)
    expected_log = -1.5 * np.log1p(d) - 2.0
    return normmats_from_expectation(expected_log, levels=levels, nbins=nbins,
                                     crop=crop)


def random_32m_bundle(seed: int = 0, name: str = "random",
                      upsample_mode: str = "bilinear",
                      up_pass: bool = True, nbins: int = 8000,
                      crop: int = 250) -> ModelBundle:
    key = jax.random.PRNGKey(seed)
    ke, kp, kd, k1 = jax.random.split(key, 4)
    dec = {
        lv: decoders.init_decoder(k)
        for lv, k in zip(LEVELS_32M, jax.random.split(kd, len(LEVELS_32M)))
    }
    normmats, epss = _random_normmats(nbins=nbins, crop=crop)
    return ModelBundle(
        name=name,
        encoder=encoders.init_encoder_tower(ke),
        pyramid=encoders.init_pyramid(kp, 5, up_pass),
        decoders=dec,
        decoder_1pt=decoders.init_decoder1m(k1) if up_pass else None,
        normmats=normmats,
        epss=epss,
        upsample_mode=upsample_mode,
        pyramid_up_pass=up_pass,
    )


def random_256m_bundle(seed: int = 0, name: str = "random_256m") -> Model256MBundle:
    key = jax.random.PRNGKey(seed)
    ke, kp1, kp, kd = jax.random.split(key, 4)
    dec = {
        lv: decoders.init_decoder(k)
        for lv, k in zip(LEVELS_256M, jax.random.split(kd, len(LEVELS_256M)))
    }
    d = np.arange(8000, dtype=np.float64)
    background_cis = np.hstack(
        [np.exp(-1.2 * np.log1p(d) - 3.0), np.repeat(np.nan, 2000)]
    )
    return Model256MBundle(
        name=name,
        encoder=encoders.init_encoder_tower(ke),
        pyramid1=encoders.init_pyramid(kp1, 5, True),
        pyramid=encoders.init_pyramid(kp, 3, True),
        decoders=dec,
        background_cis=background_cis,
        background_trans=float(np.exp(-9.0)),
    )


_LEUKEMIA_NORMMAT_FILES = {
    # multi-cell-type leukemia variants (orca_leukemia.py:1631-1632,:1763-1768)
    "leukemiaA": [
        "GSE134761_TALL_all.hg38.no_filter.1000.mcool.expected.res4000.npy",
        "THP1.hg38.no_filter.1000.mcool.expected.res4000.npy",
    ],
    "leukemiaB": [
        "4DNFIXP4QG5B.mcool.rebinned.mcool.expected.res4000.npy",
        "NALM6.hg38.no_filter.1000.mcool.expected.res4000.npy",
        "GSE146901_T_ALL_NonETP.hg38.no_filter.1000.mcool.expected.res4000.npy",
        "GSE146901_T_ALL_ETP.hg38.no_filter.1000.mcool.expected.res4000.npy",
        "GSE63525_K562.hg38.no_filter.1000.mcool.expected.res4000.npy",
        "GSE63525_KBM7.hg38.no_filter.1000.mcool.expected.res4000.npy",
    ],
}


def multi_normmats_from_expectations(expected_logs, levels=LEVELS_32M,
                                     nbins: int = 8000, crop: int = 250):
    """Stacked per-dataset backgrounds: each level maps to a
    (num_2d, crop, crop) array with a single scalar eps across datasets
    (orca_leukemia.py:1702-1729)."""
    idx = np.abs(np.arange(nbins)[None, :] - np.arange(nbins)[:, None])
    mats = np.stack([np.exp(e[:nbins])[idx] for e in expected_logs])
    normmats, epss = {}, {}
    for level in levels:
        n = crop * level
        r = (
            mats[:, :n, :n]
            .reshape(len(expected_logs), crop, level, crop, level)
            .mean(axis=4)
            .mean(axis=2)
        )
        normmats[level] = r
        epss[level] = float(np.min(r))
    return normmats, epss


def load_leukemia_bundle(model_dir: str, resource_dir: str, name: str,
                         fold: bool = True) -> ModelBundle:
    """Assemble a multi-cell-type leukemia bundle (orca_leukemia.py:1604-1869).

    `name` is 'leukemiaA' (2 heads) or 'leukemiaB' (6 heads). The leukemia
    pyramid has no upward pass (orca_leukemia.py:1499-1601) and its decoders
    use nearest upsampling with num_2d-channel distance encodings and heads.
    """
    files = _LEUKEMIA_NORMMAT_FILES[name]
    num_2d = len(files)
    sd = convert.load_statedict(
        os.path.join(model_dir, f"orca_{name}.net.statedict")
    )
    pyramid = convert.convert_pyramid(sd, levels=5, up_pass=False)
    net0_sd = convert.load_statedict(
        os.path.join(model_dir, f"orca_{name}.net0.statedict")
    )
    encoder = convert.convert_encoder_tower(net0_sd)
    decoder_1pt = convert.convert_decoder1m(net0_sd, num_2d=num_2d)
    dec = {}
    for level in LEVELS_32M:
        dsd = convert.load_statedict(
            os.path.join(model_dir, f"orca_{name}.d{level}.statedict")
        )
        dec[level] = convert.convert_decoder(dsd, num_2d=num_2d)
    expected_logs = [
        np.load(os.path.join(resource_dir, f)) for f in files
    ]
    normmats, epss = multi_normmats_from_expectations(expected_logs)
    bundle = ModelBundle(
        name=name,
        encoder=encoder,
        pyramid=pyramid,
        decoders=dec,
        decoder_1pt=decoder_1pt,
        normmats=normmats,
        epss=epss,
        upsample_mode="nearest",
        pyramid_up_pass=False,
        num_2d=num_2d,
    )
    return fold_bundle(bundle) if fold else bundle


def random_leukemia_bundle(seed: int = 0, num_2d: int = 2,
                           name: str = "random_leukemia",
                           nbins: int = 8000, crop: int = 250) -> ModelBundle:
    key = jax.random.PRNGKey(seed)
    ke, kp, kd, k1 = jax.random.split(key, 4)
    dec = {
        lv: decoders.init_decoder(k, num_2d=num_2d)
        for lv, k in zip(LEVELS_32M, jax.random.split(kd, len(LEVELS_32M)))
    }
    d = np.arange(nbins, dtype=np.float64)
    expected_logs = [
        -1.5 * np.log1p(d) - 2.0 - 0.1 * i for i in range(num_2d)
    ]
    normmats, epss = multi_normmats_from_expectations(
        expected_logs, nbins=nbins, crop=crop
    )
    return ModelBundle(
        name=name,
        encoder=encoders.init_encoder_tower(ke),
        pyramid=encoders.init_pyramid(kp, 5, False),
        decoders=dec,
        decoder_1pt=decoders.init_decoder1m(k1, num_2d=num_2d),
        normmats=normmats,
        epss=epss,
        upsample_mode="nearest",
        pyramid_up_pass=False,
        num_2d=num_2d,
    )


def load_256m_bundle(model_dir: str, resource_dir: str, name: str,
                     fold: bool = True) -> Model256MBundle:
    """Assemble a 32-256Mb bundle (orca_models.py:545-760). `name` is
    'h1esc' or 'hff'; the Encoder/Encoder2 weights come from the matching
    32Mb bundle files."""
    cell = name
    sd = convert.load_statedict(
        os.path.join(model_dir, f"orca_{cell}_256m.net.statedict")
    )
    pyramid = convert.convert_pyramid(sd, levels=3, up_pass=True)
    net0_sd = convert.load_statedict(
        os.path.join(model_dir, f"orca_{cell}.net0.statedict")
    )
    encoder = convert.convert_encoder_tower(net0_sd)
    net1_sd = convert.load_statedict(
        os.path.join(model_dir, f"orca_{cell}.net.statedict")
    )
    pyramid1 = convert.convert_pyramid(net1_sd, levels=5, up_pass=True)
    dec = {}
    for level in LEVELS_256M:
        dsd = convert.load_statedict(
            os.path.join(model_dir, f"orca_{cell}_256m.d{level}.statedict")
        )
        dec[level] = convert.convert_decoder(dsd)
    stem = {"h1esc": "4DNFI9GMP2J8", "hff": "4DNFI643OYP9"}[cell]
    cis = np.load(
        os.path.join(resource_dir, f"{stem}.rebinned.mcool.expected.res32000.mono.npy")
    )
    trans = np.load(
        os.path.join(resource_dir, f"{stem}.rebinned.mcool.expected.res32000.trans.npy")
    )
    bundle = Model256MBundle(
        name=f"{cell}_256m",
        encoder=encoder,
        pyramid1=pyramid1,
        pyramid=pyramid,
        decoders=dec,
        background_cis=np.hstack([np.exp(cis), np.repeat(np.nan, 2000)]),
        background_trans=float(np.exp(trans)),
    )
    return fold_256m_bundle(bundle) if fold else bundle


def load_1m_bundle(model_dir: str, resource_dir: str, name: str) -> Model1MBundle:
    """Standalone 1Mb bundle from the stage-a checkpoint
    (orca_models.py:449-542)."""
    num_1d = {"h1esc": 32, "hff": 22}[name]
    sd = convert.load_statedict(
        os.path.join(model_dir, f"orca_{name}.net0.statedict")
    )
    net = convert.convert_net(sd, num_1d=num_1d)
    stem = {"h1esc": "4DNFI9GMP2J8", "hff": "4DNFI643OYP9"}[name]
    expected_log = np.load(
        os.path.join(resource_dir, f"{stem}.rebinned.mcool.expected.res1000.npy")
    )
    normmats, epss = normmat_1m_from_expectation(expected_log)
    return Model1MBundle(
        name=f"{name}_1m", net=net, num_1d=num_1d, normmats=normmats, epss=epss
    )


def cast_bundle(bundle, dtype: str):
    """Cast a bundle's float32 leaves to `dtype` (bfloat16 = the production
    serving precision; float32 = reference-parity, returned unchanged).

    jnp.asarray, not ndarray.astype: numpy ml_dtypes bfloat16 arrays follow
    NUMPY promotion (bf16 + python float -> f32), silently upcasting
    activations mid-network; jax arrays keep weak-type rules."""
    if dtype in ("float32", None):
        return bundle
    target = jnp.dtype(dtype)
    return jax.tree.map(
        lambda x: jnp.asarray(x, target)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        bundle,
    )


def save_bundle(bundle, path: str) -> None:
    host = jax.tree.map(np.asarray, bundle)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_bundle(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
