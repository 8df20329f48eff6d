"""Global configuration for orca_tpu.

The reference hardcodes paths/constants per script and exposes a single module
global (``Blocksize``, orca_modules.py:11-13) plus one env var (ORCA_PATH).
Here configuration is a real, overridable object.
"""

from __future__ import annotations

import dataclasses
import os
import pathlib
from typing import Optional


REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent


@dataclasses.dataclass
class OrcaConfig:
    """Framework-wide configuration.

    Attributes
    ----------
    resource_dir:
        Directory holding genome/expectation/model resources (mirrors the
        reference's ``ORCA_PATH/resources``).
    model_dir:
        Directory holding converted model parameter files.
    param_dtype:
        dtype inference bundles are loaded in (the conv towers compute in
        the parameter dtype). float32 matches the reference numerics;
        bfloat16 is the production serving config (~2.3x fp32 on v5e at
        ~1e-2 tolerance). Applied by predict.resources.load_resources;
        override with ORCA_TPU_PARAM_DTYPE.
    encoder_block_bp:
        Sequence chunk length (bp) used when scanning the bp-resolution
        encoder to bound activation memory (reference Blocksize,
        orca_modules.py:13). Must be a multiple of 4000.
    encoder_halo_bp:
        Halo (overlap) in bp on each side of a block/shard. 112000 covers the
        encoder's full receptive field (~104 kb), making blockwise and
        monolithic execution exactly equivalent (orca_modules.py:932).
    interpret_pallas:
        Run pallas kernels in interpreter mode (CPU testing).
    """

    resource_dir: str = os.environ.get(
        "ORCA_TPU_RESOURCES", str(REPO_ROOT / "resources")
    )
    model_dir: str = os.environ.get("ORCA_TPU_MODELS", str(REPO_ROOT / "models"))
    # chromatin-track bigWigs (the reference's ORCA_PATH/extra)
    extra_dir: str = os.environ.get(
        "ORCA_TPU_EXTRA", str(REPO_ROOT / "extra")
    )
    param_dtype: str = os.environ.get("ORCA_TPU_PARAM_DTYPE", "float32")
    # 800kb blocks batched ~20 at a time measure ~2-3x faster on v5e than
    # fewer/longer blocks (long spatial dims tile poorly); see bench history.
    encoder_block_bp: int = int(os.environ.get("ORCA_TPU_BLOCK_BP", 4000 * 200))
    encoder_halo_bp: int = 112000
    # Block length used by the fused-Pallas encoder path (larger than the
    # XLA path's 800kb: the kernels stream tiles, so blocks are bounded by
    # activation memory only and bigger blocks amortize the 112kb halo).
    pallas_block_bp: int = int(
        os.environ.get("ORCA_TPU_PALLAS_BLOCK_BP", 4_000_000)
    )
    interpret_pallas: bool = False
    # None = auto (fused Pallas kernels on TPU backends, XLA elsewhere);
    # override with ORCA_TPU_USE_PALLAS=0/1.
    use_pallas: Optional[bool] = (
        None
        if os.environ.get("ORCA_TPU_USE_PALLAS", "") == ""
        else bool(int(os.environ["ORCA_TPU_USE_PALLAS"]))
    )


_config: Optional[OrcaConfig] = None


def get_config() -> OrcaConfig:
    global _config
    if _config is None:
        _config = OrcaConfig()
    return _config


def set_config(config: OrcaConfig) -> None:
    global _config
    _config = config
