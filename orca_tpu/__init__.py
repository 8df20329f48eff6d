"""orca_tpu — a TPU-native multiscale genome 3D-structure prediction framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference Orca framework (jzhoulab/orca): sequence-to-contact-map prediction
at 4kb..1024kb resolutions over 1Mb..256Mb windows, in-silico structural
variant screens, and multi-stage training from micro-C contact data.

Design (TPU-first):
  * channels-last layouts (NLC / NHWC): 128 channels == one TPU lane tile.
  * functional modules: parameter pytrees + pure apply functions, jit/pjit
    friendly, with BatchNorm folded into convolutions for inference.
  * static shapes everywhere: zoom cascade uses dynamic-slice starts, never
    shape-changing ops, so each level compiles exactly once.
  * sequence-axis sharding with halo exchange (shard_map + ppermute) replaces
    the reference's sequential block loop (orca_modules.py:929-980).
"""

__version__ = "0.1.0"

from orca_tpu.utils.config import OrcaConfig, get_config, set_config  # noqa: F401
