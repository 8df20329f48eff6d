"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), per the standard JAX testing recipe;
real-TPU benchmarks live in bench.py, not the test suite.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# JAX >= 0.5 honors jax_num_cpu_devices; older versions use the XLA flag.
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments (e.g. a TPU plugin registered from sitecustomize) import
# jax at interpreter startup, freezing platform/device-count config before
# this file runs. Force an 8-device CPU re-initialization.
import jax  # noqa: E402

if jax.config.jax_num_cpu_devices != 8 or jax.default_backend() != "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    from jax.extend.backend import clear_backends

    clear_backends()
    assert jax.device_count() == 8, jax.devices()
# Persistent compilation cache: the unrolled decoder graphs are slow to
# compile on CPU; cache across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1"
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return os.path.isdir(REFERENCE_DIR)


def import_reference_modules():
    """Import the reference torch module definitions as a parity oracle."""
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import orca_modules  # noqa: F401

    return orca_modules


def import_reference_leukemia():
    """Load the reference leukemia module's class definitions as an oracle.

    orca_leukemia.py instantiates its models at import time (:1872-1873),
    which requires checkpoint files — so exec only the definitions."""
    import types

    src = open(os.path.join(REFERENCE_DIR, "orca_leukemia.py")).read()
    cut = src.index("leuA = OrcaLeukemiaA()")
    # drop the model-assembly classes too (they load statedicts in __init__)
    cls_cut = src.index("class OrcaLeukemiaA")
    mod = types.ModuleType("orca_leukemia_defs")
    mod.__dict__["__file__"] = os.path.join(REFERENCE_DIR, "orca_leukemia.py")
    # the module requires the ORCA_PATH env/global (orca_leukemia.py:8-10)
    mod.__dict__["ORCA_PATH"] = REFERENCE_DIR
    exec(compile(src[:cls_cut], "orca_leukemia_defs", "exec"), mod.__dict__)
    return mod


def import_reference_utils():
    """Import the reference orca_utils (StructuralChange2, coord utils) with
    its unavailable viz dependency stubbed out."""
    import types

    if "pygenometracks" not in sys.modules:
        pkg = types.ModuleType("pygenometracks")
        plot_tracks = types.ModuleType("pygenometracks.plotTracks")
        pkg.plotTracks = plot_tracks
        sys.modules["pygenometracks"] = pkg
        sys.modules["pygenometracks.plotTracks"] = plot_tracks
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import orca_utils  # noqa: F401

    return orca_utils
