"""ctypes bindings for the native host-side data kernels (native/).

Every entry point has a numpy fallback; `available()` reports whether the
shared library is loaded. Build with `make -C native` (or it is built on
demand when a compiler is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "liborca_native.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"], check=True, timeout=120,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fasta_to_codes.restype = ctypes.c_longlong
    lib.fasta_to_codes.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p,
        ctypes.c_longlong,
    ]
    lib.codes_to_onehot.restype = None
    lib.codes_to_onehot.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.codes_to_onehot_rc.restype = None
    lib.codes_to_onehot_rc.argtypes = lib.codes_to_onehot.argtypes
    lib.onehot_batch_gather.restype = None
    lib.onehot_batch_gather.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_longlong, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def fasta_to_codes(path: str, max_size: Optional[int] = None,
                   max_chroms: int = 4096):
    """Parse FASTA into (codes: uint8 array, [(name, start, end), ...]).
    Returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    size = max_size or os.path.getsize(path)
    codes = np.empty(size, dtype=np.uint8)
    offsets = np.zeros(2 * max_chroms, dtype=np.int64)
    names = ctypes.create_string_buffer(max_chroms * 256)
    n = lib.fasta_to_codes(
        path.encode(), _u8ptr(codes),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        names, max_chroms,
    )
    if n < 0:
        return None
    name_list = names.raw.split(b"\0")[:n]
    chroms = [
        (name_list[i].decode(), int(offsets[2 * i]), int(offsets[2 * i + 1]))
        for i in range(n)
    ]
    total = chroms[-1][2] if chroms else 0
    return codes[:total].copy(), chroms


def codes_to_onehot(codes: np.ndarray, rc: bool = False) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    out = np.empty((len(codes), 4), dtype=np.float32)
    fn = lib.codes_to_onehot_rc if rc else lib.codes_to_onehot
    fn(_u8ptr(codes), len(codes), _f32ptr(out))
    return out


def onehot_batch_gather(genome_codes: np.ndarray, starts: np.ndarray,
                        strands: np.ndarray, window_len: int
                        ) -> Optional[np.ndarray]:
    """Batched window expansion: (W,) starts/strands -> (W, window_len, 4)."""
    lib = _load()
    if lib is None:
        return None
    genome_codes = np.ascontiguousarray(genome_codes, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    strands = np.ascontiguousarray(strands, dtype=np.uint8)
    out = np.empty((len(starts), window_len, 4), dtype=np.float32)
    lib.onehot_batch_gather(
        _u8ptr(genome_codes), len(genome_codes),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _u8ptr(strands), len(starts), window_len, _f32ptr(out),
    )
    return out
