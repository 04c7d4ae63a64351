"""Native host-side data plane (C++, ctypes-bound).

Replaces the reference's Numba kernels (kge/indexing.py:58-155,415-428,
kge/util/sampler.py:700-752) with a compiled shared library; every entry
point has a pure-numpy fallback, so the package works without a compiler.
The library is built on first use with g++ and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kge_native.cpp")
_SO = os.path.join(_HERE, "_kge_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    """Compile the shared library (g++ -O3, OpenMP when available)."""
    for extra in (["-fopenmp"], []):
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            *extra, "-o", _SO + ".tmp", _SRC,
        ]
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=240
            )
        except (OSError, subprocess.TimeoutExpired):
            return False
        if proc.returncode == 0:
            os.replace(_SO + ".tmp", _SO)
            return True
    sys.stderr.write(
        f"kge_tpu.native: build failed:\n{proc.stderr[-2000:]}\n"
    )
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("KGE_TPU_NO_NATIVE"):
            _build_failed = True
            return None
        fresh = (
            os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
        )
        if not fresh and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.kge_parse_triples.restype = ctypes.c_int64
        lib.kge_parse_triples.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.kge_where_in.restype = None
        lib.kge_where_in.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.kge_filter_resample.restype = ctypes.c_int64
        lib.kge_filter_resample.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_uint64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def parse_triples(path: str) -> Optional[np.ndarray]:
    """Parse a 3-column integer TSV into an [N, 3] int32 array, or None when
    the native library is unavailable. Raises on malformed files."""
    lib = _load()
    if lib is None:
        return None
    count = lib.kge_parse_triples(path.encode(), None, 0)
    if count < 0:
        raise ValueError(
            f"cannot parse triple file {path!r} (native error {count})"
        )
    out = np.empty((count, 3), dtype=np.int32)
    got = lib.kge_parse_triples(path.encode(), _ptr(out, ctypes.c_int32), count)
    if got != count:
        raise ValueError(f"inconsistent parse of {path!r}: {got} vs {count}")
    return out


def where_in(
    x: np.ndarray, y: np.ndarray, not_in: bool = False
) -> Optional[np.ndarray]:
    """Positions of x (not) contained in y, or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.int64)
    y = np.ascontiguousarray(y, dtype=np.int64)
    mask = np.empty(len(x), dtype=np.uint8)
    lib.kge_where_in(
        _ptr(x, ctypes.c_int64), len(x), _ptr(y, ctypes.c_int64), len(y),
        _ptr(mask, ctypes.c_uint8), int(not_in),
    )
    return np.nonzero(mask)[0]


def filter_resample(
    samples: np.ndarray,
    rows_idx: np.ndarray,
    offsets: np.ndarray,
    values: np.ndarray,
    vocab: int,
    seed: int,
    cdf: Optional[np.ndarray] = None,
) -> Optional[int]:
    """In-place filtered resampling of ``samples`` [n, m] (int64, C-order):
    entries colliding with their row's CSR positives are redrawn (uniform, or
    from the inclusive ``cdf`` when given). Returns the replacement count, or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    assert samples.dtype == np.int64 and samples.flags.c_contiguous
    rows_idx = np.ascontiguousarray(rows_idx, dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    values = np.ascontiguousarray(values, dtype=np.int32)
    n, m = samples.shape
    cdf_ptr = None
    if cdf is not None:
        cdf = np.ascontiguousarray(cdf, dtype=np.float64)
        cdf_ptr = cdf.ctypes.data_as(ctypes.c_void_p)
    return int(
        lib.kge_filter_resample(
            _ptr(samples, ctypes.c_int64), n, m,
            _ptr(rows_idx, ctypes.c_int64), _ptr(offsets, ctypes.c_int64),
            _ptr(values, ctypes.c_int32), vocab, cdf_ptr,
            ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF).value,
        )
    )
