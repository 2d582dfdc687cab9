"""ctypes binding for the native JPEG decode pool (native/jpeg_decoder.cpp).

Builds on demand with `make` if the shared library is missing; falls back to
the PIL path in data/pipeline.py when libjpeg headers or the toolchain are
unavailable. The native pool decodes whole batches without the GIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libodt_jpeg.so"))

_lib: Optional[ctypes.CDLL] = None
_tried_build = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried_build
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _tried_build:
        _tried_build = True
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.odt_decode_batch.restype = ctypes.c_int
    lib.odt_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    try:
        lib.odt_decode_batch_status.restype = ctypes.c_int
        lib.odt_decode_batch_status.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
    except AttributeError:
        # Stale .so predating the status API: rebuild picks it up next time.
        pass
    lib.odt_decode_single.restype = ctypes.c_int
    lib.odt_decode_single.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_batch(
    paths: Sequence[str], size: int, num_threads: int = 4
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Decode+resize a batch of JPEG files -> ((N, size, size, 3) uint8,
    (N,) bool ok-mask).

    Returns None when the native library is unavailable (caller falls back
    to PIL). Files that fail native decode (corrupt, CMYK, non-JPEG) are
    zero-filled with ok=False so the caller can re-decode them via PIL.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    u8p = ctypes.POINTER(ctypes.c_uint8)
    if hasattr(lib, "odt_decode_batch_status"):
        status = np.zeros((n,), np.uint8)
        lib.odt_decode_batch_status(
            arr, n, size, out.ctypes.data_as(u8p),
            status.ctypes.data_as(u8p), num_threads,
        )
        ok = status == 0
    else:  # stale .so: infer failures from zero-filled slots
        failures = lib.odt_decode_batch(
            arr, n, size, out.ctypes.data_as(u8p), num_threads
        )
        ok = np.ones((n,), bool)
        if failures:
            ok = out.reshape(n, -1).any(axis=1)
    return out, ok
