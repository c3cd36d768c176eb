"""ctypes binding for the native C++ batch image loader.

Builds ``native/libeacham_native.so`` on first use (cached). PNG (zlib),
PPM/PGM, and BMP decode + grayscale + the <=1500-row downsize policy all
run in native threads (the equivalent of the reference's native OpenCV
imread path); JPEG and exotic formats fall back to PIL per image.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libeacham_native.so"
_lib = None

EL_OK = 0


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.el_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.el_probe.restype = ctypes.c_int
    lib.el_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.el_load_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def probe(path: str | Path):
    """(width, height) after the downsize policy, or None if undecodable
    natively."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.el_probe(str(path).encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != EL_OK:
        return None
    return w.value, h.value


def load_batch_native(paths: list, out_h: int, out_w: int, workers: int = 8):
    """Decode a batch into ([N, out_h, out_w] float32, sizes [N, 2],
    status [N]). status != 0 rows must be filled by the fallback."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.zeros((n, out_h, out_w), np.float32)
    sizes = np.zeros((n, 2), np.int32)
    status = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.el_load_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        workers,
    )
    return out, sizes, status
