"""Native host kernels (fwcore C++) with numpy fallback.

Builds ``native/fwcore.cpp`` into a shared library on demand (g++,
-O3 -fopenmp) and binds it via ctypes — pybind11 isn't available in
this environment, and a C ABI keeps the boundary trivial. All callers
go through the wrappers here, which fall back to the pure-numpy
implementations when the toolchain or library is unavailable, so the
framework never hard-requires the native build.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_LOCK = threading.Lock()


def _source_path() -> Path:
    return Path(__file__).resolve().parents[2] / "native" / "fwcore.cpp"


def _lib_path() -> Path:
    # keep the built artifact OUT of the python package so import
    # scanners don't mistake it for an extension module
    return Path(__file__).resolve().parents[2] / "native" / "libfwcore.so"


def build(force: bool = False) -> Optional[Path]:
    """Compile fwcore.cpp -> _fwcore.so. Returns the path or None."""
    src = _source_path()
    out = _lib_path()
    if out.exists() and not force:
        if out.stat().st_mtime >= src.stat().st_mtime:
            return out
    if not src.exists():
        return None
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
           str(src), "-o", str(out)]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            # retry without OpenMP (minimal toolchains)
            cmd = [c for c in cmd if c != "-fopenmp"]
            res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            logger.warning("fwcore build failed: %s", res.stderr.decode()[:400])
            return None
        return out
    except (OSError, subprocess.TimeoutExpired) as exc:
        logger.warning("fwcore build unavailable: %s", exc)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FRAMEWRIGHT_NO_NATIVE"):
            return None
        path = build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(str(path))
        except OSError as exc:
            logger.warning("fwcore load failed: %s", exc)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.yuv420_to_rgb.argtypes = [u8p, u8p, u8p, u8p,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.rgb_to_yuv420.argtypes = [u8p, u8p, u8p, u8p,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.dhash_batch.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_int]
        lib.fwcore_version.restype = ctypes.c_int
        _LIB = lib
        logger.info("fwcore native kernels loaded (v%d)", lib.fwcore_version())
        return _LIB


def available() -> bool:
    return get_lib() is not None


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# ---------------------------------------------------------------------------
# Wrappers (native or numpy fallback)
# ---------------------------------------------------------------------------

def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                  full_range: bool = False) -> np.ndarray:
    lib = get_lib()
    h, w = y.shape
    if lib is not None and w % 2 == 0 and h % 2 == 0:
        y = np.ascontiguousarray(y)
        u = np.ascontiguousarray(u)
        v = np.ascontiguousarray(v)
        rgb = np.empty((h, w, 3), np.uint8)
        lib.yuv420_to_rgb(_ptr(y), _ptr(u), _ptr(v), _ptr(rgb),
                          h, w, int(full_range))
        return rgb
    from framewright_tpu.io import color

    return color.yuv420_to_rgb(y, u, v, full_range=full_range)


def rgb_to_yuv420(rgb: np.ndarray, full_range: bool = False):
    lib = get_lib()
    h, w = rgb.shape[:2]
    if lib is not None and w % 2 == 0 and h % 2 == 0:
        rgb = np.ascontiguousarray(rgb)
        y = np.empty((h, w), np.uint8)
        u = np.empty((h // 2, w // 2), np.uint8)
        v = np.empty((h // 2, w // 2), np.uint8)
        lib.rgb_to_yuv420(_ptr(rgb), _ptr(y), _ptr(u), _ptr(v),
                          h, w, int(full_range))
        return y, u, v
    from framewright_tpu.io import color

    return color.rgb_to_yuv420(rgb, full_range=full_range)


def dhash_batch(frames: np.ndarray, hash_size: int = 8) -> np.ndarray:
    lib = get_lib()
    if lib is not None and hash_size <= 64:
        frames = np.ascontiguousarray(frames)
        n, h, w = frames.shape[:3]
        bits = np.empty((n, hash_size * hash_size), np.uint8)
        lib.dhash_batch(_ptr(frames), _ptr(bits), n, h, w, hash_size)
        return bits.astype(bool)
    from framewright_tpu.ops import dhash as _d

    return _d.dhash_batch(frames, hash_size)
