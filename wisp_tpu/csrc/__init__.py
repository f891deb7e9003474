"""ctypes bindings for the native SPC topology builder (csrc/spc_builder.cpp).

Auto-builds the shared library on first import when a compiler is available; every entry
point has a numpy fallback in wisp_tpu.ops.spc.core, so the package works without native
code (tests assert both paths agree).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    so_path = os.path.join(here, "libwisp_spc.so")
    if not os.path.exists(so_path):
        try:
            subprocess.run(["sh", os.path.join(here, "build.sh")], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001
            log.info(f"native spc builder unavailable ({e}); numpy fallback in use")
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        log.info(f"cannot load {so_path} ({e}); numpy fallback in use")
        return None

    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32

    lib.morton_encode.argtypes = [i32p, i64, u64p]
    lib.morton_decode.argtypes = [u64p, i64, i32p]
    lib.sort_unique.argtypes = [u64p, i64]
    lib.sort_unique.restype = i64
    lib.quantize_and_unique.argtypes = [f32p, i64, i32, u64p]
    lib.quantize_and_unique.restype = i64
    lib.parent_level.argtypes = [u64p, i64, u64p]
    lib.parent_level.restype = i64
    lib.fill_occupancy.argtypes = [u64p, i64, i32, u8p]
    lib.dilate.argtypes = [u64p, i64, i32, u64p]
    lib.dilate.restype = i64
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def morton_encode(points: np.ndarray) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, dtype=np.int32)
    out = np.empty(len(pts), dtype=np.uint64)
    lib.morton_encode(pts, len(pts), out)
    return out


def morton_decode(codes: np.ndarray) -> np.ndarray:
    lib = _load()
    c = np.ascontiguousarray(codes, dtype=np.uint64)
    out = np.empty((len(c), 3), dtype=np.int32)
    lib.morton_decode(c, len(c), out)
    return out


def quantize_and_unique(coords: np.ndarray, level: int) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(coords, dtype=np.float32)
    buf = np.empty(len(pts), dtype=np.uint64)
    n = lib.quantize_and_unique(pts, len(pts), level, buf)
    return buf[:n].copy()


def parent_level(child_codes: np.ndarray) -> np.ndarray:
    lib = _load()
    c = np.ascontiguousarray(child_codes, dtype=np.uint64)
    buf = np.empty(len(c), dtype=np.uint64)
    n = lib.parent_level(c, len(c), buf)
    return buf[:n].copy()


def fill_occupancy(codes: np.ndarray, level: int) -> np.ndarray:
    lib = _load()
    c = np.ascontiguousarray(codes, dtype=np.uint64)
    occ = np.zeros((1 << level) ** 3, dtype=np.uint8)
    lib.fill_occupancy(c, len(c), level, occ)
    return occ.astype(bool)


def dilate(codes: np.ndarray, level: int) -> np.ndarray:
    lib = _load()
    c = np.ascontiguousarray(codes, dtype=np.uint64)
    buf = np.empty(27 * len(c), dtype=np.uint64)
    n = lib.dilate(c, len(c), level, buf)
    return buf[:n].copy()
