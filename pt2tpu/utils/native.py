"""ctypes bindings for the native runtime (runtime/libpt2runtime.so).

The library is built from C++ (runtime/ternary_pack.cc) with `make -C
runtime`; this module auto-builds it on first use when a toolchain is
available and falls back to the pure-numpy codec otherwise — import never
fails. Used by the artifact path (utils/checkpoint) and anywhere host-side
pack/unpack of large code matrices matters.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

__all__ = ["native_available", "pack_ternary_np", "unpack_ternary_np"]

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime",
)
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libpt2runtime.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _RUNTIME_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:
            print(f"pt2tpu native runtime unavailable: {e}", file=sys.stderr)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pt2_version.restype = ctypes.c_int32
        if lib.pt2_version() != 1:
            return None
        for fn in (lib.pt2_pack_ternary, lib.pt2_unpack_ternary):
            fn.restype = ctypes.c_int32
            fn.argtypes = [
                ctypes.c_void_p,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_void_p,
                ctypes.c_int32,
            ]
        _lib = lib
    except OSError as e:
        print(f"pt2tpu native runtime load failed: {e}", file=sys.stderr)
    return _lib


def native_available() -> bool:
    return _load() is not None


def _threads() -> int:
    return min(os.cpu_count() or 1, 16)


def pack_ternary_np(codes: np.ndarray, block_size: int = 128) -> np.ndarray:
    """(n, K) int8 {-1,0,1} -> (K//4, n) int8 planes (host-side).

    Same layout contract as core/packing.pack_ternary; uses the threaded C++
    codec when available, numpy otherwise.
    """
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    n, K = codes.shape
    if block_size % 4 != 0 or K % block_size != 0:
        raise ValueError(f"bad shape: K={K} block_size={block_size}")
    lib = _load()
    if lib is not None:
        out = np.empty((K // 4, n), dtype=np.int8)
        rc = lib.pt2_pack_ternary(
            codes.ctypes.data, n, K, block_size, out.ctypes.data, _threads()
        )
        if rc == 0:
            return out
    # numpy fallback (same math as core/packing.pack_ternary)
    bs4 = block_size // 4
    nb = K // block_size
    u = (codes.astype(np.int16) + 1).astype(np.uint8)
    ut = u.T.reshape(nb, 4, bs4, n)
    packed = ut[:, 0] | (ut[:, 1] << 2) | (ut[:, 2] << 4) | (ut[:, 3] << 6)
    return packed.reshape(K // 4, n).astype(np.int8)


def unpack_ternary_np(packed: np.ndarray, block_size: int = 128) -> np.ndarray:
    """(K//4, n) int8 planes -> (K, n) int8 codes (host-side)."""
    packed = np.ascontiguousarray(packed, dtype=np.int8)
    K4, n = packed.shape
    bs4 = block_size // 4
    if K4 % bs4 != 0:
        raise ValueError(f"bad shape: K/4={K4} block_size={block_size}")
    K = K4 * 4
    lib = _load()
    if lib is not None:
        out = np.empty((K, n), dtype=np.int8)
        rc = lib.pt2_unpack_ternary(
            packed.ctypes.data, n, K, block_size, out.ctypes.data, _threads()
        )
        if rc == 0:
            return out
    nb = K4 // bs4
    pr = packed.reshape(nb, bs4, n)
    planes = [((pr >> (2 * p)) & 3) for p in range(4)]
    stacked = np.concatenate(planes, axis=1)
    return (stacked.reshape(K, n) - 1).astype(np.int8)
