"""Native (C++) host runtime components, loaded via ctypes.

The shared library is compiled on first use and cached next to the sources;
every entry point has a pure-numpy fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libjpeggpu_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, "destuff.cpp")
    tmp = _SO_PATH + f".tmp{os.getpid()}"
    cmd = ["c++", "-O3", "-shared", "-fPIC", "-o", tmp, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO_PATH)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib():
    """Return the loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.jpeggpu_destuff.restype = ctypes.c_int64
            lib.jpeggpu_destuff.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def destuff_host(body: np.ndarray, seg_sub_offset: np.ndarray,
                 num_subseq: int) -> np.ndarray | None:
    """Native destuff of a scan body into the device layout.

    Returns uint8[num_subseq*128] or None if the native library is
    unavailable (caller falls back to numpy).
    """
    lib = get_lib()
    if lib is None:
        return None
    body = np.ascontiguousarray(body, np.uint8)
    seg = np.ascontiguousarray(seg_sub_offset, np.int32)
    out = np.zeros(num_subseq * 128, np.uint8)
    rc = lib.jpeggpu_destuff(
        body.ctypes.data, body.size, seg.ctypes.data, seg.size,
        out.ctypes.data, out.size)
    if rc < 0:
        return None
    return out
