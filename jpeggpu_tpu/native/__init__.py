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
    cmd = ["c++", "-O3", "-shared", "-fPIC", "-pthread", "-o", tmp, src]
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
            if not hasattr(lib, "jpeggpu_destuff_seg"):
                # stale cached build from an older version: rebuild once
                lib = None
                if _build():
                    lib = ctypes.CDLL(_SO_PATH)
                    if not hasattr(lib, "jpeggpu_destuff_seg"):
                        lib = None
            if lib is not None:
                lib.jpeggpu_destuff.restype = ctypes.c_int64
                lib.jpeggpu_destuff.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                ]
                lib.jpeggpu_destuff_seg.restype = ctypes.c_int64
                lib.jpeggpu_destuff_seg.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                    ctypes.c_int64, ctypes.c_int32,
                ]
                lib.jpeggpu_bswap32.restype = None
                lib.jpeggpu_bswap32.argtypes = [
                    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def destuff_host(body: np.ndarray, seg_sub_offset: np.ndarray,
                 num_subseq: int, seg_raw: np.ndarray | None = None,
                 num_threads: int | None = None) -> np.ndarray | None:
    """Native destuff of a scan body into the device layout.

    With ``seg_raw`` (per-segment stuffed byte spans from the parser's
    segment walk), segments are destuffed in parallel across
    ``num_threads`` workers (default: the machine's core count) — they are
    independent by construction since each starts subsequence-aligned.
    Returns uint8[num_subseq*128] or None if the native library is
    unavailable (caller falls back to numpy).
    """
    lib = get_lib()
    if lib is None:
        return None
    body = np.ascontiguousarray(body, np.uint8)
    seg = np.ascontiguousarray(seg_sub_offset, np.int32)
    out = np.zeros(num_subseq * 128, np.uint8)
    if seg_raw is not None:
        if num_threads is None:
            num_threads = min(os.cpu_count() or 1, 8)
        raw = np.ascontiguousarray(seg_raw, np.int64)
        rc = lib.jpeggpu_destuff_seg(
            body.ctypes.data, body.size, raw.ctypes.data, seg.ctypes.data,
            seg.size, out.ctypes.data, out.size, num_threads)
    else:
        rc = lib.jpeggpu_destuff(
            body.ctypes.data, body.size, seg.ctypes.data, seg.size,
            out.ctypes.data, out.size)
    if rc < 0:
        return None
    return out


def destuff_words(body: np.ndarray, seg_sub_offset: np.ndarray,
                  num_subseq: int, lanes: int,
                  seg_raw: np.ndarray | None = None,
                  num_threads: int | None = None) -> np.ndarray | None:
    """Destuff straight into the padded device word layout.

    One native pass produces the uint32[lanes * 32] array the device bit
    reader consumes: segment-parallel destuff into the padded buffer plus an
    in-place big-endian word conversion — no Python-side copy chain.
    Returns None if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None or seg_raw is None:
        return None
    if num_threads is None:
        num_threads = min(os.cpu_count() or 1, 8)
    body = np.ascontiguousarray(body, np.uint8)
    seg = np.ascontiguousarray(seg_sub_offset, np.int32)
    raw = np.ascontiguousarray(seg_raw, np.int64)
    full = np.zeros(lanes * 128, np.uint8)
    # capacity bound is the real subsequence count: a corrupt final segment
    # must not bleed into the zero padding the decode relies on
    rc = lib.jpeggpu_destuff_seg(
        body.ctypes.data, body.size, raw.ctypes.data, seg.ctypes.data,
        seg.size, full.ctypes.data, num_subseq * 128, num_threads)
    if rc < 0:
        return None
    words = full.view(np.uint32)
    lib.jpeggpu_bswap32(words.ctypes.data, num_subseq * 32, num_threads)
    return words
