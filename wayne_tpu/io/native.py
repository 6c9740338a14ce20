"""ctypes bindings to the native FITS backend (libwaynefits.so).

Builds the library on first use (g++ is in the image; pybind11 is not,
so the boundary is a plain C ABI). Falls back silently to the pure-Python
writer in wayne_tpu/io/fits.py when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libwaynefits.so"))

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False
# Bump together with wayne_abi_version() in native/fitsio.cpp whenever
# the wayne_write_ima signature changes.
_ABI_VERSION = 3


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # Always run make: a no-op when current, a rebuild when the C++
        # source is newer than a stale .so (whose ABI may have changed).
        if not _build() and not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        # ABI gate: a pre-existing .so that make could NOT rebuild (no
        # compiler on this machine) may predate the current signature or
        # carry another host's -march=native code — loading it anyway
        # risks SIGILL/corruption instead of the documented silent
        # Python fallback. Require the matching version tag.
        try:
            lib.wayne_abi_version.restype = ctypes.c_int
            if int(lib.wayne_abi_version()) != _ABI_VERSION:
                return None
        except AttributeError:
            return None
        lib.wayne_write_ima.restype = ctypes.c_int
        lib.wayne_write_ima.argtypes = [
            ctypes.c_char_p,                      # path
            ctypes.c_char_p, ctypes.c_long,       # primary hdr
            ctypes.POINTER(ctypes.c_char_p),      # ext hdrs
            ctypes.POINTER(ctypes.c_long),        # ext hdr lens
            ctypes.POINTER(ctypes.c_float),       # reads
            ctypes.POINTER(ctypes.c_int16),       # dq planes (nullable)
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),      # read times
            ctypes.c_float, ctypes.c_float,       # gain, read noise
            ctypes.c_float,                       # bias pedestal (DN)
            ctypes.POINTER(ctypes.c_float),       # gain map (nullable)
            ctypes.POINTER(ctypes.c_float),       # bias e- map (nullable)
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def write_ima_native(path: str, reads_dn: np.ndarray, read_times: np.ndarray,
                     primary_bytes: bytes, ext_header_bytes: list[bytes],
                     gain: float, read_noise_e: float,
                     dq: np.ndarray | None = None,
                     bias_dn: float = 0.0,
                     gain_map: np.ndarray | None = None,
                     bias_e_map: np.ndarray | None = None) -> bool:
    """Write one ima file through the native backend. Returns success.

    ``gain_map`` / ``bias_e_map``: optional (h, w) per-pixel planes the
    default ERR propagates through instead of the scalar gain / mean
    bias pedestal (matching a SCI written with gain_variations/bias on).
    """
    lib = get_lib()
    if lib is None:
        return False
    reads = np.ascontiguousarray(reads_dn, np.float32)
    nr, h, w = reads.shape
    if len(ext_header_bytes) != 5 * nr:
        raise ValueError("need 5 extension headers per read")
    times = np.ascontiguousarray(read_times, np.float64)
    HdrArray = ctypes.c_char_p * len(ext_header_bytes)
    LenArray = ctypes.c_long * len(ext_header_bytes)
    hdrs = HdrArray(*ext_header_bytes)
    lens = LenArray(*[len(b) for b in ext_header_bytes])
    if dq is not None:
        dq = np.ascontiguousarray(dq, np.int16)
        if dq.shape != reads.shape:
            raise ValueError("dq shape must match reads")
        dq_ptr = dq.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
    else:
        dq_ptr = None

    def plane_ptr(m):
        if m is None:
            return None
        m = np.ascontiguousarray(m, np.float32)
        if m.shape != (h, w):
            raise ValueError(f"plane shape {m.shape} != {(h, w)}")
        return m, m.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    gm = plane_ptr(gain_map)
    bm = plane_ptr(bias_e_map)
    rc = lib.wayne_write_ima(
        path.encode(), primary_bytes, len(primary_bytes), hdrs, lens,
        reads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dq_ptr,
        nr, h, w, times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_float(gain), ctypes.c_float(read_noise_e),
        ctypes.c_float(bias_dn),
        gm[1] if gm else None, bm[1] if bm else None)
    return rc == 0
